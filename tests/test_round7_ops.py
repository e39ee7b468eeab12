"""Invariant tests for the round-7 late additions (diagnostics batch):
time-series ACF/EWMA/seasonal, dq volume-freshness, join-cardinality
audit, HLL sketch set-ops, Zipf fit, interval-overlap join. The oracle
parity suite already value-hashes each; these pin the *semantic*
invariants a hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_apache_ci_spark.registry import all_queries

from .conftest import SF_DIR


def run(spark, name):
    return all_queries()[name](spark, SF_DIR)


def test_acf_bounded_and_lag_complete(spark):
    rows = run(spark, "events_autocorrelation").collect()
    assert rows
    assert all(abs(r.acf) <= 1.0001 for r in rows)
    # every (type, lag) pair has a healthy pair count at sf0.001
    assert all(r.n_pairs > 10 for r in rows)


def test_ewma_first_row_equals_value_and_taps_bounded(spark):
    df = run(spark, "events_ewma_taps")
    assert df.filter((F.col("n_taps") < 1) | (F.col("n_taps") > 8)).count() == 0
    # a 1-tap row renormalizes to exactly its own value
    one = df.filter(F.col("n_taps") == 1)
    assert one.count() > 0
    assert one.filter(F.abs(F.col("ewma") - F.col("v")) > 1e-6).count() == 0


def test_seasonal_residual_anomalies_are_tail(spark):
    df = run(spark, "events_seasonal_residual")
    n = df.count()
    a = df.filter("is_anomaly").count()
    assert n > 0 and a < 0.1 * n  # 2-sigma flags are a tail, not the body


def test_volume_freshness_lag_nonneg_with_zero_at_hwm(spark):
    rows = run(spark, "dq_volume_freshness").collect()
    assert all(r.lag_hours >= 0 for r in rows)
    assert any(abs(r.lag_hours) < 1e-6 for r in rows)  # some type IS the hwm
    # med7 is null only for each type's earliest day(s)
    assert all(r.med7 is None or r.med7 > 0 for r in rows)


def test_join_cardinality_actual_sums_to_join_count(spark):
    from hive_apache_ci_spark.catalog import load_table

    df = run(spark, "analyze_join_cardinality")
    got = df.agg(F.sum("actual")).collect()[0][0]
    o = load_table(spark, SF_DIR, "orders").select("o_custkey")
    e = load_table(spark, SF_DIR, "events").select("user_id")
    true = o.join(e, o["o_custkey"] == e["user_id"]).count()
    assert got == true


def test_hll_setops_bounds_hold(spark):
    rows = run(spark, "agg_hll_sketch_setops").collect()
    assert rows
    assert all(r.union_within_bound and r.inter_within_bound for r in rows)
    assert all(
        r.exact_union >= max(r.exact_a, r.exact_b)
        and r.exact_inter <= min(r.exact_a, r.exact_b)
        for r in rows
    )


def test_zipf_slope_negative_good_fit(spark):
    rows = run(spark, "text_zipf_fit").collect()
    assert rows
    assert all(r.slope < 0 for r in rows)  # frequencies DECAY with rank
    assert all(0.0 <= r.r2 <= 1.0 for r in rows)


def test_interval_overlap_bounds(spark):
    rows = run(spark, "join_interval_overlap").collect()
    assert rows
    # closed-interval overlap with the 1800 s close-out pad: 0..len
    assert all(r.overlap_sec >= 0 for r in rows)
    # containment implies overlap == full b length >= the 1800 pad
    assert all(
        r.overlap_sec >= 1800 for r in rows if r.b_contained
    )


def test_sliding_distinct_first_day_equals_daily(spark):
    from hive_apache_ci_spark.catalog import load_table

    df = run(spark, "events_sliding_distinct_users")
    first = (
        df.groupBy("event_type")
        .agg(F.min("window_end_day").alias("d"))
        .collect()
    )
    e = load_table(spark, SF_DIR, "events")
    daily = (
        e.select(
            "event_type",
            (F.floor(F.col("ts").cast("double") / 86400) * 86400)
            .cast("bigint")
            .alias("day"),
            "user_id",
        )
        .groupBy("event_type", "day")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    )
    daily_map = {(r.event_type, r.day): r.nd for r in daily}
    win_map = {
        (r.event_type, r.window_end_day): r.n_distinct_users
        for r in df.collect()
    }
    for r in first:
        # the first window has no trailing days: it IS that day's distinct
        assert win_map[(r.event_type, r.d)] == daily_map[(r.event_type, r.d)]
    # every window dominates its own day's distinct count
    for (t, d), nd in daily_map.items():
        assert win_map[(t, d)] >= nd


def test_csv_quarantine_partitions_the_feed(spark):
    from hive_apache_ci_spark.catalog import load_table

    rows = {r.status: r for r in run(spark, "io_csv_malformed_quarantine").collect()}
    assert set(rows) == {"good", "quarantined"}
    total = load_table(spark, SF_DIR, "supplier").count()
    assert rows["good"].n + rows["quarantined"].n == total
    # quarantined = every 7th key; salvage recovered ALL of them
    assert rows["quarantined"].key_sum is not None


def test_stream_python_source_drains_exactly_once(spark):
    df = run(spark, "stream_python_datasource")
    agg = df.agg(F.sum("n"), F.sum("i_sum")).collect()[0]
    assert agg[0] == 64            # every row, no duplicates
    assert agg[1] == 64 * 63 // 2  # exact content, not just count


def test_sql_script_converges_to_limit(spark):
    r = run(spark, "script_while_threshold").collect()[0]
    assert r.n_above <= r.limit_n or r.iterations == 20
    assert r.threshold == 1000.0 * (2 ** r.iterations)


def test_state_store_matches_batch_counts(spark):
    from hive_apache_ci_spark.catalog import load_table

    got = {
        r.event_type: r.state_count
        for r in run(spark, "stream_state_store_reader").collect()
    }
    want = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
