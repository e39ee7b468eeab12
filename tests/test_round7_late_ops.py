"""Invariant + plan-shape tests for the round-7 late additions:
mode/median, PMI collocations, filtered ANN, interval coverage, Holt
smoothing, Benford audit, windowed distinct, landmark BFS, MAD outliers,
grid spatial join, RAKE keywords, greedy LM decoding. The oracle parity
suite already value-hashes each; these pin the semantic invariants a
hash can't express, plus the 100 TB plan shapes."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from hive_apache_ci_spark.registry import all_queries

from .conftest import SF_DIR


def run(spark, name):
    return all_queries()[name](spark, SF_DIR)


def plan(spark, name: str) -> str:
    df = run(spark, name)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_mode_median_within_group_bounds(spark):
    rows = run(spark, "agg_mode_median").collect()
    assert rows
    for r in rows:
        assert r.mode_cnt >= 1
        assert r.mode_cnt <= r.n_rows


def test_pmi_collocations_floor_and_rank(spark):
    from hive_apache_ci_spark.pipeline.lm import _PMI_MIN_CNT, _PMI_TOPK

    rows = run(spark, "quality_pmi_collocations").collect()
    assert len(rows) == _PMI_TOPK
    assert all(r.cxy >= _PMI_MIN_CNT for r in rows)
    ranks = sorted(r.rk for r in rows)
    assert ranks == list(range(1, _PMI_TOPK + 1))


def test_filtered_ann_fills_k_within_label(spark):
    from hive_apache_ci_spark.pipeline.similarity import _FILT_TOPK

    df = run(spark, "ann_filtered_topk")
    per_q = df.groupBy("query_id").count().collect()
    assert per_q and all(r["count"] == _FILT_TOPK for r in per_q)
    # the label predicate is a pre-filter: no self-matches survive
    assert df.filter(F.col("neighbor_id") == F.col("query_id")).count() == 0


def test_interval_coverage_island_arithmetic(spark):
    rows = run(spark, "events_interval_coverage").collect()
    assert rows
    for r in rows:
        assert r.n_islands <= r.n_intervals
        assert r.max_island_s <= r.covered_s
        assert r.covered_s <= r.last_end - r.first_start


def test_holt_forecasts_are_linear_in_trend(spark):
    rows = run(spark, "events_holt_linear").collect()
    assert rows
    for r in rows:
        assert r.n_buckets >= 2
        # f_h = level + h*trend (4dp cuts): consecutive gaps equal trend
        assert abs((r.f2 - r.f1) - r.trend) < 2e-4
        assert abs((r.f3 - r.f2) - r.trend) < 2e-4
        assert r.sse >= 0


def test_benford_shares_and_chi2_consistency(spark):
    df = run(spark, "dq_benford_audit")
    g = (
        df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("ncells"),
            F.sum("obs_share").alias("s_obs"),
            F.sum("chi_cell").alias("s_chi"),
            F.max("chi2_total").alias("chi2"),
        )
        .collect()
    )
    assert g
    for r in g:
        assert r.ncells == 9
        assert abs(r.s_obs - 1.0) < 1e-3
        assert abs(r.s_chi - r.chi2) < 1e-2


def test_window_distinct_count_frame_bounds(spark):
    df = run(spark, "window_distinct_count")
    bad = df.filter(
        (F.col("dtypes_last10") > F.col("dtypes_running"))
        | (F.col("dtypes_last10") > 10)
        | (F.col("dtypes_last10") < 1)
    )
    assert bad.count() == 0


def test_bfs_landmark_distances(spark):
    from hive_apache_ci_spark.pipeline.dedup import _BFS_HOPS, _BFS_LANDMARKS

    rows = run(spark, "graph_bfs_landmarks").collect()
    assert rows
    zero = [r for r in rows if r.dist == 0]
    # each landmark is at distance 0 of exactly itself
    assert len(zero) == len({r.lmk for r in rows}) <= _BFS_LANDMARKS
    assert all(r.lmk == r.v for r in zero)
    assert all(0 <= r.dist <= _BFS_HOPS for r in rows)
    # (lmk, v) settles exactly once
    assert len({(r.lmk, r.v) for r in rows}) == len(rows)


def test_mad_outliers_all_beyond_threshold(spark):
    df = run(spark, "events_mad_outliers")
    n = df.count()
    assert n > 0
    assert df.filter(F.col("robust_z") <= 3.0).count() == 0


def test_spatial_grid_pairs_within_radius_no_cartesian(spark):
    from hive_apache_ci_spark.operators.joins import _SPATIAL_R2

    df = run(spark, "join_spatial_grid")
    rows = df.collect()
    assert rows
    assert all(r.d2 <= _SPATIAL_R2 and r.ka < r.kb for r in rows)
    assert len({(r.ka, r.kb) for r in rows}) == len(rows)
    p = plan(spark, "join_spatial_grid")
    assert "CartesianProduct" not in p
    # the 1-row domain-size broadcast is a legitimate BNLJ; the PAIR join
    # must be an equi (hash/sort-merge) join keyed on the grid cell
    assert "BroadcastHashJoin [cx" in p or "SortMergeJoin [cx" in p or (
        "HashJoin" in p and "cx" in p
    )


def test_rake_phrases_stopword_free_topk_plan(spark):
    from hive_apache_ci_spark.pipeline.text_analysis import _RAKE_K, _RAKE_STOP

    rows = run(spark, "text_keyword_rake").collect()
    assert len(rows) == _RAKE_K
    for r in rows:
        toks = r.phrase.split(" ")
        assert len(toks) == r.n_words
        assert not any(t in _RAKE_STOP for t in toks)
    p = plan(spark, "text_keyword_rake")
    assert "TakeOrderedAndProject" in p


def test_greedy_generation_walk_shape(spark):
    from hive_apache_ci_spark.pipeline.lm import _GEN_STEPS

    rows = sorted(run(spark, "lm_greedy_generation").collect(),
                  key=lambda r: r.step)
    assert [r.step for r in rows] == list(range(_GEN_STEPS + 1))
    assert rows[0].cnt is None
    assert all(r.cnt is not None and r.cnt >= 1 for r in rows[1:])

def test_upsample_epochs_budget_arithmetic(spark):
    rows = run(spark, "corpus_upsample_epochs").collect()
    assert rows
    budget = rows[0].budget
    assert all(r.budget == budget for r in rows)
    for r in rows:
        assert r.base_epochs >= 1
        assert r.tokens_emitted >= budget  # never under-fills
        assert 0 <= r.overshoot  # boundary doc included whole
        assert r.tokens_emitted - r.overshoot == budget
    # the largest language IS the budget: exactly 1 epoch, no top-up
    top = [r for r in rows if r.total_tokens == budget]
    assert len(top) == 1 and top[0].base_epochs == 1 and top[0].overshoot == 0

def test_ppl_sweep_survival_monotone(spark):
    rows = sorted(run(spark, "quality_ppl_filter_sweep").collect(),
                  key=lambda r: r.f)
    assert len(rows) == 7
    kept = [r.n_kept for r in rows]
    assert kept == sorted(kept)  # higher cutoff can only keep more
    assert all(0.0 <= r.doc_share <= 1.0 for r in rows)
    assert rows[-1].n_kept > 0


def test_contamination_embedding_constraints(spark):
    from hive_apache_ci_spark.pipeline.corpus import _CEMB_MOD, _CEMB_TH

    rows = run(spark, "contamination_embedding").collect()
    assert rows
    for r in rows:
        assert r.vec_id % _CEMB_MOD != 0          # corpus side only
        assert r.best_bench_id % _CEMB_MOD == 0   # matched a benchmark vec
        assert r.best_sim > _CEMB_TH
        assert r.n_bench_hits >= 1


def test_stump_single_best_nonneg_gain(spark):
    rows = run(spark, "train_decision_stump").collect()
    best = [r for r in rows if r.is_best]
    assert len(best) == 1
    # weighted child impurity never exceeds parent impurity (concavity)
    assert best[0].gain >= 0
    for r in rows:
        assert 0.0 <= r.p_left <= 1.0 + 1e-9
        assert 0.0 <= r.p_right <= 1.0 + 1e-9
        assert r.n_left + r.n_right == rows[0].n_left + rows[0].n_right


def test_phrase_positions_phrase_subset_of_near(spark):
    df = run(spark, "search_phrase_positions")
    assert df.filter(F.col("n_phrase") > F.col("n_near")).count() == 0
    assert (
        df.filter(
            (F.col("n_phrase") == 0) != F.col("first_pos").isNull()
        ).count()
        == 0
    )


def test_bootstrap_ci_brackets_replicas(spark):
    rows = run(spark, "agg_bootstrap_ci").collect()
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r)
    for flag, rs in by_flag.items():
        assert len(rs) == 32
        lo, hi = rs[0].ci_lo, rs[0].ci_hi
        assert lo <= hi
        means = sorted(x.boot_mean for x in rs)
        # the interpolated 2.5/97.5 quantiles bracket the middle replicas
        assert lo <= means[len(means) // 2] <= hi
        assert all(x.n_eff > 0 for x in rs)


def test_survivorship_quality_ordering(spark):
    rows = run(spark, "dedup_survivorship").collect()
    assert rows
    for r in rows:
        assert r.n_members >= 2
        assert r.survivor_q >= r.min_q
        assert abs((r.survivor_q - r.min_q) - r.q_spread) < 2e-6


def test_weighted_median_ordering(spark):
    rows = run(spark, "agg_weighted_median").collect()
    assert rows
    for r in rows:
        assert r.w_p50 <= r.w_p90
        assert r.total_weight > 0


def test_label_confusion_shares_sum(spark):
    df = run(spark, "quality_label_confusion")
    g = df.groupBy("lang").agg(F.sum("lang_share").alias("s")).collect()
    assert g and all(abs(r.s - 1.0) < 1e-3 for r in g)
    a = df.select("overall_agreement").first()[0]
    assert 0.0 <= a <= 1.0


def test_range_search_contains_qualifying_topk(spark):
    from hive_apache_ci_spark.pipeline.similarity import _RANGE_R

    rng = run(spark, "ann_range_search")
    assert rng.filter(F.col("sim") < _RANGE_R).count() == 0
    topk = run(spark, "ivf_probe_topk")
    # every top-k hit above the radius must appear in the range results
    qual = topk.filter(F.col("sim") >= _RANGE_R + 1e-6).select(
        "query_id", "neighbor_id"
    )
    missing = qual.join(
        rng.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_anti",
    )
    assert missing.count() == 0


def test_consistent_hash_conservation_and_bound(spark):
    from hive_apache_ci_spark.catalog import load_table

    rows = run(spark, "io_consistent_hash_shards").collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_after for r in rows) == n_docs
    assert sum(r.n_arrived for r in rows) + sum(r.n_stayed for r in rows) == n_docs
    # consistent hashing moves ~1/9; assert well under mod-sharding's ~8/9
    assert rows[0].moved_share < 0.3

def test_forecast_backtest_shape_and_ape(spark):
    rows = run(spark, "events_forecast_backtest").collect()
    assert rows
    # every (type, cutoff) emits exactly h=1..3
    from collections import defaultdict
    g = defaultdict(list)
    for r in rows:
        g[(r.event_type, r.cutoff_rn)].append(r.h)
        assert r.ape >= 0
        assert r.cutoff_rn >= 2
    assert all(sorted(v) == [1, 2, 3] for v in g.values())

def test_bootstrap_two_phase_partial_agg(spark):
    # the x32 fan must collapse map-side: partial agg before the exchange
    p = plan(spark, "agg_bootstrap_ci")
    import re
    assert re.search(r"partial_(sum|count)", p) or "HashAggregate" in p
    assert "CartesianProduct" not in p


def test_crossmodal_caption_tower_broadcasts(spark):
    p = plan(spark, "multimodal_crossmodal_match")
    # the caption tower must broadcast into the encode output — never a
    # shuffle of the image side against the tower
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_benford_filter_pushed_to_scan(spark):
    p = plan(spark, "dq_benford_audit")
    assert "PushedFilters" in p and "l_extendedprice" in p


def test_contamination_bench_side_broadcast(spark):
    p = plan(spark, "contamination_embedding")
    # bench x corpus candidate join: tiny benchmark side broadcast
    assert "BroadcastHashJoin" in p
