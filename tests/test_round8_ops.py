"""Round-8 operator invariants: stats-only aggregate pushdown."""

from __future__ import annotations

from hive_apache_ci_spark.registry import all_queries

from .conftest import SF_DIR


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_stats_only_minmax_is_metadata_only(spark):
    """StatsOptimizer parity gate (SURVEY §4.1): the count/min/max query
    must be answered from parquet footer statistics — the scan carries
    PushedAggregation and emits the aggregate columns, not data pages."""
    df = all_queries()["io_stats_only_minmax"](spark, SF_DIR)
    plan = _formatted(df)
    assert "PushedAggregation: [COUNT(*)" in plan, plan
    assert "MIN(l_orderkey)" in plan and "MAX(l_extendedprice)" in plan
    # the pushed scan must be the DSv2 BatchScan form
    assert "BatchScan" in plan


def test_stats_only_minmax_restores_reader_conf(spark):
    """Building the query must not leak the DSv2 reader selection into the
    shared session (the r7-ADVICE conf-leak class, applied to r8 code)."""
    prev = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    all_queries()["io_stats_only_minmax"](spark, SF_DIR)
    after = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    assert after == prev


def test_stats_only_minmax_survives_conf_restore(spark):
    """The pushed plan is cached in its QueryExecution, so collecting
    AFTER the conf restore still returns correct (and pushed) results."""
    df = all_queries()["io_stats_only_minmax"](spark, SF_DIR)
    row = df.collect()[0]
    assert row["n_rows"] > 0
    assert row["min_okey"] <= row["max_okey"]
    assert row["min_price"] <= row["max_price"]


def test_cc_long_chain_rounds_logarithmic(spark):
    """Worst-case CC canary (r7 verdict #4: pin the sf1 ratio creep): a
    single path graph of diameter 255 — the shape where naive min-label
    propagation needs 255 rounds — must converge in O(log2(diameter)):
    the hop+pointer-jump round at least doubles the min-label's reach, so
    ceil(log2(255)) + 2 rounds (reach-1 seed + no-change proof) bounds
    the loop. This is the invariant that keeps the sf1 canary ~linear in
    DATA, independent of component shape."""
    import math

    from pyspark.sql import functions as F

    from hive_apache_ci_spark.pipeline.dedup import cc_fixpoint

    n = 256  # vertices 0..255 in a single chain, diameter 255
    v = spark.range(n).select(F.col("id").alias("vec_id"))
    fwd = spark.range(n - 1).select(
        F.col("id").alias("s"), (F.col("id") + 1).alias("d")
    )
    edges = fwd.unionByName(
        fwd.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).localCheckpoint()
    labels = v.select(
        "vec_id", F.col("vec_id").alias("label")
    ).localCheckpoint()
    labels, rounds = cc_fixpoint(labels, edges)
    assert labels.filter(F.col("label") != 0).count() == 0, (
        "chain did not collapse to component 0"
    )
    bound = math.ceil(math.log2(n - 1)) + 2
    assert rounds <= bound, (rounds, bound)


def test_blocklist_all_verdicts_fire(spark):
    """The three verdict branches must all be live at the test SF —
    a threshold that silently stops firing is the vacuity failure class
    the verify harness flags for whole results, applied per-branch."""
    df = all_queries()["corpus_blocklist_filter"](spark, SF_DIR)
    verdicts = {r["verdict"] for r in df.select("verdict").distinct().collect()}
    assert verdicts == {"keep", "review", "drop"}, verdicts


def test_shuffle_shards_partition_the_corpus(spark):
    """Shards must exactly partition the corpus (no doc lost or double-
    assigned) and every shard's head list must respect its n_docs."""
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T

    rows = all_queries()["corpus_shuffle_shards"](spark, SF_DIR).collect()
    total = T(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    assert len(rows) == 16 and {r["shard"] for r in rows} == set(range(16))
    for r in rows:
        assert len(r["head_docs"]) == min(3, r["n_docs"])
        assert r["min_key"] <= r["max_key"]


def test_exact_substring_runs_verify_and_are_maximal(spark):
    """Every reported run must be a REAL token-for-token match in the two
    source documents, and maximal: extending one token left or right
    either leaves a document or breaks the match. This checks the
    diagonal gaps-and-islands merge against ground truth, not the oracle
    (which shares the dataflow shape)."""
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T

    runs = all_queries()["dedup_exact_substring"](spark, SF_DIR).collect()
    assert runs, "no runs at test SF — op is vacuous"
    toks = {
        r["doc_id"]: r["toks"]
        for r in T(spark, SF_DIR, "documents")
        .select("doc_id", F.split(F.lower("text"), r"\s+").alias("toks"))
        .collect()
    }
    # gram -> document frequency, for the extension guard below: a run can
    # legitimately stop where its next seed gram was df-cut as boilerplate
    # (>_ESUB_MAX_DF docs) — maximality only holds where the seed that
    # would cover the extension was itself eligible.
    from collections import Counter

    from hive_apache_ci_spark.pipeline.dedup import _ESUB_K, _ESUB_MAX_DF

    df = Counter()
    for ts in toks.values():
        seen = {
            " ".join(ts[i : i + _ESUB_K]) for i in range(len(ts) - _ESUB_K + 1)
        }
        df.update(seen)

    def eligible(ts, start):  # df-eligible seed gram at 0-based start
        g = " ".join(ts[start : start + _ESUB_K])
        return 2 <= df[g] <= _ESUB_MAX_DF

    for r in runs[:50]:
        a, b = toks[r["doc_a"]], toks[r["doc_b"]]
        sa, sb, n = r["start_a"] - 1, r["start_b"] - 1, r["run_tokens"]
        assert a[sa : sa + n] == b[sb : sb + n], (r, a[sa : sa + n], b[sb : sb + n])
        if sa > 0 and sb > 0 and eligible(a, sa - 1):
            assert a[sa - 1] != b[sb - 1], ("left-extensible", r)
        if sa + n < len(a) and sb + n < len(b) and eligible(a, sa + n - _ESUB_K + 1):
            assert a[sa + n] != b[sb + n], ("right-extensible", r)


def test_attribution_credit_conserves_purchase_mass(spark):
    """Each purchase with >=1 touch distributes ~exactly 1.0 credit (the
    only slack is 6dp rounding of the middle share), so the report's
    total credit must equal the attributed-purchase count to within
    n_touches * 1e-6."""
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T

    rows = all_queries()["events_attribution_multitouch"](spark, SF_DIR).collect()
    total_credit = sum(r["total_credit"] for r in rows)
    n_touches = sum(r["n_touches"] for r in rows)
    e = T(spark, SF_DIR, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts"
    )
    attributed = (
        p.join(t, "user_id")
        .filter(
            (F.col("ts") < F.col("pts"))
            & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 24 HOURS"))
        )
        .select("pid")
        .distinct()
        .count()
    )
    assert abs(total_credit - attributed) <= n_touches * 1e-6, (
        total_credit,
        attributed,
    )


def test_exact_substring_short_docs_dont_crash(spark, tmp_path):
    """Regression (r8 review): a document with fewer than K tokens made
    Spark's sequence(1, m<=0) count DOWN into slice(toks, 0, ...) and
    abort the whole query, while the oracle's exclusive-end range() was
    simply empty. Short docs must contribute no grams, and runs between
    the remaining docs must still be found."""
    rows = [
        (1, "a b c", "en", "src0", 5),  # 3 tokens — the crash case
        (2, "x y z w q r s t u v", "en", "src0", 19),
        (3, "x y z w q r s t u v", "en", "src0", 19),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = all_queries()["dedup_exact_substring"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"], r["run_tokens"]) == (2, 3, 10)


# ---- Spark-4 SQL-UDF / parameterized-SQL / Arrow-native surface ----------


def _plan_of(spark, name):
    return _formatted(all_queries()[name](spark, SF_DIR))


def test_sql_udf_scalar_inlines_no_python(spark):
    """The SQL UDF body must be Catalyst-inlined: no Python eval node, and
    the shipdate predicate still reaches the scan through the call."""
    p = _plan_of(spark, "sql_udf_scalar")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "LessThanOrEqual(l_shipdate" in p


def test_sql_udf_table_param_folds_to_scan(spark):
    """The table-function parameter (price floor) must constant-fold and
    push down to the orders parquet scan — a parameterized view, not a
    materialize-then-filter."""
    p = _plan_of(spark, "sql_udf_table")
    assert "GreaterThanOrEqual(o_totalprice,150000.0)" in p


def test_parameterized_query_binds_as_literals(spark):
    """Named :params bind in the analyzer and push down like inline
    constants (both the equality and the range predicate)."""
    p = _plan_of(spark, "parameterized_query")
    assert "EqualTo(o_orderstatus,F)" in p
    assert "GreaterThanOrEqual(o_totalprice,25000.0)" in p


def test_arrow_map_batches_plan_and_values(spark):
    """mapInArrow shows as a MapInArrow node (no pandas conversion), the
    filter is pushed below it, and the Arrow-computed revenue matches the
    JVM expression bitwise-at-2dp."""
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T

    p = _plan_of(spark, "arrow_map_batches")
    assert "MapInArrow" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    got = {
        r["l_returnflag"]: (r["n"], r["revenue"])
        for r in all_queries()["arrow_map_batches"](spark, SF_DIR).collect()
    }
    l = T(spark, SF_DIR, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("date")
    )
    term = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) + F.lit(1e-9), 2
    ).cast("decimal(18,2)")
    want = {
        r["l_returnflag"]: (r["n"], r["revenue"])
        for r in l.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(term), 2).cast("double").alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_centroid_eval_covers_heldout_exactly(spark):
    """Confusion-cell mass must equal the held-out split size (no vector
    dropped or double-counted), the model side must broadcast, and the
    accuracy column must be one consistent scalar."""
    from hive_apache_ci_spark.helpers import T

    rows = all_queries()["classify_centroid_eval"](spark, SF_DIR).collect()
    n_eval = (
        T(spark, SF_DIR, "embeddings").filter("vec_id % 5 = 0").count()
    )
    assert sum(r["n"] for r in rows) == n_eval
    assert len({r["accuracy"] for r in rows}) == 1
    p = _plan_of(spark, "classify_centroid_eval")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_ab_readout_arms_partition_users(spark):
    """Control+treatment counts must add to the full event count per
    metric, and the significance flag must agree with the reported z."""
    from hive_apache_ci_spark.helpers import T

    rows = all_queries()["events_ab_readout"](spark, SF_DIR).collect()
    totals = {
        r["event_type"]: r["n"]
        for r in T(spark, SF_DIR, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for r in rows:
        assert r["n_control"] + r["n_treat"] == totals[r["event_type"]]
        assert r["significant"] == (abs(r["z_welch"]) > 1.96)


def test_binaryfile_ingest_lossless(spark):
    """Every doc under the cutoff must come back exactly once, and the
    blob digest must equal the md5 of (text + newline) from the table."""
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T

    out = {
        r["doc_id"]: (r["n_bytes"], r["content_md5"])
        for r in all_queries()["io_binaryfile_ingest"](spark, SF_DIR).collect()
    }
    src = T(spark, SF_DIR, "documents").filter("doc_id < 40").select(
        "doc_id",
        # byte length, not char length — the blob side measures UTF-8 bytes
        (F.octet_length("text") + 1).cast("bigint").alias("n_bytes"),
        F.md5(F.concat(F.col("text"), F.lit("\n"))).alias("md5"),
    )
    want = {r["doc_id"]: (r["n_bytes"], r["md5"]) for r in src.collect()}
    assert out == want


def test_k_anonymity_accounting(spark):
    """Group mass must reconcile: rows_at_risk <= total rows, min_k <= any
    group size implied, and risk_share consistent with the counts."""
    from hive_apache_ci_spark.helpers import T

    rows = all_queries()["dq_k_anonymity"](spark, SF_DIR).collect()
    seg_tot = {
        r["c_mktsegment"]: r["count"]
        for r in T(spark, SF_DIR, "customer").groupBy("c_mktsegment").count().collect()
    }
    for r in rows:
        assert 0 <= r["rows_at_risk"] <= seg_tot[r["c_mktsegment"]]
        assert r["small_groups"] <= r["n_groups"]
        assert r["min_k"] >= 1
        expect_share = r["rows_at_risk"] / seg_tot[r["c_mktsegment"]]
        assert abs(r["risk_share"] - expect_share) < 1e-5


def test_drop_partition_is_metadata_only(spark):
    """After the retention drop, the catalog must list no expired years
    and a year-filtered read must partition-prune to one directory."""
    from hive_apache_ci_spark.helpers import RUN_ID

    df = all_queries()["io_drop_partition_retention"](spark, SF_DIR)
    yrs = {r["yr"] for r in df.collect()}
    assert yrs and min(yrs) >= 1997
    tbl = "orders_retention_" + RUN_ID.replace("-", "_")
    parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {tbl}").collect()}
    assert "yr=1995" not in parts and "yr=1996" not in parts
    assert any(p.startswith("yr=199") or p.startswith("yr=200") for p in parts)


def test_kfold_loo_stats_match_direct_training(spark):
    """The leave-one-fold-out centroid algebra (total minus fold partial)
    must equal a centroid trained directly on the other folds, and fold-0
    accuracy must equal what classify-style direct evaluation gives."""
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T

    e = T(spark, SF_DIR, "embeddings").withColumn("fold", F.col("vec_id") % 5)
    # direct: train on folds != 0, label 3, dim 1
    direct = (
        e.filter("fold <> 0 AND label = 3")
        .select(F.col("embedding")[0].cast("double").alias("v"))
        .agg(F.round(F.avg("v") + F.lit(1e-12), 6).alias("c"))
        .collect()[0]["c"]
    )
    dims = e.filter("label = 3").select(
        "fold", F.col("embedding")[0].cast("double").alias("v")
    )
    per = dims.groupBy("fold").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    tot = per.agg(F.sum("s").alias("st"), F.sum("n").alias("nt")).collect()[0]
    f0 = per.filter("fold = 0").collect()[0]
    trick = round((tot["st"] - f0["s"]) / (tot["nt"] - f0["n"]) + 1e-12, 6)
    assert abs(trick - direct) < 2e-6
    rows = all_queries()["train_kfold_cv"](spark, SF_DIR).collect()
    assert sum(r["n_eval"] for r in rows) == e.count()
    assert len({r["mean_acc"] for r in rows}) == 1


def test_cuped_preserves_effect_and_reduces_variance(spark):
    """CUPED must not move the estimated effect materially when the
    covariate is balanced (means shift by theta*arm-imbalance only) and
    must never INCREASE pooled variance; both arms carry one consistent
    theta/readout."""
    rows = {r["arm"]: r for r in all_queries()["events_ab_cuped"](spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    r0, r1 = rows[0], rows[1]
    assert r0["theta"] == r1["theta"]
    assert r0["var_reduction"] == r1["var_reduction"]
    assert r0["var_reduction"] >= -1e-6  # pooled-theta CUPED cannot hurt
    raw_eff = r1["mean_post"] - r0["mean_post"]
    adj_eff = r1["mean_adj"] - r0["mean_adj"]
    # effect shift is bounded by |theta| * |pre-mean imbalance|; on a
    # balanced random split this is small relative to the raw spread
    assert abs(adj_eff - raw_eff) < max(1.0, abs(raw_eff))


def test_km_survival_is_monotone_and_risk_accounted(spark):
    """S(t) must be non-increasing from <=1, the risk set non-increasing,
    and the first risk set equal to the user count."""
    from hive_apache_ci_spark.helpers import T

    rows = sorted(
        all_queries()["events_survival_km"](spark, SF_DIR).collect(),
        key=lambda r: r["t_hours"],
    )
    n_users = T(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert rows[0]["n_risk"] == n_users
    prev_s, prev_n = 1.0 + 1e-9, n_users + 1
    for r in rows:
        assert r["survival"] <= prev_s + 1e-9
        assert r["n_risk"] <= prev_n
        assert 1 <= r["deaths"] <= r["n_risk"]
        prev_s, prev_n = r["survival"], r["n_risk"]


def test_power_analysis_formula(spark):
    """n_per_arm must reproduce the textbook formula from the emitted
    moments, and the powered flag must agree with observed traffic."""
    import math

    rows = all_queries()["events_ab_power"](spark, SF_DIR).collect()
    for r in rows:
        n = math.ceil(
            2.0 * (1.959964 + 0.841621) ** 2 * r["variance"] / r["mde_abs"] ** 2
        )
        assert r["n_per_arm"] == n
        assert r["currently_powered"] == (2 * n <= r["n_obs"])


def test_uncertainty_pick_takes_smallest_margins(spark):
    """The 25 picked margins must be the global minimum set over the
    held-out split, plan must TakeOrdered (no global sort), and every
    margin must be non-negative (top1 >= top2 by construction)."""
    rows = all_queries()["quality_uncertainty_pick"](spark, SF_DIR).collect()
    assert len(rows) == 25
    assert all(r["margin"] >= 0 for r in rows)
    p = _plan_of(spark, "quality_uncertainty_pick")
    assert "TakeOrderedAndProject" in p


def test_did_reconstructs_from_cells(spark):
    """The DiD effect must equal the double difference of the emitted
    cell means (within rounding), with all four cells present."""
    rows = all_queries()["events_ab_did"](spark, SF_DIR).collect()
    cells = {(r["arm"], r["period"]): r["mean_value"] for r in rows}
    assert set(cells) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    did = (cells[(1, 1)] - cells[(1, 0)]) - (cells[(0, 1)] - cells[(0, 0)])
    assert abs(rows[0]["did"] - did) < 5e-6
    assert len({(r["did"], r["se"], r["z_did"]) for r in rows}) == 1


def test_kappa_consistent_with_confusion(spark):
    """kappa must reconstruct from p_observed/p_expected, and p_observed
    must equal the centroid-eval overall accuracy (same model, split)."""
    k = all_queries()["quality_cohen_kappa"](spark, SF_DIR).collect()[0]
    recon = (k["p_observed"] - k["p_expected"]) / (1.0 - k["p_expected"])
    assert abs(k["kappa"] - recon) < 5e-6
    acc = all_queries()["classify_centroid_eval"](spark, SF_DIR).collect()[0][
        "accuracy"
    ]
    assert abs(k["p_observed"] - acc) < 5e-6


def test_modularity_accounting(spark):
    """Per-community contribution must reconstruct Q when summed with the
    (unemitted) singleton terms bounded: every emitted contribution obeys
    m_c/m <= 1 and the global Q lies in [-0.5, 1]."""
    rows = all_queries()["graph_community_modularity"](spark, SF_DIR).collect()
    if rows:
        q = rows[0]["modularity"]
        assert -0.5 - 1e-6 <= q <= 1.0 + 1e-6
        assert len({r["modularity"] for r in rows}) == 1
        for r in rows:
            assert r["size"] >= 2 and r["degree_sum"] >= 0


def test_hhi_shares_and_bands(spark):
    """HHI must lie in (0, 10000], CR1 in (0, 1], and the band must agree
    with the emitted hhi under the published thresholds."""
    rows = all_queries()["supplier_hhi_concentration"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["hhi"] <= 10000.0 + 1e-6
        assert 0 < r["cr1"] <= 1.0 + 1e-6
        want = (
            "concentrated"
            if r["hhi"] >= 2500
            else "moderate" if r["hhi"] >= 1500 else "unconcentrated"
        )
        assert r["band"] == want
        # perfectly even shares bound: hhi >= 10000/n
        assert r["hhi"] >= 10000.0 / r["n_suppliers"] - 1e-6


def test_pareto_abc_mass_and_no_global_window(spark):
    """Class masses must cover all customers and ~100% revenue, A must
    dominate, and the plan must not contain a single-partition global
    window (the scaled two-pass shape is the point)."""
    rows = {r["abc"]: r for r in all_queries()["window_pareto_abc"](spark, SF_DIR).collect()}
    assert set(rows) == {"A", "B", "C"}
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-4
    assert rows["A"]["revenue_share"] >= rows["B"]["revenue_share"] >= rows["C"]["revenue_share"]
    p = _plan_of(spark, "window_pareto_abc")
    import re as _re

    # every Window node must be shard-keyed: in formatted explain the
    # partition spec is the bracket list after the windowspecdefinition
    # args — "], [shard#N], [" when keyed, "], [], [" for the
    # single-partition global cumulative this op exists to avoid
    win_lines = [l for l in p.splitlines() if "windowspecdefinition" in l]
    assert win_lines
    for l in win_lines:
        assert not _re.search(r"\], \[\], \[", l), l
        assert "shard#" in l


def test_markov_entropy_bounds(spark):
    """Row entropies in [0, log2(K)], pi sums to ~1, and the rate equals
    the pi-weighted row-entropy sum."""
    import math

    rows = all_queries()["events_markov_entropy"](spark, SF_DIR).collect()
    k = len(rows)
    assert abs(sum(r["pi"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert -1e-9 <= r["h_row"] <= math.log2(k) + 1e-6
    rate = sum(r["pi"] * r["h_row"] for r in rows)
    assert abs(rows[0]["entropy_rate"] - rate) < 1e-4


def test_winsorized_metrics_contract(spark):
    """Winsorization can only shrink spread; clamp counts are bounded by
    ~2% of mass (1%+99% tails of the exact percentile cuts)."""
    rows = all_queries()["events_winsorized_metrics"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["sd_winsor"] <= r["sd_raw"] + 1e-6
        assert 0 <= r["n_clamped"] <= 0.03 * r["n"] + 2
        assert abs(r["mean_winsor"] - r["mean_raw"]) <= r["sd_raw"]


def test_neyman_allocation_sums(spark):
    """Shares sum to 1, the per-1000 integer split never overspends, and
    the deltas vs proportional cancel out."""
    rows = all_queries()["sample_neyman_allocation"](spark, SF_DIR).collect()
    assert abs(sum(r["alloc_share"] for r in rows) - 1.0) < 1e-4
    assert sum(r["n_alloc_of_1000"] for r in rows) <= 1000
    assert abs(sum(r["vs_proportional"] for r in rows)) < 1e-4


def test_heaps_curve_monotone_and_fit_consistent(spark):
    """Both cumulative series must be strictly monotone non-decreasing,
    the last vocab checkpoint must equal the corpus distinct-token count,
    and the emitted fit must reproduce an OLS over the emitted points."""
    import math

    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T

    rows = sorted(
        all_queries()["text_heaps_law_fit"](spark, SF_DIR).collect(),
        key=lambda r: r["checkpoint"],
    )
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] >= a["cum_tokens"]
        assert b["cum_vocab"] >= a["cum_vocab"]
    vocab = (
        T(spark, SF_DIR, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
        .distinct()
        .count()
    )
    assert rows[-1]["cum_vocab"] == vocab
    xs = [math.log(r["cum_tokens"]) for r in rows]
    ys = [math.log(r["cum_vocab"]) for r in rows]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert abs(rows[0]["beta"] - beta) < 1e-4


def test_slo_burn_rate_window_accounting(spark):
    """Trailing-6h mass must dominate the 1h mass and never exceed the sum
    of 6 hourly cells; the page flag must equal the two-window rule."""
    rows = sorted(
        all_queries()["events_slo_burn_rate"](spark, SF_DIR).collect(),
        key=lambda r: r["hour_start"],
    )
    by_h = {r["hour_start"]: r for r in rows}
    for r in rows:
        assert r["n_6h"] >= r["n_1h"]
        window = [
            by_h[h]["n_1h"]
            for h in range(r["hour_start"] - 5 * 3600, r["hour_start"] + 1, 3600)
            if h in by_h
        ]
        assert r["n_6h"] == sum(window)
        assert r["page"] == (r["burn_1h"] > 2.0 and r["burn_6h"] > 1.0)


def test_spell_correction_recovers_and_is_editdist_bounded(spark):
    """Every correction must be within edit distance 1 of the typo, and
    since the synthetic typos delete one char from real vocab words, the
    recovery rate must be well above zero."""
    rows = all_queries()["search_spell_correction"](spark, SF_DIR).collect()
    assert rows

    def lev1(a, b):
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = j = diff = 0
        while i < la and j < lb:
            if a[i] == b[j]:
                i += 1
                j += 1
            else:
                diff += 1
                if diff > 1:
                    return False
                if la == lb:
                    i += 1
                j += 1
        return True

    for r in rows:
        assert lev1(r["typo"], r["correction"])
        assert r["recovered"] == (r["correction"] == r["truth"])
    assert sum(r["recovered"] for r in rows) >= 0.5 * len(rows)


def test_psi_accounting(spark):
    """Bin masses must cover both halves, contributions must sum to the
    PSI, and every contribution is non-negative (the PSI integrand
    (a-b)*ln(a/b) is always >= 0)."""
    rows = all_queries()["dq_psi_drift"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert abs(sum(r["contribution"] for r in rows) - rows[0]["psi"]) < 1e-4
    for r in rows:
        assert r["contribution"] >= -1e-9
        assert r["drifted"] == (rows[0]["psi"] >= 0.2)
