"""Extension-surface tests: variable-length matchpath PTF, bucketed-table
SMB joins (shuffle-free), percentile_approx tolerance, parquet aggregate
pushdown (Hive StatsOptimizer's close cousin)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from hive_apache_ci_spark.functions.hive_compat import matchpath
from hive_apache_ci_spark.helpers import T

from .conftest import SF_DIR


def test_matchpath_variable_length(spark):
    """A.B*.C pattern over per-user event sequences, pandas-PTF form."""
    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"),  # abbc -> match len 4
            (1, 5, "a"), (1, 6, "c"),                            # ac   -> match len 2
            (2, 1, "b"), (2, 2, "c"),                            # no 'a' start
        ],
        "user bigint, seq int, sym string",
    )
    out = matchpath(df, "user", ["seq"], "sym", "ab*c").collect()
    got = sorted((r.part, r.start_idx, r.match_len) for r in out)
    assert got == [(1, 0, 4), (1, 4, 2)]


def test_matchpath_on_events(spark):
    """signup (click|view)* purchase over the real events table."""
    e = T(spark, SF_DIR, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "CASE event_type WHEN 'signup' THEN 's' WHEN 'click' THEN 'k' "
            "WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p' ELSE 'e' END"
        ).alias("sym"),
    )
    out = matchpath(e, "user_id", ["ts", "event_id"], "sym", "s[kv]*p")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.match_len >= 2 for r in rows)


def test_bucketed_smb_join_no_shuffle(spark):
    """CLUSTERED BY ... INTO n BUCKETS ≙ bucketBy + saveAsTable; a join of
    two co-bucketed tables must NOT shuffle either side (Hive
    SMBMapJoinOperator ≙ shuffle-free SortMergeJoin)."""
    import shutil

    o = T(spark, SF_DIR, "orders")
    c = T(spark, SF_DIR, "customer")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    # the in-memory catalog forgets dirs across sessions — clear leftovers
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "customer_b"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_b")
    )
    (
        c.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("customer_b")
    )
    # hint('merge') pins SortMergeJoin (otherwise the tiny test tables
    # auto-broadcast and the bucketing property is never exercised)
    joined = spark.table("orders_b").join(
        spark.table("customer_b").hint("merge"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).groupBy("c_mktsegment").count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain(mode="formatted")
    plan = buf.getvalue()
    # the join itself must consume bucketed scans directly: no Exchange
    # between the scans and the SortMergeJoin
    join_part = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in join_part, plan
    # result sanity vs direct join
    direct = (
        o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, direct.collect()))


def test_percentile_approx_tolerance(spark):
    """approx_percentile must stay within 2% relative of the exact
    percentile at default accuracy (Hive percentile_approx parity)."""
    l = T(spark, SF_DIR, "lineitem")
    row = l.agg(
        F.expr("percentile_approx(l_extendedprice, 0.5)").alias("approx"),
        F.percentile("l_extendedprice", 0.5).alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.02


# NOTE: a parquet-footer aggregate pushdown test (Hive StatsOptimizer's
# cousin) was tried and dropped: spark.sql.parquet.aggregatePushdown only
# takes effect on the DSv2 parquet path (spark.sql.sources.useV1SourceList
# excludes parquet by default), and flipping the whole engine to DSv2 for a
# metadata-only optimization is not worth the behavior surface change.
# SURVEY.md §4.1 already records StatsOptimizer as having no Catalyst
# equivalent.
