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


# ---- r8: Hive MatchPath argument convention ------------------------------


def test_matchpath_pattern_compiler():
    from hive_apache_ci_spark.functions.hive_compat import (
        compile_matchpath_pattern,
    )

    m = {"LATE": "a", "ONTIME": "b", "UP": "c", "DOWN": "d", "FLAT": "e"}
    assert compile_matchpath_pattern("LATE.LATE+", m) == "aa+"
    assert compile_matchpath_pattern("FLAT.(UP|DOWN)*.FLAT", m) == "e(c|d)*e"
    assert compile_matchpath_pattern("LATE.ONTIME?.LATE", m) == "ab?a"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="undeclared symbol"):
        compile_matchpath_pattern("EARLY.LATE", m)
    with _pytest.raises(ValueError, match="bad pattern char"):
        compile_matchpath_pattern("LATE,LATE", m)


def _mp_rows(spark, seq):
    """One partition whose ordered symbol sequence is `seq` ('A'/'B'/'x')."""
    from pyspark.sql import functions as F

    data = [(1, i, ch) for i, ch in enumerate(seq)]
    return spark.createDataFrame(data, "part bigint, ord int, sym string")


def _run_mp(spark, seq, pattern, symbols=None):
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.functions.hive_compat import matchpath_hive

    df = _mp_rows(spark, seq)
    symbols = symbols or [
        ("A", F.col("sym") == "A"),
        ("B", F.col("sym") == "B"),
    ]
    out = matchpath_hive(df, "part", ["ord"], pattern, symbols)
    return sorted(
        (r.start_idx, r.match_len) for r in out.toLocalIterator()
    )


def test_matchpath_variable_length_greedy(spark):
    """`A.A+` is greedy per MatchPath semantics: AAAA is ONE maximal
    4-row match, not two 2-row matches."""
    assert _run_mp(spark, "AAAA", "A.A+") == [(0, 4)]


def test_matchpath_star_matches_empty(spark):
    """`A.B*.A` with zero Bs: the quantified symbol is optional."""
    assert _run_mp(spark, "AA", "A.B*.A") == [(0, 2)]
    assert _run_mp(spark, "ABBA", "A.B*.A") == [(0, 4)]


def test_matchpath_unlabeled_rows_break_matches(spark):
    """Rows matching no declared symbol get the reserved '0' label and can
    never be absorbed by a quantifier: AxA has no A.B*.A match."""
    assert _run_mp(spark, "AxA", "A.B*.A") == []


def test_matchpath_first_symbol_wins_on_overlap(spark):
    """Overlapping predicates resolve by declaration order (MatchPath
    evaluates symbols in argument order): a row satisfying both A and B
    is labeled A, so `B.B+` finds nothing in a both-both-both sequence."""
    from pyspark.sql import functions as F

    both = [
        ("A", F.col("sym").isin("A", "B")),
        ("B", F.col("sym").isin("A", "B")),
    ]
    assert _run_mp(spark, "BBB", "B.B+", symbols=both) == []
    assert _run_mp(spark, "BBB", "A.A+", symbols=both) == [(0, 3)]


def test_matchpath_alternation_groups(spark):
    """Grouped alternation with a star quantifier: FLAT.(UP|DOWN)*.FLAT
    over A=(FLAT) B=(UP) C=(DOWN) shaped input."""
    from pyspark.sql import functions as F

    symbols = [
        ("FLAT", F.col("sym") == "A"),
        ("UP", F.col("sym") == "B"),
        ("DOWN", F.col("sym") == "x"),
    ]
    assert _run_mp(spark, "ABxBA", "FLAT.(UP|DOWN)*.FLAT", symbols) == [(0, 5)]
