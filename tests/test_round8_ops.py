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
