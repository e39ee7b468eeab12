"""Smoke: the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_oracles_aligned():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert qs, "queries() must be non-empty"
    assert set(os_) <= set(qs), "every oracle key must have a query"


def test_run_sql_error_surface(spark):
    """Bad SQL reaches the user as an AnalysisException (Hive
    SemanticAnalyzer error role), not a silent failure."""
    import pytest
    from pyspark.errors import AnalysisException

    from hive_apache_ci_spark.catalog import run_sql

    with pytest.raises(AnalysisException):
        run_sql(spark, "SELECT no_such_column FROM lineitem", "/root/testdata/sf0.001")


def test_catalog_ops(spark):
    """Catalog surface (SURVEY.md §3.3): temp views registered by the
    loader are visible/queryable/droppable via spark.catalog."""
    from hive_apache_ci_spark.catalog import TABLES, load_tables

    load_tables(spark, "/root/testdata/sf0.001", register=True)
    names = {t.name for t in spark.catalog.listTables()}
    assert set(TABLES) <= names
    assert spark.catalog.tableExists("lineitem")
    cols = [c.name for c in spark.catalog.listColumns("lineitem")]
    assert "l_orderkey" in cols
