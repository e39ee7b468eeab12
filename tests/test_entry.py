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
