"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table (schema-on-read from parquet)."""
    return load_table(spark, sf_dir, name)


def r2(c: Column) -> Column:
    """Round to 2 decimals — for SUMs of doubles, where cross-engine
    accumulation-order differences live in the ~1e-7 relative tail."""
    return F.round(c, 2)


def r4(c: Column) -> Column:
    """Round to 4 decimals — for AVG/variance-family outputs."""
    return F.round(c, 4)


def ts_lit(s: str) -> Column:
    """Timestamp literal (testdata 'date' columns are parquet timestamps)."""
    return F.lit(s).cast("timestamp")
