"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`hive_apache_ci_spark` — the engine package. The
driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make the import robust to the
# driver invoking us from a different working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_apache_ci_spark.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: TPC-H Q1-shaped pricing summary (returned) plus the
    LLM-pipeline north-star (hybrid RRF retrieval: BM25 arm + vector-PRF
    arm fused) executed as a second smoke so the driver's check exercises
    both halves of the engine (round-7, r6 verdict #8). The returned
    DataFrame stays q1 — stable schema across rounds. Measured on a bare
    cold local[4] session at sf0.001: q1 ≈ 5 s, RRF ≈ 5.5 s (~11 s total;
    both numbers are dominated by first-job/JIT overhead — at sf0.1 in a
    warm session the pair runs in ~1.5 s per bench)."""
    qs = all_queries()
    sf_dir = "/root/testdata/sf0.001"
    n = qs["search_hybrid_rrf"](spark, sf_dir).count()
    assert n > 0, "hybrid-RRF flagship returned no rows"
    return qs["q1_pricing_summary"](spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted => rows-only check)."""
    return all_oracles()
