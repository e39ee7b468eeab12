"""Query + oracle registry — the driver-contract backbone.

Every operator the engine claims (SURVEY.md §2 rows tagged Q) registers here
as a named query callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string. The driver
runs both sides at sf0.01 and compares row-count + schema + order-insensitive
value hash, so:

- alias every computed column identically on both sides;
- make results deterministic (tie-breaker sort keys, sorted arrays, fixed
  seeds, rounded floating aggregates);
- match result *types* (DuckDB ``sum(int)`` is HUGEINT -> cast to BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query name: {name}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: ``@query("join_inner", oracle="SELECT ...")``.

    ``oracle=None`` marks a non-SQL-expressible op (streaming, approximate,
    LSH) — the driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        extensions,
        joins,
        lateral,
        matview,
        modern_sql,
        mutations,
        relational,
        setops,
        subqueries,
        temporal,
        windows,
    )
    from .functions import expressions, hive_compat_queries  # noqa: F401
    from .sources import io_roundtrip  # noqa: F401
    from .streaming import timeseries, jobs  # noqa: F401
    from .pipeline import (  # noqa: F401
        corpus,
        dedup,
        lm,
        multimodal,
        retrieval,
        similarity,
        text_analysis,
    )

    _LOADED = True
