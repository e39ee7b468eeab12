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
_PARITY_ONLY: set[str] = set()


def register(
    name: str,
    fn: QueryFn,
    oracle: str | None = None,
    parity_only: bool = False,
) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query name: {name}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle
    if parity_only:
        _PARITY_ONLY.add(name)


def query(
    name: str, oracle: str | None = None, parity_only: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: ``@query("join_inner", oracle="SELECT ...")``.

    ``oracle=None`` marks a non-SQL-expressible op (streaming, approximate,
    LSH) — the driver then records a weaker rows-only check.

    ``parity_only=True`` marks a deliberate semantics-parity shape whose
    PLAN would not be run at scale (e.g. the global-NTILE twins that
    exist to pin Hive output semantics, each paired with an
    equality-gated scaled twin). Parity-only queries stay in the
    correctness surface (sweeps + driver gate) but are EXCLUDED from the
    performance surface (bench headliners, sf1 canary) — their numbers
    would grade a plan the docs explicitly say not to ship
    (docs/SCALE.md §parity-shapes)."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle, parity_only=parity_only)
        return fn

    return deco


def parity_only_queries() -> frozenset[str]:
    """Names flagged ``parity_only`` — the bench/canary exclusion set."""
    _ensure_loaded()
    return frozenset(_PARITY_ONLY)


def _sample_hint_names() -> list[str]:
    """Names from ``scripts/sample_hint.json`` (newest + changed_behavior).

    The hint file is maintained by hand at each round close and lists the
    queries added or materially changed that round. Returning them here lets
    :func:`_interleaved_names` pin them to the FRONT of the registry order so
    the driver's first-N CORRECTNESS sample always covers the freshest
    surface instead of re-drawing long-stable queries. Missing/unparseable
    file or unregistered names degrade silently to the plain interleave —
    the hint is an ordering bias, never a correctness dependency.
    """
    import json
    from pathlib import Path

    hint_path = Path(__file__).resolve().parent.parent / "scripts" / "sample_hint.json"
    try:
        payload = json.loads(hint_path.read_text())
    except (OSError, ValueError):
        return []
    names: list[str] = []
    for key in ("newest", "changed_behavior"):
        for name in payload.get(key, []):
            if name in _QUERIES and name not in names:
                names.append(name)
    return names


def _interleaved_names() -> list[str]:
    """Sample-hint entries first, then round-robin across registering modules.

    The driver's CORRECTNESS sample grades the *first N* registry entries, so
    plain import order would forever show only the first-imported modules
    (aggregates/extensions/joins). Two deterministic layers fix that:

    1. the current round's ``scripts/sample_hint.json`` entries (new or
       behavior-changed queries) go first, in file order — the freshest
       surface is always inside the sample window;
    2. the remainder is interleaved by module — first entry of each module,
       then second of each, ... — so any prefix spans every operator area
       (§2.1 relational through §2.11 pipeline). Module order = import
       order, within-module order = registration order.
    """
    pinned = _sample_hint_names()
    pinned_set = set(pinned)
    by_module: dict[str, list[str]] = {}
    for name, fn in _QUERIES.items():
        if name in pinned_set:
            continue
        by_module.setdefault(fn.__module__, []).append(name)
    buckets = list(by_module.values())
    out: list[str] = list(pinned)
    depth = 0
    while len(out) < len(_QUERIES):
        for bucket in buckets:
            if depth < len(bucket):
                out.append(bucket[depth])
        depth += 1
    return out


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: _QUERIES[name] for name in _interleaved_names()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: _ORACLES[name] for name in _interleaved_names() if name in _ORACLES
    }


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        acid,
        aggregates,
        authz,
        extensions,
        hiveql_text,
        joins,
        lateral,
        matview,
        modern_sql,
        mutations,
        relational,
        setops,
        subqueries,
        temporal,
        tpcds_shapes,
        windows,
    )
    from .functions import expressions, hive_compat_queries  # noqa: F401
    from .sources import acid_orc, io_roundtrip, zorder  # noqa: F401
    from .streaming import timeseries, jobs  # noqa: F401
    from .pipeline import (  # noqa: F401
        corpus,
        dedup,
        lm,
        multimodal,
        retrieval,
        similarity,
        text_analysis,
        training,
    )

    _LOADED = True
