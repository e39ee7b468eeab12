"""KMV mergeable sketch (agg_kmv_mergeable_sketch): pin the estimator
and the merge algebra against a pure-Python reference — the oracle
proves Spark == DuckDB; this proves both == the KMV definition."""

from __future__ import annotations

import hashlib

import duckdb

from hive_apache_ci_spark.operators.aggregates import _KMV_K
from hive_apache_ci_spark.registry import all_queries

from .conftest import SF_DIR


def _frac(h: str) -> float:
    return sum(
        int(h[i - 1], 16) * 16.0 ** -i for i in range(1, 14)
    )


def _kmv_estimate(hashes: set[str]) -> float:
    if len(hashes) < _KMV_K:
        return float(len(hashes))
    kth = sorted(hashes)[_KMV_K - 1]
    return round((_KMV_K - 1) / _frac(kth) + 1e-9, 4)


def test_kmv_matches_python_reference(spark):
    rows = duckdb.sql(
        f"SELECT DISTINCT event_type, user_id FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    by_grp: dict[str, set[str]] = {}
    for grp, uid in rows:
        by_grp.setdefault(grp, set()).add(
            hashlib.md5(str(uid).encode()).hexdigest()
        )

    got = {
        r.grp: (r.exact_distinct, r.est_distinct)
        for r in all_queries()["agg_kmv_mergeable_sketch"](spark, SF_DIR).collect()
    }
    for grp, hs in by_grp.items():
        assert got[grp][0] == len(hs)
        assert abs(got[grp][1] - _kmv_estimate(hs)) < 1e-9, grp

    # merge algebra: global sketch from per-group top-k only
    union_of_sketches = set()
    for hs in by_grp.values():
        union_of_sketches |= set(sorted(hs)[:_KMV_K])
    all_hashes = set().union(*by_grp.values())
    # k-smallest of the sketch union IS the global k-smallest
    assert sorted(union_of_sketches)[:_KMV_K] == sorted(all_hashes)[:_KMV_K]
    assert got["ALL"][0] == len(all_hashes)
    assert abs(got["ALL"][1] - _kmv_estimate(union_of_sketches)) < 1e-9
    # and the estimate is in a sane band around truth (k=32 → ~18% sigma)
    assert 0.4 * len(all_hashes) < got["ALL"][1] < 2.5 * len(all_hashes)


def test_kmv_setops_matches_python_reference(spark):
    """Union/Jaccard/intersection estimates from sketches only, vs the
    same estimator computed in pure Python from the raw sets."""
    rows = duckdb.sql(
        f"SELECT DISTINCT event_type, user_id FROM '{SF_DIR}/events.parquet' "
        "WHERE event_type IN ('click', 'view')"
    ).fetchall()
    sets: dict[str, set[str]] = {"click": set(), "view": set()}
    for grp, uid in rows:
        sets[grp].add(hashlib.md5(str(uid).encode()).hexdigest())
    ska = set(sorted(sets["click"])[:_KMV_K])
    skb = set(sorted(sets["view"])[:_KMV_K])
    m = sorted(ska | skb)[:_KMV_K]
    both = sum(1 for h in m if h in ska and h in skb)
    if len(m) < _KMV_K:
        u_raw = float(len(m))
    else:
        u_raw = (_KMV_K - 1) / _frac(m[-1])
    est_union = round(u_raw + 1e-9, 4)
    est_jac = round(both / len(m) + 1e-9, 6)
    # est_inter derives from the UNROUNDED union estimate — the headline
    # estimator (HLL can't intersect directly; KMV can), so it gets its
    # own reference assertion (review finding, round 12)
    est_inter = round((both / len(m)) * u_raw + 1e-9, 4)

    r = all_queries()["agg_kmv_sketch_setops"](spark, SF_DIR).collect()[0]
    assert r.n_click == len(sets["click"]) and r.n_view == len(sets["view"])
    assert r.exact_union == len(sets["click"] | sets["view"])
    assert r.exact_inter == len(sets["click"] & sets["view"])
    assert abs(r.est_union - est_union) < 1e-9
    assert abs(r.est_jaccard - est_jac) < 1e-9
    assert abs(r.est_inter - est_inter) < 1e-9
