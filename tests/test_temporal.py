"""As-of / range join semantics + plan-shape gates (operators/temporal.py)."""

from __future__ import annotations

import contextlib
import io

from hive_apache_ci_spark.registry import all_queries

from .conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = all_queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_asof_backward_semantics(spark):
    """Every matched view precedes (or ties) its purchase; matches are the
    LATEST such view — spot-checked independently per user."""
    rows = all_queries()["join_asof_backward"](spark, SF_DIR).collect()
    assert len(rows) > 0
    matched = [r for r in rows if r.view_id is not None]
    assert matched, "as-of produced zero matches — vacuous"
    assert all(r.gap_s >= 0 for r in matched)
    unmatched = [r for r in rows if r.view_id is None]
    assert all(r.gap_s is None for r in unmatched)


def test_asof_plan_has_no_join(spark):
    """The as-of operator is a union + window scan: the plan must contain a
    Window and NO join operator at all — that is the 100 TB shape (one
    timeline pass per user, no range-join blowup)."""
    p = _plan(spark, "join_asof_backward")
    assert "Window" in p
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in p, f"{op} in as-of plan:\n{p}"


def test_asof_tolerance_bounds_gap(spark):
    rows = all_queries()["join_asof_tolerance"](spark, SF_DIR).collect()
    assert all(r.gap_s <= 3600 for r in rows if r.gap_s is not None)
    base = all_queries()["join_asof_backward"](spark, SF_DIR).collect()
    n_tol = sum(r.view_id is not None for r in rows)
    n_base = sum(r.view_id is not None for r in base)
    assert 0 < n_tol < n_base  # tolerance discarded some but not all matches


def test_range_join_is_equi_not_nested_loop(spark):
    """Binning must turn the interval predicate into an equi-join: a raw
    BETWEEN join would plan BroadcastNestedLoopJoin (O(n*m))."""
    p = _plan(spark, "join_range_binned")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p, p


def test_asof_nearest_one_sort_no_join(spark):
    """Both directional scans must ride ONE user-keyed sort — the nearest
    variant costs the same exchange as either sibling, not their sum —
    and, like them, plans no join operator at all."""
    p = _plan(spark, "join_asof_nearest")
    assert "Join" not in p, p
    assert p.count("Sort ") == 1, p


def test_asof_nearest_agrees_with_directional_siblings(spark):
    """Per purchase: the nearest match must be whichever of the two
    sibling ops' matches has the smaller |gap| (ties backward)."""
    from hive_apache_ci_spark.registry import all_queries

    from .conftest import SF_DIR

    qs = all_queries()
    bk = {r.buy_id: r for r in qs["join_asof_backward"](spark, SF_DIR).collect()}
    fw = {r.buy_id: r for r in qs["join_asof_forward"](spark, SF_DIR).collect()}
    nr = {r.buy_id: r for r in qs["join_asof_nearest"](spark, SF_DIR).collect()}
    assert set(nr) == set(bk) == set(fw)
    for bid, r in nr.items():
        b, f = bk[bid], fw[bid]
        if b.view_id is None and f.view_id is None:
            assert r.direction == "none" and r.view_id is None
        elif f.view_id is None:
            assert r.direction == "backward" and r.view_id == b.view_id
        elif b.view_id is None:
            assert r.direction == "forward" and r.view_id == f.view_id
        elif b.gap_s <= f.gap_s:  # both sibling gaps are non-negative
            assert r.direction == "backward" and r.view_id == b.view_id
            assert r.gap_s == -b.gap_s
        else:
            assert r.direction == "forward" and r.view_id == f.view_id
            assert r.gap_s == f.gap_s
