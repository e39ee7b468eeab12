"""Golden-EXPLAIN snapshot tests (qtest parity — SURVEY.md §5.1.1: the
reference's ``.q.out`` files pin EXPLAIN output, so unasserted plan
regressions fail the suite). Complements test_plans.py's ~40 plan
*property* gates with full-plan pins for the headline queries.

On an intentional plan change: ``python scripts/regen_plan_snapshots.py``
and commit the snapshot diff.
"""

from __future__ import annotations

import difflib
import os

import pytest

from hive_apache_ci_spark.plan_snapshot import SNAPSHOT_QUERIES, normalized_plan
from hive_apache_ci_spark.registry import all_queries

from .conftest import SF_DIR

SNAP_DIR = os.path.join(
    os.path.dirname(__file__), "..", "docs", "plan_snapshots"
)


@pytest.mark.parametrize("name", SNAPSHOT_QUERIES)
def test_plan_matches_snapshot(spark, name):
    path = os.path.join(SNAP_DIR, f"{name}.txt")
    assert os.path.isfile(path), (
        f"missing snapshot {path} — run scripts/regen_plan_snapshots.py"
    )
    expected = open(path).read()
    actual = normalized_plan(all_queries()[name](spark, SF_DIR))
    if actual != expected:
        diff = "\n".join(
            difflib.unified_diff(
                expected.splitlines(),
                actual.splitlines(),
                fromfile=f"docs/plan_snapshots/{name}.txt",
                tofile="live plan",
                lineterm="",
            )
        )
        pytest.fail(
            f"physical plan drifted for {name} — if intentional, regen the "
            f"snapshot and commit the diff:\n{diff}"
        )


def test_snapshot_catches_join_strategy_flip(spark):
    """The canary the property gates can't express: a deliberate conf
    change (broadcast disabled) must CHANGE the pinned plan — proving the
    snapshot actually covers join strategy, not just cosmetics."""
    # tpch_q3 relies on AUTO broadcast (no explicit hint — an explicit
    # F.broadcast()/hint survives threshold=-1 and would not flip)
    name = "tpch_q3_shipping"
    expected = open(os.path.join(SNAP_DIR, f"{name}.txt")).read()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        actual = normalized_plan(all_queries()[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert actual != expected, (
        "disabling auto-broadcast did not change the snapshot — the "
        "normalizer is stripping structure, not just noise"
    )


def test_no_stale_snapshots():
    """Every committed snapshot corresponds to a pinned query (catches a
    renamed query leaving its old golden file behind)."""
    files = {
        f[:-4] for f in os.listdir(SNAP_DIR) if f.endswith(".txt")
    }
    assert files == set(SNAPSHOT_QUERIES), (
        files.symmetric_difference(SNAPSHOT_QUERIES)
    )
