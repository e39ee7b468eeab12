#!/usr/bin/env python
"""Regenerate docs/plan_snapshots/*.txt (golden-EXPLAIN baselines).

Run after an INTENTIONAL plan change and commit the diff — the review
then shows exactly which operators moved, the qtest ``.q.out`` workflow
(SURVEY.md §5.1.1). tests/test_plan_snapshots.py fails on any drift.

Usage: python scripts/regen_plan_snapshots.py [name ...]
(no args = all SNAPSHOT_QUERIES; snapshots are taken at sf0.001 under
the engine session factory — the same environment the test uses).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = "/root/testdata/sf0.001"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "docs", "plan_snapshots")


def main() -> int:
    from hive_apache_ci_spark.plan_snapshot import SNAPSHOT_QUERIES, normalized_plan
    from hive_apache_ci_spark.registry import all_queries
    from hive_apache_ci_spark.session import get_spark

    names = sys.argv[1:] or list(SNAPSHOT_QUERIES)
    spark = get_spark("plan-snapshots")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        text = normalized_plan(df)
        path = os.path.join(OUT_DIR, f"{name}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
