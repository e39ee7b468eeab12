"""MERGE emulation + CDC operator semantics (operators/mutations.py)."""

from __future__ import annotations

import shutil
import tempfile

from hive_apache_ci_spark.registry import all_queries

from .conftest import SF_DIR


def test_merge_exercises_all_clauses(spark):
    """The merge result must contain updated, inserted AND kept rows, and
    no deleted key may survive."""
    rows = all_queries()["merge_into_upsert"](spark, SF_DIR).collect()
    actions = {r.merge_action for r in rows}
    assert actions == {"updated", "inserted", "kept"}
    inserted = [r for r in rows if r.merge_action == "inserted"]
    assert all(r.c_custkey >= 10000000 for r in inserted)
    assert all(r.c_mktsegment == "NEWSEGMENT" for r in inserted)


def test_merge_copy_on_write_roundtrip(spark):
    """Full ACID-emulation cycle: compute merge → INSERT OVERWRITE to
    parquet → read back; the table state equals the computed merge."""
    from pyspark.sql import functions as F

    merged = all_queries()["merge_into_upsert"](spark, SF_DIR)
    target = tempfile.mkdtemp(prefix="merge_cow_") + "/t"
    try:
        merged.write.mode("overwrite").parquet(target)
        back = spark.read.parquet(target)
        assert back.count() == merged.count()
        diff = back.exceptAll(merged).count() + merged.exceptAll(back).count()
        assert diff == 0
    finally:
        shutil.rmtree(target, ignore_errors=True)


def test_scd2_intervals_tile_the_timeline(spark):
    """Per key: intervals are disjoint, contiguous (valid_to == next
    valid_from), and exactly one open (is_current) interval exists."""
    rows = all_queries()["cdc_scd2_history"](spark, SF_DIR).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)
    assert by_key
    for recs in by_key.values():
        recs.sort(key=lambda r: r.valid_from)
        assert sum(r.is_current for r in recs) == 1
        assert recs[-1].valid_to is None and recs[-1].is_current == 1
        for a, b in zip(recs, recs[1:]):
            assert a.valid_to == b.valid_from


def test_latest_snapshot_is_one_row_per_live_key(spark):
    rows = all_queries()["cdc_latest_snapshot"](spark, SF_DIR).collect()
    keys = [r.user_id for r in rows]
    assert len(keys) == len(set(keys))
    assert len(keys) > 0


def test_sorted_layout_files_disjoint(spark):
    """io_sorted_layout's contract: after repartitionByRange+sortWithin,
    every parquet file covers a disjoint ts slice (per-file min/max from
    the footers must not overlap) — the property file-level pruning needs."""
    import glob
    import os

    import pyarrow.parquet as pq

    from hive_apache_ci_spark.registry import all_queries
    from hive_apache_ci_spark.sources.io_roundtrip import _scratch

    out = all_queries()["io_sorted_layout"](spark, SF_DIR)
    assert out.count() > 0  # materializes the write
    d = _scratch(SF_DIR, "events_sorted")  # per-run path (round-6 discipline)
    ranges = []
    for f in glob.glob(os.path.join(d, "*.parquet")):
        # footer stats for TIMESTAMP_NTZ chunks aren't always populated;
        # reading the single ts column of a small file is equivalent proof
        col = pq.read_table(f, columns=["ts"]).column("ts")
        if len(col):
            import pyarrow.compute as pc

            ranges.append(
                (pc.min(col).as_py(), pc.max(col).as_py())
            )
    assert len(ranges) >= 2, "expected a multi-file layout"
    ranges.sort()
    for (_, a_hi), (b_lo, _) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo, f"overlapping file ranges: {a_hi} > {b_lo}"
