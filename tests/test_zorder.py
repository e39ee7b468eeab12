"""Z-order clustered layout: the file-skipping claims behind
sources/zorder.py, at the sharpness the in-query audit can't afford —
z-order must strictly BEAT a single-column sorted layout on the second
column's band, and the Morton code itself must be the locality-preserving
bijection the docstring claims."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hive_apache_ci_spark.helpers import T
from hive_apache_ci_spark.sources.zorder import (
    _key_bounds,
    bucketize,
    file_skip_stats,
    suppkey_band,
    write_clustered,
    zvalue,
)

from .conftest import SF_DIR


def _part_files(path):
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]


def test_zvalue_is_morton_interleave(spark):
    """Pin the bit layout: x bits at even positions, y at odd — checked
    against a pure-Python reference on exhaustive 5-bit inputs."""
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue(F.col("x"), F.col("y"), 5).alias("z")).collect()
    }
    for x, y in rows:
        want = 0
        for i in range(5):
            want |= ((x >> i) & 1) << (2 * i)
            want |= ((y >> i) & 1) << (2 * i + 1)
        assert got[(x, y)] == want, (x, y)


def test_bucketize_monotone_and_bounded(spark):
    df = spark.range(0, 1000).select(
        bucketize(F.col("id"), 0, 999).alias("b"), "id"
    )
    r = df.agg(F.min("b"), F.max("b")).first()
    assert r[0] == 0 and r[1] == 255
    # monotone: bucket never decreases as the value increases
    w = df.orderBy("id").select("b").toPandas()["b"]
    assert (w.diff().dropna() >= 0).all()


def test_zorder_beats_single_column_sort_on_second_column(spark, tmp_path):
    """THE claim: for a band on l_suppkey, a partkey-sorted layout skips
    ~nothing (every file spans the full suppkey range) while the
    z-ordered layout fully skips at least a quarter of its files."""
    li = T(spark, SF_DIR, "lineitem")
    pmin, pmax, smin, smax = _key_bounds(li)
    lo, hi = suppkey_band(smin, smax)

    z_out = str(tmp_path / "zorder")
    write_clustered(
        li.withColumn(
            "z",
            zvalue(
                bucketize(F.col("l_partkey"), pmin, pmax),
                bucketize(F.col("l_suppkey"), smin, smax),
            ),
        ),
        z_out,
        "z",
    )
    naive_out = str(tmp_path / "bypart")
    write_clustered(li, naive_out, "l_partkey")

    zn, zskip = file_skip_stats(_part_files(z_out), "l_suppkey", lo, hi)
    nn, nskip = file_skip_stats(_part_files(naive_out), "l_suppkey", lo, hi)
    assert zn >= 8 and nn >= 8
    assert zskip * 4 >= zn, f"z-order skipped only {zskip}/{zn}"
    assert zskip > nskip, (zskip, nskip)
    # and the partkey-sorted layout is near-useless for this band
    assert nskip <= nn // 4, (nskip, nn)


def test_zorder_query_registered_and_oracled():
    from hive_apache_ci_spark.registry import all_oracles, all_queries

    assert "io_zorder_file_skipping" in all_queries()
    assert "io_zorder_file_skipping" in all_oracles()


def test_file_skip_stats_conservative_without_stats(tmp_path):
    """A file whose footer lacks min/max must count as NOT skippable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"l_suppkey": list(range(100))})
    p = str(tmp_path / "nostats.parquet")
    pq.write_table(t, p, write_statistics=False)
    n, skip = file_skip_stats([p], "l_suppkey", 1000, 2000)
    assert (n, skip) == (1, 0)


def _xy2d_ref(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_table_matches_reference_exhaustive():
    """The 32-row automaton == the classic reflect-and-swap xy2d, for
    every cell of a 32x32 grid (pure Python — no Spark needed)."""
    from hive_apache_ci_spark.sources.zorder import hilbert_step_rows

    table = {
        (st, bx, by): (digit, nst)
        for st, bx, by, digit, nst in hilbert_step_rows()
    }

    def h(bits, x, y):
        st, d = 0, 0
        for i in range(bits - 1, -1, -1):
            digit, st = table[(st, (x >> i) & 1, (y >> i) & 1)]
            d = d * 4 + digit
        return d

    n = 32
    for x in range(n):
        for y in range(n):
            assert h(5, x, y) == _xy2d_ref(n, x, y), (x, y)


def test_hilbert_unit_step_adjacency():
    """THE Hilbert property Morton lacks: consecutive d values are grid
    NEIGHBORS (|dx|+|dy| == 1), so a contiguous d-range is one connected
    region — exhaustive over the full 16x16 grid."""
    from hive_apache_ci_spark.sources.zorder import hilbert_step_rows

    table = {
        (st, bx, by): (digit, nst)
        for st, bx, by, digit, nst in hilbert_step_rows()
    }

    def h(bits, x, y):
        st, d = 0, 0
        for i in range(bits - 1, -1, -1):
            digit, st = table[(st, (x >> i) & 1, (y >> i) & 1)]
            d = d * 4 + digit
        return d

    n = 16
    by_d = {h(4, x, y): (x, y) for x in range(n) for y in range(n)}
    assert len(by_d) == n * n  # bijective
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, x1, y1, x2, y2)


def test_with_hilbert_spark_matches_reference(spark):
    """The relational automaton (8 broadcast joins) computes the same
    d as the pure-Python table walk, over a deterministic sample."""
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.sources.zorder import (
        hilbert_step_rows, with_hilbert,
    )

    table = {
        (st, bx, by): (digit, nst)
        for st, bx, by, digit, nst in hilbert_step_rows()
    }

    def h(bits, x, y):
        st, d = 0, 0
        for i in range(bits - 1, -1, -1):
            digit, st = table[(st, (x >> i) & 1, (y >> i) & 1)]
            d = d * 4 + digit
        return d

    rows = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.h
        for r in with_hilbert(df, F.col("x"), F.col("y")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == h(8, x, y), (x, y)


def test_hilbert_layout_skips_on_first_column(spark, tmp_path):
    """The hilbert-clustered layout prunes a partkey band at least as
    well as the audit bound, mirroring the Morton second-column test."""
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.sources.zorder import (
        _key_bounds, bucketize, partkey_band, with_hilbert,
    )

    li = T(spark, SF_DIR, "lineitem")
    pmin, pmax, smin, smax = _key_bounds(li)
    lo, hi = partkey_band(pmin, pmax)
    out = str(tmp_path / "hilbert")
    write_clustered(
        with_hilbert(
            li,
            bucketize(F.col("l_partkey"), pmin, pmax),
            bucketize(F.col("l_suppkey"), smin, smax),
        ),
        out,
        "h",
    )
    n, skip = file_skip_stats(_part_files(out), "l_partkey", lo, hi)
    assert n >= 8 and skip * 4 >= n, (skip, n)
