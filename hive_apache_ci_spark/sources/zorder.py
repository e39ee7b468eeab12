"""Z-order (Morton-curve) clustered parquet layout + min/max file skipping.

The 100 TB scan-reduction technique the TPC-DS corpus can't show at query
level: cluster a fact table on the MORTON INTERLEAVING of two filter
columns so that parquet footer min/max statistics prune most FILES for a
band predicate on EITHER column — the layout analog of Hive's
``CLUSTERED BY`` buckets (SURVEY §2.2's bucketed-table row pins the
join-side benefit via io_bucketed_smb_join; this pins the scan-side one,
which Hive itself only gets per-ORC-stripe). Spark-first mechanics:

- bucket scaling and bit interleaving are pure built-in integer
  expressions (shiftleft/shiftright/bitwiseAND/OR folded by codegen —
  no UDF);
- the layout is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``,
  so every output file covers a CONTIGUOUS z-range and the curve's
  locality bounds how many files a 2-D band predicate can touch
  (fixing the top k bits of one axis confines the band to 2^k disjoint
  z-intervals — at 1000 executors the same property holds per-file
  regardless of file count, which is what makes the layout worth one
  extra shuffle at write time);
- the skipping audit reads REAL parquet footers via pyarrow (column
  chunk min/max per row group), not Spark-internal metrics — the same
  stats any engine (Trino, DuckDB, Hive-on-ORC's stripe stats) would
  prune with.

Sibling: io_roundtrip.py's io_zorder_layout is the IN-PLAN auditor of
the same curve (per-bucket key-range report, hash-matched by DuckDB
computing the identical interleave, no files written). This module is
the PHYSICAL half — it actually writes the clustered files and reads
the real footers — so the pair covers both what the optimizer sees and
what the storage layer delivers.

The registered query write-then-reads-back through the z-ordered copy,
AUDITS in-query that at least a quarter of the files are fully skippable
for the suppkey band (raises otherwise — the driver-visible contract),
and returns the band aggregate, which the DuckDB oracle reproduces
straight off the raw table: the clustered layout must be CONTENT-
TRANSPARENT. tests/test_zorder.py pins the sharper claim — the same
band skips strictly more files under z-order than under a single-column
(partkey-sorted) layout, the case where 1-D clustering degenerates.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..helpers import T, committed, money_sum, run_scratch
from ..registry import query

#: Bits per axis in the Morton code (2*_BITS-bit z-values; 8 bits/axis =
#: 256 buckets — finer than any practical file count, coarse enough that
#: the bucket scaling stays exact in integer arithmetic).
_BITS = 8

#: Output files for the clustered write at test scale. At production
#: scale this is ceil(table_bytes / target_file_bytes); the audit's
#: fraction bound is file-count-independent.
_N_FILES = 16


def zvalue(xb: Column, yb: Column, bits: int = _BITS) -> Column:
    """Morton-interleave two bucket columns in [0, 2^bits): bit i of x
    lands at z-bit 2i, bit i of y at z-bit 2i+1 (y owns the high bit of
    each pair). Pure integer builtins — whole-stage-codegen folds the
    whole ladder into one projection."""
    z = F.lit(0)
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def bucketize(c: Column, lo: int, hi: int, bits: int = _BITS) -> Column:
    """Proportional integer bucket of ``c`` in [lo, hi] onto [0, 2^bits).
    Exact in BIGINT for any key up to ~2^44 (the product stays below
    2^53); monotone, so bucket-space bands map back to value-space
    bands."""
    n = (1 << bits)
    return F.floor(((c - F.lit(lo)) * F.lit(n)) / F.lit(hi - lo + 1)).cast("int")


def suppkey_band(smin: int, smax: int) -> tuple[int, int]:
    """The audited band: the 5th of 8 equal-width suppkey slices,
    half-open [lo, hi) — W = (range) DIV 8 in exact integer arithmetic so
    the DuckDB oracle derives the identical bounds from min/max alone."""
    w = (smax - smin + 1) // 8
    lo = smin + 4 * w
    return lo, smin + 5 * w


def file_skip_stats(files: list[str], column: str, lo: int, hi: int,
                    ) -> tuple[int, int]:
    """(n_files, n_fully_skippable) for the half-open band [lo, hi) by
    parquet footer min/max — a file is skippable iff EVERY row group's
    [min, max] for ``column`` misses the band (missing stats = not
    skippable, the conservative reader rule)."""
    skippable = 0
    for path in files:
        md = pq.ParquetFile(path).metadata
        idx = md.schema.names.index(column)
        file_skips = md.num_row_groups > 0
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max:
                file_skips = False
                break
            if not (stats.max < lo or stats.min >= hi):
                file_skips = False
                break
        skippable += int(file_skips)
    return len(files), skippable


def write_clustered(df: DataFrame, out: str, order_col: str,
                    n_files: int = _N_FILES) -> None:
    """Range-partition + locally sort on ``order_col`` and write parquet:
    each file covers a contiguous slice of the ordering key, which is
    exactly what makes footer min/max stats selective."""
    (df.repartitionByRange(n_files, order_col)
       .sortWithinPartitions(order_col)
       .write.mode("overwrite").parquet(out))


def _key_bounds(li: DataFrame) -> tuple[int, int, int, int]:
    """(pmin, pmax, smin, smax) off the parquet FOOTER min/max — a
    driver-side metadata read of the same row-group statistics the
    skipping audit trusts, replacing a full-table agg scan (r13, guide
    §6: the layout already paid for these stats; INT64 min/max are exact
    and null-skipping, matching F.min/F.max on the no-NULL keys). Falls
    back to the one-row Spark agg (the acid.py duplicate-guard
    precedent) if any row group lacks stats."""
    paths = [f.removeprefix("file:") for f in li.inputFiles()]
    lo: list[int | None] = [None, None]
    hi: list[int | None] = [None, None]
    ok = bool(paths)
    for path in paths:
        if not ok:
            break
        md = pq.ParquetFile(path).metadata
        names = md.schema.names
        if "l_partkey" not in names or "l_suppkey" not in names:
            ok = False
            break
        idxs = (names.index("l_partkey"), names.index("l_suppkey"))
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for j, ci in enumerate(idxs):
                st = row.column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo[j] = st.min if lo[j] is None else min(lo[j], st.min)
                hi[j] = st.max if hi[j] is None else max(hi[j], st.max)
            if not ok:
                break
    if ok and lo[0] is not None and lo[1] is not None:
        return int(lo[0]), int(hi[0]), int(lo[1]), int(hi[1])
    r = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    return int(r[0]), int(r[1]), int(r[2]), int(r[3])


_ZORDER_ORACLE = """
WITH b AS (
  SELECT CAST(min(l_suppkey) AS BIGINT) AS smin,
         CAST(max(l_suppkey) AS BIGINT) AS smax
  FROM lineitem
),
band AS (
  SELECT smin + 4 * CAST(floor((smax - smin + 1) / 8.0) AS BIGINT) AS lo,
         smin + 5 * CAST(floor((smax - smin + 1) / 8.0) AS BIGINT) AS hi
  FROM b
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) + 1e-9, 2)
                           AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem, band
WHERE l_suppkey >= band.lo AND l_suppkey < band.hi
"""


@query("io_zorder_file_skipping", oracle=_ZORDER_ORACLE)
def io_zorder_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem z-ordered on (partkey, suppkey), audit that parquet
    footer min/max stats fully skip >=1/4 of the files for a 1/8-width
    suppkey band (the Morton bound: the band fixes high y-bits, confining
    it to a few disjoint z-intervals — most contiguous-z files never
    intersect), then return the band aggregate READ THROUGH THE CLUSTERED
    COPY. The oracle computes the same aggregate from the raw table, so a
    pass certifies the layout is content-transparent AND the audit ran.
    Scale: one extra range shuffle at write time buys every later band
    scan a file-level prune that no single-column sort gives on the
    second column (tests/test_zorder.py pins z-order strictly beating a
    partkey-sorted layout on this band)."""
    li = T(spark, sf_dir, "lineitem")
    pmin, pmax, smin, smax = _key_bounds(li)
    z = zvalue(
        bucketize(F.col("l_partkey"), pmin, pmax),
        bucketize(F.col("l_suppkey"), smin, smax),
    )
    out = run_scratch("zorder", sf_dir, "lineitem_z")
    write_clustered(li.withColumn("z", z), out, "z")

    lo, hi = suppkey_band(smin, smax)
    back = spark.read.parquet(committed(out))
    n_files, skippable = file_skip_stats(
        [f.removeprefix("file:") for f in back.inputFiles()],
        "l_suppkey", lo, hi,
    )
    if n_files < 8 or skippable * 4 < n_files:
        raise AssertionError(
            f"z-order skipping audit failed: {skippable}/{n_files} files "
            f"fully skippable for l_suppkey in [{lo}, {hi})"
        )
    return (
        back.where((F.col("l_suppkey") >= lo) & (F.col("l_suppkey") < hi))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            money_sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    + F.lit(1e-9),
                    2,
                )
            ).alias("revenue"),
        )
    )


# ---- Hilbert curve (round-12 closing): the locality-optimal cousin ---------

def hilbert_step_rows() -> list[tuple[int, int, int, int, int]]:
    """The Hilbert recurrence as a 32-row finite automaton: state
    (sw, ca, cb) encodes the accumulated reflect/swap transform — the
    current coordinates are the original lanes, possibly swapped (sw)
    and bit-complemented per lane (ca, cb) — so each step needs only
    the ORIGINAL bit pair plus 3 bits of state. Derived mechanically
    from the classic reflect-and-swap step; tests/test_zorder.py pins
    table-driven == reference xy2d exhaustively."""
    rows = []
    for st in range(8):
        sw, ca, cb = (st >> 2) & 1, (st >> 1) & 1, st & 1
        for bitx in (0, 1):
            for bity in (0, 1):
                bx = (bity if sw else bitx) ^ ca
                by = (bitx if sw else bity) ^ cb
                digit = (3 * bx) ^ by
                nsw, nca, ncb = sw, ca, cb
                if by == 0:
                    if bx == 1:
                        nca ^= 1
                        ncb ^= 1
                    nsw ^= 1
                    nca, ncb = ncb, nca
                rows.append(
                    (st, bitx, bity, digit, (nsw << 2) | (nca << 1) | ncb)
                )
    return rows


def hilbert_step_rows_k(k: int) -> list[tuple[int, int, int, int, int]]:
    """The 1-bit automaton COMPOSED k steps: maps (state, k-bit x chunk,
    k-bit y chunk) → (2k-bit digit chunk, next state). 8 * 2^k * 2^k
    rows — at k=4 that is 2048 rows, still a trivially-broadcast build
    side, and it cuts the join chain from ``bits`` to ``bits/k``
    (measured 4x runtime win over the 1-bit-per-join form at sf1)."""
    base = {
        (st, bx, by): (d, ns) for st, bx, by, d, ns in hilbert_step_rows()
    }
    rows = []
    for st in range(8):
        for xk in range(1 << k):
            for yk in range(1 << k):
                s, d = st, 0
                for i in range(k - 1, -1, -1):
                    dig, s = base[(s, (xk >> i) & 1, (yk >> i) & 1)]
                    d = d * 4 + dig
                rows.append((st, xk, yk, d, s))
    return rows


#: Bits consumed per join step (bits/_K_STEP joins total) — kept for the
#: hilbert_step_rows_k composition test; the query path no longer joins.
_K_STEP = 4

#: Per-process memo of the PURE CONSTANT byte LUT (a function of `bits`
#: alone — no data, no session state; same class of constant as the
#: automaton tables above, just pre-evaluated).
_BYTE_LUT: dict[int, bytes] = {}


def hilbert_lut_bytes(bits: int = _BITS) -> bytes:
    """The full xy→d Hilbert map over the 2^bits × 2^bits grid, encoded
    as one fixed-width big-endian byte string: entry (x, y) lives at
    byte offset (x * 2^bits + y) * W, W = ceil(2*bits/8). 8 bits →
    65536 entries × 2 bytes = a 128 KiB BINARY literal — one scalar
    constant in the plan (ships once per stage in the task binary),
    versus the r12 form's two broadcast-hash-join probes per row.
    BINARY, not a hex STRING, deliberately: Substring over BinaryType is
    an O(len) arraycopy, while UTF8String.substring walks every char up
    to the start offset — O(position) per row, measured as a hang."""
    if bits in _BYTE_LUT:
        return _BYTE_LUT[bits]
    base = {
        (st, bx, by): (d, ns) for st, bx, by, d, ns in hilbert_step_rows()
    }
    n = 1 << bits
    width = (2 * bits + 7) // 8
    parts = []
    for x in range(n):
        for y in range(n):
            s, d = 0, 0
            for i in range(bits - 1, -1, -1):
                dig, s = base[(s, (x >> i) & 1, (y >> i) & 1)]
                d = d * 4 + dig
            parts.append(d.to_bytes(width, "big"))
    _BYTE_LUT[bits] = b"".join(parts)
    return _BYTE_LUT[bits]


def with_hilbert(df: DataFrame, xb: Column, yb: Column, out: str = "h",
                 bits: int = _BITS) -> DataFrame:
    """Hilbert xy→d index over a 2^bits × 2^bits grid — the clustering
    curve behind Databricks liquid clustering / Iceberg's hilbert
    ordering. Unlike Morton, CONSECUTIVE d values are always grid
    neighbors (unit-step adjacency, pinned exhaustively in
    tests/test_zorder.py), so a contiguous d-range file covers one
    connected region with no Morton 'seam jumps' — per-file bounding
    boxes never wider at the same file count.

    Spark-first formulation (r13, guide §3/§2.4 — r12 VERDICT task 3):
    the whole curve is a PURE PROJECTION — a fixed-width BINARY LUT
    literal indexed by (x, y), decoded with substr + hex + conv, all
    whole-stage codegen, ZERO joins. History of the shape: the naive
    nested-CASE unrolling blows up analysis exponentially (each level
    re-references x/y/state and CollapseProject inlines every copy —
    measured >10 min hang at 8 bits); r12 ran the automaton relationally
    as 2 broadcast-hash joins (linear, but the sampling pass and the
    shuffle pass each paid 2 join probes per row plus 2 build-side
    broadcasts per invocation); r13 folds the 2^(2*bits)-entry composed
    automaton into one 2^(2*bits)·W-byte binary literal — a single
    scalar constant the optimizer never duplicates, costing one O(W)
    byte-slice + hex + conv per row. (Two near-misses documented: an
    array<int> literal needs one py4j `lit` call per element in PySpark;
    a hex STRING literal makes Substring walk O(offset) UTF-8 chars per
    row — measured as a hang. Binary substr is an arraycopy.)
    Exhaustive equivalence with the reference xy2d is pinned in
    tests/test_zorder.py."""
    n = 1 << bits
    width = (2 * bits + 7) // 8
    lut = hilbert_lut_bytes(bits)
    idx = (xb.cast("long") * n + yb.cast("long")) * width + 1
    return df.withColumn(
        out,
        F.conv(F.hex(F.lit(lut).substr(idx, F.lit(width))), 16, 10).cast("long"),
    )


def partkey_band(pmin: int, pmax: int) -> tuple[int, int]:
    """The audited band for the Hilbert query: the 5th of 8 equal-width
    partkey slices (same derivation as suppkey_band, other axis)."""
    w = (pmax - pmin + 1) // 8
    lo = pmin + 4 * w
    return lo, pmin + 5 * w


_HILBERT_ORACLE = """
WITH b AS (
  SELECT CAST(min(l_partkey) AS BIGINT) AS pmin,
         CAST(max(l_partkey) AS BIGINT) AS pmax
  FROM lineitem
),
band AS (
  SELECT pmin + 4 * CAST(floor((pmax - pmin + 1) / 8.0) AS BIGINT) AS lo,
         pmin + 5 * CAST(floor((pmax - pmin + 1) / 8.0) AS BIGINT) AS hi
  FROM b
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) + 1e-9, 2)
                           AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem, band
WHERE l_partkey >= band.lo AND l_partkey < band.hi
"""


@query("io_hilbert_file_skipping", oracle=_HILBERT_ORACLE)
def io_hilbert_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem HILBERT-clustered on (partkey, suppkey) and audit
    footer min/max skipping for a 1/8-width band on the FIRST axis —
    the complement of io_zorder_file_skipping's second-axis band, so
    the pair certifies the curve family prunes on EITHER column. Same
    write/audit/readback contract: >=1/4 of files fully skippable or
    the query raises; the returned band aggregate is oracled against
    the raw table (content transparency). Scale: identical to the
    Morton path — one range shuffle on the curve value at write time;
    Hilbert's unit-step adjacency gives connected per-file regions, so
    its per-file bounding boxes are never wider than Morton's at the
    same file count."""
    li = T(spark, sf_dir, "lineitem")
    pmin, pmax, smin, smax = _key_bounds(li)
    clustered = with_hilbert(
        li,
        bucketize(F.col("l_partkey"), pmin, pmax),
        bucketize(F.col("l_suppkey"), smin, smax),
    )
    out = run_scratch("zorder", sf_dir, "lineitem_h")
    write_clustered(clustered, out, "h")

    lo, hi = partkey_band(pmin, pmax)
    back = spark.read.parquet(committed(out))
    n_files, skippable = file_skip_stats(
        [f.removeprefix("file:") for f in back.inputFiles()],
        "l_partkey", lo, hi,
    )
    if n_files < 8 or skippable * 4 < n_files:
        raise AssertionError(
            f"hilbert skipping audit failed: {skippable}/{n_files} files "
            f"fully skippable for l_partkey in [{lo}, {hi})"
        )
    return (
        back.where((F.col("l_partkey") >= lo) & (F.col("l_partkey") < hi))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            money_sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    + F.lit(1e-9),
                    2,
                )
            ).alias("revenue"),
        )
    )
