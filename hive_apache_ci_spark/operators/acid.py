"""ACID-lite: snapshot-versioned mutations with time-travel (SURVEY §1.1
row 6 — Hive's transactional-table surface, ``[jar: io/AcidInputFormat.class,
lockmgr/DbTxnManager.class]``).

Hive ACID stores a transactional table as ``base_N`` directories plus
``delta_M_M`` directories of U/D/I events, merges them on read keyed by
ROW__ID, and periodically compacts deltas back into a new base. No
Delta/Iceberg jars exist in this sandbox (SURVEY §7.8), so this module
implements the same design over plain parquet + a manifest commit log,
public API only:

- every commit is an immutable data dir (``base_*`` or ``delta_*``,
  _SUCCESS-gated) plus a ``_commits/v{n}.json`` manifest naming the base
  and the live delta chain;
- the manifest file itself is the commit point (Delta's _delta_log
  protocol): published by hard-linking a complete fsynced temp file into
  the ``v{n}.json`` slot, so a slot can never hold torn JSON and a crash
  at any point leaves either no manifest (transaction never happened) or
  a complete one (transaction committed — the next reader/writer scan
  picks it up); the latest version is a directory scan, not a pointer,
  so nothing can wedge;
- **snapshot isolation**: a reader resolves the latest manifest (or an
  explicit ``VERSION AS OF n``) once, then touches only the immutable
  dirs that manifest names — concurrent commits cannot tear its view;
- **merge-on-read**: base rows carry seq = base's commit, delta rows carry
  their commit's seq; latest-seq-per-key wins, 'D' rows drop out — one
  hash shuffle on the key (Hive's ROW__ID merge, keyed by primary key);
- **compaction** (Hive's major compaction): materialize the current
  snapshot as ``base_{n}``, commit a manifest with an EMPTY delta chain.
  Read-back equivalence is oracled below; post-compaction reads scan one
  base dir and plan zero delta unions (gated in tests/test_plans.py);
- **optimistic concurrency** (r9): the hard-link publish means of two
  writers racing for version n+1 exactly one commits; the loser raises
  ConcurrentCommitError and must re-read + retry (Delta's
  first-writer-wins protocol). Losing writers leave only unreferenced
  data dirs. No lock manager (DbTxnManager stays out of scope) —
  conflicts are detected at commit, not prevented by locks.

Scale notes: deltas are mutation-sized, not table-sized; the read path is
UNION ALL + one row_number window partitioned BY KEY (hash-distributed,
never a global window). At 100 TB the base is partitioned and compaction
runs partition-at-a-time — the manifest chain is the only global state.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..helpers import T, committed, run_scratch
from ..registry import query

_COLS = ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the version this transaction targeted
    (optimistic-concurrency conflict — re-read and retry)."""


class AcidTable:
    """Manifest-dir commit log over immutable parquet data dirs."""

    def __init__(self, root: str):
        self.root = root
        self.commits = os.path.join(root, "_commits")
        os.makedirs(self.commits, exist_ok=True)

    # -- commit protocol ------------------------------------------------
    #
    # The manifest file v{n}.json IS the commit point (exactly Delta's
    # _delta_log/N.json): it is published by hard-linking a COMPLETE,
    # fsynced temp file into the slot, so a slot file can never hold torn
    # JSON, and link(2)'s EEXIST gives first-writer-wins atomically.
    # latest_version() is a directory scan for the highest complete
    # manifest — no pointer file is ever the authority, so a writer that
    # dies right after publishing its manifest has simply COMMITTED
    # (readers and the next writer see its version; nothing wedges).

    _SLOT = re.compile(r"^v(\d+)\.json$")

    def latest_version(self) -> int:
        vs = [
            int(m.group(1))
            for f in os.listdir(self.commits)
            if (m := self._SLOT.match(f))
        ]
        if not vs:
            raise OSError(f"no committed version at {self.commits}")
        return max(vs)

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        path = os.path.join(self.commits, f"v{v}.json")
        if not os.path.isfile(path):
            raise OSError(f"no committed version v{v} at {self.commits}")
        with open(path) as fh:
            return json.load(fh)

    def _commit(self, manifest: dict) -> None:
        """Publish a complete manifest into the version slot with
        OPTIMISTIC CONCURRENCY: write + fsync a temp file, hard-link it
        into v{n}.json (atomic create-if-absent of a complete file), then
        unlink the temp. Of two writers that both read version n and try
        to publish n+1, exactly one links first; the loser gets
        ConcurrentCommitError and must re-read + retry."""
        v = manifest["version"]
        mpath = os.path.join(self.commits, f"v{v}.json")
        tmp = os.path.join(self.commits, f".tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, mpath)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version v{v} was committed by another writer; "
                "re-read the table and retry the transaction"
            ) from None
        finally:
            os.unlink(tmp)

    # -- writes ----------------------------------------------------------

    def create(self, df) -> None:
        """v0: initial base snapshot."""
        d = os.path.join(self.root, "base_0")
        df.select(*_COLS).write.mode("errorifexists").parquet(d)
        committed(d)
        self._commit(
            {"version": 0, "base": "base_0", "base_seq": 0, "deltas": []}
        )

    def commit_delta(self, delta_df) -> int:
        """One transaction: U/D/I event rows (full row image + _op).
        Returns the committed version. Rejects deltas carrying two events
        for one key — within a commit all events share the same _seq, so
        duplicate keys would make the merge-on-read winner arbitrary
        (nondeterministic snapshots); one event per key per transaction
        is the contract (Hive MERGE raises the same cardinality error)."""
        dup = (
            delta_df.groupBy("c_custkey")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"delta has multiple events for key {dup[0][0]}; "
                "one event per key per transaction"
            )
        m = self.manifest()
        v = m["version"] + 1
        # writer-unique data dir: the manifest slot link is the ONLY
        # commit arbiter — a losing concurrent writer leaves an orphan
        # data dir that no manifest references (harmless; GC'd with the
        # table)
        dname = f"delta_{v}_{uuid.uuid4().hex[:8]}"
        d = os.path.join(self.root, dname)
        delta_df.select(*_COLS, "_op").write.mode("errorifexists").parquet(d)
        committed(d)
        m = {
            "version": v,
            "base": m["base"],
            "base_seq": m["base_seq"],
            "deltas": m["deltas"] + [[v, dname]],
        }
        self._commit(m)
        return v

    def compact(self, spark) -> int:
        """Major compaction: rewrite the current snapshot as a new base,
        commit an empty delta chain. State-preserving by construction
        (and oracled by acid_compaction_equivalence)."""
        m = self.manifest()
        v = m["version"] + 1
        snap = self.read(spark)
        dname = f"base_{v}_{uuid.uuid4().hex[:8]}"
        d = os.path.join(self.root, dname)
        snap.write.mode("errorifexists").parquet(d)
        committed(d)
        self._commit(
            {"version": v, "base": dname, "base_seq": v, "deltas": []}
        )
        return v

    # -- merge-on-read ---------------------------------------------------

    def read(self, spark, version: int | None = None):
        """Snapshot read (``VERSION AS OF`` when version is given): base
        UNION deltas, latest seq per key wins, deletes drop out."""
        m = self.manifest(version)
        base = spark.read.parquet(
            committed(os.path.join(self.root, m["base"]))
        ).select(*_COLS)
        if not m["deltas"]:
            # compacted (or fresh) snapshot: the base IS the state — plain
            # scan, no merge window (what compaction buys at read time)
            return base
        cur = base.withColumn("_op", F.lit("I")).withColumn(
            "_seq", F.lit(m["base_seq"])
        )
        for seq, dname in m["deltas"]:
            d = (
                spark.read.parquet(committed(os.path.join(self.root, dname)))
                .select(*_COLS, "_op")
                .withColumn("_seq", F.lit(seq))
            )
            cur = cur.unionByName(d)
        w = Window.partitionBy("c_custkey").orderBy(F.col("_seq").desc())
        return (
            cur.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("_op") != "D"))
            .select(*_COLS)
        )


def _null_str():
    return F.lit(None).cast("string")


def _build_demo_table(spark, sf_dir: str, name: str) -> AcidTable:
    """v0 create → v1 UPDATE → v2 DELETE → v3 MERGE, all derived
    deterministically from the customer table (so DuckDB can replay every
    version). Per-run scratch path (scratch discipline)."""
    tbl = AcidTable(run_scratch("acid", sf_dir, name))
    base = T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    tbl.create(base)
    # v1 — UPDATE: 10% balance bump for every 5th customer
    v0 = tbl.read(spark)
    upd = v0.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 1.1 + F.lit(1e-9), 2).alias("c_acctbal"),
        "c_mktsegment",
        F.lit("U").alias("_op"),
    )
    tbl.commit_delta(upd)
    # v2 — DELETE: account closures
    v1 = tbl.read(spark)
    dele = v1.filter(F.col("c_custkey") % 7 == 3).select(
        "c_custkey", _null_str().alias("c_name"),
        F.lit(None).cast("double").alias("c_acctbal"),
        _null_str().alias("c_mktsegment"), F.lit("D").alias("_op"),
    )
    tbl.commit_delta(dele)
    # v3 — MERGE: matched keys update to newbal; unmatched (including keys
    # deleted at v2) insert as fresh 'ACID' rows
    src = T(spark, sf_dir, "customer").filter(
        (F.col("c_custkey") % 11 == 0) | (F.col("c_custkey") % 11 == 5)
    ).select(
        F.when(
            F.col("c_custkey") % 11 == 5, F.col("c_custkey") + 20000000
        ).otherwise(F.col("c_custkey")).alias("k"),
        F.when(
            F.col("c_custkey") % 11 == 5,
            F.round(F.col("c_acctbal") / 2 + F.lit(1e-9), 2),
        ).otherwise(
            F.round(F.col("c_acctbal") + 500 + F.lit(1e-9), 2)
        ).alias("newbal"),
    )
    v2 = tbl.read(spark)
    matched = v2.join(src, v2["c_custkey"] == src["k"]).select(
        "c_custkey", "c_name", F.col("newbal").alias("c_acctbal"),
        "c_mktsegment", F.lit("U").alias("_op"),
    )
    inserted = src.join(
        v2, v2["c_custkey"] == src["k"], "left_anti"
    ).select(
        F.col("k").alias("c_custkey"),
        F.concat(F.lit("Customer#acid"), F.col("k").cast("string")).alias(
            "c_name"
        ),
        F.col("newbal").alias("c_acctbal"),
        F.lit("ACID").alias("c_mktsegment"),
        F.lit("I").alias("_op"),
    )
    tbl.commit_delta(matched.unionByName(inserted))
    return tbl


# DuckDB replay of the same four versions (shared by all three oracles).
_VERSIONS_CTE = """
v0 AS (
  SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, c_mktsegment
  FROM customer
),
v1 AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 5 = 0
              THEN round(c_acctbal * 1.1 + 1e-9, 2)
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM v0
),
v2 AS (SELECT * FROM v1 WHERE c_custkey % 7 <> 3),
src AS (
  SELECT CASE WHEN c_custkey % 11 = 5 THEN c_custkey + 20000000
              ELSE c_custkey END AS k,
         CASE WHEN c_custkey % 11 = 5
              THEN round(c_acctbal / 2 + 1e-9, 2)
              ELSE round(c_acctbal + 500 + 1e-9, 2) END AS newbal
  FROM customer
  WHERE c_custkey % 11 = 0 OR c_custkey % 11 = 5
),
v3 AS (
  SELECT v2.c_custkey, v2.c_name,
         coalesce(s.newbal, v2.c_acctbal) AS c_acctbal, v2.c_mktsegment
  FROM v2 LEFT JOIN src s ON v2.c_custkey = s.k
  UNION ALL
  SELECT s.k, 'Customer#acid' || CAST(s.k AS VARCHAR), s.newbal, 'ACID'
  FROM src s LEFT JOIN v2 ON v2.c_custkey = s.k
  WHERE v2.c_custkey IS NULL
)
"""

_FINAL_STATE_SQL = f"""
WITH {_VERSIONS_CTE}
SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM v3
"""


@query("acid_upsert_delete_merge", oracle=_FINAL_STATE_SQL)
def acid_upsert_delete_merge(spark, sf_dir):
    """UPDATE → DELETE → MERGE on a snapshot-versioned table, read back
    from storage at LATEST through the merge-on-read path (base + 3 delta
    dirs, latest-seq-per-key). The oracle replays all three transactions
    relationally — a wrong op precedence, a delta applied out of order, or
    a tombstone leak all break the hash."""
    tbl = _build_demo_table(spark, sf_dir, "upsert_delete_merge")
    out = tbl.read(spark).localCheckpoint()
    import shutil

    shutil.rmtree(tbl.root, ignore_errors=True)
    return out


@query(
    "acid_version_as_of",
    oracle=f"""
    WITH {_VERSIONS_CTE}
    SELECT * FROM (
      SELECT 0 AS version, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_bal
      FROM v0
      UNION ALL
      SELECT 1, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) FROM v1
      UNION ALL
      SELECT 2, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) FROM v2
      UNION ALL
      SELECT 3, CAST(count(*) AS BIGINT),
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) FROM v3
    )
    """,
)
def acid_version_as_of(spark, sf_dir):
    """Time travel: ``VERSION AS OF n`` for every committed version of the
    mutated table — each read resolves manifest v{n} and sees exactly the
    dirs that commit named (snapshot isolation: later commits are
    invisible). Emits (version, row count, exact-DECIMAL balance total);
    the oracle recomputes each version's state independently."""
    tbl = _build_demo_table(spark, sf_dir, "version_as_of")
    outs = []
    for v in range(tbl.latest_version() + 1):
        outs.append(
            tbl.read(spark, version=v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_bal"),
            ).select("version", "n_rows", "total_bal")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    res = res.localCheckpoint()
    import shutil

    shutil.rmtree(tbl.root, ignore_errors=True)
    return res


@query("acid_compaction_equivalence", oracle=_FINAL_STATE_SQL)
def acid_compaction_equivalence(spark, sf_dir):
    """Major compaction: after the three transactions, rewrite the
    snapshot as base_4 with an empty delta chain, then read LATEST —
    which now scans ONE base dir and unions zero deltas (plan-gated in
    tests/test_plans.py::test_acid_compacted_read_scans_base_only).
    Matching the SAME final-state oracle as acid_upsert_delete_merge
    proves compaction is state-preserving bit-for-bit."""
    tbl = _build_demo_table(spark, sf_dir, "compaction")
    v = tbl.compact(spark)
    m = tbl.manifest()
    if m["deltas"] or m["version"] != v:
        raise AssertionError(f"compaction left a dirty manifest: {m}")
    out = tbl.read(spark).localCheckpoint()
    import shutil

    shutil.rmtree(tbl.root, ignore_errors=True)
    return out
