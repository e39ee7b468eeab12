"""Row-mutation semantics on immutable storage: MERGE emulation + CDC.

Hive 2.3's ACID surface (``MERGE INTO``, transactional update/delete —
ql/parse/MergeSemanticAnalyzer + AcidOutputFormat in hive-exec-2.3.10) needs
a transactional table format; this environment has plain parquet (SURVEY.md
§7.8). The portable Spark-first equivalent is copy-on-write: compute the
merged state as a DataFrame and INSERT OVERWRITE it. These operators cover
the *semantics* (the part users port queries against); the overwrite write
path itself is exercised by sources/io_roundtrip.py and
tests/test_mutations.py.

Scale notes: merge is ONE shuffle of each side on the merge key (or
shuffle-free if both sides are bucketed on it — io_bucketed_smb_join shows
that layout); SCD2/latest-snapshot are one window scan per key timeline.
At 100 TB the same topology holds partition-by-partition; Delta/Iceberg/Hudi
only add file-level pruning of untouched partitions on top.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..helpers import T, r2, ravg
from ..registry import query

# Source relation for the merge: per-customer finalized-order revenue at a
# 1% credit — customers with >= 8 finalized orders are "delete" tombstones
# (account closed), others are balance updates; custkeys shifted by
# 10_000_000 model brand-new customers arriving in the batch. Customers
# with no finalized orders are absent from the source → 'kept'.
_MERGE_SOURCE = """
  SELECT o_custkey                                  AS s_custkey,
         round(sum(o_totalprice) / 100.0 + 1e-9, 2) AS s_newbal,
         CASE WHEN count(*) >= 8 THEN 'D' ELSE 'U' END AS s_op
  FROM orders
  WHERE o_orderstatus = 'F'
  GROUP BY o_custkey
"""


@query(
    "merge_into_upsert",
    oracle=f"""
    WITH src AS ({_MERGE_SOURCE}),
    new_rows AS (
      SELECT s_custkey + 10000000 AS s_custkey, s_newbal, 'I' AS s_op
      FROM src WHERE s_custkey % 10 = 0 AND s_op = 'U'
    ),
    source AS (SELECT * FROM src UNION ALL SELECT * FROM new_rows)
    SELECT coalesce(t.c_custkey, s.s_custkey)            AS c_custkey,
           coalesce(t.c_name, 'Customer#new' || CAST(s.s_custkey AS VARCHAR))
                                                         AS c_name,
           CASE WHEN s.s_custkey IS NOT NULL THEN s.s_newbal
                ELSE round(t.c_acctbal, 2) END           AS c_acctbal,
           coalesce(t.c_mktsegment, 'NEWSEGMENT')        AS c_mktsegment,
           CASE WHEN s.s_custkey IS NULL THEN 'kept'
                WHEN t.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END                       AS merge_action
    FROM customer t FULL JOIN source s ON t.c_custkey = s.s_custkey
    WHERE s.s_op IS NULL OR s.s_op <> 'D'
    """,
)
def merge_into_upsert(spark, sf_dir):
    """MERGE INTO emulation (copy-on-write): full outer join target⋈source,
    then per-row clause selection —

    - WHEN MATCHED AND s_op='D'      THEN DELETE
    - WHEN MATCHED                   THEN UPDATE SET c_acctbal = s_newbal
    - WHEN NOT MATCHED AND s_op<>'D' THEN INSERT (new customer row)
    - target rows never matched      survive unchanged ('kept')

    Equivalent of Hive MergeSemanticAnalyzer's rewrite of MERGE into a
    right-outer-join + multi-insert (same join-based plan, minus ACID
    delta files)."""
    t = T(spark, sf_dir, "customer")
    src = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("s_custkey"))
        .agg(
            # /100 is a ratio of 2-decimal-quantized data: epsilon-shift the
            # round so boundary-exact values agree cross-engine.
            ravg(F.sum("o_totalprice") / 100.0, 2).alias("s_newbal"),
            F.when(F.count(F.lit(1)) >= 8, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("s_op"),
        )
    )
    new_rows = (
        src.filter((F.col("s_custkey") % 10 == 0) & (F.col("s_op") == "U"))
        .withColumn("s_custkey", F.col("s_custkey") + 10000000)
        .withColumn("s_op", F.lit("I"))
    )
    source = src.unionByName(new_rows)
    j = t.join(source, t["c_custkey"] == source["s_custkey"], "full_outer")
    return (
        # 'D' rows vanish whether matched (DELETE) or not (no insert);
        # null-safe so unmatched target rows (s_op NULL) survive as 'kept'.
        j.filter(F.col("s_op").isNull() | (F.col("s_op") != "D"))
        .select(
            F.coalesce("c_custkey", "s_custkey").alias("c_custkey"),
            F.coalesce(
                "c_name",
                F.concat(F.lit("Customer#new"), F.col("s_custkey").cast("string")),
            ).alias("c_name"),
            F.when(F.col("s_custkey").isNotNull(), F.col("s_newbal"))
            .otherwise(r2(F.col("c_acctbal")))
            .alias("c_acctbal"),
            F.coalesce("c_mktsegment", F.lit("NEWSEGMENT")).alias("c_mktsegment"),
            F.when(F.col("s_custkey").isNull(), "kept")
            .when(F.col("c_custkey").isNull(), "inserted")
            .otherwise("updated")
            .alias("merge_action"),
        )
    )


@query(
    "cdc_scd2_history",
    oracle="""
    SELECT user_id,
           round(value, 2)                        AS value,
           CAST(floor(epoch(ts)) AS BIGINT)       AS valid_from,
           CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT) AS valid_to,
           CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE event_type = 'signup'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def cdc_scd2_history(spark, sf_dir):
    """Slowly-changing-dimension type 2 build: each change record gets a
    [valid_from, valid_to) interval via lead() over the per-key timeline,
    open-ended (+is_current) on the newest. One window scan per key — the
    standard dimension-history materialization a MERGE-less warehouse runs
    nightly."""
    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        r2(F.col("value")).alias("value"),
        F.col("ts").cast("long").alias("valid_from"),
        nxt.cast("long").alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "cdc_latest_snapshot",
    oracle="""
    SELECT user_id,
           round(value, 2)                  AS value,
           CAST(floor(epoch(ts)) AS BIGINT) AS updated_at
    FROM (
      SELECT user_id, value, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE event_type IN ('signup', 'error')
    )
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_latest_snapshot(spark, sf_dir):
    """Changelog compaction to latest state: last record per key wins;
    a trailing tombstone ('error' here) deletes the key from the snapshot.
    row_number desc over the key timeline — the CDC-read pattern every
    lakehouse table service (Hudi/Delta snapshot read) implements."""
    e = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "error")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            r2(F.col("value")).alias("value"),
            F.col("ts").cast("long").alias("updated_at"),
        )
    )
