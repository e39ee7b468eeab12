"""SparkSession factory with Hive-compatible semantics.

The reference engine (Apache Hive 2.3.x — SURVEY.md §1.3) has a permissive,
non-ANSI SQL dialect: implicit string<->numeric coercion, ``int/int -> double``,
silent NULL on bad casts. Spark 4 defaults ``spark.sql.ansi.enabled=true``,
so we flip it off to match Hive semantics (the DuckDB oracle side compensates
with explicit casts — see SURVEY.md §7 risk 1).

Scale posture (100 TB north star): everything here is a *session* default
that also makes sense on a 1000-executor cluster — AQE on (runtime join
conversion, skew-join splitting, partition coalescing), broadcast threshold
sized for dimension tables, shuffle partitions tuned per deployment (32 for
the local[32] test rig; a real cluster overrides via ``extra_conf`` or
spark-defaults).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are *runtime-settable* and required for correct reads of the
# testdata regardless of who created the SparkSession (the driver harness
# creates its own session and passes it to ``__spark_entry__.entry``).
RUNTIME_CONFS: dict[str, str] = {
    # Hive dialect: permissive casts, int/int -> double (SURVEY.md §1.3).
    "spark.sql.ansi.enabled": "false",
    # Deterministic timestamp semantics on both the Spark and DuckDB side.
    "spark.sql.session.timeZone": "UTC",
    # events.parquet `ts` is parquet TIMESTAMP(MICROS) since the round-2
    # testdata regeneration (reads as TIMESTAMP_NTZ; catalog.load_table
    # normalizes to timestamp). nanosAsLong is INERT for micros files but
    # kept so a TIMESTAMP(NANOS) regeneration (the round-1 encoding) reads
    # as int64 instead of crashing — load_table handles both (FIXTURES.md).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # AQE: runtime broadcast conversion, skew-join handling, partition
    # coalescing — the scale levers Hive implemented as SkewJoinResolver /
    # CommonJoinResolver / SetReducerParallelism (SURVEY.md §4.1).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/customer/supplier/part) broadcast;
    # 64 MB covers TPC-H dims at ~SF1k while staying executor-memory safe.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for any pandas_udf / toPandas path (vectorized, not row-at-a-time).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Runtime-settable so externally-created (driver) sessions get the tuned
    # parallelism too; AQE coalesces down, so this is an upper bound.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Join strategy (r12 optimization, guide §3.1): allow shuffled-hash
    # join wherever the planner's size conditions hold instead of always
    # sorting both sides (A/B at sf0.1: 0.27-0.86x, median ~0.5x, on the
    # 12 join-heavy TPC-DS shapes; results hash-identical — strategy never
    # changes content). Production posture: SHJ spills gracefully since
    # Spark 3.2, AQE's local-map threshold below bounds the runtime
    # SMJ->SHJ rewrite to builds that provably fit one map's output, and
    # bucketed/SMB paths pin SMJ via hint('merge') regardless. Both knobs
    # env-tunable; set SPARK_GRAFT_PREFER_SMJ=true to restore the old
    # planner bias on memory-constrained clusters.
    "spark.sql.join.preferSortMergeJoin": os.environ.get(
        "SPARK_GRAFT_PREFER_SMJ", "false"
    ),
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": os.environ.get(
        "SPARK_GRAFT_SHJ_LOCALMAP", str(64 * 1024 * 1024)
    ),
    # Scan-split sizing: the testdata files are single-digit-MB parquet, so
    # the 128 MB default yields 1-3 splits and leaves 32 cores idle on every
    # scan-heavy stage (measured: q1 0.53s→0.41s, minhash 1.6s→1.3s at
    # sf0.1 with 16 MB). A deployment knob exactly like shuffle.partitions:
    # at cluster scale set it so per-task input ≈ 64-128 MB — the point is
    # splits ≈ a few × total cores, which 16 MB achieves on this rig.
    "spark.sql.files.maxPartitionBytes": os.environ.get(
        "SPARK_GRAFT_SPLIT_BYTES", str(16 * 1024 * 1024)
    ),
}

# Confs that must be set at session-build time (ignored via try/except when
# applied to an already-running session).
BUILD_CONFS: dict[str, str] = {
    "spark.driver.memory": "8g",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # managed-table location for bucketed saveAsTable (SMB joins) — keep the
    # repo clean and scratch-resident
    "spark.sql.warehouse.dir": "/tmp/hive_apache_ci_spark_warehouse",
}


_CONFS_APPLIED: set[str] = set()


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply Hive-semantics confs to an externally created session.

    Safe to call repeatedly; used by ``catalog.load_tables`` so that even the
    driver's own SparkSession reads the testdata correctly. Short-circuits
    per JVM application (keyed by ``applicationId``, which is stable for the
    session's lifetime — ``id(spark)`` would be fooled by a recycled Python
    object address) — each conf.set is a py4j round-trip, and the catalog
    calls this on every table load. The short-circuit re-verifies ONE
    sentinel conf first: sibling sessions of the same application (e.g.
    ``spark.newSession()``) share the applicationId but carry their own
    SQLConf, so the cache alone would silently skip them.
    """
    try:
        key_id = spark.sparkContext.applicationId
    except Exception:
        key_id = None
    if key_id is not None and key_id in _CONFS_APPLIED:
        try:
            sentinel = spark.conf.get("spark.sql.session.timeZone", None)
        except Exception:
            sentinel = None
        if sentinel == RUNTIME_CONFS["spark.sql.session.timeZone"]:
            return spark
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Non-settable on this build — keep going; reads may still work.
            pass
    if key_id is not None:
        _CONFS_APPLIED.add(key_id)
    return spark


def get_spark(
    app_name: str = "hive-apache-ci-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    for the test rig; on a real cluster pass ``None`` after setting the
    master in spark-submit / spark-defaults.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for key, value in {**BUILD_CONFS, **RUNTIME_CONFS}.items():
        builder = builder.config(key, value)
    if extra_conf:
        for key, value in extra_conf.items():
            builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
