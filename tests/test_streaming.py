"""Stream-vs-batch equivalence: the streaming topologies must produce the
same results as their batch counterparts over the same files (no oracle can
check a stream, so the batch engine is the oracle here)."""

from __future__ import annotations

from hive_apache_ci_spark.registry import all_queries

from .conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumbling_equals_batch(spark):
    qs = all_queries()
    stream = qs["stream_tumbling_counts"](spark, SF_DIR)
    batch = qs["events_tumbling_hour"](spark, SF_DIR)
    assert _rows(stream) == _rows(batch)


def test_stream_session_equals_batch(spark):
    qs = all_queries()
    stream = qs["stream_session_counts"](spark, SF_DIR)
    batch = qs["events_session_window"](spark, SF_DIR).select(
        "user_id", "session_start", "n_events"
    )
    assert _rows(stream) == _rows(batch)


def test_stream_dedup_counts(spark):
    qs = all_queries()
    stream = qs["stream_dedup_watermark"](spark, SF_DIR)
    # events have unique event_ids already -> dedup is identity on counts
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
    )
    assert _rows(stream) == _rows(batch)


def test_stream_foreach_batch_totals(spark):
    qs = all_queries()
    stream = qs["stream_foreach_batch_sink"](spark, SF_DIR)
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
    )
    assert _rows(stream) == _rows(batch)


def test_stream_stateful_counter_equals_batch(spark):
    from pyspark.sql import functions as F

    qs = all_queries()
    stream = qs["stream_stateful_counter"](spark, SF_DIR)
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    srows = {(r.user_id, r.n_events) for r in stream.collect()}
    brows = {(r.user_id, r.n_events) for r in batch.collect()}
    assert srows == brows


def test_stream_stream_join_equals_batch(spark):
    """The watermarked stream-stream view⋈purchase join must produce the
    same per-user pair counts as the identical batch self-join."""
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T

    qs = all_queries()
    stream = qs["stream_stream_join"](spark, SF_DIR)

    e = T(spark, SF_DIR, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("b_ts"),
    )
    batch = (
        v.join(
            b,
            (F.col("v_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("v_ts"))
            & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 24 HOURS")),
        )
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("buy_id").alias("n_buys"),
        )
    )
    assert _rows(stream) == _rows(batch)


def test_stream_static_join_equals_batch(spark):
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T

    stream = all_queries()["stream_static_join"](spark, SF_DIR)
    e = T(spark, SF_DIR, "events")
    dim = T(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = (
        e.join(dim, "user_id", "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.floor(F.sum("value") + F.lit(1e-6))
            .cast("long")
            .alias("sum_value_long"),
        )
    )
    assert _rows(stream) == _rows(batch)


def test_stream_sliding_equals_batch(spark):
    from pyspark.sql import functions as F

    from hive_apache_ci_spark.helpers import T, ravg

    qs = all_queries()
    stream = qs["stream_sliding_counts"](spark, SF_DIR)
    batch = (
        T(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), ravg(F.sum("value")).alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("bucket_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    assert _rows(stream) == _rows(batch)
