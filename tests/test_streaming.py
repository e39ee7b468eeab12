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
