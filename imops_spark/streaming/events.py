"""Structured Streaming surface over the harness ``events`` table.

The reference has no streaming (SURVEY.md §2.2 "Streaming"); this module is
the engine's additive surface: the batch operators of
``imops_spark.functions.events`` re-expressed as ``readStream`` pipelines
with watermarks, so the same logical computation runs incrementally.

Patterns covered:
- file-source stream of the events parquet (nanosecond timestamps normalized
  exactly like the batch loader);
- tumbling/sliding windowed aggregates with ``withWatermark`` for late data;
- stateful exact dedup via ``dropDuplicates`` under a watermark.

At cluster scale the same code runs against Kafka by swapping the source —
all transformations are source-agnostic DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "stream_events",
    "windowed_counts_stream",
    "sliding_avg_stream",
    "dedup_stream",
    "run_stream_to_memory",
]


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one-file directory glob).

    Timestamps arrive as TIMESTAMP(NANOS) which Spark cannot represent; we
    read them as nano-longs and materialize a true timestamp column ``ts_t``
    (second precision) plus ``ts_sec`` — matching the batch loader.
    """
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        static = spark.read.parquet(f"{sf_dir}/events.parquet")
        schema = static.schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    ts_sec = F.expr("CAST(ts DIV 1000000000 AS BIGINT)")
    return stream.withColumn("ts_sec", ts_sec).withColumn(
        "ts_t", F.timestamp_seconds(ts_sec)
    )


def windowed_counts_stream(events: DataFrame, minutes: int = 5, watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window counts per event type with a late-data watermark."""
    return (
        events.withWatermark("ts_t", watermark)
        .groupBy(F.window("ts_t", f"{minutes} minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_avg_stream(events: DataFrame, length_min: int = 10, slide_min: int = 5) -> DataFrame:
    """Sliding-window mean value per user (overlapping windows)."""
    return (
        events.withWatermark("ts_t", "1 hour")
        .groupBy(F.window("ts_t", f"{length_min} minutes", f"{slide_min} minutes"), "user_id")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "user_id",
            "avg_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exact dedup on (user_id, event_type) within the watermark."""
    return events.withWatermark("ts_t", watermark).dropDuplicates(["user_id", "event_type"])


def run_stream_to_memory(
    stream_df: DataFrame, name: str, spark: SparkSession, mode: str = "append"
) -> DataFrame:
    """Drain a stream with availableNow into an in-memory table; returns the
    resulting batch DataFrame (test/driver harness helper).  Use
    ``mode='complete'`` for aggregate streams, ``'append'`` for row streams."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)
