"""Structured Streaming wiring (SURVEY.md §2.10).

`windows.py` holds the window semantics (batch-checkable); this module
binds the same aggregations to real streams: source builders, watermark
policy, stateful dedup, and a foreachBatch JSON sink mirroring the
reference's chunked S3 staging (dag-knlp.py:139-145). Tested with the
rate and file sources — no external broker in this environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_events_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic events stream from the built-in rate source, shaped
    like the `events` table (event-time `ts`, user_id, type, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 50).alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
                (F.col("value") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("value") % 100 / 10.0).alias("value"),
        )
    )


def windowed_counts(events: DataFrame, window: str = "10 minutes", watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts: late data beyond the
    watermark is dropped and window state is evicted — bounded state at
    any scale (the non-negotiable property for 100 TB streams)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup on event_id, state bounded by the
    watermark (`dropDuplicatesWithinWatermark`)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def write_stream_foreach_batch(df: DataFrame, path: str, checkpoint: str):
    """Exactly-once-style sink via foreachBatch: each micro-batch
    writes to a batchId-keyed subdirectory with overwrite, so a
    replayed batch (failure → restart from checkpoint) lands
    idempotently instead of duplicating. This is the pattern for sinks
    without native transactional support."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").json(f"{path}/batch_id={batch_id}")

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def write_stream_json(df: DataFrame, path: str, checkpoint: str, max_records_per_file: int = 10_000):
    """JSON-lines streaming sink with part-file chunking — the streaming
    analog of the reference's 10k-row chunked S3 staging
    (dag-knlp.py:139-145 → `maxRecordsPerFile`)."""
    return (
        df.writeStream.format("json")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .option("maxRecordsPerFile", max_records_per_file)
        .outputMode("append")
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on: list[str] | str, how: str = "left") -> DataFrame:
    """Stream-static join: every micro-batch joins the (slowly-changing)
    static dimension. The dim is broadcast — the stream side never
    shuffles, so enrichment adds no stateful operator and no watermark
    requirement. At 100 TB-scale ingest this is the standard pattern
    for attaching reference data (user → cohort, type → category)."""
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), on, how)
