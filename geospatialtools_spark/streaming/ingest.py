"""Streaming doc-ingest operators (SURVEY.md §2.11).

All transformations are source-agnostic: they take any streaming (or batch —
the logic is identical, which is how the tests oracle them) DataFrame with an
event-time column. At production scale the source is a file/Kafka stream of
doc-ingest records; here the file source over the ``events`` parquet with
``availableNow`` triggers exercises the full watermark + state path.

Checkpointing: pass ``checkpointLocation`` to ``writeStream`` — Spark's state
store gives the kill-resume guarantee for the streaming stages (the batch
stages use plans/checkpointing.py stage snapshots instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ts_utc(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with zone); driver parquet carries
    TIMESTAMP_NTZ — interpret as UTC wall time."""
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def read_events_stream(spark, sf_dir: str, schema=None) -> DataFrame:
    """File-source stream over the events table (one-file-per-trigger keeps
    backpressure bounded; at scale this is a Kafka/queue source)."""
    if schema is None:
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the streaming file source wants a DIRECTORY; select just the events
    # file(s) out of the sf dir with a glob filter
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir))


def dedup_in_watermark(events: DataFrame, id_col: str = "event_id",
                       ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-id within the watermark horizon: state-store dedup
    keyed on id; state older than the watermark is evicted (bounded memory
    at unbounded input — the scale requirement)."""
    events = _ts_utc(events, ts_col)
    return events.withWatermark(ts_col, watermark).dropDuplicates([id_col])


def windowed_ingest_counts(events: DataFrame, ts_col: str = "ts",
                           watermark: str = "1 hour",
                           window: str = "1 hour",
                           slide: str | None = None) -> DataFrame:
    """Tumbling (or sliding) per-window ingest counts + value sum.

    Late rows beyond the watermark are dropped; the aggregation state closes
    per window once the watermark passes, so output is append-mode capable.
    """
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    events = _ts_utc(events, ts_col)
    return (events.withWatermark(ts_col, watermark)
            .groupBy(w.alias("win"), F.col("event_type"))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "event_type", "n_events", "sum_value"))


def streaming_time_average(events: DataFrame, ts_col: str = "ts",
                           block: str = "1 hour",
                           watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of functions/upscaling.time_average: tumbling-window
    mean (src/upscaling_tools.f90 block mean, with the window as the block)."""
    events = _ts_utc(events, ts_col)
    return (events.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), block).alias("win"))
            .agg(F.avg("value").alias("avg_value"))
            .select(F.col("win.start").alias("block_start"), "avg_value"))


def run_available_now(stream_df: DataFrame, checkpoint_dir: str,
                      out_dir: str) -> None:
    """Drain everything currently available through the streaming engine
    (used by tests and backfills; identical plan serves true continuous runs)."""
    q = (stream_df.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
