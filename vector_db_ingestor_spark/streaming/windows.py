"""Structured Streaming surface.

The reference is batch-only (SURVEY §2A: "no streaming"); these are the
streaming-shaped extensions the north star allows: continuous ingestion
and windowed event aggregation.  Batch/stream parity is deliberate —
``q_stream_tumbling`` runs the same logical plan in batch mode for the
DuckDB oracle, and :func:`tumbling_counts` builds it for either a batch
or a streaming DataFrame (Spark's unified API: the plan is identical,
only the source/sink differ).

At scale: watermark bounds state (late events beyond 10 minutes are
dropped); the shuffle for the window agg is keyed by (window,
event_type) — naturally balanced since windows rotate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


EVENTS_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window per-type counts/sums; works on batch and
    streaming inputs alike."""
    src = events
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_events_from_parquet(
    spark: SparkSession, path: str, ts_is_nanos: bool = True
) -> DataFrame:
    """readStream over the driver's events parquet (file source stands in
    for kafka; the transformation chain is source-agnostic)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = EVENTS_SCHEMA.replace("ts TIMESTAMP", "ts LONG") if ts_is_nanos else EVENTS_SCHEMA
    src = spark.readStream.schema(schema).parquet(path)
    if ts_is_nanos:
        src = src.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return src


def run_windowed_stream_demo(
    spark: SparkSession, events_dir: str, window: str = "1 hour"
) -> DataFrame:
    """Drive the streaming agg to completion over the fixture files and
    return the (batch-queryable) result — used by tests to prove
    batch/stream parity of the plan."""
    stream = stream_events_from_parquet(spark, events_dir)
    agg = tumbling_counts(stream, window=window, watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_tumbling_demo")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM stream_tumbling_demo")
