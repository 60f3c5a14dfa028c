"""op-44: Structured Streaming ingestion of event/touch streams.

The north rule is batch (spark-submit pipeline), but the capability maps
cleanly when touches arrive incrementally: file-source stream → watermark →
tumbling-window aggregation. For verification the finite parquet input
drives the stream to completion synchronously (memory sink +
processAllAvailable) and the result is returned as a batch DataFrame the
DuckDB oracle can check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_stream(spark: SparkSession, events_path: str):
    """File-stream the events table. The file source wants a DIRECTORY; a
    single-file path is streamed via its parent dir + a pathGlobFilter."""
    import os

    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        return reader.parquet(os.path.dirname(events_path))
    return reader.parquet(events_path)


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 day",
    watermark: str = "1 day",
    query_name: str = "kgc_stream_counts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type over a streamed
    events table. Deterministic output (complete mode, decimal sums)."""
    stream = (
        _read_stream(spark, events_path)
        # parquet TIMESTAMP_NTZ → session-TZ timestamp (UTC): watermarks
        # require an instant-typed event-time column
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # decimal-exact: sum(double) is partition-order-dependent and a
            # result near a .005 boundary could round differently across
            # engines/partitionings — same pattern as the contract queries
            F.sum(F.col("value").cast("decimal(20,6)")).alias("sum_value_d"),
        )
    )
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name).select(
        F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
        "event_type",
        "n",
        F.round(F.col("sum_value_d").cast("double"), 2).alias("sum_value"),
    )


def streaming_touch_dedup(spark: SparkSession, events_path: str, query_name: str = "kgc_stream_dedup") -> DataFrame:
    """Stateful streaming dedup of touch events within the watermark —
    dropDuplicatesWithinWatermark on the natural key."""
    stream = _read_stream(spark, events_path).withColumn("ts", F.col("ts").cast("timestamp"))
    deduped = stream.withWatermark("ts", "1 day").dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "ts"]
    )
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    q = (
        deduped.writeStream.outputMode("append").format("memory").queryName(query_name).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
