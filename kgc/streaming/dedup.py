"""op-44 × dedup family: INCREMENTAL exact deduplication of a document
stream — the streaming twin of q_dd_exact_hash.

A training-data ingestion pipeline dedups continuously: new document files
land, and only first-seen content should flow downstream. The
scale-honest design keeps NO streaming state in executors (a content
registry is unbounded — it can never live in `dropDuplicates` state):

- foreachBatch reduces each micro-batch to per-content-hash PARTIALS
  (batch_id, content_hash, n, min_doc) — O(distinct hashes in batch) rows,
  map-side combinable — and APPENDS them to a parquet registry sink.
  State lives in the sink, like the triples natural-key compaction.
- First-seen documents (hashes absent from the pre-batch registry) are
  appended to a `uniques` sink — the dedup filter a downstream trainer
  consumes. Uniques are written BEFORE the registry partials so a
  crash-mid-batch replay (foreachBatch is at-least-once) re-emits
  byte-identical rows instead of losing them; both sinks are
  replay-idempotent under full-row distinct because every appended row
  carries its batch_id.
- Reads COMPACT: registry = distinct partials → groupBy(hash) →
  (Σn, min doc). At scale this is the standard merge-on-read layout; an
  Iceberg/Delta MERGE would compact on write instead (same contract).

The compacted registry is BIT-EQUAL to the batch exact-dedup oracle
(count + min-doc per md5(text) group) regardless of arrival order or
batch boundaries; only `uniques` is arrival-order-dependent (it keeps the
first-SEEN doc, the registry keeps the min-id doc — both disclosed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_registry(spark: SparkSession, registry_dir: str) -> DataFrame:
    """Compacted content registry: (content_hash, n, keep_doc_id) — the
    merge-on-read over appended per-batch partials. distinct() absorbs
    at-least-once replays (replayed partials are byte-identical, keyed by
    batch_id)."""
    if not os.path.isdir(registry_dir):
        return spark.createDataFrame(
            [], "content_hash string, n long, keep_doc_id string"
        )
    # schema inferred from the sink's own files: the doc-id type follows
    # whatever the source table uses (string in the KG docs, int64 in the
    # driver's documents table)
    return (
        spark.read.parquet(registry_dir)
        .distinct()
        .groupBy("content_hash")
        .agg(F.sum("n").cast("long").alias("n"), F.min("min_doc").alias("keep_doc_id"))
    )


def read_uniques(spark: SparkSession, uniques_dir: str) -> DataFrame:
    """First-seen documents: (content_hash, first_doc_id). One row per
    distinct content hash across the stream's lifetime."""
    if not os.path.isdir(uniques_dir):
        return spark.createDataFrame([], "content_hash string, first_doc_id string")
    return (
        spark.read.parquet(uniques_dir)
        .distinct()
        .select("content_hash", "first_doc_id")
    )


def streaming_exact_dedup(
    spark: SparkSession,
    docs_path: str,
    registry_dir: str,
    uniques_dir: str,
    checkpoint_dir: str,
    query_name: str = "kgc_stream_dedup",
) -> DataFrame:
    """Drain all currently-available document files through the incremental
    dedup and return the compacted registry. Idempotent per input file via
    the checkpoint: call again after new files arrive to process only
    those (tested two-chunk in tests/test_streaming.py)."""
    from kgc.streaming.touches import _read_stream

    docs = _read_stream(spark, docs_path).select("doc_id", "text")
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        partial = (
            batch_df.groupBy(F.md5(F.col("text")).alias("content_hash"))
            .agg(F.count("*").alias("n"), F.min("doc_id").alias("min_doc"))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .select("batch_id", "content_hash", "n", "min_doc")
            .persist()
        )
        try:
            seen = read_registry(spark, registry_dir).select("content_hash")
            new = (
                partial.join(seen, "content_hash", "left_anti")
                .select("batch_id", "content_hash", F.col("min_doc").alias("first_doc_id"))
            )
            # uniques FIRST: a crash between the two appends replays into
            # byte-identical unique rows; the reverse order would see the
            # replayed hashes already registered and drop them.
            new.write.mode("append").parquet(uniques_dir)
            partial.write.mode("append").parquet(registry_dir)
        finally:
            partial.unpersist()

    q = (
        docs.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()
    return read_registry(spark, registry_dir)
