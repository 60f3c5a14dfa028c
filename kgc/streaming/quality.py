"""op-62 (r5): streaming quality/repetition gate — the streaming twin of
quality_gate, closing the VERDICT-r4 gap that the streaming
construct/dedup chain had no quality stage.

Quality admission is per-document STATELESS (a doc's scores depend only
on its own text), so this is the streaming_decontam shape: foreachBatch
scores each micro-batch with the BATCH operator itself (one code path,
one semantics — kgc/operators/curate.quality_gate) and appends the
passing rows to a parquet sink. The accumulated kept set equals the
batch operator over all arrived docs EXACTLY, for any arrival order or
batch boundaries — no registry, no cross-batch state. Appended rows
carry batch_id so at-least-once replays are byte-identical; the read
side dedups with distinct; the sink gets the standard compactor
(_swap_rewrite — orphan-recovery included).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgc.streaming.dedup import _COMPACTED_BATCH_ID, _recover_orphan, _swap_rewrite


def read_quality_kept(spark: SparkSession, kept_dir: str) -> DataFrame:
    """Accumulated gate-passing docs: (doc_id, quality_score, rep_score)."""
    _recover_orphan(kept_dir)
    if not os.path.isdir(kept_dir):
        return spark.createDataFrame(
            [], "doc_id long, quality_score double, rep_score double"
        )
    return (
        spark.read.parquet(kept_dir)
        .select("doc_id", "quality_score", "rep_score")
        .distinct()
    )


def compact_quality_kept(spark: SparkSession, kept_dir: str) -> None:
    """Rewrite the kept-docs append log to its distinct row set."""
    _recover_orphan(kept_dir)
    if not os.path.isdir(kept_dir):
        return
    merged = read_quality_kept(spark, kept_dir).select(
        F.lit(_COMPACTED_BATCH_ID).cast("long").alias("batch_id"),
        "doc_id", "quality_score", "rep_score",
    )
    _swap_rewrite(merged, kept_dir)


def streaming_quality_gate(
    spark: SparkSession,
    docs_path: str,
    kept_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.1,
    max_repetition: float = 0.2,
    query_name: str = "kgc_stream_quality",
    compact: bool = False,
) -> DataFrame:
    """Drain all currently-available document files through the quality +
    repetition gate and return the accumulated kept set. Incremental via
    the checkpoint (new files only on re-drain); `compact=True` rewrites
    the sink right after the drain (quiesced + committed by construction
    — the streaming_exact_dedup pattern)."""
    from kgc.operators.curate import quality_gate
    from kgc.streaming.touches import _read_stream

    docs = _read_stream(spark, docs_path).select("doc_id", "text")
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        kept = quality_gate(batch_df, min_quality, max_repetition)
        (
            kept.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .select("batch_id", "doc_id", "quality_score", "rep_score")
            .write.mode("append")
            .parquet(kept_dir)
        )

    q = (
        docs.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()
    if compact:
        compact_quality_kept(spark, kept_dir)
    return read_quality_kept(spark, kept_dir)
