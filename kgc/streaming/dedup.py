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
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COMPACTED_BATCH_ID = -1  # sentinel batch_id for rows produced by compaction


def _recover_orphan(path: str) -> None:
    """Crash recovery for _swap_rewrite (ADVICE r4): a crash between its two
    renames leaves the ONLY surviving copy of a sink at
    `path + '.compact-old'` and nothing at `path`. Every read_* helper
    treats a missing dir as an empty sink, so without this a resumed drain
    would see an empty registry, re-register all history (double-counting
    n), and the next compaction's rmtree of .compact-old would permanently
    delete the last copy. Roll the orphan back before any read or rewrite;
    when `path` exists, .compact-old is just the stale pre-swap copy and the
    next _swap_rewrite removes it."""
    old = path.rstrip("/") + ".compact-old"
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)


def read_registry(spark: SparkSession, registry_dir: str) -> DataFrame:
    """Compacted content registry: (content_hash, n, keep_doc_id) — the
    merge-on-read over appended per-batch partials. distinct() absorbs
    at-least-once replays (replayed partials are byte-identical, keyed by
    batch_id)."""
    _recover_orphan(registry_dir)
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
    _recover_orphan(uniques_dir)
    if not os.path.isdir(uniques_dir):
        return spark.createDataFrame([], "content_hash string, first_doc_id string")
    return (
        spark.read.parquet(uniques_dir)
        .distinct()
        .select("content_hash", "first_doc_id")
    )


def _exact_merge_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    registry_dir: str,
    uniques_dir: str,
) -> None:
    """One micro-batch of the exact dedup, module-level so the replay test
    can invoke it twice with the SAME batch_id (the crash-mid-batch
    scenario) and pin that both compacted sinks are unchanged. Idempotence
    holds ONLY under checkpointed replay (same batch_id): deleting the
    checkpoint and re-draining re-ingests files under new batch ids and
    double-counts — the checkpoint directory is part of the sink's state."""
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


def streaming_exact_dedup(
    spark: SparkSession,
    docs_path: str,
    registry_dir: str,
    uniques_dir: str,
    checkpoint_dir: str,
    query_name: str = "kgc_stream_dedup",
    compact: bool = False,
) -> DataFrame:
    """Drain all currently-available document files through the incremental
    dedup and return the compacted registry. Idempotent per input file via
    the checkpoint: call again after new files arrive to process only
    those (tested two-chunk in tests/test_streaming.py).

    `compact=True` runs compact_registry after the drain — the one moment
    the compaction precondition holds for free (availableNow just
    terminated, so the stream is quiesced and its last batch
    checkpoint-committed). A long-lived ingest toggles this every K-th
    drain to keep registry reads O(live state)."""
    from kgc.streaming.touches import _read_stream

    docs = _read_stream(spark, docs_path).select("doc_id", "text")
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        _exact_merge_batch(spark, batch_df, batch_id, registry_dir, uniques_dir)

    q = (
        docs.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()
    if compact:
        compact_registry(spark, registry_dir)
        compact_uniques(spark, uniques_dir)
    return read_registry(spark, registry_dir)


def read_postings(spark: SparkSession, postings_dir: str) -> DataFrame:
    """The banded-MinHash posting registry: distinct (id, band_idx,
    band_key) rows accumulated across batches (each doc posts once per
    band; the distinct absorbs at-least-once replays, whose appended rows
    are byte-identical)."""
    _recover_orphan(postings_dir)
    if not os.path.isdir(postings_dir):
        return spark.createDataFrame([], "id long, band_idx int, band_key string")
    return spark.read.parquet(postings_dir).select("id", "band_idx", "band_key").distinct()


def read_candidate_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """Distinct near-dup candidate pairs (id_a < id_b) emitted so far —
    input to a downstream batch Jaccard verify (dd_jaccard machinery)."""
    _recover_orphan(pairs_dir)
    if not os.path.isdir(pairs_dir):
        return spark.createDataFrame([], "id_a long, id_b long")
    return spark.read.parquet(pairs_dir).select("id_a", "id_b").distinct()


def _neardup_merge_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    postings_dir: str,
    pairs_dir: str,
    bands: int = 8,
    rows: int = 2,
    k: int = 3,
    max_postings: int | None = None,
) -> None:
    """One micro-batch of the near-dup detection, module-level so the
    replay test can invoke it twice with the SAME batch_id and pin both
    compacted sinks unchanged. A replay AFTER the postings append lands
    re-derives each batch-internal pair a second time through the
    cross-vs-registry join — but normalization to (least, greatest) makes
    those rows byte-identical to the originals, so the read-side distinct
    absorbs them. Same checkpoint caveat as _exact_merge_batch."""
    from kgc.operators.dedup import doc_shingles, minhash_band_keys

    bk = (
        minhash_band_keys(doc_shingles(batch_df, k), bands, rows)
        .withColumn("batch_id", F.lit(batch_id).cast("long"))
        .select("batch_id", "id", "band_idx", "band_key")
        .persist()
    )
    try:
        prior = read_postings(spark, postings_dir).select(
            F.col("id").alias("_pid"), "band_idx", "band_key"
        )
        cross = bk.join(prior, ["band_idx", "band_key"]).filter(
            F.col("id") != F.col("_pid")
        ).select("id", F.col("_pid").alias("_oid"))
        internal = (
            bk.select("id", "band_idx", "band_key")
            .join(
                bk.select(F.col("id").alias("_oid"), "band_idx", "band_key"),
                ["band_idx", "band_key"],
            )
            .filter(F.col("id") < F.col("_oid"))
            .select("id", "_oid")
        )
        pairs = (
            cross.unionByName(internal)
            .select(
                F.least("id", "_oid").alias("id_a"),
                F.greatest("id", "_oid").alias("id_b"),
            )
            .distinct()
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        )
        pairs.write.mode("append").parquet(pairs_dir)
        post = bk
        if max_postings is not None:
            full = (
                prior.groupBy("band_idx", "band_key")
                .agg(F.count("*").alias("_m"))
                .filter(F.col("_m") >= max_postings)
                .drop("_m")
            )
            post = bk.join(full, ["band_idx", "band_key"], "left_anti")
        post.write.mode("append").parquet(postings_dir)
    finally:
        bk.unpersist()


def streaming_near_dedup(
    spark: SparkSession,
    docs_path: str,
    postings_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    bands: int = 8,
    rows: int = 2,
    k: int = 3,
    max_postings: int | None = None,
    query_name: str = "kgc_stream_neardup",
    compact: bool = False,
) -> DataFrame:
    """Incremental NEAR-duplicate candidate detection — the banded-MinHash
    twin of streaming_exact_dedup, closing the streaming side of the dedup
    family (exact + near-dup).

    Each micro-batch computes its docs' b×r band keys
    (kgc/operators/dedup.minhash_band_keys — same keys as the batch path),
    emits candidate pairs two ways — against the PRIOR posting registry
    (cross-arrival dups) and batch-internally (same-batch dups) — then
    appends its own keys to the registry. Pairs are normalized to
    (least, greatest) so a crash-mid-batch replay (at-least-once) re-emits
    byte-identical rows whether or not the postings append already
    happened; both sinks dedup on read via distinct. With no cap the
    accumulated pair set equals the BATCH banding exactly, regardless of
    arrival order or batch boundaries (tested two-chunk).

    `compact=True` rewrites both sinks to merged form after the drain
    (quiesced + committed by construction at that point — see
    streaming_exact_dedup).

    `max_postings` is the registry-side rendering of the batch hot-bucket
    cap: a band key stops ACCEPTING postings at the cap (later arrivals
    still pair against the kept members), bounding the per-arrival join
    fan-out on template-heavy corpora — deterministic given file order,
    though (like any online cap) not arrival-order-free, so it is off by
    default and the gate equality runs uncapped. The batch keep-min policy
    stays the compaction-time answer for giant clusters.

    Returns the distinct candidate pairs accumulated so far.
    """
    from kgc.streaming.touches import _read_stream

    docs = _read_stream(spark, docs_path).select("doc_id", "text")
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        _neardup_merge_batch(
            spark, batch_df, batch_id, postings_dir, pairs_dir,
            bands=bands, rows=rows, k=k, max_postings=max_postings,
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
        compact_postings(spark, postings_dir)
        compact_pairs(spark, pairs_dir)
    return read_candidate_pairs(spark, pairs_dir)


# ---------------------------------------------------------------------------
# Streaming decontamination (op-44 × op-50)
# ---------------------------------------------------------------------------


def read_contamination_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """Accumulated (train_id, bench_id, n_common, containment) rows.
    distinct() absorbs at-least-once replays (replayed rows are
    byte-identical, keyed by batch_id before the projection)."""
    _recover_orphan(pairs_dir)
    if not os.path.isdir(pairs_dir):
        return spark.createDataFrame(
            [], "train_id long, bench_id long, n_common long, containment double"
        )
    return (
        spark.read.parquet(pairs_dir)
        .select("train_id", "bench_id", "n_common", "containment")
        .distinct()
    )


def streaming_decontam(
    spark: SparkSession,
    docs_path: str,
    bench: DataFrame,
    pairs_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    min_overlap: int = 2,
    max_bench_df: int | None = 64,
    train_filter=None,
    query_name: str = "kgc_stream_decontam",
    compact: bool = False,
) -> DataFrame:
    """Incremental test-set decontamination — the streaming twin of
    contamination_pairs, completing the streaming curation trio
    (exact dedup + near-dup + decontam).

    The benchmark dim is STATIC by definition (a held-out eval set is
    frozen while a corpus streams in), so its capped exploded shingle
    table is computed ONCE (bench_shingles_exploded — identical bench-side
    rule as the batch operator, stop-shingle cap included), materialized
    with localCheckpoint, and broadcast into every micro-batch join.
    Decontamination is per-document STATELESS — a train doc's pairs depend
    only on its own shingles and the static dim — so the accumulated pair
    set equals the batch operator EXACTLY for any arrival order or batch
    boundaries (no registry, no cross-batch state at all). Appended rows
    carry batch_id, making replays byte-identical; the read side dedups
    with distinct.

    ``train_filter``: optional Column predicate selecting which streamed
    docs are training docs (e.g. excluding the benchmark slice itself when
    both stream from the same table).
    """
    from kgc.operators.dedup import bench_shingles_exploded, doc_shingles
    from kgc.streaming.touches import _read_stream

    b = bench_shingles_exploded(bench, k, max_bench_df).localCheckpoint(eager=True)
    docs = _read_stream(spark, docs_path).select("doc_id", "text")
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.filter(train_filter) if train_filter is not None else batch_df
        tsh = doc_shingles(batch, k)
        t = tsh.select(
            F.col("id").alias("train_id"),
            F.size("sh").alias("_n_train"),
            F.explode_outer("sh").alias("shingle"),
        )
        pairs = (
            t.join(F.broadcast(b), "shingle")
            .groupBy("train_id", "bench_id", "_n_train")
            .agg(F.count("*").alias("n_common"))
            .filter(F.col("n_common") >= min_overlap)
            .select(
                F.lit(batch_id).alias("batch_id"),
                "train_id",
                "bench_id",
                "n_common",
                F.round(F.col("n_common") / F.col("_n_train"), 6).alias("containment"),
            )
        )
        pairs.write.mode("append").parquet(pairs_dir)

    q = (
        docs.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()
    if compact:
        compact_contamination_pairs(spark, pairs_dir)
    return read_contamination_pairs(spark, pairs_dir)


# ---------------------------------------------------------------------------
# Sink compaction (VERDICT r3 #4): rewrite the append logs to merged form
# ---------------------------------------------------------------------------
#
# Every sink above is an APPEND log that its read_* helper merges on read
# (distinct / groupBy) — correct but O(history) per drain: a year-old stream
# re-distincts every partial ever appended. These batch jobs rewrite a log to
# its merged form so reads cost O(live state); they are the engine's rendering
# of the standard log-structured compaction (Kafka compacted topics, Iceberg
# rewrite_data_files, the RocksDB L0→L1 merge).
#
# Contract (tested in tests/test_streaming.py::TestSinkCompaction):
# - equal-on-read: every read_* helper returns the identical rowset before
#   and after compaction, and a stream RESUMED after compaction keeps
#   producing oracle-equal results (the merge logic never distinguishes
#   compacted from raw rows).
# - idempotent: compacting twice is a no-op rewrite.
# - QUIESCED streams only: run while no streaming query is writing the sink
#   and its last batch is checkpoint-committed. Compaction folds batch_ids
#   into the -1 sentinel, so an UNCOMMITTED batch replayed afterwards would
#   no longer be absorbed byte-identically (the registry would double-count
#   it). Same precondition every log compactor has; at 100 TB the periodic
#   compaction slot sits between drains of an availableNow pipeline.
#
# The rewrite is crash-safe via rename ordering (write tmp → move old away →
# move tmp in → drop old): a crash leaves either the original or the
# compacted log plus a stale temp dir, never a half-deleted sink. (A table
# format with atomic snapshot commit — Iceberg/Delta — replaces this dance
# with one metadata swap; kgc/sources/catalog.py documents that seam.)


def _swap_rewrite(df: DataFrame, path: str) -> None:
    """Materialize `df` (which may read from `path`) into a temp dir, then
    swap it in place of `path` via two renames.

    Crash-safety (ADVICE r4): a crash BETWEEN the two renames leaves the
    sole copy at `.compact-old` with nothing at `path`. _recover_orphan
    (called here and by every read_* helper, so `df` was never built from
    the orphaned-empty state) rolls it back before anything destructive;
    the rmtree of a stale `.compact-old` only ever runs when `path` exists,
    i.e. when the old dir really is a superseded copy."""
    tmp, old = path.rstrip("/") + ".compact-tmp", path.rstrip("/") + ".compact-old"
    _recover_orphan(path)
    shutil.rmtree(tmp, ignore_errors=True)
    if os.path.isdir(path):  # never drop .compact-old unless path survives
        shutil.rmtree(old, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)  # materializes BEFORE the swap
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def compact_registry(spark: SparkSession, registry_dir: str) -> None:
    """Fold the exact-dedup registry's per-batch partials into one row per
    content hash: (batch_id=-1, content_hash, Σn, min min_doc) — exactly
    what read_registry computes on read, persisted."""
    if not os.path.isdir(registry_dir):
        return
    merged = read_registry(spark, registry_dir).select(
        F.lit(_COMPACTED_BATCH_ID).cast("long").alias("batch_id"),
        "content_hash", "n", F.col("keep_doc_id").alias("min_doc"),
    )
    _swap_rewrite(merged, registry_dir)


def compact_uniques(spark: SparkSession, uniques_dir: str) -> None:
    """Rewrite the uniques sink to one row per content hash (ADVICE r4 —
    previously the only sink without a compactor: byte-identical replayed
    rows accumulated and read_uniques stayed a distinct over full
    history)."""
    _recover_orphan(uniques_dir)
    if not os.path.isdir(uniques_dir):
        return
    merged = read_uniques(spark, uniques_dir).select(
        F.lit(_COMPACTED_BATCH_ID).cast("long").alias("batch_id"),
        "content_hash", "first_doc_id",
    )
    _swap_rewrite(merged, uniques_dir)


def compact_postings(spark: SparkSession, postings_dir: str) -> None:
    """Rewrite the near-dup posting log to its distinct (id, band_idx,
    band_key) set under the sentinel batch_id."""
    if not os.path.isdir(postings_dir):
        return
    merged = read_postings(spark, postings_dir).select(
        F.lit(_COMPACTED_BATCH_ID).cast("long").alias("batch_id"),
        "id", "band_idx", "band_key",
    )
    _swap_rewrite(merged, postings_dir)


def compact_pairs(spark: SparkSession, pairs_dir: str) -> None:
    """Rewrite the near-dup candidate-pair log to its distinct pair set."""
    if not os.path.isdir(pairs_dir):
        return
    merged = read_candidate_pairs(spark, pairs_dir).select(
        F.lit(_COMPACTED_BATCH_ID).cast("long").alias("batch_id"), "id_a", "id_b"
    )
    _swap_rewrite(merged, pairs_dir)


def compact_contamination_pairs(spark: SparkSession, pairs_dir: str) -> None:
    """Rewrite the decontamination pair log to its distinct row set."""
    if not os.path.isdir(pairs_dir):
        return
    merged = read_contamination_pairs(spark, pairs_dir).select(
        F.lit(_COMPACTED_BATCH_ID).cast("long").alias("batch_id"),
        "train_id", "bench_id", "n_common", "containment",
    )
    _swap_rewrite(merged, pairs_dir)
