"""op-44 deepened: INCREMENTAL KG construction — the streaming twin of the
flagship batch pipeline (SURVEY.md §3.2).

New interleaved documents land in a directory; Structured Streaming drives
the same construction operators the batch path uses:

    file source (DOCS schema) → explode_spans → extract_mentions
    (mapInPandas works unchanged on streams) → link_triples_wide_with_dim
    (stream-static broadcast joins against the PRECOMPUTED resolution
    dimension) → canonical_rewrite (broadcast alias→canonical) → parquet
    sink with checkpoint (exactly-once per input file).

Design points that make this the production shape:

- The resolution dimension and the canonical map are SLOWLY-CHANGING
  DIMENSIONS: the batch pipeline refreshes them (vocabulary resolution is
  O(entities), not O(docs)); the stream performs only stateless projections
  and broadcast probes, so there is NO streaming state to size or expire —
  a watermark-free, unbounded-throughput topology.
- MERGE dedup (§2.4-D) is deliberately NOT in the stream (unbounded state);
  the file-source/checkpoint contract already gives exactly-once per input
  file, and the natural-key dedup remains a batch compaction step — the
  same split Iceberg/Delta streaming writers use.
- `trigger(availableNow=True)` drains the current backlog and stops:
  re-running with the same checkpoint processes ONLY newly-arrived docs
  (incremental resume, tested in tests/test_streaming.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kgc.operators.extract import extract_mentions
from kgc.operators.link import link_triples_wide_with_dim
from kgc.operators.spans import explode_spans
from kgc.operators.triples import canonical_rewrite
from kgc.schemas import DOCS


def streaming_construct(
    spark: SparkSession,
    docs_dir: str,
    resolution_dim: DataFrame,
    entities_canon: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    query_name: str = "kgc_stream_construct",
) -> DataFrame:
    """Drain all currently-available docs in `docs_dir` into the triple sink;
    returns the sink as a batch DataFrame. Idempotent per input file via the
    checkpoint: call again after new docs arrive to process only those."""
    docs = spark.readStream.schema(DOCS).parquet(docs_dir)
    triples = canonical_rewrite(
        link_triples_wide_with_dim(extract_mentions(explode_spans(docs)), resolution_dim),
        entities_canon,
    )
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    q = (
        triples.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(sink_dir):
        # zero input files may leave no sink directory at all; honor the
        # contract (a poller can fire before the first docs land)
        return spark.createDataFrame([], triples.schema)
    # explicit schema: a drained-but-empty sink has only _spark_metadata,
    # and schema inference over zero data files would fail
    return spark.read.schema(triples.schema).parquet(sink_dir)


def bootstrap_dims(spark: SparkSession, docs: DataFrame, sf: float):
    """Batch bootstrap of the two slowly-changing dimensions the stream
    probes: the (role, surface_key) resolution dim and the canonical map.
    In production this is the batch pipeline's periodic refresh."""
    from kgc.operators.canon import entities_canon_map, salted_dedup
    from kgc.operators.link import link_resolution_dim, mentions_to_long
    from kgc.sources.synth import alias_catalog, alias_edges

    catalog = alias_catalog(spark, sf)
    res = link_resolution_dim(
        mentions_to_long(extract_mentions(explode_spans(docs))), catalog
    ).localCheckpoint(eager=True)
    canon = entities_canon_map(
        salted_dedup(alias_edges(catalog), ["src", "dst"])
    ).localCheckpoint(eager=True)
    return res, canon
