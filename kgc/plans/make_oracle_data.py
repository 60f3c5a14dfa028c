"""Materialize the deterministic sf0.01 synthetic corpus for the DuckDB
oracle (driver correctness gate).

DuckDB has no xxhash64, so it cannot re-run the generator formulas; instead
the generator output (documents + alias edges) is materialized once —
deterministic, seed 42, byte-stable — and BOTH engines derive everything
downstream from these files through independent implementations:

  Spark:  real operators (extraction UDFs, CC loop, windows, joins)
  DuckDB: independent ANSI SQL (regexp_extract, recursive CTE, windows)

triples.parquet is also materialized so downstream per-operator oracles
(attribution / similarity / recommend) check operator semantics in isolation;
the extraction oracle (kg_triples) guards that file's content end-to-end.

Run: python kgc/plans/make_oracle_data.py   (writes data/oracle/sf0.01/)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

ORACLE_SF = 0.01
ORACLE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "data", "oracle", "sf0.01")


def materialize(spark, out_dir: str = ORACLE_DIR) -> None:
    from kgc.operators.canon import entities_canon_map, salted_dedup
    from kgc.operators.extract import extract_mentions
    from kgc.operators.link import link_mentions, mentions_to_long
    from kgc.operators.spans import explode_spans
    from kgc.operators.triples import assemble_triples, canonical_triples
    from kgc.sources.synth import alias_catalog, alias_edges, synth_documents

    docs = synth_documents(spark, ORACLE_SF)
    docs.coalesce(4).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
    # JSONL rendering of the first 500 docs (source-format coverage query)
    docs.filter("doc_id < 'doc-0000000500'").coalesce(1).write.mode("overwrite").json(
        os.path.join(out_dir, "documents_jsonl")
    )

    catalog = alias_catalog(spark, ORACLE_SF)
    edges = salted_dedup(alias_edges(catalog), ["src", "dst"])
    edges.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "alias_edges.parquet"))

    linked = link_mentions(mentions_to_long(extract_mentions(explode_spans(docs))), catalog)
    triples = canonical_triples(assemble_triples(linked), entities_canon_map(edges))
    triples.coalesce(4).write.mode("overwrite").parquet(os.path.join(out_dir, "triples.parquet"))


def ensure_materialized(spark) -> str:
    """Idempotent: generate only when missing (the files are committed)."""
    if not os.path.exists(os.path.join(ORACLE_DIR, "triples.parquet")):
        materialize(spark)
    return ORACLE_DIR


if __name__ == "__main__":
    from kgc.session import get_spark

    spark = get_spark(app_name="kgc-oracle-data")
    materialize(spark)
    print(f"materialized oracle corpus → {ORACLE_DIR}")
    spark.stop()
