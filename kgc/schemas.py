"""Pinned StructTypes for every table in the pipeline (SURVEY.md §1.2).

The reference (graphadvantage/neo4j-binary-cosine-similarity, a Neo4j
GraphGist) is schema-free; this engine is columnar with explicit schemas
everywhere — nothing is ever inferred on a production path.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input table — exactly the BASELINE.json input_hint shape.
# ---------------------------------------------------------------------------

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'text' | 'image' | 'video'
        T.StructField("text", T.StringType(), True),  # NULL for media w/o alt text
        T.StructField("media_ref", T.StringType(), True),  # NULL for text spans
        T.StructField("offset", T.IntegerType(), False),  # strictly increasing
    ]
)

DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN, False), False),
    ]
)

# Exploded-span view (op-06).
SPANS_FLAT = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Extraction / linking
# ---------------------------------------------------------------------------

MENTION = T.StructType(
    [
        T.StructField("mention_type", T.StringType(), False),
        # 'touch' | 'conversion' | 'purchase' | 'media_touch'
        T.StructField("ind_surface", T.StringType(), True),
        T.StructField("act_surface", T.StringType(), True),
        T.StructField("cmp_surface", T.StringType(), True),
        T.StructField("prd_surface", T.StringType(), True),
        T.StructField("ts_str", T.StringType(), True),
        T.StructField("match_idx", T.IntegerType(), False),  # nth match in span
        # KG provenance: character span of the match within the span text
        T.StructField("char_start", T.IntegerType(), False),
        T.StructField("char_end", T.IntegerType(), False),
    ]
)

MENTIONS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        *MENTION.fields,
    ]
)

# Alias catalog: surface_key (normalized) -> entity id (pre-canonical alias id).
ALIAS_CATALOG = T.StructType(
    [
        T.StructField("surface_key", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Triples (the KG edge table) — vocabulary pinned by BASELINE.json north_star.
# ---------------------------------------------------------------------------

TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        # TOUCHED | CONVERTED_BY | PURCHASED (raw);
        # ATTRIBUTED_* | SIMILAR_TO | RECOMMEND (derived)
        T.StructField("obj", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("doc_id", T.StringType(), True),  # provenance
        T.StructField("span_idx", T.IntegerType(), True),
    ]
)

ENTITIES_CANON = T.StructType(
    [
        T.StructField("alias_id", T.StringType(), False),
        T.StructField("canonical_id", T.StringType(), False),
    ]
)

TOUCH_PROFILES = T.StructType(
    [
        T.StructField("individual", T.StringType(), False),
        T.StructField("acts", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("deg", T.IntegerType(), False),
    ]
)

SIMILAR_TO = T.StructType(
    [
        T.StructField("ind_a", T.StringType(), False),
        T.StructField("ind_b", T.StringType(), False),
        T.StructField("similarity", T.DoubleType(), False),
    ]
)

ATTRIBUTIONS = T.StructType(
    [
        T.StructField("individual", T.StringType(), False),
        T.StructField("campaign", T.StringType(), False),
        T.StructField("activity", T.StringType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

RECOMMENDATIONS = T.StructType(
    [
        T.StructField("individual", T.StringType(), False),
        T.StructField("product", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)

STAGE_METRICS = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("fingerprint", T.LongType(), False),
    ]
)
