"""op-06 explode_spans / op-09 reassemble_spans / op-07 filter_kind.

The per-row invariant the whole pipeline must preserve (BASELINE.json
input_hint): span-sequence equality — (kind, text, media_ref, order) of every
document survives an explode → process → reassemble round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_spans(docs: DataFrame) -> DataFrame:
    """Flatten docs.spans preserving order; span_idx = array position (op-06).

    posexplode keeps the array position → together with `offset` (strictly
    increasing) either column reconstructs the original order. Documents with
    empty span arrays produce no rows (re-attached by reassemble via all_docs).
    """
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        F.col("span_idx").cast("int"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def filter_kind(spans: DataFrame, kinds: list[str]) -> DataFrame:
    """Route text vs media spans (op-07); predicate pushes to the scan."""
    return spans.filter(F.col("kind").isin(kinds))


def reassemble_spans(spans: DataFrame, all_docs: DataFrame | None = None) -> DataFrame:
    """Regroup flat spans to per-doc ordered arrays (op-09) — DOCS shape.

    Sorts by `offset` (the order key named by the invariant). When `all_docs`
    (a DataFrame with a doc_id column) is supplied, docs with zero spans are
    re-attached with an empty array — a groupBy alone would drop them.
    """
    grouped = spans.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("offset", "kind", "text", "media_ref"))),
            lambda x: F.struct(
                x["kind"].alias("kind"),
                x["text"].alias("text"),
                x["media_ref"].alias("media_ref"),
                x["offset"].alias("offset"),
            ),
        ).alias("spans")
    )
    if all_docs is None:
        return grouped
    empty = F.array().cast(grouped.schema["spans"].dataType)
    return (
        all_docs.select("doc_id")
        .join(grouped, "doc_id", "left")
        .select("doc_id", F.coalesce("spans", empty).alias("spans"))
    )


def span_sequence_fingerprint(docs: DataFrame) -> DataFrame:
    """Per-doc fingerprint of the (kind, text, media_ref, order) sequence —
    equality of fingerprints proves the per-row span-sequence invariant."""
    return docs.select(
        "doc_id",
        F.xxhash64(
            F.to_json(
                F.transform(
                    "spans",
                    lambda x: F.struct(
                        x["kind"].alias("kind"), x["text"].alias("text"), x["media_ref"].alias("media_ref")
                    ),
                )
            )
        ).alias("span_fp"),
        F.size("spans").alias("n_spans"),
    )
