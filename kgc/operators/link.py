"""op-12/14/46: entity linking — candidate generation + batched link scoring.

The reference GraphGist never links (its notebook writes entity ids straight
into Neo4j); here every surface form extracted from text must be resolved
against an entity catalog:

1. candidate generation (op-14): normalize the surface (op-11) and equi-join
   on a blocking key against the **broadcast** catalog — the catalog is a
   dimension (O(entities)), the mentions side is O(docs); broadcasting removes
   the shuffle entirely.
2. scoring (op-12): an **iterator-form pandas UDF** (op-46) scores each
   (surface_key, candidate_key) pair with a blend of normalized Levenshtein
   similarity and token-set Jaccard. Iterator form so per-worker setup happens
   once per Python worker, not once per batch.
3. resolution: ranking window keeps the argmax candidate per mention with a
   pinned tie-break (score DESC, entity_id ASC) — SURVEY.md §2.4.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgc.functions.text import block_key, normalize_surface

LINK_THRESHOLD = 0.3  # candidates scoring below are dropped (no link)


def _lev(a: str, b: str) -> int:
    """Plain Levenshtein distance (no external deps; called per candidate
    pair inside the vectorized batch — pair count is bounded by blocking)."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@F.pandas_udf(T.DoubleType())
def score_links_udf(surface: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    """op-12/46: blend = 0.5·(1 − lev/maxlen) + 0.5·token-Jaccard."""
    for surf, cand in surface:

        def score(pair):
            s, c = pair
            if s is None or c is None:
                return 0.0
            s, c = str(s), str(c)
            maxlen = max(len(s), len(c)) or 1
            lev_sim = 1.0 - _lev(s, c) / maxlen
            st, ct = set(s.split()), set(c.split())
            jac = len(st & ct) / (len(st | ct) or 1)
            return 0.5 * lev_sim + 0.5 * jac

        yield pd.Series(map(score, zip(surf, cand)), index=surf.index, dtype="float64")


def link_mentions(mentions_long: DataFrame, catalog: DataFrame) -> DataFrame:
    """Resolve (mention_role, surface) rows to catalog entity ids.

    mentions_long columns: doc_id, span_idx, match_idx, mention_type, role
    ('individual'|'activity'|'campaign'|'product'), surface.
    Returns those + entity_id, link_score (best candidate above threshold).
    """
    m = mentions_long.withColumn("surface_key", normalize_surface("surface")).withColumn(
        "bkey", block_key("surface")
    )
    cat = catalog.withColumn("bkey", block_key(F.col("surface_key")))
    cands = m.join(
        F.broadcast(cat),
        (m["bkey"] == cat["bkey"]) & (m["role"] == cat["entity_type"]),
        "inner",
    ).select(
        m["doc_id"], m["span_idx"], m["match_idx"], m["mention_type"], m["ts_str"], m["role"],
        m["surface"], m["surface_key"],
        cat["surface_key"].alias("cand_key"), cat["entity_id"],
    )
    scored = cands.withColumn("link_score", score_links_udf(F.col("surface_key"), F.col("cand_key")))
    w = Window.partitionBy("doc_id", "span_idx", "match_idx", "role").orderBy(
        F.col("link_score").desc(), F.col("entity_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("link_score") >= LINK_THRESHOLD))
        .drop("rn", "cand_key")
    )


def mentions_to_long(mentions: DataFrame) -> DataFrame:
    """Unpivot MENTIONS (one row per mention, surface columns by role) into
    (role, surface) rows — stack() stays JVM-side."""
    return mentions.select(
        "doc_id", "span_idx", "match_idx", "mention_type", "ts_str",
        F.expr(
            "stack(4, 'individual', ind_surface, 'activity', act_surface, "
            "'campaign', cmp_surface, 'product', prd_surface) AS (role, surface)"
        ),
    ).filter(F.col("surface").isNotNull())
