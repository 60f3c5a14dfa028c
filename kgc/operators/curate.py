"""Document quality features — the canonical impl behind the ts_text_stats
gate query and the curation pipeline's quality stage (kgc/plans/curate.py).

All builtin expressions (regexp_extract_all / size / round) — codegen-
resident, no Python in the path. The DuckDB oracle mirrors every formula
byte-for-byte (__spark_entry__._TEXT_STATS_SQL interpolates the same
constants below), so moving a doc through the pipeline's quality filter is
bit-reproducible cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Interpolated into BOTH the Spark expressions and the DuckDB oracle SQL —
# change here changes both engines together (CLAUDE.md pinned-semantics rule).
STOPWORDS = "(the|and|of|to|in|a|is|that|it|for)"
BPE_RE = r"('s|'t|'re|'ve|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"
BPE_RE_SQL = BPE_RE.replace("'", "''")  # escaped for the SQL string literal


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_bpe_tokens, stopword_ratio,
    punct_ratio, quality_score) — whitespace + BPE-ish token counts,
    stopword/punctuation ratios, and the composite quality heuristic
    (reward stopword presence = natural prose; penalize punctuation soup
    and extreme lengths)."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.size(tokens)
    n_bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 1))
    n_stop = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(rf"\b{STOPWORDS}\b"), 1)
    )
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"([^\w\s])"), 1))
    stop_ratio = F.round(n_stop / n_tok, 6)
    punct_ratio = F.round(n_punct / F.length(text_col), 6)
    quality = F.round(
        F.least(stop_ratio * 4, F.lit(1.0))
        * (1 - F.least(punct_ratio * 5, F.lit(1.0)))
        * F.when((n_tok >= 5) & (n_tok <= 5000), 1.0).otherwise(0.2),
        6,
    )
    return docs.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality_score"),
    )
