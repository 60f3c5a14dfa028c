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


def _quality_exprs(text_col: str) -> dict:
    """The quality formula's shared sub-expressions — ONE source for
    quality_features and quality_score_col (the ADVICE-r5 rule: the formula
    must not fork across consumers)."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.size(tokens)
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
    return {
        "n_tok": n_tok,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality": quality,
    }


def quality_score_col(text_col: str = "text"):
    """The composite quality heuristic as ONE guarded column expression —
    0.0 for NULL/empty text (the run_curation rule), the quality_features
    formula otherwise. The `when` guard keeps ANSI division safe (branch
    expressions are only evaluated where the condition holds), so a
    consumer that needs quality_score on EVERY doc row can compute it
    map-only instead of scoring the non-empty slice and left-joining it
    back (two full-corpus exchanges + a sort, r6)."""
    quality = _quality_exprs(text_col)["quality"]
    return F.when(F.length(F.col(text_col)) > 0, quality).otherwise(F.lit(0.0))


def quality_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: list[str] | None = None,
) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_bpe_tokens, stopword_ratio,
    punct_ratio, quality_score) — whitespace + BPE-ish token counts,
    stopword/punctuation ratios, and the composite quality heuristic
    (reward stopword presence = natural prose; penalize punctuation soup
    and extreme lengths).

    ``vocab`` (op-60, opt-in) appends an n_subword_tokens column — the
    longest-match count a token-budgeted consumer actually pays. Default
    None keeps the gate schema bit-identical."""
    q = _quality_exprs(text_col)
    n_tok, stop_ratio, punct_ratio, quality = (
        q["n_tok"], q["stop_ratio"], q["punct_ratio"], q["quality"]
    )
    n_bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 1))
    cols = [
        id_col,
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality_score"),
    ]
    if vocab is not None:
        from kgc.operators.tokenize import subword_count_col

        cols.append(subword_count_col(vocab, text_col).alias("n_subword_tokens"))
    return docs.select(*cols)


def quality_gate(
    docs: DataFrame,
    min_quality: float = 0.1,
    max_repetition: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """op-62 batch form (r5): the combined quality + repetition admission
    rule as ONE operator — (doc_id, quality_score, rep_score) for every
    doc passing quality_score ≥ min_quality AND rep_score ≤
    max_repetition, where rep_score = max(dup_line_fraction,
    top_bigram_fraction). Missing feature rows (empty/whitespace-only
    text) score 0.0 (the run_curation rule). Pure per-document — which is
    what makes the streaming twin (kgc/streaming/quality.py) exactly
    batch-equal for any arrival order or batch boundaries."""
    feats = quality_features(
        docs.filter(F.length(text_col) > 0), text_col, id_col
    ).select(id_col, "quality_score")
    rep = repetition_features(docs, id_col, text_col).select(
        id_col,
        F.greatest("dup_line_fraction", "top_bigram_fraction").alias("rep_score"),
    )
    scored = (
        docs.select(id_col)
        .join(feats, id_col, "left")
        .join(rep, id_col, "left")
        .select(
            id_col,
            F.coalesce("quality_score", F.lit(0.0)).alias("quality_score"),
            F.coalesce("rep_score", F.lit(0.0)).alias("rep_score"),
        )
    )
    return scored.filter(
        (F.col("quality_score") >= min_quality) & (F.col("rep_score") <= max_repetition)
    )


# Interpolated into BOTH engines' renderings (the test mirrors it in DuckDB).
REPETITION_NGRAM = 2


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals (r4) — the standard pretraining
    quality rules the ratio features above don't catch: boilerplate and
    template spam look like natural prose per-token but repeat themselves.

    - dup_line_fraction: 1 − distinct_lines/lines ('\\n'-split, verbatim).
    - top_bigram_fraction: occurrences of the doc's most frequent
      lowercased word 2-gram / total 2-grams (0.0 when the doc has <2
      words). Thresholding ~0.18 (Gopher) flags list/template spam.

    Scale shape: dup_line_fraction is map-only (array_distinct per row);
    the bigram mode NEEDS the explode → two-stage agg rendering — the
    tempting pure higher-order form (per-distinct-gram filter scan) is
    O(tokens²) per doc and dies on a 5k-token doc. One shuffle keyed by
    (doc, gram) with map-side partial aggregation, then a doc-keyed join
    that co-locates on doc_id-bucketed tables. Deterministic; mirrored in
    DuckDB by tests/test_ops_core.py::TestRepetitionFeatures (same rigor
    as the gate, kept out of the 57-query registry — see SURVEY §11 on
    the harness budget).

    Docs with empty/whitespace-only text are dropped (no lines/grams are
    defined for them — the quality_features ANSI rule).
    """
    from kgc.operators.dedup import shingles_col

    t = docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    base = t.select(
        F.col(id_col),
        F.split(F.col(text_col), "\n").alias("_lines"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_w"),
    )
    dup_line = F.round(
        F.lit(1.0) - F.size(F.array_distinct("_lines")) / F.size("_lines"), 6
    )
    # size >= k guard BEFORE shingles_col: Spark's sequence(1, 0) counts
    # DOWN ([1, 0]) and slice(start=0) throws — same reason doc_shingles
    # word-count-filters first. Sub-k docs re-enter via the left join as
    # top_bigram_fraction 0.0.
    grams = base.filter(F.size("_w") >= REPETITION_NGRAM).select(
        id_col, F.explode(shingles_col("_w", REPETITION_NGRAM)).alias("g")
    )
    top = (
        grams.groupBy(id_col, "g")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_mx"), F.sum("_c").alias("_tot"))
    )
    return (
        base.select(id_col, dup_line.alias("dup_line_fraction"))
        .join(top, id_col, "left")
        .select(
            id_col,
            "dup_line_fraction",
            F.round(F.coalesce(F.col("_mx") / F.col("_tot"), F.lit(0.0)), 6).alias(
                "top_bigram_fraction"
            ),
        )
    )
