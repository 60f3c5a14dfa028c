"""op-60: deterministic longest-match subword tokenizer (VERDICT r4 #2).

pack_greedy and quality_features count tokens with a whitespace/BPE-ish
regex proxy — fine for gate determinism, but a training pipeline budgets
context windows against a real subword vocabulary, and the proxy drifts
vs actual tokenizer counts (measured on the driver corpus: see
SURVEY.md §12). This operator is the engine's tokenizer-fidelity counter:
greedy longest-match (WordPiece-inference shape) over the committed
synthetic vocab data/vocab/subword_vocab_v1.txt (kgc/plans/make_vocab.py).

Pinned semantics (SURVEY §2.4 contract, mirrored by the DuckDB
recursive-CTE oracle in __spark_entry__):

- words = whitespace-split of trim(text); NULL/empty text → 0 tokens.
- per word, left to right: consume the LONGEST vocab token matching at
  the cursor; if none matches, consume exactly ONE character (the
  unknown token counts 1 regardless of vocab membership, so the vocab
  only ever holds tokens of length ≥ 2).
- n_subword_tokens(doc) = Σ over its words.

Scale shape: tokenization is a pure function of the word and corpus word
vocabularies are tiny relative to row counts (the op-12 entity-linking
lesson), so the ITERATOR pandas UDF dedups each Arrow batch to its
distinct words and carries a cross-batch cache per Python worker; the
vocab set rides once per worker in the serialized closure (a few KB —
same mechanism as the SRP plane constants). Per-row cost at 10^12 docs:
dict lookups; the longest-match loop runs only once per distinct word.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_VOCAB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data", "vocab", "subword_vocab_v1.txt",
)


def load_vocab(path: str = DEFAULT_VOCAB_PATH) -> list[str]:
    """The committed vocab, one token per line (sorted; order is
    irrelevant to longest-match — the set is the vocabulary)."""
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def count_word_subwords(word: str, vocab: frozenset[str], max_len: int) -> int:
    """Greedy longest-match token count for one word — the pure fold the
    property tests exercise without a SparkSession."""
    n, i, length = 0, 0, len(word)
    while i < length:
        step = 1
        for cand in range(min(max_len, length - i), 1, -1):
            if word[i : i + cand] in vocab:
                step = cand
                break
        n += 1
        i += step
    return n


def subword_count_udf(vocab: list[str]):
    """Iterator pandas UDF: text → subword token count under `vocab`.

    Closure-captured vocab set + a distinct-word cache that lives for the
    worker's task lifetime (op-12/46 pattern). NULL text yields 0 — the
    pack_greedy NULL rule, applied inside the UDF so callers need no
    coalesce."""
    vset = frozenset(vocab)
    max_len = max(map(len, vocab), default=1)

    @F.pandas_udf(T.LongType())
    def _count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, int] = {}
        for texts in batches:
            out = []
            for txt in texts:
                if txt is None:
                    out.append(0)
                    continue
                total = 0
                for w in str(txt).split():
                    c = cache.get(w)
                    if c is None:
                        c = cache[w] = count_word_subwords(w, vset, max_len)
                    total += c
                out.append(total)
            yield pd.Series(out, dtype="int64")

    return _count


def subword_token_counts(
    docs: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_subword_tokens) for every document — the DataFrame
    surface pack_greedy and the curation DAG consume."""
    return docs.select(
        id_col, subword_count_udf(vocab)(F.col(text_col)).alias("n_subword_tokens")
    )


def subword_count_col(vocab: list[str], text_col: str = "text") -> Column:
    """The same counter as a Column expression, for operators that embed
    the count in a wider projection (pack_greedy's tokenizer='subword')."""
    return subword_count_udf(vocab)(F.col(text_col))
