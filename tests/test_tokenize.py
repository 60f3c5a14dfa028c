"""op-60: deterministic longest-match subword tokenizer — pure-function
closed forms, Spark-path equality, pack_greedy integration, and the
vocab-generator determinism the committed artifact depends on."""

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kgc.operators.sample import greedy_bins, pack_greedy
from kgc.operators.tokenize import (
    DEFAULT_VOCAB_PATH,
    count_word_subwords,
    load_vocab,
    subword_token_counts,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = ["cus", "custom", "er", "scan", "ta", "ble", "tomer"]
VSET = frozenset(VOCAB)
MAXLEN = max(map(len, VOCAB))


class TestPureFunction:
    def test_closed_forms(self):
        # longest match wins: custom(6) + er(2), not cus + tomer
        assert count_word_subwords("customer", VSET, MAXLEN) == 2
        assert count_word_subwords("scan", VSET, MAXLEN) == 1
        assert count_word_subwords("table", VSET, MAXLEN) == 2  # ta + ble
        assert count_word_subwords("xyz", VSET, MAXLEN) == 3    # 3 unknown chars
        assert count_word_subwords("", VSET, MAXLEN) == 0
        # unknown single char between matches: ta|q|ble
        assert count_word_subwords("taqble", VSET, MAXLEN) == 3

    @given(st.text(alphabet="custoerbl", max_size=24))
    @settings(max_examples=200, deadline=None)
    def test_invariants(self, word):
        n = count_word_subwords(word, VSET, MAXLEN)
        if word:
            # every step consumes 1..MAXLEN chars
            assert -(-len(word) // MAXLEN) <= n <= len(word)
        else:
            assert n == 0
        # empty vocab degenerates to char count
        assert count_word_subwords(word, frozenset(), 1) == len(word)


class TestSparkPath:
    def test_matches_pure_function_and_null_rule(self, spark):
        rows = [(1, "customer scan table"), (2, "xyz"), (3, None), (4, "  "), (5, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["n_subword_tokens"]
               for r in subword_token_counts(df, VOCAB).collect()}
        want = {
            1: 2 + 1 + 2,
            2: 3,
            3: 0,   # NULL text -> 0 (the pack_greedy rule, inside the UDF)
            4: 0,   # whitespace-only: no words
            5: 0,
        }
        assert got == want

    def test_committed_vocab_loads_and_counts(self, spark):
        vocab = load_vocab(DEFAULT_VOCAB_PATH)
        assert len(vocab) > 100 and all(len(t) >= 2 for t in vocab)
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = subword_token_counts(docs, vocab)
        row = out.agg(F.sum("n_subword_tokens"), F.count("*")).collect()[0]
        assert row[0] > 0 and row[1] == docs.count()


class TestPackIntegration:
    def test_subword_pack_matches_pure_fold(self, spark):
        docs = spark.createDataFrame(
            [(i, "customer scan table xyz " * (1 + i % 4)) for i in range(40)]
            + [(40, None)],
            "doc_id long, text string",
        )
        budget = 12
        got = pack_greedy(docs, budget=budget, n_shards=3,
                          tokenizer="subword", vocab=VOCAB)
        rows = got.collect()
        # counts match the pure tokenizer...
        per_word = 2 + 1 + 2 + 3  # customer scan table xyz
        for r in rows:
            want = 0 if r["id"] == 40 else per_word * (1 + r["id"] % 4)
            assert r["n_tokens"] == want
        # ...and the fold is the same greedy_bins reference as the ws path
        for shard in {r["shard_id"] for r in rows}:
            srows = sorted((r for r in rows if r["shard_id"] == shard),
                           key=lambda r: r["id"])
            assert [r["bin_id"] for r in srows] == greedy_bins(
                [r["n_tokens"] for r in srows], budget
            )

    def test_bad_args_raise(self, spark):
        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="requires an explicit vocab"):
            pack_greedy(docs, tokenizer="subword")
        with pytest.raises(ValueError, match="unknown tokenizer"):
            pack_greedy(docs, tokenizer="bpe")


class TestQualityFeaturesOptIn:
    def test_schema_unchanged_by_default_and_column_added_with_vocab(self, spark):
        from kgc.operators.curate import quality_features

        docs = spark.createDataFrame(
            [(1, "the customer and the scan of a table")], "doc_id long, text string"
        )
        base = quality_features(docs)
        assert "n_subword_tokens" not in base.columns
        ext = quality_features(docs, vocab=VOCAB)
        assert ext.columns == base.columns + ["n_subword_tokens"]
        assert (
            ext.select("n_subword_tokens").collect()[0][0]
            == subword_token_counts(docs, VOCAB).collect()[0]["n_subword_tokens"]
        )


class TestVocabGenerator:
    def test_deterministic_ranked_and_min_len(self):
        from kgc.plans.make_vocab import MAX_LEN, MIN_LEN, build_vocab

        texts = ["aa bb aa cc", "aa bb dd", None, ""]
        v1 = build_vocab(texts, 3)
        v2 = build_vocab(list(texts), 3)
        assert v1 == v2 == sorted(v1)
        assert all(MIN_LEN <= len(t) <= MAX_LEN for t in v1)
        assert "aa" in v1  # most frequent bigram survives any top-3 cut

    def test_committed_file_reproducible(self):
        """The committed vocab must equal a fresh derivation from its
        documented source (the CLAUDE.md committed-corpus discipline)."""
        import duckdb

        from kgc.plans.make_vocab import SOURCE_PARQUET, build_vocab

        texts = [
            r[0]
            for r in duckdb.connect()
            .execute(f"SELECT text FROM read_parquet('{SOURCE_PARQUET}') ORDER BY doc_id")
            .fetchall()
        ]
        assert build_vocab(texts, 512) == load_vocab(DEFAULT_VOCAB_PATH)
