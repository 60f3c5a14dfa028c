"""Tests for the training-data dedup / similarity-search operators."""


from pyspark.sql import functions as F

from kgc.operators.dedup import (
    _simhash64,
    ann_topk_lsh,
    embedding_near_dup,
    simhash_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


class TestSimHash:
    def test_identical_and_near_identical(self, spark):
        docs = spark.createDataFrame(
            [
                ("a", "the quick brown fox jumps over the lazy dog"),
                ("b", "the quick brown fox jumps over the lazy dog"),  # identical
                ("c", "the quick brown fox leaps over the lazy dog"),  # 1-word diff
                ("d", "completely different content about spark query engines"),
            ],
            "doc_id string, text string",
        )
        pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=12).collect()}
        assert pairs[("a", "b")] == 0
        assert ("a", "c") in pairs and pairs[("a", "c")] <= 12
        assert not any("d" in p for p in pairs)

    def test_fingerprint_deterministic(self):
        assert _simhash64("hello world") == _simhash64("hello world")
        assert _simhash64("hello world") != _simhash64("goodbye world")

    def test_band_recall_guarantee(self):
        # Hamming <= 3 flips touch at most 3 of the 4 bands → at least one
        # 16-bit band stays identical (pigeonhole): band-equality blocking
        # has exact recall at the threshold
        base = 0x1A2B3C4D5E6F0718
        flipped = base ^ 0b111  # Hamming 3
        bands_equal = sum(
            ((base >> (b * 16)) & 0xFFFF) == ((flipped >> (b * 16)) & 0xFFFF) for b in range(4)
        )
        assert bin(base ^ flipped).count("1") == 3 and bands_equal >= 1


class TestEmbeddingNearDup:
    def test_candidates_are_verified_exact(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        nd = embedding_near_dup(emb, threshold=0.8)
        rows = nd.collect()
        # every emitted pair respects the threshold and ordering invariant
        assert all(r["cosine"] >= 0.8 for r in rows)
        assert all(r["id_a"] < r["id_b"] for r in rows)

    def test_ann_lsh_recall_vs_brute_force(self, spark):
        import __spark_entry__ as E

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        brute = E.q_ann_cosine_topk(spark, SF_DIR)  # exact top-5 for vec_id<20
        approx = ann_topk_lsh(emb, k=5).filter(F.col("q_id") < 20)
        hits = brute.select("q_id", "vec_id").intersect(approx.select("q_id", "vec_id")).count()
        total = brute.count()
        assert total > 0
        recall = hits / total
        assert recall >= 0.5, recall  # banded LSH catches most true neighbors
