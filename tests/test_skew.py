"""T6: planted-skew tests — salted paths must equal unsalted results."""

from pyspark.sql import functions as F

from kgc.operators.skew import hot_keys, salted_join
from kgc.operators.similarity import hot_activities, touch_items
from kgc.sources.synth import ground_truth_triples


class TestSaltedJoin:
    def test_equals_plain_join_on_skewed_data(self, spark):
        # 90% of big rows share one key — the planted-skew shape
        big = spark.range(2000).select(
            F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
            F.col("id").alias("v"),
        )
        small = spark.createDataFrame(
            [("hot", 1), ("k9", 2), ("missing", 3)], "k string, w int"
        )
        plain = {tuple(r) for r in big.join(small, "k").collect()}
        salted = {tuple(r) for r in salted_join(big, small, "k", n_salt=8).collect()}
        assert plain == salted
        assert len(plain) == 1801  # 1800 hot rows + the one k9 row

    def test_deterministic_across_runs(self, spark):
        big = spark.range(500).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
        small = spark.createDataFrame([("hot", 9)], "k string, w int")
        a = sorted(map(tuple, salted_join(big, small, "k").collect()))
        b = sorted(map(tuple, salted_join(big.repartition(7), small, "k").collect()))
        assert a == b  # row-hash salting is partitioning-invariant

    def test_hot_key_detection(self, spark):
        df = spark.range(100).select(
            F.when(F.col("id") < 60, F.lit("hot")).otherwise(F.col("id").cast("string")).alias("k")
        )
        assert [r["k"] for r in hot_keys(df, "k", threshold=10).collect()] == ["hot"]


class TestPlantedHotActivity:
    def test_stoplist_catches_only_planted_key(self, spark):
        gt = ground_truth_triples(spark, 0.001)
        stop = hot_activities(touch_items(gt))
        assert [r["act"] for r in stop.collect()] == [0]


class TestSaltedSimilarity:
    def test_salted_hot_path_equals_plain(self, spark):
        """The SURVEY T6 promise: with the planted hot activity routed
        through the salted triangular self-join, pair counts and similarity
        values equal the unsalted exact path exactly."""
        from kgc.operators.similarity import candidate_pairs_exact, score_pairs

        gt = ground_truth_triples(spark, 0.001)
        items = touch_items(gt).cache()
        hot = hot_activities(items)
        plain = score_pairs(candidate_pairs_exact(items))
        salted = score_pairs(candidate_pairs_exact(items, hot_acts=hot, n_salt=4))
        a = sorted(map(tuple, plain.collect()), key=repr)
        b = sorted(map(tuple, salted.collect()), key=repr)
        assert a == b
