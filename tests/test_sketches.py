"""Sketch-aggregate scale paths (op-53): at 100 TB exact quantiles and
exact distinct counts are sort-/shuffle-bound, so the production paths are
the mergeable sketches (approx_percentile = KLL-style, approx_count_distinct
= HyperLogLog++, hll_sketch_agg = Apache DataSketches HLL). These tests pin
(a) their error vs the exact gate specs and (b) MERGEABILITY — the sketch of
a union equals the merge of per-part sketches, which is exactly the
partial-aggregation property that makes them map-side combinable on a
1000-executor cluster."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


class TestApproxPercentile:
    def test_within_accuracy_bound_of_exact(self, lineitem):
        """approx_percentile(acc=10000) must land within a small relative
        error of the exact percentile spec (q_rel_quantiles_lineitem) at
        every probed p — the bound the scale path substitutes under."""
        ps = [0.25, 0.5, 0.75, 0.9, 0.99]
        row = lineitem.agg(
            F.percentile("l_extendedprice", F.lit(ps)).alias("exact"),
            F.approx_percentile("l_extendedprice", F.lit(ps), F.lit(10000)).alias("approx"),
        ).collect()[0]
        for e, a in zip(row["exact"], row["approx"]):
            assert abs(a - e) / e < 0.01, (e, a)


class TestApproxCountDistinct:
    def test_within_rsd_of_exact(self, lineitem):
        row = lineitem.agg(
            F.countDistinct("l_orderkey").alias("exact"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        ).collect()[0]
        assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06, row


class TestHllMergeability:
    def test_union_of_part_sketches_tracks_whole_sketch(self, lineitem):
        """The 100-TB property: build one DataSketches HLL per disjoint half
        and union them. The union gadget may promote the sketch's internal
        mode (sparse→dense), so the merged estimate is NOT byte-identical to
        the whole-table sketch — measured 14908 vs 14892 here — but it must
        track it within a fraction of the sketch's own error bound. This is
        the bounded-error composition that lets per-partition sketches merge
        at the reducer with no accuracy cliff."""
        half_a = lineitem.filter(F.col("l_orderkey") % 2 == 0)
        half_b = lineitem.filter(F.col("l_orderkey") % 2 == 1)
        whole = lineitem.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("est")
        ).collect()[0]["est"]
        parts = (
            half_a.agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
            .unionAll(half_b.agg(F.hll_sketch_agg("l_orderkey").alias("sk")))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
            .collect()[0]["est"]
        )
        assert abs(parts - whole) / whole < 0.02, (parts, whole)

    def test_hllpp_estimate_is_partition_layout_invariant(self, lineitem):
        """Spark's own approx_count_distinct (HLL++) merges fixed dense
        registers by per-register max — commutative and associative — so the
        estimate must be IDENTICAL whatever the partition layout. This is
        the determinism half of map-side combinability (the driver-gate
        determinism invariant extended to the sketch path)."""
        one = lineitem.repartition(1).agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("e")
        ).collect()[0]["e"]
        many = lineitem.repartition(32, "l_partkey").agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("e")
        ).collect()[0]["e"]
        assert one == many, (one, many)

    def test_estimate_close_to_exact(self, lineitem):
        exact = lineitem.agg(F.countDistinct("l_orderkey")).collect()[0][0]
        est = lineitem.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("est")
        ).collect()[0]["est"]
        assert abs(est - exact) / exact < 0.05, (est, exact)
