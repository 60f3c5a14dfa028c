"""op-18/20/30/31: attribution models — firstTouch, lastTouch, linear.

Re-expresses the reference GraphGist's attribution Cypher
(`MATCH (i)-[t:TOUCHED]->(a)-[:PART_OF]->(c), (i)-[:CONVERTED_BY]->(c)
WHERE t.ts <= conv.ts ...`) as joins + ranking windows.

Pinned semantics (SURVEY.md §2.4-A):
- domain: individuals with ≥1 conversion (semi-join, op-20);
- multiple conversions to the same campaign → the EARLIEST one counts;
- qualifying touches: distinct (individual, activity, ts) TOUCHED events on
  activities PART_OF the converted campaign with touch.ts <= conv.ts
  (NULL-ts media touches never qualify — NULL fails the predicate);
- firstTouch = min by (ts, activity), lastTouch = max by (ts, activity),
  weight 1.0; linear = 1/n per qualifying touch, summing to 1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversions_of(triples: DataFrame) -> DataFrame:
    """Earliest conversion per (individual, campaign)."""
    return (
        triples.filter(F.col("pred") == "CONVERTED_BY")
        .groupBy(F.col("subj").alias("individual"), F.col("obj").alias("campaign"))
        .agg(F.min("ts").alias("conv_ts"))
    )


def qualifying_touches(triples: DataFrame, part_of: DataFrame) -> DataFrame:
    """op-18: the as-of/range join. Equi-join on (individual, campaign) +
    range predicate touch_ts <= conv_ts. part_of is a tiny dimension →
    broadcast; the conversions side is one row per (ind, campaign) — the
    equi component keeps Catalyst on a hash/sort-merge join, never BNLJ.
    """
    touches = (
        triples.filter((F.col("pred") == "TOUCHED") & F.col("ts").isNotNull())
        .select(F.col("subj").alias("individual"), F.col("obj").alias("activity"), F.col("ts"))
        .dropDuplicates(["individual", "activity", "ts"])
        .join(F.broadcast(part_of), "activity")
    )
    conv = conversions_of(triples)
    return touches.join(conv, ["individual", "campaign"]).filter(F.col("ts") <= F.col("conv_ts"))


def first_last_touch(qualifying: DataFrame) -> DataFrame:
    """op-30: firstTouch + lastTouch edges (weight 1.0).

    One partial+final hash aggregation (r6): min/max of struct(ts, activity)
    IS the row_number()=1 row under (ts ASC, activity ASC) / (ts DESC,
    activity DESC) — ts is never NULL in qualifying touches, and struct
    comparison is lexicographic — so the two ranking windows (each an
    exchange + full sort of the qualifying stream) collapse into one
    map-side-combined agg whose output is conversion-sized."""
    agg = qualifying.groupBy("individual", "campaign").agg(
        F.min(F.struct("ts", "activity")).alias("_f"),
        F.max(F.struct("ts", "activity")).alias("_l"),
    )
    first = agg.select(
        "individual", "campaign", F.col("_f.activity").alias("activity"),
        F.lit("firstTouch").alias("model"), F.lit(1.0).alias("weight"),
        F.col("_f.ts").alias("ts"),
    )
    last = agg.select(
        "individual", "campaign", F.col("_l.activity").alias("activity"),
        F.lit("lastTouch").alias("model"), F.lit(1.0).alias("weight"),
        F.col("_l.ts").alias("ts"),
    )
    return first.unionByName(last)


def linear_weights(qualifying: DataFrame) -> DataFrame:
    """op-31: every qualifying touch gets 1/n (n per (individual, campaign))."""
    w = Window.partitionBy("individual", "campaign")
    return qualifying.select(
        "individual", "campaign", "activity", F.lit("linear").alias("model"),
        (F.lit(1.0) / F.count("*").over(w)).alias("weight"), "ts",
    )


def time_decay_weights(qualifying: DataFrame) -> DataFrame:
    """Extension beyond the reference's three models: recency-weighted
    attribution. weight_i = d_i / Σ d_j with d = 1/(1 + whole_days_before_
    conversion) — harmonic decay rather than exponential because libm pow()
    is not bit-reproducible across engines, while one integer-derived
    division is; the normalizing sum is decimal-exact (order-independent).
    """
    days = F.floor((F.unix_timestamp("conv_ts") - F.unix_timestamp("ts")) / 86400)
    d = F.round(F.lit(1.0) / (F.lit(1) + days), 9)
    w = Window.partitionBy("individual", "campaign")
    den = F.sum(d.cast("decimal(20,9)")).over(w).cast("decimal(20,9)").cast("double")
    return qualifying.select(
        "individual", "campaign", "activity", F.lit("timeDecay").alias("model"),
        F.round(d / den, 9).alias("weight"), "ts",
    )


def attribute(triples: DataFrame, part_of: DataFrame) -> DataFrame:
    """All four models → ATTRIBUTIONS table.

    `q` is localCheckpointed (r6): the four model branches consume it above
    its final join, which exchange reuse cannot deduplicate — the
    un-materialized plan re-ran the touches-dedup + conversions join once
    per branch family (measured 2.4–3.8 s → 1.4–1.7 s with the agg-form
    first/last on the sf0.1 noop bench). The materialization is O(|q|),
    linear at any scale."""
    q = qualifying_touches(triples, part_of).localCheckpoint(eager=True)
    return first_last_touch(q).unionByName(linear_weights(q)).unionByName(time_decay_weights(q))
