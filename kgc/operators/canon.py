"""op-28/29: entity canonicalization — salted-key dedup + connected components.

op-28 is the one genuinely iterative operator in the pipeline (GraphFrames is
absent in this environment, so components are hand-rolled on DataFrames):
min-label propagation to a fixpoint. Each iteration is one shuffle
(edges ⋈ labels + groupBy-min); ``localCheckpoint(eager=True)`` truncates the
lineage so the plan stays O(1) per iteration instead of growing without bound
(SURVEY.md §4.4). Alias graphs are near-star-shaped → few iterations; the
documented scale path for adversarial graphs (long chains) is the
large-star/small-star variant, which this loop structure accommodates by
swapping the message step.

op-29 is the salted two-phase dedup the north star names: phase 1 collapses
duplicates within (key, salt) groups — a hot key's duplicates spread over
n_salt reducers — phase 2 finishes globally on an input already reduced to
≤ n_salt rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgc.functions.text import salt_col


def salted_dedup(df: DataFrame, keys: list[str], n_salt: int = 16) -> DataFrame:
    """op-29: exact distinct-on-keys, skew-safe."""
    salt = salt_col(F.concat_ws("", *[F.coalesce(F.col(k).cast("string"), F.lit("")) for k in keys]), n_salt)
    phase1 = df.withColumn("_salt", salt).dropDuplicates([*keys, "_salt"])
    return phase1.drop("_salt").dropDuplicates(keys)


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """op-28: undirected components over edges(src, dst) → (node, component)
    with component = lexicographic min node id in the component (§2.4-F).

    Deterministic: pure min-aggregation fixpoint, no ordering dependence.
    """
    bidir = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).union(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()
    labels = (
        bidir.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # message: each node offers its current label to every neighbor
        msgs = bidir.join(labels, bidir["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("component")
        )
        propagated = (
            labels.select("node", "component")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer doubling (path shortcut): L(u) ← L(L(u)). Turns chains of
        # length d into convergence in O(log d) rounds instead of O(d) —
        # the property that keeps adversarial graphs tractable at scale.
        lab2 = propagated.select(
            F.col("node").alias("_n2"), F.col("component").alias("_c2")
        )
        new_labels = (
            propagated.join(lab2, propagated["component"] == lab2["_n2"], "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("_c2"), F.col("component"))).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def entities_canon_map(edges: DataFrame) -> DataFrame:
    """alias_id → canonical_id map (identity rows for component minima are
    included, so a plain inner-join rewrite also works)."""
    cc = connected_components(edges)
    return cc.select(F.col("node").alias("alias_id"), F.col("component").alias("canonical_id"))
