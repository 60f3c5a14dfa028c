"""op-28/29: entity canonicalization — salted-key dedup + connected components.

op-28 is the one genuinely iterative operator in the pipeline (GraphFrames is
absent in this environment, so components are hand-rolled on DataFrames):
min-label propagation to a fixpoint. Each iteration is one shuffle
(edges ⋈ labels + groupBy-min); ``localCheckpoint(eager=True)`` truncates the
lineage so the plan stays O(1) per iteration instead of growing without bound
(SURVEY.md §4.4). Alias graphs are near-star-shaped → few iterations; the
scale path for adversarial graphs (long chains, 10^9+ edges) is
``connected_components_star`` below — alternating large-star/small-star
contraction, which also SHRINKS the edge set every round (min-label keeps
shuffling the full edge list).

op-29 is the salted two-phase dedup the north star names: phase 1 collapses
duplicates within (key, salt) groups — a hot key's duplicates spread over
n_salt reducers — phase 2 finishes globally on an input already reduced to
≤ n_salt rows per key.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgc.functions.text import salt_col


def salted_dedup(df: DataFrame, keys: list[str], n_salt: int = 16) -> DataFrame:
    """op-29: exact distinct-on-keys, skew-safe."""
    salt = salt_col(F.concat_ws("", *[F.coalesce(F.col(k).cast("string"), F.lit("")) for k in keys]), n_salt)
    phase1 = df.withColumn("_salt", salt).dropDuplicates([*keys, "_salt"])
    return phase1.drop("_salt").dropDuplicates(keys)


def connected_components(edges: DataFrame, max_iter: int = 25, stats: dict | None = None) -> DataFrame:
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
            if stats is not None:
                stats["iterations"] = _ + 1
                stats["converged"] = True
            break
    else:
        # max_iter exhausted without a fixpoint: labels may still be split
        # across a component — never fail silently (ADVICE r2)
        warnings.warn(
            f"connected_components: no fixpoint within max_iter={max_iter}; "
            "labels may be non-canonical — raise max_iter or use "
            "connected_components_star",
            stacklevel=2,
        )
        if stats is not None:
            stats["converged"] = False
    return labels


def connected_components_star(edges: DataFrame, max_iter: int = 50, stats: dict | None = None) -> DataFrame:
    """op-28 scale variant: alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond").

    Same (node, component-min) output as ``connected_components``; converges
    in O(log n) rounds even on adversarial long-chain graphs where min-label
    propagation alone needs O(diameter) (pointer doubling cuts that to
    O(log d) but star contraction halves the EDGE set too, shrinking every
    subsequent shuffle — the property that matters at 10^9 edges). Each
    round is two groupBy-min + join shuffles over a monotonically shrinking
    edge list; fixpoint detected by an order-independent edge fingerprint.

    - large-star: every neighbor v > u repoints to m = min(Γ(u) ∪ {u})
    - small-star: every neighbor v ≤ u (plus u) repoints to the min
    """
    base = edges.select(F.col("src").alias("x"), F.col("dst").alias("y")).filter(
        F.col("x").isNotNull() & F.col("y").isNotNull()
    )
    # nodes captured BEFORE the self-loop drop: a node whose only edge is
    # (n, n) must still appear in the output (r2 review finding — the
    # min-label loop keeps it via bidir, so parity requires it here)
    nodes = base.select(F.col("x").alias("node")).union(
        base.select(F.col("y").alias("node"))
    ).distinct().localCheckpoint(eager=True)
    e = (
        base.select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def fingerprint(df: DataFrame):
        r = df.agg(
            F.expr("bit_xor(xxhash64(u, v))").alias("fp"), F.count("*").alias("n")
        ).collect()[0]
        return (r["fp"], r["n"])

    fp = fingerprint(e)
    for i in range(max_iter):
        # --- large-star: (v, m) for v in Γ(u), v > u, m = min(Γ⁺(u)) -------
        bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            bidir.groupBy("u").agg(F.min("v").alias("_mb"))
            .select("u", F.least("_mb", F.col("u")).alias("m"))
        )
        ls = (
            bidir.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))  # v > u ≥ m
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star on (u, v) with u > v: all small neighbors + u → min
        smins = ls.groupBy("u").agg(F.min("v").alias("m"))
        joined = ls.join(smins, "u")
        ss = (
            joined.select(F.greatest("v", "m").alias("u"), F.least("v", "m").alias("v"))
            .union(joined.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_fp = fingerprint(ss)
        e = ss
        if stats is not None:
            stats.setdefault("edge_counts", []).append(new_fp[1])
        if new_fp == fp:
            if stats is not None:
                stats["iterations"] = i + 1
                stats["converged"] = True
            break
        fp = new_fp
    else:
        # the final groupBy-min below is only a best-effort net when the
        # edge fixpoint wasn't reached — warn, don't silently truncate
        # (ADVICE r2: this variant is the adversarial-graph path, where
        # hitting the cap is likelier)
        warnings.warn(
            f"connected_components_star: edge fixpoint not reached within "
            f"max_iter={max_iter}; labels may be non-canonical",
            stacklevel=2,
        )
        if stats is not None:
            stats["converged"] = False
    # fixpoint edges are stars (u, component-min) — each non-root u appears
    # exactly once; the groupBy-min is a no-op then, and a best-effort
    # safety net if max_iter truncated before convergence. Nodes with no
    # surviving edge (isolated after self-loop removal) get identity labels.
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .union(nodes.select("node", F.col("node").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


# Past ~1e8 undirected edges the min-label loop's per-round FULL-edge-list
# shuffle dominates its O(log d) round count; star contraction pays two
# shuffles per round on a monotonically SHRINKING edge set and wins
# regardless of graph shape. Below it, rounds are cheap and min-label's
# single shuffle + changed-probe per round costs less than star's double
# shuffle + fingerprint. (Diameter — the other discriminator — has no cheap
# probe; edge volume is the one that moves real money at 10^9+ edges.)
STAR_EDGE_THRESHOLD = 100_000_000


def connected_components_auto(
    edges: DataFrame,
    max_iter: int = 50,
    stats: dict | None = None,
    star_edge_threshold: int = STAR_EDGE_THRESHOLD,
) -> DataFrame:
    """op-28 dispatcher (VERDICT r2 #8): one O(E) count picks the variant.

    Both variants emit the identical (node, component-min) labels — pinned
    by tests — so the choice is purely a cost call; `stats['variant']`
    records it. The edges input is localCheckpointed first, so the probe
    count and the chosen variant's own multiple scans all read ONE
    materialization instead of re-deriving the caller's edge subtree (the
    pipeline's is two dropDuplicates shuffles; r3 review finding)."""
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    variant = "star" if n_edges > star_edge_threshold else "min_label"
    if stats is not None:
        stats["variant"] = variant
        stats["probe_edges"] = n_edges
    if variant == "star":
        return connected_components_star(edges, max_iter=max_iter, stats=stats)
    return connected_components(edges, max_iter=max_iter, stats=stats)


def entities_canon_map(
    edges: DataFrame,
    stats: dict | None = None,
    star_edge_threshold: int = STAR_EDGE_THRESHOLD,
) -> DataFrame:
    """alias_id → canonical_id map (identity rows for component minima are
    included, so a plain inner-join rewrite also works). Routes through the
    op-28 auto-dispatcher so adversarial-scale edge sets engage star
    contraction without a caller-side flag."""
    cc = connected_components_auto(edges, stats=stats, star_edge_threshold=star_edge_threshold)
    return cc.select(F.col("node").alias("alias_id"), F.col("component").alias("canonical_id"))
