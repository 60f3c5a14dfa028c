"""Graph analytics beyond connected components (op-56): triangle counting
with degree-ordered orientation — the compact-forward algorithm rendered
as three DataFrame joins.

Semantics (pinned, mirrored in the DuckDB oracle): the input is an
UNDIRECTED simple graph as (src < dst) edge rows. Each edge is oriented
from the endpoint with the smaller (degree, id) key to the larger; a
triangle {a,b,c} then exists as exactly ONE oriented wedge a→b→c with a→c
present, so the count is exact with no division by 3. Per-node counts
attribute each triangle to all three corners.

Why orientation matters at scale: the naive wedge join fans out by
Σ deg(v)² — a hub with 10^6 neighbors contributes 10^12 wedges. Orienting
by degree bounds every node's OUT-degree by O(√|E|) (a classic arboricity
bound), so the wedge join is O(|E|^1.5) worst-case and hub-proof — the
same reason the similarity family blocks and salts its self-joins. The
two joins key on node ids (shuffle by node), and the final existence
check is a semi-join on the oriented edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


CO_ORDER_MAX_ITEMS = 64


def co_order_edges(
    lineitem: DataFrame, max_items: int | None = CO_ORDER_MAX_ITEMS
) -> DataFrame:
    """(src < dst) part pairs co-occurring in at least one order — the
    bipartite projection that serves as the demo graph.

    Per-order pair fan-out is C(items, 2) — single-digit for TPC-H-ish
    orders, but a general bipartite projection meets fat keys (a
    10^6-item "order" is 5·10^11 pairs), so the builder carries the
    family's standard per-key cap (VERDICT r3 #7): orders keep only their
    `max_items` parts with the smallest md5('co:'||order||':'||part) rank
    (part-id tie-break), bounding fan-out at C(max_items, 2) ≈ 2k pairs.
    Deterministic, oracle-mirrored (identical QUALIFY in _CO_EDGES_CTE);
    never binds on the gate corpus. Same retention rule as the IVF
    max_cell and minhash max_bucket caps."""
    items = lineitem.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    if max_items is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy(
            F.md5(
                F.concat_ws(
                    ":", F.lit("co"), F.col("k").cast("string"), F.col("p").cast("string")
                )
            ).asc(),
            F.col("p").asc(),
        )
        items = (
            items.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_items)
            .drop("_rk")
        )
    a = items.select("k", F.col("p").alias("src"))
    b = items.select("k", F.col("p").alias("dst"))
    return (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, n_tri) for every node in at least one triangle.

    edges: undirected simple graph, one (src < dst) row per edge.
    """
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    d1 = deg.select(F.col("node").alias("src"), F.col("deg").alias("_ds"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("_dd"))
    with_deg = edges.join(d1, "src").join(d2, "dst")
    fwd = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = with_deg.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
    )
    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    tris = wedges.join(
        oriented.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    return (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )


def pagerank_fixedpoint(
    edges: DataFrame, iters: int = 5, scale: int = 10**12, damping_pct: int = 85
) -> DataFrame:
    """PageRank over the undirected graph (each edge walked both ways) in
    FIXED-POINT integer arithmetic — op-57's iterative-algorithm surface
    with a bit-exact oracle.

    Floating-point PageRank can never gate bit-exactly (summation order
    differs per engine/partitioning), so every quantity here is a scaled
    integer with floor division, which Spark and DuckDB evaluate
    identically (the same trick as the decimal-exact attribution sums):

        pr_0(v)   = scale // N
        contrib_i(v) = Σ_{u ~ v} pr_i(u) // deg(u)
        pr_{i+1}(v) = ((100-d)·(scale // N)) // 100 + (d·contrib_i(v)) // 100

    Fixed `iters` (the oracle unrolls them as chained CTEs — deterministic
    iteration count, no convergence test to disagree on). Scale shape per
    iteration: one join edges⋈scores (shuffle by node) + one groupBy —
    identical to the CC round pattern; lineage is cut per round with
    localCheckpoint like connected_components.

    Returns (node, pr_int) — pr_int/scale ≈ the damped PageRank score.
    """
    both = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    n = deg.count()
    base = scale // n
    teleport = ((100 - damping_pct) * base) // 100
    pr = deg.select("node", F.lit(base).cast("long").alias("pr_int"), "deg")
    for _ in range(iters):
        contrib = (
            # `div`, NEVER `/`: longs under `/` go through DOUBLE division,
            # whose rounding can land past the true floor — `div` is the
            # integral operator both engines (Spark div, DuckDB //) define
            # identically
            both.join(
                pr.select(F.col("node").alias("src"),
                          F.expr("pr_int div deg").alias("_c")),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("_c").alias("_sum"))
        )
        pr = (
            deg.join(contrib, "node", "left")
            .withColumn("_sum", F.coalesce(F.col("_sum"), F.lit(0)))
            .select(
                "node",
                (F.lit(teleport) + F.expr(f"({damping_pct} * _sum) div 100")).alias("pr_int"),
                "deg",
            )
            .localCheckpoint(eager=True)
        )
    return pr.select("node", "pr_int")
