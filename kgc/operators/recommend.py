"""op-19/32/33: kNN product recommendation over SIMILAR_TO edges.

The reference's final Cypher: for each individual, take the k most similar
neighbors, collect the products those neighbors purchased that the individual
has not, score each product by the summed similarity of contributing
neighbors, return the top m. Pinned k=10, m=5, ties broken by id ASC
(SURVEY.md §2.4-C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K_NEIGHBORS = 10
M_PRODUCTS = 5


def symmetrize(similar_to: DataFrame) -> DataFrame:
    """similar_to stores each unordered pair once (ind_a < ind_b); readers
    union both directions — symmetry is logical, storage stays halved."""
    return similar_to.select(
        F.col("ind_a").alias("individual"), F.col("ind_b").alias("neighbor"), "similarity"
    ).union(
        similar_to.select(
            F.col("ind_b").alias("individual"), F.col("ind_a").alias("neighbor"), "similarity"
        )
    )


def topk_neighbors(similar_to: DataFrame, k: int = K_NEIGHBORS) -> DataFrame:
    """op-32: per-individual top-k — ranking window, never a global sort."""
    w = Window.partitionBy("individual").orderBy(F.col("similarity").desc(), F.col("neighbor").asc())
    return (
        symmetrize(similar_to)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def purchases_of(triples: DataFrame) -> DataFrame:
    return (
        triples.filter(F.col("pred") == "PURCHASED")
        .select(F.col("subj").alias("individual"), F.col("obj").alias("product"))
        .dropDuplicates(["individual", "product"])
    )


def recommend(triples: DataFrame, similar_to: DataFrame, k: int = K_NEIGHBORS, m: int = M_PRODUCTS) -> DataFrame:
    """Full RECOMMEND derivation → RECOMMENDATIONS table."""
    purchases = purchases_of(triples)
    neighbors = topk_neighbors(similar_to, k)
    cands = neighbors.join(
        purchases.select(F.col("individual").alias("neighbor"), "product"), "neighbor"
    )
    # op-19: drop products the individual already owns (left anti = NOT EXISTS)
    cands = cands.join(purchases, ["individual", "product"], "left_anti")
    # §2.4-D/E byte-stable scores: sum-of-doubles is partition-order-dependent
    # at ~1e-16, so sum the 9-dp-rounded similarity as exact decimal (the same
    # pattern the contract query uses), then surface a double again
    scored = cands.groupBy("individual", "product").agg(
        F.sum(F.round("similarity", 9).cast("decimal(20,9)"))
        .cast("decimal(20,9)").cast("double").alias("score")
    )
    w = Window.partitionBy("individual").orderBy(F.col("score").desc(), F.col("product").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
        .select("individual", "product", "score", F.col("rank").cast("int"))
    )
