"""ANN recall/latency evidence harness — makes the BENCH §4 full-corpus
measurements reproducible with one command.

Every vector queries for its top-k cosine neighbors over the whole corpus;
ground truth = the brute-force crossJoin; candidates = each index's
ann_topk_* path at full query load. Recall@k = mean per-query overlap with
the GT top-k set (ties broken (cosine desc, vec_id asc) on both sides, so
overlap is well-defined).

Usage: python kgc/plans/ann_eval.py [--sf 0.1] [--k 5]
       [--n-cells 20] [--nprobe 12] [--lsh-bands 4]
Prints one JSON line with per-method wall seconds and recall.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F


def _recall(got, gt_sets, k: int) -> float:
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["q_id"], set()).add(r["vec_id"])
    total = sum(len(by_q.get(q, ()) & s) for q, s in gt_sets.items())
    return round(total / (k * len(gt_sets)), 4)


def skewed_corpus(spark, n: int, dim: int = 8, hot_per_10: int = 7):
    """Deterministic SKEWED embedding corpus (r4): `hot_per_10`/10 of the
    vectors live in a narrow cone around e0 (one coarse cell swallows them
    — the hot-quantizer case) but are angularly DIVERSE inside it
    (integer-hash wobble), the rest spread over the space. All components
    are xxhash64-derived (no rand(), CLAUDE.md determinism rule)."""
    hot = F.pmod(F.col("vec_id"), F.lit(10)) < hot_per_10

    def comp(j: int):
        wobble = F.pmod(F.xxhash64(F.lit(j), F.col("vec_id")), F.lit(23)).cast("double")
        spread = (
            F.pmod(F.xxhash64(F.lit(100 + j), F.col("vec_id")), F.lit(101)) - 50
        ).cast("double")
        hot_c = F.lit(100.0) if j == 0 else wobble
        tail_c = (spread + 1) if j == 0 else spread
        return F.when(hot, hot_c).otherwise(tail_c)

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(j) for j in range(dim)]).alias("embedding"),
    )


def run_skewed(spark, n: int, k: int) -> dict:
    """Cap-vs-split operating points on the skewed corpus: ground truth on
    a deterministic query sample (queries × ALL data — the sampled-GT
    method of the recall harnesses), candidates from the full index."""
    from pyspark.sql import Window

    from kgc.operators.dedup import _exact_cosine, ann_topk_ivf, ann_topk_ivf_split

    emb = skewed_corpus(spark, n).localCheckpoint(eager=True)
    q_sample = F.pmod(F.xxhash64(F.lit("q"), F.col("vec_id")), F.lit(10)) == 0
    out: dict = {"mode": "skewed", "n_vectors": n, "k": k,
                 "n_queries": emb.filter(q_sample).count()}

    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e = emb.select(F.col("vec_id").alias("id"), vec.alias("v"))
    a = e.filter(F.pmod(F.xxhash64(F.lit("q"), F.col("id")), F.lit(10)) == 0).select(
        F.col("id").alias("q_id"), F.col("v").alias("qv")
    )
    b = e.select(F.col("id").alias("vec_id"), F.col("v").alias("v"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    t0 = time.time()
    gt = (
        a.crossJoin(b).filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", F.round(_exact_cosine("qv", "v"), 6).alias("cosine"))
        .withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
        .select("q_id", "vec_id").collect()
    )
    out["brute_sampled_sec"] = round(time.time() - t0, 2)
    gt_sets: dict = {}
    for r in gt:
        gt_sets.setdefault(r["q_id"], set()).add(r["vec_id"])

    def timed(name, df):
        t0 = time.time()
        got = [r for r in df.select("q_id", "vec_id").collect() if r["q_id"] in gt_sets]
        out[f"{name}_sec"] = round(time.time() - t0, 2)
        out[f"{name}_recall"] = _recall(got, gt_sets, k)

    common = dict(k=k, n_cells=16, nprobe=4)
    timed("ivf_uncapped", ann_topk_ivf(emb, max_cell=None, **common))
    timed("ivf_capped64", ann_topk_ivf(emb, max_cell=64, **common))
    timed(
        "ivf_split",
        ann_topk_ivf_split(
            emb, split_threshold=256, n_sub=16, nprobe_sub=6, max_cell=None, **common
        ),
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--n-cells", type=int, default=20)
    ap.add_argument("--nprobe", type=int, default=12)
    ap.add_argument("--lsh-bands", type=int, default=4)
    ap.add_argument("--skewed", type=int, default=0, metavar="N",
                    help="instead of the driver corpus, run the cap-vs-split "
                         "comparison on an N-vector deterministic skewed corpus")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    if args.skewed:
        from kgc.session import get_spark

        spark = get_spark(app_name="kgc-ann-eval-skewed", cpus=args.cpus)
        print(json.dumps(run_skewed(spark, args.skewed, args.k)))
        spark.stop()
        return

    from kgc.operators.dedup import (
        _exact_cosine,
        ann_topk_ivf,
        ann_topk_lsh,
        train_ivf_centroids,
    )
    from kgc.session import get_spark

    spark = get_spark(app_name=f"kgc-ann-eval-sf{args.sf}", cpus=args.cpus)
    emb = spark.read.parquet(f"/root/testdata/sf{args.sf:g}/embeddings.parquet")
    emb = emb.localCheckpoint(eager=True)
    k = args.k
    out: dict = {"sf": args.sf, "k": k, "n_vectors": emb.count()}

    # ground truth: brute-force full self-join top-k
    from pyspark.sql import Window

    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e = emb.select(F.col("vec_id").alias("id"), vec.alias("v"))
    a = e.select(F.col("id").alias("q_id"), F.col("v").alias("qv"))
    b = e.select(F.col("id").alias("vec_id"), F.col("v").alias("v"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    t0 = time.time()
    gt = (
        a.crossJoin(b).filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", F.round(_exact_cosine("qv", "v"), 6).alias("cosine"))
        .withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
        .select("q_id", "vec_id").collect()
    )
    out["brute_sec"] = round(time.time() - t0, 2)
    gt_sets: dict = {}
    for r in gt:
        gt_sets.setdefault(r["q_id"], set()).add(r["vec_id"])

    def timed(name, df):
        t0 = time.time()
        got = df.select("q_id", "vec_id").collect()
        out[f"{name}_sec"] = round(time.time() - t0, 2)
        out[f"{name}_recall"] = _recall(got, gt_sets, k)

    # max_cell=None explicitly (ADVICE r4): the operator's default is now
    # capped (256), which on a skewed hash-sampled codebook could silently
    # shift recall/latency vs the uncapped operating points recorded in
    # BENCH/BASELINE.md §4 — this path measures the UNCAPPED baselines; the
    # cap-vs-split comparison lives in --skewed mode.
    timed(
        "ivf_hash",
        ann_topk_ivf(emb, k=k, n_cells=args.n_cells, nprobe=args.nprobe, max_cell=None),
    )
    t0 = time.time()
    cents = train_ivf_centroids(emb, n_cells=args.n_cells)
    out["kmeans_train_sec"] = round(time.time() - t0, 2)
    timed(
        "ivf_kmeans",
        ann_topk_ivf(
            emb, k=k, n_cells=args.n_cells, nprobe=args.nprobe,
            centroids=cents, max_cell=None,
        ),
    )
    timed("srp_lsh", ann_topk_lsh(emb, k=k, bands=args.lsh_bands))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
