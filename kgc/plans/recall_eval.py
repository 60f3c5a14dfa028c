"""LSH pair-recall evidence at large SF (VERDICT r1 #3).

Full exact similarity at sf1 (20k individuals) IS the Σ_act deg(act)²
explosion the LSH path exists to avoid (~10⁹ pair rows locally), so the
harness does the honest large-scale thing:

- candidate_pairs_lsh runs at FULL scale (the actual sf1 workload — this is
  the evidence that the banded path executes at 100× the pinned-recall SF);
- exact ground truth is computed on a DETERMINISTIC 1/K individual sample
  (xxhash64(individual) % K == 0). Whether LSH recalls a pair depends only
  on the two profiles and the hash bands — never on other individuals — so
  sampled-pair recall is an unbiased estimate of population pair recall.
  The hot-activity stop-list is still computed on the FULL population,
  exactly as production would.

Usage: python kgc/plans/recall_eval.py [--sf 1.0] [--k 20] [--cpus N]
Prints one JSON line: {"sf":..., "recall_at_0.5":..., "n_high_pairs":...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--k", type=int, default=20, help="sample 1/k of individuals for exact GT")
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args()

    from kgc.operators.similarity import (
        candidate_pairs_exact,
        candidate_pairs_lsh,
        hot_activities,
        score_pairs,
        touch_items,
    )
    from kgc.session import get_spark
    from kgc.sources.synth import ground_truth_triples

    spark = get_spark(app_name=f"kgc-recall-sf{args.sf}", cpus=args.cpus or (os.cpu_count() or 8))
    workdir = tempfile.mkdtemp(prefix="kgc_recall_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        t0 = time.time()
        gt_path = os.path.join(workdir, "gt")
        # materialize: fusing the generator into downstream plans re-evaluates
        # the synthesis expression tree per field access (SURVEY.md §8)
        ground_truth_triples(spark, args.sf).write.parquet(gt_path)
        gt = spark.read.parquet(gt_path)
        gen_sec = time.time() - t0

        items = touch_items(gt).localCheckpoint(eager=True)
        stop = hot_activities(items)  # full-population stop-list, as in prod

        t0 = time.time()
        lsh = candidate_pairs_lsh(gt, stoplist=stop).select("ind_a", "ind_b", "similarity")
        lsh_path = os.path.join(workdir, "lsh")
        lsh.write.parquet(lsh_path)
        lsh = spark.read.parquet(lsh_path)
        n_lsh = lsh.count()
        lsh_sec = time.time() - t0

        sampled = F.pmod(F.xxhash64("individual"), F.lit(args.k)) == 0
        t0 = time.time()
        exact_s = score_pairs(candidate_pairs_exact(items.filter(sampled), hot_acts=stop))
        high = exact_s.filter(F.col("similarity") >= 0.5).select("ind_a", "ind_b").cache()
        n_high = high.count()
        tp = high.join(lsh, ["ind_a", "ind_b"], "left_semi").count()
        exact_sec = time.time() - t0

        # --- kNN neighbor-set P/R for the sampled individuals ---------------
        # exact top-10 needs (sampled × ALL) pairs — Σ deg_s(act)·deg(act),
        # 1/k of the full blowup, feasible at sf1. FULL degrees on both sides
        # so similarities equal the production values.
        t0 = time.time()
        from pyspark.sql import Window

        deg = items.groupBy("individual").agg(F.count("*").alias("deg"))
        it = items.join(deg, "individual")
        s_side = it.filter(sampled).select(
            F.col("individual").alias("si"), "act", F.col("deg").alias("sdeg"))
        o_side = it.select(F.col("individual").alias("oi"), "act", F.col("deg").alias("odeg"))
        spairs = (
            s_side.join(o_side, "act")
            .filter(F.col("si") != F.col("oi"))
            .groupBy("si", "oi")
            .agg(F.count("*").alias("inter"), F.max("sdeg").alias("sdeg"), F.max("odeg").alias("odeg"))
            .select("si", "oi", F.round(
                F.col("inter") / F.sqrt(F.col("sdeg").cast("double") * F.col("odeg")), 9
            ).alias("sim"))
        )
        w = Window.partitionBy("si").orderBy(F.col("sim").desc(), F.col("oi").asc())
        knn_exact = spairs.withColumn("rn", F.row_number().over(w)).filter("rn <= 10").select("si", "oi").cache()
        lsh_scored = lsh  # already the materialized (ind_a, ind_b, similarity) table
        lsh_sym = lsh_scored.select(
            F.col("ind_a").alias("si"), F.col("ind_b").alias("oi"), "similarity"
        ).union(lsh_scored.select(
            F.col("ind_b").alias("si"), F.col("ind_a").alias("oi"), "similarity"))
        knn_lsh = (
            lsh_sym.filter(F.pmod(F.xxhash64("si"), F.lit(args.k)) == 0)
            .select("si", "oi", F.round("similarity", 9).alias("sim"))
            .withColumn("rn", F.row_number().over(w)).filter("rn <= 10").select("si", "oi").cache()
        )
        knn_tp = knn_exact.join(knn_lsh, ["si", "oi"], "left_semi").count()
        n_ex, n_ls = knn_exact.count(), knn_lsh.count()
        knn_sec = time.time() - t0

        print(json.dumps({
            "sf": args.sf,
            "sample_rate": f"1/{args.k}",
            "n_individuals_sampled_gt": items.filter(sampled).select("individual").distinct().count(),
            "n_high_pairs_sampled": n_high,
            "recall_at_0.5": round(tp / n_high, 4) if n_high else None,
            "knn10_precision": round(knn_tp / n_ls, 4) if n_ls else None,
            "knn10_recall": round(knn_tp / n_ex, 4) if n_ex else None,
            "n_lsh_candidates_full": n_lsh,
            "gen_sec": round(gen_sec, 1),
            "lsh_full_scale_sec": round(lsh_sec, 1),
            "exact_sample_sec": round(exact_sec, 1),
            "knn_eval_sec": round(knn_sec, 1),
        }))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
