"""Banded-minhash DOCUMENT-dedup recall evidence at large corpus size (r3).

All-pairs Jaccard over 1M docs is ~5·10^11 comparisons — the explosion the
banding exists to avoid — so, like the similarity harness
(kgc/plans/recall_eval.py), this does the honest large-scale thing:

- minhash_banded_pairs runs at FULL corpus scale (with the hot-bucket cap,
  exactly the production configuration);
- exact ground truth is all-pairs Jaccard restricted to a DETERMINISTIC
  1/K doc sample (xxhash64(doc_id) % K == 0). Whether banding recalls a
  pair depends only on the two docs' shingle sets and the md5 band hashes
  — never on other documents — so sampled-pair recall is an unbiased
  estimate of population pair recall. (The hot-bucket CAP does couple
  pairs to bucket population; pairs lost to the cap are counted against
  recall here, so the estimate is honest about it.)

The corpus is the kgc synthetic doc table flattened to text (template-
heavy — the adversarial case for banding: hot buckets everywhere).

Usage: python kgc/plans/dedup_recall_eval.py [--sf 1.0] [--k 80] [--threshold 0.5]
Prints one JSON line: {"sf":..., "recall_at_t":..., "n_high_pairs":...}
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
    ap.add_argument("--k", type=int, default=80, help="sample 1/k of docs for exact GT (GT cost is quadratic in 1/k)")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--max-bucket", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args()

    from kgc.operators.dedup import doc_shingles, jaccard_pairs_bruteforce, minhash_banded_pairs
    from kgc.session import get_spark
    from kgc.sources.synth import synth_documents

    spark = get_spark(
        app_name=f"kgc-dedup-recall-sf{args.sf}", cpus=args.cpus or (os.cpu_count() or 8)
    )
    workdir = tempfile.mkdtemp(
        prefix="kgc_dedup_recall_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        t0 = time.time()
        docs_path = os.path.join(workdir, "docs")
        # materialize first (SURVEY.md §8: fused generator re-evaluates per
        # field access), flattened to one text per doc
        synth_documents(spark, args.sf).select(
            "doc_id",
            F.concat_ws(
                " ", F.expr("transform(spans, s -> coalesce(s.text, ''))")
            ).alias("text"),
        ).write.parquet(docs_path)
        docs = spark.read.parquet(docs_path).repartition(
            spark.sparkContext.defaultParallelism * 2, "doc_id"
        )

        # --- full-scale banded pairs (the production workload) ------------
        banded = (
            minhash_banded_pairs(docs, threshold=args.threshold, max_bucket=args.max_bucket)
            .select("id_a", "id_b")
        )
        banded_path = os.path.join(workdir, "banded")
        banded.write.parquet(banded_path)
        banded = spark.read.parquet(banded_path)
        n_banded = banded.count()
        t_banded = time.time() - t0

        # --- sampled exact ground truth ------------------------------------
        sample = docs.filter(F.xxhash64("doc_id") % args.k == 0)
        n_sample = sample.count()
        gt = (
            jaccard_pairs_bruteforce(sample, threshold=args.threshold)
            .select("id_a", "id_b")
        )
        gt_path = os.path.join(workdir, "gt")
        gt.write.parquet(gt_path)
        gt = spark.read.parquet(gt_path)
        n_high = gt.count()

        # Two recall notions (a doc's band keys depend only on the doc, so
        # both are computable on the sample without touching the corpus):
        # 1. BANDING recall — the pair shares ≥1 band bucket: the LSH
        #    mechanism found it; probability 1-(1-j^r)^b regardless of cap.
        # 2. ENUMERATED recall — the pair survived the hot-bucket cap into
        #    the pairwise verify. On template-heavy corpora most high-pair
        #    mass sits in giant same-template clusters, which the cap
        #    deliberately routes to the bucket-level keep-min dedup instead
        #    of C(m,2) enumeration — the gap between the two numbers is
        #    exactly that routed mass, not lost duplicates.
        from kgc.operators.dedup import banded_candidates, minhash_band_keys

        # the SHIPPED candidate rule, uncapped — so the harness measures the
        # production mechanism, not a re-implementation
        same_band = banded_candidates(minhash_band_keys(doc_shingles(sample)))
        hit_band = gt.join(same_band, ["id_a", "id_b"], "left_semi").count()
        hit_enum = gt.join(banded, ["id_a", "id_b"], "left_semi").count()

        print(json.dumps({
            "sf": args.sf,
            "threshold": args.threshold,
            "max_bucket": args.max_bucket,
            "banded_pairs_full_scale": n_banded,
            "banded_wall_sec": round(t_banded, 1),
            "sample_docs": n_sample,
            "n_high_pairs": n_high,
            "banding_recall_at_t": round(hit_band / n_high, 4) if n_high else 1.0,
            "enumerated_recall_at_t": round(hit_enum / n_high, 4) if n_high else 1.0,
            "capped_to_bucket_policy": hit_band - hit_enum,
            "wall_sec": round(time.time() - t0, 1),
        }))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
