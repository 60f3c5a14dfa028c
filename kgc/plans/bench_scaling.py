"""Scaling-efficiency evidence (north rule: throughput efficiency ≥0.8 from
N to 4N executors; sandbox stand-in: local[N] vs local[4N] on one box).

Methodology:
- The input documents table is pre-written ONCE (untimed) — at target scale
  the corpus already exists in the lake; synthesis is fixture setup.
- Entity dimensions (alias catalog, canonical map) are corpus-independent
  and prebuilt (untimed).
- The TIMED job per parallelism level: read docs parquet → explode spans →
  pandas-UDF mention extraction → vocabulary link resolution + broadcast
  rewrite (the fused wide path; the vocabulary subtree re-derives its input,
  which scales identically at both levels) → canonical rewrite + MERGE-dedup
  → parquet write. Cold SparkSession per level, same input.
- efficiency = (throughput@4N / throughput@N) / 4.

Run: python kgc/plans/bench_scaling.py [--sf 1.0] [--n 1] (4N = 4*n)
Writes BENCH/BASELINE.md-compatible JSON to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from kgc.session import get_spark
from kgc.operators.canon import entities_canon_map, salted_dedup
from kgc.operators.extract import extract_mentions
from kgc.operators.link import link_triples_wide
from kgc.operators.spans import explode_spans
from kgc.operators.triples import canonical_triples
from kgc.sources.synth import alias_catalog, alias_edges

cpus = {cpus}
sf = {sf}
docs_path = {docs_path!r}
out_path = {out_path!r}

extra = {{}}
if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/kgc-spark-local", exist_ok=True)
    extra["spark.local.dir"] = "/dev/shm/kgc-spark-local"
spark = get_spark(app_name=f"kgc-scale-{{cpus}}", cpus=cpus, extra_conf=extra)
catalog = alias_catalog(spark, sf)
canon = entities_canon_map(salted_dedup(alias_edges(catalog), ["src", "dst"]))
canon = canon.localCheckpoint(eager=True)  # prebuilt dim, untimed (no driver round-trip)

docs = spark.read.parquet(docs_path)
t0 = time.time()
triples = canonical_triples(
    link_triples_wide(extract_mentions(explode_spans(docs)), catalog), canon
)
triples.write.mode("overwrite").parquet(out_path)
wall = time.time() - t0
n = spark.read.parquet(out_path).count()
print(json.dumps({{"cpus": cpus, "wall_sec": round(wall, 2), "triples": n,
                   "triples_per_sec": round(n / wall, 1)}}))
spark.stop()
"""


def run_level(cpus: int, sf: float, docs_path: str, out_path: str) -> dict:
    code = _WORKER.format(repo=REPO, cpus=cpus, sf=sf, docs_path=docs_path, out_path=out_path)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--docs", default=None, help="pre-written docs parquet (generated if absent)")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="kgc_scaling_")
    docs_path = args.docs or os.path.join(tmp, "docs")
    if not os.path.exists(docs_path):
        from kgc.session import get_spark
        from kgc.sources.synth import synth_documents

        spark = get_spark(app_name="kgc-scale-setup")
        synth_documents(spark, args.sf).write.mode("overwrite").parquet(docs_path)
        spark.stop()

    results = {}
    for cpus in (args.n, 4 * args.n):
        results[cpus] = run_level(cpus, args.sf, docs_path, os.path.join(tmp, f"triples_{cpus}"))
        print(f"[scaling] {results[cpus]}", file=sys.stderr)

    thr_n = results[args.n]["triples_per_sec"]
    thr_4n = results[4 * args.n]["triples_per_sec"]
    eff = (thr_4n / thr_n) / 4
    print(json.dumps({
        "sf": args.sf,
        "n_cores": args.n,
        "4n_cores": 4 * args.n,
        "throughput_n": thr_n,
        "throughput_4n": thr_4n,
        "wall_n_sec": results[args.n]["wall_sec"],
        "wall_4n_sec": results[4 * args.n]["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "triples": results[args.n]["triples"],
    }))


if __name__ == "__main__":
    main()
