"""op-63 scale evidence: incremental append vs full rebuild cost.

The claim worth measuring: ivf_index_append is O(new vectors) — it never
reads or rewrites existing rows — so appending a small delta to a large
stored index should cost a small fraction of rebuilding it, while
(append + maintain) keeps the stored state BIT-EQUAL to the rebuild (the
tests pin equality; this probe prices it).

Usage: python kgc/plans/ann_index_probe.py [--n 200000] [--delta 2000]
       [--n-cells 64] [--cpus N]
Prints one JSON line: build / append / maintain / rebuild walls + the
append:rebuild ratio.
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


def uniform_corpus(spark, n: int, dim: int = 8, id_offset: int = 0):
    """Deterministic spread corpus (xxhash64 components, no rand())."""
    comp = lambda j: (  # noqa: E731
        F.pmod(F.xxhash64(F.lit(100 + j), F.col("vec_id")), F.lit(101)) - 50
    ).cast("double")
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id"),
        F.array(*[comp(j) for j in range(dim)]).alias("embedding"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--delta", type=int, default=2_000)
    ap.add_argument("--n-cells", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from kgc.operators.ann_index import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_maintain,
        read_index_data,
    )
    from kgc.session import get_spark

    spark = get_spark(app_name=f"kgc-ann-index-probe-{args.n}", cpus=args.cpus)
    base = uniform_corpus(spark, args.n).localCheckpoint(eager=True)
    delta = uniform_corpus(spark, args.delta, id_offset=args.n).localCheckpoint(eager=True)
    out: dict = {"n": args.n, "delta": args.delta, "n_cells": args.n_cells}

    root = tempfile.mkdtemp(prefix="kgc_ann_index_probe_")
    try:
        inc = os.path.join(root, "inc")
        t0 = time.time()
        ivf_index_build(base, inc, n_cells=args.n_cells)
        out["build_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        ivf_index_append(spark, inc, delta)
        out["append_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        split = ivf_index_maintain(spark, inc, split_threshold=4 * (args.n // args.n_cells))
        out["maintain_sec"] = round(time.time() - t0, 2)
        out["cells_split"] = len(split)

        # rebuild over the full corpus WITH the same codebook (index identity)
        cb = spark.read.parquet(os.path.join(inc, "codebook"))
        cents = [(r["c_id"], list(r["cv"])) for r in cb.collect()]
        full = base.unionByName(delta)
        bat = os.path.join(root, "bat")
        t0 = time.time()
        ivf_index_build(full, bat, centroids=cents)
        out["rebuild_sec"] = round(time.time() - t0, 2)
        out["append_vs_rebuild"] = round(out["append_sec"] / out["rebuild_sec"], 3)
        out["rows_inc"] = read_index_data(spark, inc).count()
        out["rows_bat"] = read_index_data(spark, bat).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
