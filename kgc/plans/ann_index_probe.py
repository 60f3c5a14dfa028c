"""op-63/op-64 scale evidence: incremental append vs full rebuild cost,
and the streaming-ingest path's pricing.

The op-63 claim worth measuring: ivf_index_append is O(new vectors) — it
never reads or rewrites existing rows — so appending a small delta to a
large stored index should cost a small fraction of rebuilding it, while
(append + maintain) keeps the stored state BIT-EQUAL to the rebuild (the
tests pin equality; this probe prices it).

The op-64 claims (--streaming): the drain is O(batch) (assignment +
delta-log append, no stored rows read); the live query's overhead over a
stored-only query is the small delta scan; the flush reads only the
TOUCHED skey partitions — the probe reports touched/total so the honest
caveat is measurable: a delta that scatters across every cell makes
flush read the whole store, so at scale flushes should be batched until
|touched cells| << |cells| or deltas are cell-skewed (which streams
naturally are — arrival locality).

Usage: python kgc/plans/ann_index_probe.py [--n 200000] [--delta 2000]
       [--n-cells 64] [--cpus N] [--streaming]
Prints one JSON line: build / append / maintain / rebuild walls + the
append:rebuild ratio; with --streaming instead: ingest / live-query /
flush / stored-query walls + touched-partition accounting.
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


def streaming_probe(args) -> None:
    """Price the op-64 lifecycle on the same corpus shapes as the op-63
    probe: build(base) → stream-drain the delta → live query → flush →
    stored query. Equality with the append path is pinned in tests; this
    measures what each step costs and how many partitions flush touches."""
    from kgc.operators.ann_index import ivf_index_build, ivf_index_query, read_index_data
    from kgc.session import get_spark
    from kgc.streaming.ann_index import (
        ivf_index_flush,
        ivf_index_query_live,
        read_index_delta,
        streaming_index_ingest,
    )

    spark = get_spark(app_name=f"kgc-ann-stream-probe-{args.n}", cpus=args.cpus)
    base = uniform_corpus(spark, args.n).localCheckpoint(eager=True)
    delta = uniform_corpus(spark, args.delta, id_offset=args.n).localCheckpoint(eager=True)
    queries = uniform_corpus(spark, 200, id_offset=10 * args.n).localCheckpoint(eager=True)
    out: dict = {"mode": "streaming", "n": args.n, "delta": args.delta,
                 "n_cells": args.n_cells}

    root = tempfile.mkdtemp(prefix="kgc_ann_stream_probe_")
    try:
        idx = os.path.join(root, "idx")
        t0 = time.time()
        ivf_index_build(base, idx, n_cells=args.n_cells)
        out["build_sec"] = round(time.time() - t0, 2)

        sd, ck = os.path.join(root, "stream"), os.path.join(root, "ckpt")
        delta.write.mode("append").parquet(sd)
        t0 = time.time()
        streaming_index_ingest(spark, sd, idx, ck)
        out["ingest_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        n_live = ivf_index_query_live(spark, idx, queries=queries, k=5, nprobe=4).count()
        out["live_query_sec"] = round(time.time() - t0, 2)

        touched = read_index_delta(spark, idx).select("skey").distinct().count()
        total = read_index_data(spark, idx).select("skey").distinct().count()
        t0 = time.time()
        flushed = ivf_index_flush(spark, idx)
        out["flush_sec"] = round(time.time() - t0, 2)
        out["touched_skeys"], out["total_skeys"] = touched, total
        out["flushed_partition_rows"] = flushed

        t0 = time.time()
        n_stored = ivf_index_query(spark, idx, queries=queries, k=5, nprobe=4).count()
        out["stored_query_sec"] = round(time.time() - t0, 2)
        out["rows_total"] = read_index_data(spark, idx).count()
        assert n_live == n_stored, (n_live, n_stored)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--delta", type=int, default=2_000)
    ap.add_argument("--n-cells", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--streaming", action="store_true", help="price the op-64 path")
    args = ap.parse_args()

    if args.streaming:
        return streaming_probe(args)

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
