"""op-05: per-partition lineage + metrics.

After each stage checkpoint, one cheap scan over the materialized table
records (stage, partition_id, rows_out, fingerprint) where fingerprint is an
order-independent sum of per-row xxhash64 — equal fingerprints across a
resume prove the stage reproduced byte-identical content partition by
partition (determinism §2.4-E makes this meaningful).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame):
    # direct multi-column xxhash64 — stays in whole-stage codegen; to_json
    # would build a string per row (~4× slower on wide/large tables)
    return F.xxhash64(*[F.col(c) for c in df.columns])


def partition_metrics(df: DataFrame, stage: str) -> DataFrame:
    row_hash = _row_hash(df)
    return (
        df.select(F.spark_partition_id().alias("partition_id"), row_hash.alias("h"))
        .groupBy("partition_id")
        .agg(F.count("*").alias("rows_out"), F.expr("bit_xor(h)").alias("fingerprint"))
        .select(F.lit(stage).alias("stage"), "partition_id", "rows_out", "fingerprint")
    )


def emit_metrics(df: DataFrame, stage: str, metrics_dir: str) -> None:
    out = os.path.join(metrics_dir, stage)
    partition_metrics(df, stage).write.mode("overwrite").parquet(out)


def table_fingerprint(df: DataFrame) -> int:
    """Order/partitioning-independent whole-table fingerprint."""
    r = df.select(_row_hash(df).alias("h")).agg(F.expr("bit_xor(h)").alias("fp"), F.count("*").alias("n")).collect()[0]
    return hash((r["fp"], r["n"]))
