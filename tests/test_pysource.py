"""op-55: the Python DataSource connector (kgc/sources/pysource.py) —
batch reads must equal the native parquet source row-for-row, and the
stream must deliver deterministic chunk-sized micro-batches."""

import os
import time

import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registered(spark):
    from kgc.sources.pysource import register_chunked_source

    register_chunked_source(spark)
    return spark


class TestChunkedBatch:
    def test_rowset_equals_native_parquet(self, registered):
        spark = registered
        p = f"{SF_DIR}/documents.parquet"
        got = spark.read.format("kgc_chunked").option("path", p).option("chunk", "120").load()
        want = spark.read.parquet(p)
        assert got.schema == want.schema
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_partitioning_follows_chunk_option(self, registered):
        spark = registered
        p = f"{SF_DIR}/documents.parquet"
        got = spark.read.format("kgc_chunked").option("path", p).option("chunk", "120").load()
        assert got.rdd.getNumPartitions() == 5  # ceil(500 / 120)


class TestChunkedStream:
    def test_deterministic_chunk_sized_microbatches(self, registered, tmp_path):
        spark = registered
        p = f"{SF_DIR}/documents.parquet"
        stream = (
            spark.readStream.format("kgc_chunked")
            .option("path", p).option("chunk", "120").load()
        )
        seen = []

        def sink(bdf, bid):
            rows = bdf.select("doc_id").collect()
            if rows:
                seen.append((bid, sorted(r["doc_id"] for r in rows)))

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline and sum(len(ids) for _, ids in seen) < 500:
            time.sleep(0.5)
        q.stop()
        sizes = [len(ids) for _, ids in seen]
        assert sizes == [120, 120, 120, 120, 20], sizes
        all_ids = sorted(i for _, ids in seen for i in ids)
        want = sorted(
            r["doc_id"] for r in spark.read.parquet(p).select("doc_id").collect()
        )
        assert all_ids == want  # exactly-once row coverage across batches
