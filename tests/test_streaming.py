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
