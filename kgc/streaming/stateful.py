"""op-44 extension: custom stateful streaming operators.

- running_touch_profiles: per-user running distinct-event-type profile via
  applyInPandasWithState — the streaming rendering of op-23 (touch-profile
  build): state = the set of types seen so far; each micro-batch emits the
  user's updated degree. GroupStateTimeout is off (profiles never expire in
  the GraphGist model; a production deployment would use event-time timeout
  keyed to the attribution window).
- sessionized_counts: session_window aggregation (gap-based) — the
  streaming sessionization primitive.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kgc.streaming.touches import _read_stream

PROFILE_STATE = T.StructType([T.StructField("types", T.ArrayType(T.StringType()), True)])
PROFILE_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("deg", T.IntegerType(), False),
        T.StructField("types", T.ArrayType(T.StringType()), False),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        seen.update(pdf["event_type"].dropna().tolist())
    types: list[Any] = sorted(seen)
    state.update((types,))
    yield pd.DataFrame({"user_id": [key[0]], "deg": [len(types)], "types": [types]})


def running_touch_profiles(
    spark: SparkSession, events_path: str, query_name: str = "kgc_stream_profiles"
) -> DataFrame:
    """Drive the finite events stream to completion; returns the final
    per-user profile rows (update mode — last emit per user wins)."""
    stream = _read_stream(spark, events_path).withColumn("ts", F.col("ts").cast("timestamp"))
    profiles = stream.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_OUT,
        stateStructType=PROFILE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    q = profiles.writeStream.outputMode("update").format("memory").queryName(query_name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode memory sink appends each emit; keep the last per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("deg").desc())
    return (
        spark.table(query_name)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "deg", "types")
    )


def sessionized_counts(
    spark: SparkSession, events_path: str, gap: str = "30 minutes", query_name: str = "kgc_stream_sessions"
) -> DataFrame:
    """Session-window aggregation: events of a user within `gap` of each
    other form one session; emits per-session event counts."""
    stream = _read_stream(spark, events_path).withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    q = agg.writeStream.outputMode("complete").format("memory").queryName(query_name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name).select(
        "user_id", F.unix_timestamp(F.col("w.start")).alias("session_start_epoch"), "n"
    )
