"""Multimodal column handling: media spans as opaque refs + typed metadata.

Real image/audio/video decode libraries are not available in this
environment, so the decode step is STUBBED behind ``decode_media`` (raises
NotImplementedError) with a clearly-marked deterministic fake
(``_fake_decode``) standing in. Everything Spark-side — nested-schema-pruned
scan of media spans, Arrow-batched ``mapInPandas``, explicit output schema,
partition-preserving batch shape — is real and tested; swapping
``_fake_decode`` for a PIL/ffmpeg call is the only change needed on a
cluster with the codecs installed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("content_fp", T.StringType(), False),
    ]
)


def decode_media(media_bytes: bytes, kind: str) -> dict:
    """The real decode hook (image open / video frame-sample). Not available
    in this environment — plug in PIL / pyav here on a real cluster."""
    raise NotImplementedError("media codecs not installed; use _fake_decode")


def _fake_decode(md5_hex: str) -> tuple[int, int]:
    """Deterministic stand-in for decode: pseudo dimensions from the content
    fingerprint (mirrored 1:1 by the DuckDB oracle SQL)."""
    width = 64 + (ord(md5_hex[0]) * 131 + ord(md5_hex[1])) % 1857
    height = 64 + (ord(md5_hex[2]) * 131 + ord(md5_hex[3])) % 1017
    return width, height


FRAME_SAMPLES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_fp", T.StringType(), False),
    ]
)


def sample_video_frames(spans: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame-sampling plumbing for video spans: emits n_frames rows per
    video span via mapInPandas (a flat-map — the real decode would seek
    n uniformly-spaced frames; the stubbed frame fingerprint is
    md5(media_ref + ':' + frame_idx), mirrored by the SQL oracle)."""
    videos = spans.filter(F.col("kind") == "video").select("doc_id", "span_idx", "media_ref")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rep = pdf.loc[pdf.index.repeat(n_frames)].reset_index(drop=True)
            rep["frame_idx"] = (rep.groupby(["doc_id", "span_idx"]).cumcount()).astype("int32")
            rep["frame_fp"] = (rep["media_ref"] + ":" + rep["frame_idx"].astype(str)).map(
                lambda s: hashlib.md5(s.encode()).hexdigest()
            )
            yield rep[["doc_id", "span_idx", "frame_idx", "frame_fp"]]

    return videos.mapInPandas(run, schema=FRAME_SAMPLES)


def extract_media_features(spans: DataFrame) -> DataFrame:
    """Media spans → (doc_id, span_idx, kind, width, height, content_fp)
    via Arrow-batched mapInPandas. Only 4 narrow columns cross the boundary."""
    media = spans.filter(F.col("media_ref").isNotNull()).select(
        "doc_id", "span_idx", "kind", "media_ref"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            fps = pdf["media_ref"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
            dims = fps.map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"],
                    "kind": pdf["kind"],
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "content_fp": fps,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_FEATURES)
