"""op-10/13/45/47: batched mention detection over document spans.

Reproduces what the reference GraphGist's notebook *knows by construction*
(which individual touched which activity) by actually extracting it from the
interleaved text+media spans — the KG-construction step the north star names:
"vectorized pandas/Arrow UDFs do batched mention-detection ... over document
spans".

Two carriers for the same pattern bank:
- ``detect_mentions_udf`` — scalar pandas UDF, Series[str] → Series[list[
  struct]] (op-10/45): used where an expression-positioned detector is handy.
- ``extract_mentions`` — ``mapInPandas`` flat-map (op-47): the pipeline hot
  path. One Arrow round trip, mentions emitted as rows directly (no
  array<struct> reassembly + explode). String work is compiled-``finditer``
  over the Arrow batch — measured FASTER than ``Series.str.extractall``
  (which loops in Python too, plus per-pattern DataFrame assembly), and it
  yields the ``char_start``/``char_end`` provenance offsets extractall
  cannot produce.

op-13 extracts activity references baked into media_ref filenames with
builtin ``regexp_extract`` (no UDF — stays JVM-side).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgc.schemas import MENTION, MENTIONS

IND = r"(?:I-\d{4,}|ind_\d{4,}|Individual #\d+)"  # {4,}: widths scale past 10k individuals (synth.ind_width)
TS = r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"

# group-name → MENTION column; absent groups come back NaN → None.
PATTERNS: dict[str, str] = {
    "touch": rf"(?P<ind>{IND}) opened email (?P<act>act-\d{{3}}) of campaign (?P<cmp>cmp-\d{{2}}) at (?P<ts>{TS})",
    "conversion": rf"campaign (?P<cmp>cmp-\d{{2}}) converted (?P<ind>{IND}) at (?P<ts>{TS})",
    "purchase": rf"(?P<ind>{IND}) purchased (?P<prd>prd-\d{{4}}) at (?P<ts>{TS})",
    "media_touch": rf"photo of (?P<ind>{IND}) at webinar (?P<act>act-\d{{3}})",
}
_GROUPS = ["ind", "act", "cmp", "prd", "ts"]
_OUT_COLS = ["mention_type", "ind_surface", "act_surface", "cmp_surface", "prd_surface",
             "ts_str", "match_idx", "char_start", "char_end"]
_COMPILED = {mtype: re.compile(pat) for mtype, pat in PATTERNS.items()}
# Literal substring each pattern REQUIRES (present verbatim in its regex):
# a C-speed `in` check gates the (much costlier) regex scan per row, so the
# ~3/4 of (pattern, span) combinations that cannot match never reach re (r6).
_PREFILTER = {
    "touch": " opened email ",
    "conversion": " converted ",
    "purchase": " purchased ",
    "media_touch": "photo of ",
}


def _extract_frame(text: pd.Series) -> pd.DataFrame:
    """Run the pattern bank over a text Series; rows = mentions, indexed by
    the original Series position (column 'pos').

    Compiled finditer over the batch: the only per-element Python is the re
    module's own match loop (extractall pays the same loop PLUS per-pattern
    DataFrame assembly — finditer benches ~15% faster), and match objects
    carry the span() provenance offsets the KG schema wants."""
    cols = ["pos", "match", "mention_type", *_GROUPS, "char_start", "char_end"]
    vals = text.to_numpy()
    rows: list[tuple] = []
    for mtype, cpat in _COMPILED.items():
        marker = _PREFILTER[mtype]
        for pos, txt in enumerate(vals):
            if marker not in txt:
                continue
            for j, m in enumerate(cpat.finditer(txt)):
                g = m.groupdict()
                rows.append((pos, j, mtype, g.get("ind"), g.get("act"), g.get("cmp"),
                             g.get("prd"), g.get("ts"), m.start(), m.end()))
    if not rows:
        return pd.DataFrame(columns=cols)
    out = pd.DataFrame(rows, columns=cols)
    # deterministic order within a span: by pattern name then match number
    out = out.sort_values(["pos", "mention_type", "match"], kind="mergesort").reset_index(drop=True)
    out["match_idx"] = out.groupby("pos").cumcount().astype("int32")
    out["char_start"] = out["char_start"].astype("int32")
    out["char_end"] = out["char_end"].astype("int32")
    return out


@F.pandas_udf(T.ArrayType(MENTION))
def detect_mentions_udf(text: pd.Series) -> pd.Series:
    """op-10: Series[str|None] → Series[list[mention struct]]."""
    frame = _extract_frame(text.fillna(""))
    if len(frame) == 0:
        return pd.Series([[] for _ in range(len(text))], index=text.index)
    frame = frame.rename(
        columns={"ind": "ind_surface", "act": "act_surface", "cmp": "cmp_surface", "prd": "prd_surface", "ts": "ts_str"}
    )
    recs = frame.groupby("pos").apply(lambda g: g[_OUT_COLS].where(g[_OUT_COLS].notna(), None).to_dict("records"))
    out = pd.Series([[]] * len(text), index=range(len(text)), dtype=object)
    out.loc[recs.index] = recs
    out.index = text.index
    return out


def extract_mentions(spans: DataFrame, jvm_prefilter: bool = True) -> DataFrame:
    """op-47 hot path: flat spans → MENTIONS rows via mapInPandas.

    Only (doc_id, span_idx, text) cross the Arrow boundary — Catalyst prunes
    media_ref/offset at the scan (nested-schema pruning when reading DOCS).

    ``jvm_prefilter`` (r6, default on): every pattern in the bank REQUIRES
    one of four literal markers, so a JVM-side `contains` disjunction drops
    never-matching spans (filler prose, NULL-text media) BEFORE they are
    transposed into Arrow batches and shipped to Python — the guide-§4 rule
    that the byte you control best at the Python boundary is the one that
    never crosses it. Output is identical: a markerless span yields zero
    mentions either way. Pass False when `spans` comes straight off the
    generator (kgc/plans/run.py build_triples_fused): a Spark filter on a
    generator-extracted field defeats GeneratorNestedColumnAliasing and
    would drag every span field through the projection — there the NULL/
    filler rows are still dropped inside the batch as before.
    """
    narrow = spans.select("doc_id", "span_idx", "text")
    if jvm_prefilter:
        marker = None
        for lit in _PREFILTER.values():
            cond = F.col("text").contains(lit)
            marker = cond if marker is None else (marker | cond)
        narrow = narrow.filter(marker)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["text"].notna()].reset_index(drop=True)
            if len(pdf) == 0:
                continue
            frame = _extract_frame(pdf["text"])
            if len(frame) == 0:
                continue
            frame["doc_id"] = pdf["doc_id"].to_numpy()[frame["pos"].to_numpy()]
            frame["span_idx"] = pdf["span_idx"].to_numpy()[frame["pos"].to_numpy()]
            frame = frame.rename(
                columns={"ind": "ind_surface", "act": "act_surface", "cmp": "cmp_surface",
                         "prd": "prd_surface", "ts": "ts_str"}
            )
            yield frame[["doc_id", "span_idx", *_OUT_COLS]].where(
                frame[["doc_id", "span_idx", *_OUT_COLS]].notna(), None
            )

    return narrow.mapInPandas(run, schema=MENTIONS)


def extract_media_mentions(spans: DataFrame) -> DataFrame:
    """op-13: activity references baked into media filenames —
    's3://media/vid_<hex>_act-240.mp4' → 'act-240'. Builtin regexp, no UDF."""
    return (
        spans.filter(F.col("media_ref").isNotNull())
        .select(
            "doc_id",
            "span_idx",
            F.regexp_extract("media_ref", r"_(act-\d{3})\.", 1).alias("act_surface"),
        )
        .filter(F.col("act_surface") != "")
    )
