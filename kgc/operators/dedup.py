"""Training-data deduplication + similarity-search operators.

The large-scale training-pipeline family (graded alongside the KG ops):

- exact dedup: hash-groupBy (see __spark_entry__.q_dd_exact_hash)
- minhash banding over word shingles (q_dd_minhash_buckets; md5-keyed so
  the DuckDB oracle reproduces it bit-for-bit)
- n-gram Jaccard verify (q_dd_jaccard_pairs)
- SimHash (here): 64-bit near-dup fingerprints + banded candidate join +
  exact Hamming verify — the shape that scales: candidates come from
  16-bit band equality (4 bands → Hamming ≤ 3 is always recalled), verify
  is `bit_count(xor) <= k` in the JVM.
- embedding near-dup / ANN (here): signed-random-projection LSH buckets +
  exact cosine verify; brute-force cosine is the small-scale oracle
  (__spark_entry__.q_ann_cosine_topk).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Word-shingle MinHash (single-signature blocking + banded b×r LSH)
# ---------------------------------------------------------------------------


def words_col(text_col: str = "text"):
    """Lowercased whitespace-split word array (identical split in DuckDB:
    string_split_regex(lower(text), '\\s+'))."""
    return F.split(F.lower(F.col(text_col)), r"\s+")


def shingles_col(words: str = "_words", k: int = 3):
    """Word k-shingles as strings (builtin transform + slice) over a
    PRE-MATERIALIZED words column (`.withColumn("_words", words_col())`
    first). Inlining split() into the lambda re-evaluates it per shingle
    index (Catalyst project-collapse keeps multi-referenced columns
    un-collapsed) — measured 9.4s → 3.8s at sf0.1."""
    w = F.col(words)
    n = F.greatest(F.size(w) - (k - 1), F.lit(0))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(w, i, k)),
    )


def doc_shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sh) — distinct word k-shingle sets per doc; empty-set docs are
    dropped (no signature is defined for them on either engine).

    The drop predicate is `size(words) >= k` (⟺ non-empty shingle set:
    shingle count = size(words) − k + 1, and array_distinct never empties a
    non-empty array) — filtering on `size(sh) > 0` instead makes predicate
    pushdown re-derive the ENTIRE shingle construction inside the Filter
    node, doubling the per-row work (measured in the r3 bench; the plan
    showed array_distinct(transform(...)) twice)."""
    return (
        docs.withColumn("_words", words_col(text_col))
        .filter(F.size("_words") >= k)
        .select(F.col(id_col).alias("id"), F.array_distinct(shingles_col("_words", k)).alias("sh"))
    )


def minhash_band_keys(
    shingled: DataFrame, bands: int = 8, rows: int = 2, agg_shape: bool = False
) -> DataFrame:
    """b×r banded MinHash blocking keys over doc_shingles() output.

    sig[i] = min over shingles of md5(i || ':' || shingle) for i in
    [0, bands·rows); band j's key = md5(sig[j·r] || '|' || ... sig[j·r+r-1]).
    md5 (not xxhash64) so the DuckDB oracle reproduces every byte; all
    builtin higher-order functions — hashes never leave the JVM. Candidate
    recall for Jaccard j is 1-(1-j^r)^b (b=8, r=2: 0.90 at j=0.5, ~1.0 at
    j=0.9) and tunable per use case, unlike the r2 single-signature blocker
    (b=1, r=1). Returns (id, band_idx, band_key)."""
    n = bands * rows
    if agg_shape:
        # r6 alternate execution shape (same bytes out), for consumers that
        # MATERIALIZE the band keys (banded_candidates localCheckpoints
        # them): the HOF form below runs INTERPRETED (higher-order
        # functions don't whole-stage-codegen), so exploding shingles once
        # and computing the n seeds as ordinary md5 columns under a
        # map-side-combined min groupBy keeps every hash in codegen —
        # measured 2.9 s → 2.0 s materializing sf0.1 band keys (banded
        # pairs 4.4 → 3.3 s, jaccard gate query 2.8 → 1.6 s). min(md5) over
        # exploded rows ≡ array_min over the array (same UTF8 ordering,
        # duplicates irrelevant, doc_shingles guarantees non-empty sets).
        # NOT the default: the n var-width string mins force an
        # ObjectHashAggregate, so for one-shot LAZY consumers (the buckets
        # gate query aggregates the keys straight away) this shape is
        # measurably WORSE (1.8 → 4.4 s) — those keep the map-only HOF form
        # whose output flows directly into their own aggregation.
        ex = shingled.select("id", F.explode("sh").alias("_s"))
        mins = ex.groupBy("id").agg(
            *[
                F.min(
                    F.md5(F.concat_ws(":", F.lit(i).cast("string"), F.col("_s")))
                ).alias(f"_sig{i}")
                for i in range(n)
            ]
        )
        band = F.array(
            *[
                F.md5(
                    F.concat_ws("|", *[F.col(f"_sig{j * rows + i}") for i in range(rows)])
                )
                for j in range(bands)
            ]
        )
        return mins.select("id", F.posexplode(band).alias("band_idx", "band_key"))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.array_min(
            F.transform(F.col("sh"), lambda s: F.md5(F.concat_ws(":", i.cast("string"), s)))
        ),
    )
    # Double-reference `sh` (size() guard is always true after doc_shingles'
    # word-count filter) so CollapseProject keeps the shingle construction
    # in its OWN projection: single-referenced, it gets inlined into the
    # n-iteration signature transform, whose lambda re-evaluates the
    # loop-invariant construction per seed — measured 16× the CPU at b=8,
    # r=2 (the same multi-reference rule the r2 `_words` fix relied on).
    sig_guarded = F.when(F.size("sh") >= 0, sig)
    band = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.md5(F.concat_ws("|", F.slice(F.col("_sig"), j * rows + 1, rows))),
    )
    return (
        shingled.withColumn("_sig", sig_guarded)
        .select("id", F.posexplode(band).alias("band_idx", "band_key"))
    )


def minhash_banded_buckets(
    docs: DataFrame, bands: int = 8, rows: int = 2, k: int = 3
) -> DataFrame:
    """Blocking buckets with >1 member — the banded generalization of the
    single-signature q_dd_minhash_buckets."""
    bk = minhash_band_keys(doc_shingles(docs, k), bands, rows)
    return (
        bk.groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("n"), F.min("id").alias("keep_doc_id"))
        .filter(F.col("n") > 1)
    )


def banded_candidates(bk: DataFrame, max_bucket: int | None = None) -> DataFrame:
    """Distinct candidate (id_a < id_b) pairs from minhash_band_keys output,
    optionally dropping buckets above the hot-bucket cap. Shared by
    minhash_banded_pairs and the recall harness so the evidence always
    measures the shipped candidate rule.

    `bk` is localCheckpointed (r6): the b·r md5-signature transform behind
    it is the dominant per-row cost and feeds THREE consumers (the bucket-
    size cap and both differently-aliased self-join branches), which
    exchange reuse cannot deduplicate — un-materialized it ran three times.
    O(docs·bands) rows, linear at any scale (the `sh` checkpoint rationale)."""
    bk = bk.localCheckpoint(eager=True)
    if max_bucket is not None:
        sizes = bk.groupBy("band_idx", "band_key").agg(F.count("*").alias("_m"))
        bk = bk.join(
            sizes.filter(F.col("_m") <= max_bucket).drop("_m"),
            ["band_idx", "band_key"], "left_semi",
        )
    a = bk.select(F.col("id").alias("id_a"), "band_idx", "band_key")
    b = bk.select(F.col("id").alias("id_b"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_banded_pairs(
    docs: DataFrame,
    bands: int = 8,
    rows: int = 2,
    k: int = 3,
    threshold: float = 0.10,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-dup pairs: banded-minhash candidates → exact Jaccard verify.

    Scale shape: candidates come from an equi-join on (band_idx, band_key)
    — no low-cardinality blocking key (the r2 source-blocked verify was
    ~N²/20 pairs per block; VERDICT r2 #1) — and the shingle arrays are
    joined back onto the candidate ids AFTER the dedup, so the band join
    shuffles ids only. Emitted Jaccards are exact; only candidate recall
    is probabilistic (1-(1-j^r)^b).

    ``max_bucket`` is the hot-bucket (posting-list) cap: a bucket with m
    members contributes C(m,2) candidate pairs, so a template-heavy corpus
    — where thousands of near-identical docs share every band — turns the
    self-join quadratic (measured: a 1M-doc synthetic corpus with 262k
    multi-member buckets OOM-spiraled the uncapped join; capped at 64 it
    finishes in ~2 min). Buckets above the cap are excluded from PAIRWISE
    enumeration — dedup for those groups belongs to the bucket-level
    keep-min policy (minhash_banded_buckets), the standard split at scale.

    The shingle table is localCheckpointed: it feeds the band-key side AND
    both probe sides of the verify join (three different shuffle keys, so
    no exchange reuse) — unmaterialized, the dominant shingle-construction
    cost runs three times (r3 review finding).
    """
    sh = doc_shingles(docs, k).localCheckpoint(eager=True)
    # agg_shape: the band keys are materialized right away (banded_candidates
    # checkpoints them), which is the regime where the codegen agg rendering
    # wins — see minhash_band_keys
    cand = banded_candidates(minhash_band_keys(sh, bands, rows, agg_shape=True), max_bucket)
    sa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    # guide §3.1 (r6): below ~50k docs the shingle table (≈3 KB/doc → tens
    # of MB built) broadcasts into the verify join instead of the planner's
    # default sort-merge (a localCheckpoint reports default-huge stats),
    # which shuffled + sorted the CANDIDATE pair table twice just to attach
    # shingle arrays. Above the threshold the sort-merge shape stands — at
    # corpus scale the shingle table is the big side and must shuffle.
    if sh.count() <= 50_000:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    raw = inter.cast("double") / union
    # filter on the UNROUNDED value — the DuckDB oracle compares the raw
    # quotient, and a rounded-vs-raw threshold would diverge within 5e-10
    # of the boundary (r3 review finding); round only in the projection
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(raw >= threshold)
        .select("id_a", "id_b", F.round(raw, 9).alias("jaccard"))
    )


def keep_best_per_cluster(
    docs: DataFrame,
    cc: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality_score",
) -> DataFrame:
    """op-61 (r5): keep-BEST-by-quality per near-dup cluster — the
    curation-grade keep rule (VERDICT r4 #4). dd_dup_clusters keeps the
    min-id member; a training pipeline wants the highest-quality one.

    Keep = the member with the max `quality_col` (already rounded to 6dp
    by quality_features — the §2.4 rank-on-rounded rule), doc id ASC as
    the tie-break; docs in no cluster keep themselves; clustered docs
    missing a quality row (empty text) score 0.0 (the curate.py rule).

    Scale shape: ONLY clustered members (the tiny fraction CC emits) pass
    through the per-cluster rank window — rank ≤ 1, so Spark 4 trims it
    map-side (WindowGroupLimit); singletons never shuffle. The final
    assignment is a left join of the corpus against the clustered-member
    dim on id — broadcastable whenever near-dups are rare, SMJ otherwise.

    `cc`: (node, component) from connected_components; `quality`:
    (id_col, quality_col). Returns (id_col, keep_doc_id).
    """
    from pyspark.sql import Window

    members = docs.select(F.col(id_col).alias("node")).join(cc, "node")
    mq = members.join(
        quality.select(F.col(id_col).alias("node"), F.col(quality_col).alias("_q")),
        "node",
        "left",
    ).select("node", "component", F.coalesce("_q", F.lit(0.0)).alias("_q"))
    w = Window.partitionBy("component").orderBy(F.col("_q").desc(), F.col("node").asc())
    keeper = (
        mq.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("component", F.col("node").alias("_keep"))
    )
    assign = members.join(keeper, "component").select(
        F.col("node").alias(id_col), "_keep"
    )
    return docs.select(id_col).join(assign, id_col, "left").select(
        id_col, F.coalesce("_keep", F.col(id_col)).alias("keep_doc_id")
    )


def jaccard_pairs_bruteforce(
    docs: DataFrame, k: int = 3, threshold: float = 0.10
) -> DataFrame:
    """All-pairs exact Jaccard — the small-scale recall oracle for
    minhash_banded_pairs (declared quadratic; never the scale path)."""
    sh = doc_shingles(docs, k)
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    raw = inter.cast("double") / union
    return (
        a.crossJoin(b)
        .filter((F.col("id_a") < F.col("id_b")) & (raw >= threshold))
        .select("id_a", "id_b", F.round(raw, 9).alias("jaccard"))
    )


def bench_shingles_exploded(
    bench: DataFrame, k: int = 3, max_bench_df: int | None = 64
) -> DataFrame:
    """(bench_id, shingle) — the benchmark side of the decontamination
    join, with the stop-shingle DF cap applied (see contamination_pairs
    for why the cap is load-bearing). Shared by the batch operator and the
    streaming twin (kgc/streaming/dedup.streaming_decontam), so both
    apply the identical bench-side rule."""
    bsh = doc_shingles(bench, k)
    # localCheckpoint (r6): the exploded bench shingles feed the DF-cap agg
    # AND the semi-join probe side, so the bench-side shingle construction
    # ran twice un-materialized. The bench table is the SMALL side by
    # contract (broadcast downstream), so the materialization is bounded;
    # it is also static even under the streaming twin (the stream is the
    # train side).
    b = bsh.select(
        F.col("id").alias("bench_id"), F.explode_outer("sh").alias("shingle")
    ).localCheckpoint(eager=True)
    if max_bench_df is not None:
        dfc = b.groupBy("shingle").agg(F.count("*").alias("_df"))
        b = b.join(
            dfc.filter(F.col("_df") <= max_bench_df).drop("_df"), "shingle", "left_semi"
        )
    return b


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    k: int = 3,
    min_overlap: int = 2,
    max_bench_df: int | None = 64,
) -> DataFrame:
    """Test-set decontamination: (train_id, bench_id) pairs whose word
    k-shingle sets overlap — the standard n-gram-overlap check a training
    pipeline runs against held-out eval sets before a corpus ships.

    Scale shape: eval sets are SMALL relative to the corpus (thousands of
    benchmark docs vs billions of training docs), so the exploded benchmark
    shingle table is broadcast and the train side streams through a
    map-side hash join — no shuffle of the 100-TB side. `containment` =
    |overlap| / |train shingle set| is the asymmetric score that matters
    for contamination (how much of the training doc is benchmark material).

    ``max_bench_df`` (applied via bench_shingles_exploded, shared with the
    streaming twin) is the STOP-SHINGLE cap, and it is load-bearing: the
    join emits train_df(s) × bench_df(s) rows per shingle, so one template
    shingle shared by 10^5 train docs and 10^4 bench docs is a 10^9-row
    hot key (measured: the 1M-doc template-heavy synth corpus ran its
    decontam stage >11 min before being killed; capped it completes).
    Dropping benchmark shingles with document frequency > C bounds the
    join output by C × (train shingle stream) — LINEAR — and is applied to
    the broadcast side only, so the big side stays untouched. Semantically
    it is IDF pruning: an n-gram occurring in >C benchmark docs is boiler-
    plate, not contamination evidence. The DuckDB oracle mirrors the cap.

    Returns (train_id, bench_id, n_common, containment) for pairs with
    n_common >= min_overlap.
    """
    tsh = doc_shingles(train, k)
    # explode_OUTER, not explode: plain explode makes Catalyst infer a
    # `size(sh) > 0` filter and push it below the projection, re-deriving
    # the ENTIRE shingle construction inside the Filter node (~2× the
    # dominant per-row cost — seen in the r3 plan dump). doc_shingles
    # already guarantees non-empty arrays, so outer ≡ inner here; a
    # (impossible) null shingle would drop at the inner join anyway.
    t = tsh.select(
        F.col("id").alias("train_id"),
        F.size("sh").alias("_n_train"),
        F.explode_outer("sh").alias("shingle"),
    )
    b = bench_shingles_exploded(bench, k, max_bench_df)
    return (
        t.join(F.broadcast(b), "shingle")
        .groupBy("train_id", "bench_id", "_n_train")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_overlap)
        .select(
            "train_id",
            "bench_id",
            "n_common",
            F.round(F.col("n_common") / F.col("_n_train"), 6).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"\w+")


def _simhash64(text: str) -> int:
    """64-bit SimHash over word tokens; token hashes from md5 (stable across
    processes — never Python's salted hash())."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in _TOKEN_RE.findall(text.lower()):
        bits = np.unpackbits(np.frombuffer(hashlib.md5(tok.encode()).digest()[:8], dtype=np.uint8))
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i, pos in enumerate(acc > 0):
        if pos:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out  # to signed long


@F.pandas_udf(T.LongType())
def simhash_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in texts:
        yield batch.fillna("").map(_simhash64).astype("int64")


def simhash_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Banding: 4×16-bit bands — any pair within Hamming 3 shares ≥1 full band
    (pigeonhole), so recall is exact for the threshold; candidates sharing a
    band are verified with bit_count(xor) in the JVM.
    """
    sh = docs.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("sh"))
    bands = sh.select(
        "id", "sh",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("sh"), b * 16).bitwiseAND(F.lit(0xFFFF))
                for b in range(4)
            ])
        ).alias("band_idx", "band_val"),
    )
    a = bands.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "band_idx", "band_val")
    b = bands.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "band_idx", "band_val")
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Embedding near-dup / ANN via signed random projections
# ---------------------------------------------------------------------------


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic hyperplanes: seeded generator evaluated ONCE at plan
    build (constants in the plan — not RNG state inside the data path)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def srp_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    planes = _planes(dim, n_planes, seed)

    @F.pandas_udf(T.LongType())
    def sig(embs: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in embs:
            mat = np.stack(batch.to_numpy())  # (n, dim) float32
            bits = (mat @ planes.T) > 0  # (n, n_planes)
            vals = bits @ (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.Series(vals.astype("int64"), index=batch.index)

    return sig


def _exact_cosine(a: str, b: str):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate embedding pairs (cosine >= threshold).

    Scale path: bucket by signed-random-projection band keys (bands × 8-bit
    chunks of the signature) → candidates share ≥1 band → exact cosine
    verify in the JVM. Emitted cosines are exact; only candidate recall is
    probabilistic (tested vs brute force).
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = srp_signature_udf(dim, n_planes)
    e = emb.select(F.col(id_col).alias("id"), vec.alias("v"), sig(F.col(vec_col)).alias("sig"))
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    band_arr = F.array(*[
        F.shiftrightunsigned(F.col("sig"), b * bits_per_band).bitwiseAND(F.lit(mask))
        for b in range(bands)
    ])
    banded = e.select("id", "v", F.posexplode(band_arr).alias("band_idx", "band_val"))
    a = banded.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "band_idx", "band_val")
    b = banded.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "band_idx", "band_val")
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a", "id_b", F.round(_exact_cosine("v_a", "v_b"), 9).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def ann_topk_lsh(
    emb: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors per vector: SRP-banded candidate
    join + exact re-score + per-group top-k window. The brute-force path
    (q_ann_cosine_topk) is the recall oracle."""
    from pyspark.sql import Window

    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = srp_signature_udf(dim, n_planes)
    e = emb.select(F.col(id_col).alias("id"), vec.alias("v"), sig(F.col(vec_col)).alias("sig"))
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    band_arr = F.array(*[
        F.shiftrightunsigned(F.col("sig"), b * bits_per_band).bitwiseAND(F.lit(mask))
        for b in range(bands)
    ])
    banded = e.select("id", "v", F.posexplode(band_arr).alias("band_idx", "band_val"))
    a = banded.select(F.col("id").alias("q_id"), F.col("v").alias("qv"), "band_idx", "band_val")
    b = banded.select(F.col("id").alias("vec_id"), F.col("v").alias("v"), "band_idx", "band_val")
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .dropDuplicates(["q_id", "vec_id"])
    )
    scored = cand.select("q_id", "vec_id", F.round(_exact_cosine("qv", "v"), 6).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


# ---------------------------------------------------------------------------
# IVF-Flat ANN (inverted-file index: coarse quantizer cells + nprobe search)
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    max_iter: int = 10,
    seed: int = 42,
) -> list:
    """Spherical k-means|| codebook for ivf_cells: vectors are L2-normalized
    (on the unit sphere, Euclidean k-means ≈ cosine clustering) and
    clustered with pyspark.ml KMeans. Returns [(c_id, [float...]), ...].

    This is the TRAINED alternative to ivf_cells' md5-sampled codebook —
    same index structure, better-shaped cells (measured: recall 0.846 →
    see BENCH §4 for the trained point at equal nprobe). Training is an
    OFFLINE index-build step: seeded and reproducible run-to-run on the
    same layout, but float aggregation order makes it bit-nondeterministic
    across partitionings, so trained codebooks stay OUT of the oracle gate
    (the md5-sampled default remains the pinned bit-exact path)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a, x: a + x,
        )
    )
    unit = F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
    train = emb.select(array_to_vector(unit).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(train)
    return [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]


def ivf_cells(
    emb: DataFrame,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest coarse
    centroid (its *cell*) and list the `nprobe` nearest cells to probe at
    query time.

    Centroids are a deterministic hash-ordered sample: the `n_cells`
    vectors with the smallest md5(id) — a disclosed stand-in for k-means||
    training (which is sample-based and iterative; at 10^12 scale you would
    train on a driver-side sample and broadcast the trained codebook — the
    *index structure* below is identical either way). The hash-sample keeps
    the whole index DuckDB-reproducible for the bit-exact oracle.

    Assignment is MAP-ONLY — zero shuffle: the codebook is aggregated into
    a single-row array and broadcast, and each row sorts its own
    (cell-similarity, cell-id) array with builtin higher-order functions.
    The LSH variant's window-rank formulation would shuffle N·C rows here.

    Returns (id, v, vn, cell, probes) where `cell` is the owning cell id,
    `probes` the nprobe nearest cell ids (probes[0] == cell), and vn the
    precomputed L2 norm reused by the re-score join.
    """
    return ivf_assign(
        emb, ivf_codebook(emb, n_cells, id_col, vec_col, centroids),
        nprobe, id_col, vec_col,
    )


def _sq_norm(c):
    return F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)


def ivf_codebook(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """The coarse codebook as a DataFrame (c_id, cv, cn) — split out of
    ivf_cells (r5) so the incremental index (kgc/operators/ann_index.py)
    can PERSIST it and assign appended vectors against the stored copy.
    Same two sources as before: caller-supplied centroid list (trained
    path, non-gate) or the deterministic md5(id)-smallest sample."""
    if centroids is not None:
        # caller-supplied codebook (e.g. train_ivf_centroids) as plan
        # literals — same assignment machinery, non-gate (see trainer note)
        return emb.sparkSession.createDataFrame(
            [(int(c_id), [float(x) for x in cv]) for c_id, cv in centroids],
            "c_id long, cv array<double>",
        ).select("c_id", "cv", F.sqrt(_sq_norm("cv")).alias("cn"))
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    e = emb.select(F.col(id_col).alias("id"), vec.alias("v"))
    return (
        e.orderBy(F.md5(F.col("id").cast("string")))
        .limit(n_cells)
        .select(
            F.col("id").alias("c_id"), F.col("v").alias("cv"),
            F.sqrt(_sq_norm("v")).alias("cn"),
        )
    )


def ivf_assign(
    emb: DataFrame,
    codebook_df: DataFrame,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only coarse assignment of `emb` against an explicit codebook
    DataFrame — the body of ivf_cells, callable with a STORED codebook
    (incremental appends must never re-derive the codebook, or assignments
    drift from the index). Returns (id, v, vn, cell, probes)."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    e = emb.select(F.col(id_col).alias("id"), vec.alias("v"))
    sq_norm = _sq_norm
    # One-row codebook; collect_list order is irrelevant (re-sorted per row).
    codebook = codebook_df.agg(F.collect_list(F.struct("c_id", "cv", "cn")).alias("cents"))
    rows = (
        e.crossJoin(F.broadcast(codebook))  # 1-row build side: map-side append
        .withColumn("vn", F.sqrt(sq_norm("v")))
    )
    # Per-row cell ranking: struct sort on (-csim, c_id) == csim DESC, c_id
    # ASC — byte-identical to the oracle's row_number() ORDER BY. csim is
    # rounded to 9 (rank-on-rounded, §2.4) so both engines rank equal keys
    # by c_id. `vn` is referenced inside the lambda AND by the final select,
    # so CollapseProject keeps it materialized (not re-evaluated per cell).
    sims = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            (-F.round(
                F.aggregate(
                    F.zip_with(F.col("v"), c["cv"], lambda x, y: x * y),
                    F.lit(0.0), lambda acc, x: acc + x,
                ) / (F.col("vn") * c["cn"]), 9,
            )).alias("nk"),
            c["c_id"].alias("c_id"),
        ),
    )
    ranked = rows.withColumn("_cells", F.array_sort(sims))
    probes = F.transform(
        F.slice("_cells", 1, nprobe), lambda s: s["c_id"]
    )
    return ranked.select(
        "id", "v", "vn",
        F.element_at("_cells", 1)["c_id"].alias("cell"),
        probes.alias("probes"),
    )


def ann_topk_ivf(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
    max_cell: int | None = 256,
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF-Flat index — the
    partition-pruned alternative to the SRP-LSH scale path (ann_topk_lsh):
    each vector lives in exactly ONE cell, queries probe their `nprobe`
    nearest cells, and the candidate join is a plain equi-join on `cell`
    (cells are disjoint, so no candidate dedup shuffle is needed — the LSH
    variant must dropDuplicates across overlapping bands).

    At scale: cells are the shuffle/partition key (choose n_cells ≈ √N and
    bucket the stored table BY cell so probe joins are co-located and
    untouched cells are never read — the IVF analog of partition pruning).
    Recall/cost is tuned by nprobe alone, independent of the stored layout.

    `max_cell` (VERDICT r3 #3 — the IVF rendering of the minhash
    `max_bucket` cap): a degenerate codebook (all vectors near one
    centroid) makes the candidate equi-join on `cell` quadratic — the same
    OOM spiral the 1M-doc minhash probe hit before its cap. Per cell, only
    the `max_cell` members with the smallest md5('ivf:'||id) rank (id
    tie-break) stay on the DATA side of the join; overflow members still
    probe as QUERIES (they get neighbors — drawn from the kept members —
    they just aren't indexed as candidates for others), bounding candidates
    per query at nprobe·max_cell. Deterministic and oracle-mirrored
    (identical QUALIFY rank in _ANN_IVF_SQL); Spark 4's WindowGroupLimit
    pre-trims the rank window map-side, so the cap itself never
    materializes a hot cell. At gate scale (≈62 members/cell) the default
    never binds; the production fix for a persistently hot cell remains
    retraining/sub-quantizing the codebook — the cap is the guard-rail
    that keeps the job alive meanwhile (planted-degenerate test in
    tests/test_dedup.py).

    Measured operating points (full self-join top-5 over the 2,000 sf0.1
    vectors; BENCH/BASELINE.md §4): brute 72.6 s · n_cells=20, nprobe=12 →
    4.9 s @ recall 0.846 · 16/8 → 4.5 s @ 0.758 — with hash-sampled
    centroids, probing ~half the cells is the sweet spot; both dominate
    the SRP-LSH variant (8.3 s @ 0.472) on this corpus.
    """
    from pyspark.sql import Window

    cells = ivf_cells(emb, n_cells, nprobe, id_col, vec_col, centroids=centroids)
    data = cells.select(
        F.col("id").alias("vec_id"), F.col("v").alias("dv"), F.col("vn").alias("dn"), "cell"
    )
    if max_cell is not None:
        wc = Window.partitionBy("cell").orderBy(
            F.md5(F.concat_ws(":", F.lit("ivf"), F.col("vec_id").cast("string"))).asc(),
            F.col("vec_id").asc(),
        )
        data = (
            data.withColumn("_mrk", F.row_number().over(wc))
            .filter(F.col("_mrk") <= max_cell)
            .drop("_mrk")
        )
    qs = cells.select(
        F.col("id").alias("q_id"), F.col("v").alias("qv"), F.col("vn").alias("qn"),
        F.explode("probes").alias("cell"),
    )
    cand = qs.join(data, "cell").filter(F.col("q_id") != F.col("vec_id"))
    dot = F.aggregate(
        F.zip_with("qv", "dv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = cand.select(
        "q_id", "vec_id", F.round(dot / (F.col("qn") * F.col("dn")), 6).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_store(cells: DataFrame, path: str) -> None:
    """Persist an IVF index (ivf_cells output) PARTITIONED BY cell — the
    storage half of the scale design: a probe for nprobe cells becomes a
    partition-pruned scan (only the probed cell directories are read;
    unprobed cells cost nothing), the same layout Iceberg's
    ``PARTITIONED BY (bucket(N, c))`` hides behind its catalog
    (kgc/sources/catalog.py op-02). Pinned by
    tests/test_plans.py::TestIvfStorage."""
    cells.drop("probes").write.mode("overwrite").partitionBy("cell").parquet(path)


def ivf_split_hot_cells(
    cells: DataFrame,
    split_threshold: int = 4096,
    n_sub: int = 16,
    nprobe_sub: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Sub-quantize HOT coarse cells (the production fix the `max_cell` cap
    guards until it runs): cells with more than `split_threshold` members
    get a per-cell sub-codebook — the `n_sub` members with the smallest
    md5('sub:'||cell||':'||id) rank — and each member re-ranks against it
    (identical rounded-cosine/struct-sort machinery as the coarse
    assignment), refining its key to 'cell#sub'. Queries probing a hot
    cell rank the same sub-codebook and probe their `nprobe_sub` nearest
    sub-buckets; cold cells pass through with key 'cell'. The candidate
    join stays a disjoint-key equi-join, now bounded per hot cell at
    ~|cell|/n_sub members per bucket instead of |cell| — the IVF rendering
    of the minhash posting-list split.

    Deterministic end-to-end (md5 member sampling + round-9 rank-on-rounded
    with sub_id tie-break), but NON-GATE by design, like the trained
    codebook: the interesting split behavior only appears on corpora with
    hot-but-diverse cells, which the gate corpus doesn't produce. Pinned
    instead by planted tests (tests/test_dedup.py::TestIvfSplit):
    no-hot-cells identity vs the unsplit operator, spread + bounded
    buckets + recall floor on a planted hot-diverse cone.

    Known limit (disclosed): members IDENTICAL under round-9 cosine all
    tie into one sub-bucket (nearest-sub is genuinely ambiguous) — true
    duplicates are the dedup family's job, and ann_topk_ivf_split still
    applies `max_cell` per refined key as the hard guard.

    Returns (data, probes): data = one (vec_id, dv, dn, skey) row per
    vector; probes = (q_id, qv, qn, skey) rows, one per probed sub-bucket.
    """
    from pyspark.sql import Window

    sizes = cells.groupBy("cell").agg(F.count("*").alias("_m"))
    hot = sizes.filter(F.col("_m") > split_threshold).select("cell")
    w = Window.partitionBy("cell").orderBy(
        F.md5(
            F.concat_ws(":", F.lit("sub"), F.col("cell").cast("string"), F.col("id").cast("string"))
        ).asc(),
        F.col("id").asc(),
    )
    subs = (
        cells.join(F.broadcast(hot), "cell")
        .withColumn("_srk", F.row_number().over(w))
        .filter(F.col("_srk") <= n_sub)
        .select(
            "cell", (F.col("_srk") - 1).alias("sub_id"),
            F.col("v").alias("scv"), F.col("vn").alias("scn"),
        )
    )
    subbook = subs.groupBy("cell").agg(
        F.collect_list(F.struct("sub_id", "scv", "scn")).alias("subs")
    )

    def ranked_subs(vec_col: str, norm_col: str):
        # (-round(cos,9), sub_id) struct sort == cosine DESC, sub_id ASC —
        # byte-identical tie rule as the coarse ranking in ivf_cells
        return F.array_sort(
            F.transform(
                F.col("subs"),
                lambda s: F.struct(
                    (-F.round(
                        F.aggregate(
                            F.zip_with(F.col(vec_col), s["scv"], lambda x, y: x * y),
                            F.lit(0.0), lambda acc, x: acc + x,
                        ) / (F.col(norm_col) * s["scn"]), 9,
                    )).alias("nk"),
                    s["sub_id"].alias("sub_id"),
                ),
            )
        )

    cell_str = F.col("cell").cast("string")
    data = (
        cells.select(
            F.col("id").alias("vec_id"), F.col("v").alias("dv"),
            F.col("vn").alias("dn"), "cell",
        )
        .join(F.broadcast(subbook), "cell", "left")
        .withColumn(
            "skey",
            F.when(F.col("subs").isNull(), cell_str).otherwise(
                F.concat_ws(
                    "#", cell_str,
                    F.element_at(ranked_subs("dv", "dn"), 1)["sub_id"].cast("string"),
                )
            ),
        )
        .select("vec_id", "dv", "dn", "skey")
    )
    probes = (
        cells.select(
            F.col("id").alias("q_id"), F.col("v").alias("qv"),
            F.col("vn").alias("qn"), F.explode("probes").alias("cell"),
        )
        .join(F.broadcast(subbook), "cell", "left")
        .withColumn(
            "_skeys",
            F.when(F.col("subs").isNull(), F.array(cell_str)).otherwise(
                F.transform(
                    F.slice(ranked_subs("qv", "qn"), 1, nprobe_sub),
                    lambda s: F.concat_ws("#", cell_str, s["sub_id"].cast("string")),
                )
            ),
        )
        .select("q_id", "qv", "qn", F.explode("_skeys").alias("skey"))
    )
    return data, probes


def ann_topk_ivf_split(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    split_threshold: int = 4096,
    n_sub: int = 16,
    nprobe_sub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
    max_cell: int | None = 256,
) -> DataFrame:
    """ann_topk_ivf with hot-cell sub-quantization: identical to the base
    operator when no cell exceeds split_threshold (pinned equal in tests);
    on skewed quantizer regions the refined 'cell#sub' keys bound the
    candidate equi-join at ~|cell|/n_sub per bucket with recall degrading
    gracefully via nprobe_sub (instead of the cap's hard member drop).
    `max_cell` still applies per refined key as the last-resort guard for
    sub-split-resistant (identical-vector) degeneracy."""
    from pyspark.sql import Window

    cells = ivf_cells(emb, n_cells, nprobe, id_col, vec_col, centroids=centroids)
    data, qs = ivf_split_hot_cells(cells, split_threshold, n_sub, nprobe_sub)
    if max_cell is not None:
        wc = Window.partitionBy("skey").orderBy(
            F.md5(F.concat_ws(":", F.lit("ivf"), F.col("vec_id").cast("string"))).asc(),
            F.col("vec_id").asc(),
        )
        data = (
            data.withColumn("_mrk", F.row_number().over(wc))
            .filter(F.col("_mrk") <= max_cell)
            .drop("_mrk")
        )
    cand = qs.join(data, "skey").filter(F.col("q_id") != F.col("vec_id"))
    dot = F.aggregate(
        F.zip_with("qv", "dv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = cand.select(
        "q_id", "vec_id", F.round(dot / (F.col("qn") * F.col("dn")), 6).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
