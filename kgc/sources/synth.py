"""op-04: deterministic synthetic interleaved-document corpus + closed-form
ground truth (SURVEY.md §5.3, FIXTURES.md §B).

The reference repo (graphadvantage/neo4j-binary-cosine-similarity) ships a
Jupyter-notebook generator that random.choice()'s a few hundred individuals,
campaigns, activities and timestamped touches into Neo4j. This is the
scale-ready re-expression: every value is a pure function of
``(SEED, doc_num, span_idx, tag)`` through ``xxhash64``/``pmod`` — no RNG
state, no ``rand()``, no ``monotonically_increasing_id()`` — so output is
identical under any partitioning/parallelism (SURVEY.md §2.4-E), generation is
a single ``spark.range`` + builtin column expressions (no per-row Python), and
ground-truth triples are derivable from the same hidden columns without
running extraction.

Content model (what extraction must recover):
- text spans carry templated sentences:
    touch:      "{IND} opened email {ACT} of campaign {CMP} at {TS}."
    conversion: "campaign {CMP} converted {IND} at {TS}."
    purchase:   "{IND} purchased {PRD} at {TS}."
    filler:     entity-free sentences (negative examples)
- individual surfaces rotate through 3 alias forms
  ("I-0423" / "ind_0423" / "Individual #423") to exercise canonicalization.
- media spans: media_ref = "s3://media/{img|vid}_<hex>[_act-NNN].{png|mp4}",
  text = NULL except ~30% carry alt-text "photo of {IND} at webinar {ACT}."
  → a TOUCHED triple with NULL ts (media touches count toward similarity
  profiles but never qualify for attribution — pinned semantics).
- individuals have a segment (ind % 10) biasing 80% of touches into a
  50-activity block → clustered similarity structure.
- activity act-000 is hot (~10% of touches) → planted skew for T6.
- planted edge cases at every SF: doc 0 empty spans; doc 1 media-only;
  doc 2 zero-mention text; individuals with ind%10 >= 8 never convert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


SEED = 42
N_CAMPAIGNS = 50
ACTS_PER_CAMPAIGN = 10
N_ACTIVITIES = N_CAMPAIGNS * ACTS_PER_CAMPAIGN  # 500
N_PRODUCTS = 200
EPOCH0 = 1735689600  # 2025-01-01T00:00:00Z
TS_RANGE = 180 * 86400

FILLERS = [
    "The quarterly report shows steady growth across regions.",
    "Weather stayed mild throughout the conference week.",
    "Budget review meetings continue on the usual cadence.",
    "The newsletter redesign shipped without incident.",
]


def n_docs_for(sf: float) -> int:
    return max(10, round(1_000_000 * sf))


def n_individuals_for(sf: float) -> int:
    return max(200, round(20_000 * sf))


def ind_width(n_ind: int) -> int:
    """Digit width for individual ids/surfaces: 4 up to 10k individuals
    (every committed fixture and oracle regex), growing with the id space
    beyond that. Spark/DuckDB `lpad` TRUNCATES strings longer than the pad
    width — with a fixed 4, every individual ≥ 10000 collapsed onto the
    0000–9999 ids (found by the r3 sf10 probe: 200k intended individuals
    → exactly 10,000 distinct canonical ids, every activity 'touched by
    >50% of individuals', stop-list = all 500 acts, SIMILAR_TO empty)."""
    return max(4, len(str(max(n_ind - 1, 0))))


def _h(*cols) -> Column:
    """Deterministic 64-bit hash of (SEED, *cols)."""
    return F.xxhash64(F.lit(SEED), *[c if isinstance(c, Column) else F.lit(c) for c in cols])


def _pm(col: Column, n: int) -> Column:
    return F.pmod(col, F.lit(n))


def _span_fields(d: Column, s: Column, n_ind: int) -> dict[str, Column]:
    """All span columns as pure expressions of (doc_num, span_idx) — usable
    both per-row (post-explode) and inside array-transform lambdas."""
    is_media = F.when(d == 1, F.lit(True)).otherwise(_pm(_h(d, s, "kind"), 4) == 3)

    # --- entity draws ------------------------------------------------------
    ind = _pm(_h(d, s, "ind"), n_ind)
    seg = _pm(ind, 10)
    # 80% of touches land in the individual's segment block of 50 activities;
    # activity 0 is hot (~10% of all touches) — planted skew.
    act_raw = F.when(
        _pm(_h(d, s, "actsel"), 10) < 8, seg * 50 + _pm(_h(d, s, "act"), 50)
    ).otherwise(_pm(_h(d, s, "act"), N_ACTIVITIES))
    act = F.when(_pm(_h(d, s, "hot"), 10) == 0, F.lit(0)).otherwise(act_raw)
    cmp_of_act = F.floor(act / ACTS_PER_CAMPAIGN).cast("int")  # PART_OF dimension
    cmp_conv = F.when(
        _pm(_h(d, s, "cmpsel"), 10) < 8, seg * 5 + _pm(_h(d, s, "cmp"), 5)
    ).otherwise(_pm(_h(d, s, "cmp"), N_CAMPAIGNS))
    prd = _pm(_h(d, s, "prd"), N_PRODUCTS)

    epoch = F.lit(EPOCH0) + _pm(_h(d, s, "ts"), TS_RANGE)
    ts = F.to_timestamp(F.from_unixtime(epoch))
    ts_str = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")

    # --- surfaces ----------------------------------------------------------
    ind4 = F.lpad(ind.cast("string"), ind_width(n_ind), "0")
    alias_form = _pm(_h(d, s, "alias"), 3)
    ind_surface = (
        F.when(alias_form == 0, F.concat(F.lit("I-"), ind4))
        .when(alias_form == 1, F.concat(F.lit("ind_"), ind4))
        .otherwise(F.concat(F.lit("Individual #"), ind.cast("string")))
    )
    act_surface = F.concat(F.lit("act-"), F.lpad(act.cast("string"), 3, "0"))
    cmp_touch_surface = F.concat(F.lit("cmp-"), F.lpad(cmp_of_act.cast("string"), 2, "0"))
    cmp_conv_surface = F.concat(F.lit("cmp-"), F.lpad(cmp_conv.cast("string"), 2, "0"))
    prd_surface = F.concat(F.lit("prd-"), F.lpad(prd.cast("string"), 4, "0"))

    # --- template selection ------------------------------------------------
    # text spans: 8 slots → 0-3 touch, 4 conversion (gated), 5 purchase, 6-7 filler
    slot = _pm(_h(d, s, "tmpl"), 8)
    convertible = _pm(ind, 10) < 8  # ind%10 in {8,9} never converts
    tmpl_text = (
        F.when(d == 2, F.lit("filler"))
        .when(slot <= 3, F.lit("touch"))
        .when((slot == 4) & convertible, F.lit("conversion"))
        .when(slot == 4, F.lit("filler"))
        .when(slot == 5, F.lit("purchase"))
        .otherwise(F.lit("filler"))
    )
    has_alt = _pm(_h(d, s, "alt"), 10) < 3
    tmpl = F.when(is_media & has_alt, F.lit("media_touch")).when(is_media, F.lit("media")).otherwise(tmpl_text)

    filler_sentence = F.element_at(
        F.array(*[F.lit(x) for x in FILLERS]), (_pm(_h(d, s, "fill"), len(FILLERS)) + 1).cast("int")
    )
    text = (
        F.when(
            tmpl == "touch",
            F.concat(
                ind_surface, F.lit(" opened email "), act_surface, F.lit(" of campaign "),
                cmp_touch_surface, F.lit(" at "), ts_str, F.lit("."),
            ),
        )
        .when(
            tmpl == "conversion",
            F.concat(
                F.lit("campaign "), cmp_conv_surface, F.lit(" converted "), ind_surface,
                F.lit(" at "), ts_str, F.lit("."),
            ),
        )
        .when(
            tmpl == "purchase",
            F.concat(ind_surface, F.lit(" purchased "), prd_surface, F.lit(" at "), ts_str, F.lit(".")),
        )
        .when(tmpl == "filler", filler_sentence)
        .when(tmpl == "media_touch", F.concat(F.lit("photo of "), ind_surface, F.lit(" at webinar "), act_surface, F.lit(".")))
        .otherwise(F.lit(None).cast("string"))
    )

    media_kind = F.when(_pm(_h(d, s, "mk"), 2) == 0, F.lit("img")).otherwise(F.lit("vid"))
    media_ext = F.when(media_kind == "img", F.lit("png")).otherwise(F.lit("mp4"))
    media_ref = F.when(
        is_media,
        F.concat(
            F.lit("s3://media/"), media_kind, F.lit("_"), F.lower(F.hex(_h(d, s, "mh"))),
            F.when(tmpl == "media_touch", F.concat(F.lit("_"), act_surface)).otherwise(F.lit("")),
            F.lit("."), media_ext,
        ),
    ).otherwise(F.lit(None).cast("string"))

    kind = F.when(~is_media, F.lit("text")).when(media_kind == "img", F.lit("image")).otherwise(F.lit("video"))

    return {
        "kind": kind,
        "text": text,
        "media_ref": media_ref,
        "tmpl": tmpl,
        "ind_id": F.format_string(f"ind-%0{ind_width(n_ind)}d", ind),
        "act_id": act_surface,
        "cmp_id": F.when(tmpl == "conversion", cmp_conv_surface).otherwise(cmp_touch_surface),
        "prd_id": prd_surface,
        "ts": F.when(tmpl.isin("touch", "conversion", "purchase"), ts),
    }


def _docs_internal(spark: SparkSession, sf: float) -> DataFrame:
    """One row per doc with a span-struct ARRAY built entirely by builtin
    higher-order functions — a pure narrow projection over spark.range:
    NO shuffle, NO window, embarrassingly parallel at any partitioning
    (this is the property that makes 10^12-doc generation a map-only job).

    Offsets (running char offset, strictly increasing) are computed with
    aggregate() over the span-array prefix — O(n_spans²) per doc, n ≤ 12.
    """
    n_docs = n_docs_for(sf)
    n_ind = n_individuals_for(sf)
    d = F.col("doc_num")

    base = spark.range(n_docs).withColumnRenamed("id", "doc_num")
    n_spans = F.when(d == 0, F.lit(0)).otherwise((F.lit(4) + _pm(_h(d, "nspans"), 9)).cast("int"))

    def mk_span(s: Column) -> Column:
        f = _span_fields(d, s.cast("int"), n_ind)
        return F.struct(*[f[k].alias(k) for k in ("kind", "text", "media_ref", "tmpl", "ind_id", "act_id", "cmp_id", "prd_id", "ts")])

    spans0 = F.when(n_spans == 0, F.array().cast(
        "array<struct<kind:string,text:string,media_ref:string,tmpl:string,ind_id:string,act_id:string,cmp_id:string,prd_id:string,ts:timestamp>>"
    )).otherwise(F.transform(F.sequence(F.lit(0), n_spans - 1), mk_span))

    span_len = lambda x: (  # noqa: E731
        F.length(F.coalesce(x["text"], F.lit(""))) + F.length(F.coalesce(x["media_ref"], F.lit(""))) + F.lit(1)
    )
    with_offsets = F.transform(
        F.col("_spans0"),
        lambda x, i: F.struct(
            *[x[k].alias(k) for k in ("kind", "text", "media_ref", "tmpl", "ind_id", "act_id", "cmp_id", "prd_id", "ts")],
            F.aggregate(F.slice(F.col("_spans0"), 1, i), F.lit(0), lambda acc, y: acc + span_len(y))
            .cast("int")
            .alias("offset"),
        ),
    )
    return base.select(
        "doc_num", F.format_string("doc-%010d", d).alias("doc_id"), spans0.alias("_spans0")
    ).select("doc_num", "doc_id", with_offsets.alias("spans_full"))


def synth_spans_internal(spark: SparkSession, sf: float) -> DataFrame:
    """Exploded spans WITH hidden ground-truth columns.

    Public columns: doc_id, span_idx, kind, text, media_ref, offset.
    Hidden GT columns: tmpl ('touch'|'conversion'|'purchase'|'filler'|
    'media'|'media_touch'), ind_id, act_id, cmp_id, prd_id, ts.
    """
    return _docs_internal(spark, sf).select(
        "doc_num", "doc_id", F.posexplode("spans_full").alias("span_idx", "sp")
    ).select(
        "doc_num", "doc_id", F.col("span_idx").cast("int"),
        F.col("sp.kind").alias("kind"), F.col("sp.text").alias("text"),
        F.col("sp.media_ref").alias("media_ref"), F.col("sp.tmpl").alias("tmpl"),
        F.col("sp.ind_id").alias("ind_id"), F.col("sp.act_id").alias("act_id"),
        F.col("sp.cmp_id").alias("cmp_id"), F.col("sp.prd_id").alias("prd_id"),
        F.col("sp.ts").alias("ts"), F.col("sp.offset").alias("offset"),
    )


def synth_documents(spark: SparkSession, sf: float) -> DataFrame:
    """The public input table — exactly the BASELINE.json input_hint shape.
    Shuffle-free: a projection stripping the hidden GT fields."""
    public = F.transform(
        F.col("spans_full"),
        lambda x: F.struct(
            x["kind"].alias("kind"), x["text"].alias("text"),
            x["media_ref"].alias("media_ref"), x["offset"].alias("offset"),
        ),
    )
    return _docs_internal(spark, sf).select("doc_id", public.alias("spans"))


def ground_truth_triples(spark: SparkSession, sf: float) -> DataFrame:
    """Closed-form oracle triples — derived from hidden generator columns,
    NOT by running extraction. Subjects are canonical individual ids."""
    sp = synth_spans_internal(spark, sf)
    t = F.col("tmpl")
    return sp.filter(t.isin("touch", "media_touch", "conversion", "purchase")).select(
        F.col("ind_id").alias("subj"),
        F.when(t.isin("touch", "media_touch"), F.lit("TOUCHED"))
        .when(t == "conversion", F.lit("CONVERTED_BY"))
        .otherwise(F.lit("PURCHASED"))
        .alias("pred"),
        F.when(t.isin("touch", "media_touch"), F.col("act_id"))
        .when(t == "conversion", F.col("cmp_id"))
        .otherwise(F.col("prd_id"))
        .alias("obj"),
        F.col("ts"),
        F.col("doc_id"),
        F.col("span_idx"),
    )


def alias_catalog(spark: SparkSession, sf: float) -> DataFrame:
    """Entity catalog for link-join (op-14) + alias-equivalence edges for CC.

    Individuals have 3 alias entity ids per canonical id; the two non-canonical
    ids are suffixed so the lexicographic component-min is the canonical form
    (SURVEY.md §2.4-F). surface_key is the op-11 normalized surface.
    """
    n_ind = n_individuals_for(sf)
    ind = spark.range(n_ind).select(F.col("id").alias("n"))
    ind4 = F.lpad(F.col("n").cast("string"), ind_width(n_ind), "0")
    canon = F.concat(F.lit("ind-"), ind4)
    individuals = ind.select(
        F.explode(
            F.array(
                F.struct(F.concat(F.lit("i "), ind4).alias("surface_key"), canon.alias("entity_id")),
                F.struct(F.concat(F.lit("ind "), ind4).alias("surface_key"), F.concat(canon, F.lit("#a1")).alias("entity_id")),
                F.struct(F.concat(F.lit("individual "), F.col("n").cast("string")).alias("surface_key"), F.concat(canon, F.lit("#a2")).alias("entity_id")),
            )
        ).alias("e")
    ).select("e.surface_key", "e.entity_id", F.lit("individual").alias("entity_type"))

    acts = spark.range(N_ACTIVITIES).select(
        F.concat(F.lit("act "), F.lpad(F.col("id").cast("string"), 3, "0")).alias("surface_key"),
        F.format_string("act-%03d", F.col("id")).alias("entity_id"),
        F.lit("activity").alias("entity_type"),
    )
    cmps = spark.range(N_CAMPAIGNS).select(
        F.concat(F.lit("cmp "), F.lpad(F.col("id").cast("string"), 2, "0")).alias("surface_key"),
        F.format_string("cmp-%02d", F.col("id")).alias("entity_id"),
        F.lit("campaign").alias("entity_type"),
    )
    prds = spark.range(N_PRODUCTS).select(
        F.concat(F.lit("prd "), F.lpad(F.col("id").cast("string"), 4, "0")).alias("surface_key"),
        F.format_string("prd-%04d", F.col("id")).alias("entity_id"),
        F.lit("product").alias("entity_type"),
    )
    return individuals.unionByName(acts).unionByName(cmps).unionByName(prds)


def alias_edges(catalog: DataFrame) -> DataFrame:
    """Equivalence edges between alias entity ids of the same individual:
    (canonical, canonical#a1), (canonical, canonical#a2) — CC input (op-28)."""
    alt = catalog.filter(F.col("entity_id").contains("#"))
    return alt.select(
        F.split(F.col("entity_id"), "#").getItem(0).alias("src"),
        F.col("entity_id").alias("dst"),
    )


def part_of_dim(spark: SparkSession) -> DataFrame:
    """(activity, PART_OF, campaign) dimension: campaign = act // 10."""
    return spark.range(N_ACTIVITIES).select(
        F.format_string("act-%03d", F.col("id")).alias("activity"),
        F.format_string("cmp-%02d", F.floor(F.col("id") / ACTS_PER_CAMPAIGN)).alias("campaign"),
    )
