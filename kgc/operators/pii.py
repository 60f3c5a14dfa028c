"""op-65 (r5): PII detection + redaction — the curation stage the
training-data family still lacked (every production pipeline scrubs
obvious PII before packing; cf. the public Dolma/FineWeb recipes).

Both operators are map-only JVM regex work — no shuffle, no Python — so
they cost one narrow projection at any scale. The patterns are the
deliberately conservative high-precision trio every public pipeline
starts from (emails, phone-like digit runs, IPv4): ASCII character
classes and bounded quantifiers only, no lookaround and no backrefs, so
the SAME pattern strings run identically under Java regex (Spark) and
RE2 (DuckDB) — the cross-engine mirror in tests/test_pii.py pins
count-for-count and byte-for-byte equality on a planted corpus.

Redaction order is load-bearing and mirrored exactly: emails first (the
local part can contain digits a phone scan would claim), then IPv4
(dotted quads are not phone-class matches but redact before the digit
run rule as defense in depth), then phones. Redaction is idempotent —
placeholders contain no pattern-matchable characters."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
PHONE_RE = "[+]?[0-9][0-9() -]{7,}[0-9]"

_RULES = (("email", EMAIL_RE, "[EMAIL]"), ("ip", IPV4_RE, "[IP]"),
          ("phone", PHONE_RE, "[PHONE]"))


def pii_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII signal counts: (doc_id, email_count, ip_count,
    phone_count, pii_count, has_pii). Counts are non-overlapping
    left-to-right matches — the semantics Java regex and RE2 share for
    these lookaround-free patterns. Null text counts as clean."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.coalesce(F.regexp_count(t, F.lit(pat)), F.lit(0)).alias(f"{name}_count")
        for name, pat, _ in _RULES
    ]
    out = docs.select("doc_id", *counts)
    total = sum(F.col(f"{name}_count") for name, _, _ in _RULES)
    return out.withColumn("pii_count", total).withColumn(
        "has_pii", F.col("pii_count") > 0
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match in `text_col` with a typed placeholder,
    keeping all other columns. Idempotent; preserves nulls (a media-only
    doc's null text stays null rather than becoming an empty string)."""
    t = F.col(text_col)
    red = t
    for _, pat, placeholder in _RULES:
        red = F.regexp_replace(red, pat, placeholder)
    return docs.withColumn(
        text_col, F.when(t.isNull(), F.lit(None).cast("string")).otherwise(red)
    )
