"""Scalar text/time/hash kits (op-11, op-38..43) — builtin expressions only.

Everything here stays JVM-side inside whole-stage codegen; no Python touches
these columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def normalize_surface(col: Column | str) -> Column:
    """op-11: canonical alias key — lowercase, non-alnum → single space, trim.

    'Individual #423' → 'individual 423';  'I-0423' → 'i 0423'.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def block_key(col: Column | str) -> Column:
    """Blocking key for fuzzy link candidate generation (op-12): first letter
    of the first token + the trailing number with leading zeros stripped.

    'i 0423' / 'ind 0423' / 'individual 423' → 'i423';  'act 037' → 'a37'.
    """
    c = normalize_surface(col)
    first_letter = F.substring(c, 1, 1)
    num = F.regexp_extract(c, r"(\d+)\s*$", 1).cast("long")
    return F.concat(first_letter, F.coalesce(num.cast("string"), F.lit("")))


def parse_ts(col: Column | str) -> Column:
    """op-40: parse the embedded 'yyyy-MM-ddTHH:mm:ssZ' timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c, TS_FMT)


def stable_hash(*cols, seed: int = 42) -> Column:
    """op-43: deterministic 64-bit hash (bucketing / salting / fingerprints)."""
    return F.xxhash64(F.lit(seed), *[F.col(c) if isinstance(c, str) else c for c in cols])


def salt_col(key: Column | str, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt) — a pure function of the key row, so
    re-runs place every row in the same salt bucket (no rand())."""
    return F.pmod(stable_hash(key, seed=1337), F.lit(n_salt)).cast("int")
