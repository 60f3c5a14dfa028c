"""XXH64 (Spark's `xxhash64`) as generated DuckDB SQL expressions.

DuckDB has no xxhash64, which round 1 left `kg_similar_to_lsh` as the one
rows-only driver check. XXH64 is pure 64-bit arithmetic, so this module
emits it as SQL over HUGEINT (128-bit) values kept in [0, 2^64):

- 64-bit wrapping multiply via 32-bit-halves decomposition (a HUGEINT
  product of two 64-bit values would overflow int128);
- rotations as disjoint shift halves summed; xors/shifts are native;
- sub-expression reuse via the DuckDB lambda *let-binding* idiom
  ``list_transform([v], x -> body)[1]`` so generated expressions stay
  LINEAR in size (naive inlining is exponential).

Seed/stream semantics mirror Spark's XxHash64 expression: the running hash
starts at the seed (42) and each child folds in via hashInt (4-byte ints)
or hashLong (8-byte longs); arrays fold element-wise with no length mixing.
Verified bit-exact against Spark in tests/test_ops_core.py::TestXxh64Sql.
"""

from __future__ import annotations

import itertools

_M64 = "18446744073709551616"  # 2^64
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

_ctr = itertools.count()


def _let(val: str, body) -> str:
    v = f"xx{next(_ctr)}"
    return f"list_transform([{val}], {v} -> {body(v)})[1]"


def _mul64(a: str, b: str) -> str:
    return _let(a, lambda A: _let(b, lambda B: (
        f"(({A}%4294967296)*({B}%4294967296)"
        f" + ((({A}//4294967296)*({B}%4294967296) + ({A}%4294967296)*({B}//4294967296))"
        f" % 4294967296) * 4294967296) % {_M64}"
    )))


def _rotl(x: str, r: int) -> str:
    return _let(x, lambda X: f"((({X} * {1 << r}) % {_M64}) + ({X} // {1 << (64 - r)}))")


def _fmix(h: str) -> str:
    s1 = _let(h, lambda H: f"xor({H}, {H} >> 33)")
    s2 = _mul64(s1, f"{_P2}::HUGEINT")
    s3 = _let(s2, lambda H: f"xor({H}, {H} >> 29)")
    s4 = _mul64(s3, f"{_P3}::HUGEINT")
    return _let(s4, lambda H: f"xor({H}, {H} >> 32)")


def hash_int_sql(i: str, seed: str) -> str:
    """XXH64.hashInt(i, seed) — `i` any SQL expr for a NON-NEGATIVE int
    (Spark masks with 0xFFFFFFFF; negative ints would need two's-complement
    conversion first), `seed` a [0,2^64) HUGEINT expr."""
    h0 = f"((({seed}) + {_P5} + 4) % {_M64})"
    k = _mul64(f"(({i}) % 4294967296)", f"{_P1}::HUGEINT")
    h1 = f"xor({h0}, {k})"
    h2 = f"({_mul64(_rotl(h1, 23), f'{_P2}::HUGEINT')} + {_P3}) % {_M64}"
    return _fmix(h2)


def hash_long_sql(v: str, seed: str) -> str:
    """XXH64.hashLong(v, seed) — `v` a [0,2^64) HUGEINT expr."""
    h0 = f"((({seed}) + {_P5} + 8) % {_M64})"
    k = _mul64(_rotl(_mul64(v, f"{_P2}::HUGEINT"), 31), f"{_P1}::HUGEINT")
    h1 = f"xor({h0}, {k})"
    h2 = f"({_mul64(_rotl(h1, 27), f'{_P1}::HUGEINT')} + {_P4}) % {_M64}"
    return _fmix(h2)


def to_signed_sql(v: str) -> str:
    """[0,2^64) HUGEINT → the BIGINT Spark would print (two's complement)."""
    return _let(v, lambda V: (
        f"CAST(CASE WHEN {V} >= {1 << 63} THEN {V} - {_M64} ELSE {V} END AS BIGINT)"
    ))
