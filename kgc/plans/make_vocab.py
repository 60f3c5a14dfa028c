"""Generate the committed synthetic subword vocabulary (op-60).

A real training pipeline packs sequences against a learned subword vocab;
this sandbox has no tokenizer libraries, so the engine carries its own
deterministic stand-in: the top-K character n-grams (length 2..6) over
the whitespace words of the driver's sf0.01 documents table, ranked by
(count DESC, token ASC) — a frequency vocabulary with the same
inference-time shape as WordPiece (greedy longest-match, single-char
fallback). Regenerate ONLY if the ranking formula changes, then re-run
the whole contract suite (the CLAUDE.md committed-corpus rule — the
committed file, not this script, is what both engines derive from).

Usage: python kgc/plans/make_vocab.py [--k 512] [--out data/vocab/subword_vocab_v1.txt]
"""

from __future__ import annotations

import argparse
import collections
import os

SOURCE_PARQUET = "/root/testdata/sf0.01/documents.parquet"
MIN_LEN, MAX_LEN = 2, 6


def build_vocab(texts, k: int) -> list[str]:
    """Deterministic top-k char n-grams (2..6) over whitespace words,
    ranked (count desc, token asc). Pure function for the unit test."""
    counts: collections.Counter[str] = collections.Counter()
    for t in texts:
        if not t:
            continue
        for w in t.split():
            for n in range(MIN_LEN, MAX_LEN + 1):
                for i in range(len(w) - n + 1):
                    counts[w[i : i + n]] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return sorted(tok for tok, _ in ranked[:k])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--out", default="data/vocab/subword_vocab_v1.txt")
    args = ap.parse_args()

    import duckdb

    texts = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT text FROM read_parquet('{SOURCE_PARQUET}') ORDER BY doc_id")
        .fetchall()
    ]
    vocab = build_vocab(texts, args.k)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(vocab) + "\n")
    print(f"wrote {len(vocab)} tokens to {args.out}")


if __name__ == "__main__":
    main()
