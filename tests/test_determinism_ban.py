"""§2.4-E enforcement: no nondeterminism primitives anywhere in kgc/ CODE
(docstrings/comments/string literals excluded via tokenization).

Forbidden in data paths: rand()/randn(), monotonically_increasing_id(),
uuid expressions, stateful Python RNG, wall-clock reads inside operators.
Resume equality, per-partition lineage fingerprints, and cross-engine
oracles all depend on this.
"""

import io
import os
import tokenize

KGC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "kgc")

BANNED_NAMES = {"rand", "randn", "monotonically_increasing_id", "uuid"}
BANNED_RANDOM_ATTRS = {"random", "randint", "choice", "shuffle", "seed"}  # random.<attr>
DATA_DIRS = ("operators", "sources", "functions", "streaming")


def _code_tokens(path):
    with open(path, "rb") as f:
        for tok in tokenize.tokenize(f.readline):
            if tok.type == tokenize.NAME or (tok.type == tokenize.OP and tok.string == "."):
                yield tok


def _py_files():
    for root, _, files in os.walk(KGC):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def test_no_nondeterminism_in_kgc_code():
    violations = []
    for path in _py_files():
        toks = list(_code_tokens(path))
        for i, tok in enumerate(toks):
            if tok.type != tokenize.NAME:
                continue
            if tok.string in BANNED_NAMES:
                violations.append(f"{path}:{tok.start[0]} `{tok.string}`")
            # random.<stateful attr>
            if (
                tok.string == "random"
                and i + 2 < len(toks)
                and toks[i + 1].string == "."
                and toks[i + 2].string in BANNED_RANDOM_ATTRS
            ):
                # allow np.random.default_rng(seed) — the only sanctioned form
                if toks[i + 2].string != "default_rng":
                    violations.append(f"{path}:{tok.start[0]} `random.{toks[i + 2].string}`")
            # wall-clock in data paths (plans/ may time benchmarks)
            if (
                any(f"{os.sep}{d}{os.sep}" in path for d in DATA_DIRS)
                and tok.string == "time"
                and i + 2 < len(toks)
                and toks[i + 1].string == "."
                and toks[i + 2].string == "time"
            ):
                violations.append(f"{path}:{tok.start[0]} wall-clock in data path")
    assert not violations, "\n".join(violations)


def test_numpy_rng_only_seeded_at_plan_build():
    """np.random use must be the seeded default_rng(seed) evaluated at plan
    build (dedup.py hyperplanes) — never the global singleton."""
    import re

    for path in _py_files():
        src = open(path).read()
        for m in re.finditer(r"np\.random\.default_rng\(([^)]*)\)", src):
            assert m.group(1).strip() not in ("", "None"), f"{path}: unseeded default_rng"
