"""Build kgc.zip for spark-submit --py-files deployment (M7).

Usage: python package.py [out.zip]   (default: dist/kgc.zip)
"""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(os.path.join(REPO, "kgc")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "kgc.zip")
    print(build(out))
