#!/usr/bin/env python
"""Build the spark-submit deployment artifact.

Deploy shape (north rule):

    spark-submit --py-files clinvar_ingest_spark.zip run_ingest.py \
        --log s3://.../change_log --table s3://.../pages --span 5000000

The zip contains ONLY the engine package (pure Python, no compiled
bits), so executors unpack it onto their PYTHONPATH — the standard
multi-executor distribution path. ``tests/test_submit.py`` runs the
real ``spark-submit --py-files`` end-to-end against this artifact.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "clinvar_ingest_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out_path


if __name__ == "__main__":
    p = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(p)
