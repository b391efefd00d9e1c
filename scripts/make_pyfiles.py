#!/usr/bin/env python
"""Build the spark-submit --py-files archive (north rule: "runs via
spark-submit --py-files").

    python scripts/make_pyfiles.py [out.zip]     # default: minimel_spark.zip

Deterministic by construction so the artifact is cacheable and diffable:
files are added in sorted repo-relative order, timestamps are pinned to a
fixed epoch, and bytecode/caches are excluded — two builds of the same tree
are byte-identical, which is what a cluster deploy pipeline wants to hash.

Usage on a cluster:

    spark-submit --py-files minimel_spark.zip your_job.py
    # or the built-in CLI:
    spark-submit --py-files minimel_spark.zip -m minimel_spark pipeline ...
"""

from __future__ import annotations

import os
import sys
import zipfile

PINNED = (1980, 1, 1, 0, 0, 0)  # zip format's epoch; fixed for determinism


def build(out_path: str, root: str | None = None) -> list[str]:
    root = root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "minimel_spark")
    names: list[str] = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, f)
            names.append(os.path.relpath(full, root))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in names:
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=PINNED)
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(os.path.join(root, rel), "rb") as fh:
                z.writestr(info, fh.read())
    return names


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "minimel_spark.zip"
    files = build(out)
    print(f"{out}: {len(files)} files")
