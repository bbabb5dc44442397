"""Build dist/proj_spark.zip for ``spark-submit --py-files``.

The north-star deployment shape is::

    spark-submit --py-files dist/proj_spark.zip your_job.py

The zip contains the pure-Python ``proj_spark`` package (no tests, no
caches); executors unpack it onto their PYTHONPATH, so pandas-UDF
closures that import proj_spark modules resolve on every worker.
Deterministic output: entries are stored sorted with zeroed
timestamps so the artifact hash is stable across builds.

Usage: python tools/make_pyfiles.py [out_zip]
"""
from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", "proj_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    entries = []
    pkg = os.path.join(ROOT, "proj_spark")
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        in_data = os.path.relpath(dirpath, pkg).split(os.sep)[0] == "data"
        for f in sorted(filenames):
            if f.endswith((".py", ".csv")) or in_data:
                full = os.path.join(dirpath, f)
                entries.append((full, os.path.relpath(full, ROOT)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
