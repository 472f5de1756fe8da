#!/usr/bin/env python
"""Build the spark-submit artifact: ironspark.zip for --py-files.

The engine is pure PySpark (numpy/pandas only on executors), so cluster
deployment is exactly the north rule's shape:

    python scripts/package.py                      # -> dist/ironspark.zip
    spark-submit --py-files dist/ironspark.zip \
        --master yarn --deploy-mode cluster \
        --num-executors 250 --executor-cores 8 \
        your_job.py

where your_job.py does `from ironspark.engine import CrawlEngine` and
drives a run exactly like tests/test_engine_smoke.py. See
docs/SCALE.md "Cluster deployment notes" for executor sizing.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", "ironspark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "ironspark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    path = build()
    size = os.path.getsize(path)
    print(f"{path} ({size // 1024} KiB)")
