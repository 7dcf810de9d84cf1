"""Package validate_spark for cluster deployment:

    python tools/build_pyfiles.py          # → dist/validate_spark.zip
    spark-submit --py-files dist/validate_spark.zip tools/submit_job.py \
        /root/testdata/sf0.01

The zip contains only the library (no tests, no caches) so executors
import the exact code the driver compiled the rule plan with — the
deploy shape the north rule specifies (spark-submit --py-files on a
multi-executor cluster).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "validate_spark.zip")


def build(out: str = OUT) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "validate_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
