"""Build the --py-files zip for cluster submission (north_rule:
'packaged for spark-submit --py-files on multi-executor clusters').

    python tools/build_pyfiles.py  →  dist/swarm_spark.zip

    spark-submit --py-files dist/swarm_spark.zip swarm_spark/job.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "swarm_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    src_root = os.path.join(REPO, "swarm_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(src_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
