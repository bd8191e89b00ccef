"""Package the engine for `spark-submit --py-files` deployment.

Builds `dist/engine.zip` containing the `solr_spark` package — the artifact
the north-rule deployment mode ships to a multi-executor cluster:

    spark-submit --master <cluster> --py-files dist/engine.zip \
        tools/submit_index_job.py --n-docs ... --partitions ...

The zip is DETERMINISTIC (sorted member order, zeroed timestamps) so repeated
builds are byte-identical and a deployed artifact can be verified by hash.
"""

from __future__ import annotations

import hashlib
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    members: list[tuple[str, str]] = []
    pkg_root = os.path.join(REPO, "solr_spark")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            members.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    with open(path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    print(f"{path}  sha256={digest}  members={len(zipfile.ZipFile(path).namelist())}")
