"""Build dist/logtrics_spark.zip for ``spark-submit --py-files``.

The north rule runs the job "via spark-submit --py-files at
10^12-sequence scale on N and 4N executors"; this produces the artifact
that command ships to executors (pure-Python package, no build step):

    python tools/package_pyfiles.py
    spark-submit \\
      --master <cluster> \\
      --py-files dist/logtrics_spark.zip \\
      --conf spark.sql.adaptive.enabled=true \\
      --conf spark.sql.adaptive.skewJoin.enabled=true \\
      --conf spark.sql.shuffle.partitions=<2x total cores> \\
      tools/spark_job.py rollup --input <tok.parquet> --store <root>

Only package sources go in (no tests/bench/caches); deterministic file
order so rebuilding an unchanged tree yields a byte-stable archive.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "logtrics_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "logtrics_spark")
    files = []
    for root, dirs, names in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for n in sorted(names):
            if n.endswith(".py"):
                files.append(os.path.join(root, n))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in files:
            arc = os.path.relpath(f, REPO)
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(f, "rb") as fh:
                zf.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
