"""End-to-end spark-submit --py-files evidence (the north rule's launch
mode): package the library, submit the rollup job as a cluster would,
and check the tier store it writes.

Runs from a NEUTRAL cwd with the repo stripped from PYTHONPATH, so a
pass proves dist/logtrics_spark.zip ships everything the job imports —
the exact artifact a real N/4N-executor run would distribute."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def test_spark_submit_rollup_end_to_end(spark, tmp_path):
    # input: the north-rule token table, written by the test session
    from logtrics_spark.datagen import gen_tokseq

    inp = str(tmp_path / "tok.parquet")
    gen_tokseq(spark, 3000, partitions=4).write.parquet(inp)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from package_pyfiles import build
    finally:
        sys.path.pop(0)
    zip_path = build(str(tmp_path / "logtrics_spark.zip"))

    store = str(tmp_path / "store")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "spark_job.py"),
            "rollup", "--input", inp, "--store", store,
        ],
        cwd=str(tmp_path),  # neutral cwd: the zip must supply the package
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["sealed_units"], "job sealed no (tier, day) units"

    # the submitted job's store is readable by the in-process session
    # and carries every configured tier
    from logtrics_spark.plans.pipeline import RollupJob

    job = RollupJob(spark, store)
    for tier in ("1m", "5m", "1h", "1d"):
        assert job.read_tier(tier).count() > 0, tier
