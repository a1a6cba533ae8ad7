"""Sketch tiers through the storage seam — the end-to-end claim behind
the mergeable trio: once retention drops the fine tier (and the raw
points), the coarser stored sketch tiers STILL answer distinct-count /
percentile / top-k queries, which scalar tier rows never could.

Composes only existing primitives (ParquetTableIO partitioned writes +
partition drop, the three sketch rollups/cascades) — this is the usage
pattern a deployment would run, pinned as a test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from logtrics_spark.operators import tdigest as td
from logtrics_spark.operators.heavyhitters import mg_cascade, mg_rollup, mg_topk
from logtrics_spark.operators.rollup import set_sketch_cascade, set_sketch_rollup
from logtrics_spark.storage.tableio import ParquetTableIO

BASE = pd.Timestamp("2024-03-01 00:00:00")


def _points(spark):
    rng = np.random.default_rng(21)
    n = 6000
    pdf = pd.DataFrame(
        {
            "source": ["web"] * n,
            "metric": ["lat"] * n,
            "kind": ["timer"] * n,
            "ts": [BASE + pd.Timedelta(seconds=int(s)) for s in rng.integers(0, 3600, n)],
            "value": rng.exponential(10, n),
            "user": rng.zipf(1.5, n) % 200,
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_sketch_tiers_survive_retention(spark, tmp_path):
    df, pdf = _points(spark)
    io = ParquetTableIO(spark, str(tmp_path / "store"))
    day = F.date_format("window_start", "yyyy-MM-dd")

    # build + store the 1m sketch tiers, cascade + store the 1h tiers
    fine_td = td.tdigest_rollup(df, "1m").localCheckpoint()
    fine_mg = mg_rollup(df, "1m", "user", k=64).localCheckpoint()
    fine_hll = set_sketch_rollup(df, "1m", "user").localCheckpoint()
    for name, fine, cascade in (
        ("tdigest", fine_td, lambda f: td.tdigest_cascade(f, "1m", "1h")),
        ("mg", fine_mg, lambda f: mg_cascade(f, "1m", "1h", k=64)),
        ("hll", fine_hll, lambda f: set_sketch_cascade(f, "1m", "1h")),
    ):
        io.write_partitioned(
            fine.withColumn("tier", F.lit("1m")).withColumn("day", day),
            name, ["tier", "day"],
        )
        io.write_partitioned(
            cascade(fine).withColumn("tier", F.lit("1h")).withColumn("day", day),
            name, ["tier", "day"],
        )

    # retention: the fine tier (and, in a real deployment, the raw
    # points) are gone for this day
    for name in ("tdigest", "mg", "hll"):
        assert io.drop_partition(f"{name}/tier=1m", day="2024-03-01")
        assert not io.exists(f"{name}/tier=1m/day=2024-03-01")

    # the STORED 1h sketches still answer everything, at full fidelity
    allv = pdf["value"].to_numpy()
    hour_td = io.read("tdigest/tier=1h").drop("day")
    row = td.tdigest_stats(hour_td).collect()[0]
    assert row["cnt"] == len(pdf)
    p95 = td.tdigest_quantiles(hour_td, [0.95]).collect()[0]["p95"]
    rank = np.searchsorted(np.sort(allv), p95) / len(allv)
    assert abs(rank - 0.95) <= 0.02

    hour_mg = io.read("mg/tier=1h").drop("day")
    top = mg_topk(hour_mg, n=1).collect()[0]
    true_top = pdf["user"].astype(str).value_counts()
    assert top["item"] == true_top.index[0]
    assert top["total_n"] == len(pdf)

    hour_hll = io.read("hll/tier=1h").drop("day")
    est = hour_hll.select(F.hll_sketch_estimate("hll").alias("d")).collect()[0]["d"]
    true_d = pdf["user"].nunique()
    assert abs(est - true_d) / true_d <= 0.05
