"""IcebergTableIO — exercised only where the Iceberg runtime exists.

The sandbox has no Iceberg jars (SURVEY.md §7), so the seal-flow test
skips there; the spec-parsing and guard logic runs everywhere."""

from __future__ import annotations

import datetime as dt

import pytest


def test_parse_spec():
    from logtrics_spark.storage.iceberg import _parse_spec

    assert _parse_spec("tiers") == ("tiers", {})
    assert _parse_spec("tiers/tier=1m") == ("tiers", {"tier": "1m"})
    assert _parse_spec("chunks/tier=1h/day=2024-01-01") == (
        "chunks",
        {"tier": "1h", "day": "2024-01-01"},
    )
    with pytest.raises(ValueError, match="bad partition segment"):
        _parse_spec("tiers/notakv")


def test_guard_raises_without_jars(spark):
    from logtrics_spark.storage.iceberg import IcebergTableIO, iceberg_available

    if iceberg_available(spark):
        pytest.skip("Iceberg available here; guard path not reachable")
    with pytest.raises(RuntimeError, match="Iceberg runtime or catalog"):
        IcebergTableIO(spark, "store")


def test_iceberg_seal_flow(spark, tmp_path):
    """Full seam exercise on a hadoop catalog — skipped without jars."""
    from logtrics_spark.storage.iceberg import IcebergTableIO, iceberg_available

    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime/catalog in this environment")

    import pandas as pd
    from pyspark.sql import functions as F

    io = IcebergTableIO(spark, "t_seal_flow")
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "tier": ["1m"] * 4,
                "day": ["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-02"],
                "source": ["web", "api", "web", "api"],
                "v": [1, 2, 3, 4],
            }
        )
    )
    io.write_partitioned(df, "tiers", ["tier", "day"])
    assert io.read("tiers/tier=1m").count() == 4
    assert io.list_partitions("tiers", "day") == ["2024-01-01", "2024-01-02"]
    # dynamic overwrite replaces only the touched partition
    io.write_partitioned(
        df.where(F.col("day") == "2024-01-01").withColumn("v", F.lit(9)),
        "tiers",
        ["tier", "day"],
    )
    got = io.read("tiers").toPandas()
    assert got[got.day == "2024-01-01"]["v"].tolist() == [9, 9]
    assert sorted(got[got.day == "2024-01-02"]["v"]) == [3, 4]
    # partition drop
    assert io.drop_partition("tiers", tier="1m", day="2024-01-01")
    assert io.list_partitions("tiers", "day") == ["2024-01-02"]
    # lineage + latest-wins across appends
    base = {
        "tier": "1m",
        "source": "web",
        "window_start": dt.datetime(2024, 1, 2),
        "input_partitions": ["raw/source=web"],
        "row_count": 1,
        "point_count": 1,
        "chunk_file": None,
    }
    io.append_lineage([{**base, "sealed": True, "run_id": "zzz"}])
    io.append_lineage([{**base, "sealed": False, "run_id": "aaa"}])
    assert io.sealed_units().count() == 0
