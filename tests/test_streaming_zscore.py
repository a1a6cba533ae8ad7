"""Streaming rolling z-score (streaming/zscore_stream.py) vs the batch
operator — state must carry the trailing window across micro-batches
and restarts, and the scores must match operators/series.py::zscore
row for row (same frame, same ddof, same null guards)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("metric", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("window_start", T.TimestampType()),
        T.StructField("avg", T.DoubleType()),
    ]
)

BASE = pd.Timestamp("2024-01-01 00:00:00")


def _tier_rows(start_min, values, source="web"):
    return pd.DataFrame(
        {
            "source": [source] * len(values),
            "metric": ["m"] * len(values),
            "kind": ["gauge"] * len(values),
            "window_start": [
                BASE + pd.Timedelta(minutes=start_min + i) for i in range(len(values))
            ],
            "avg": [float(v) for v in values],
        }
    )


def test_streaming_zscore_state_carries_and_matches_batch(spark, tmp_path):
    from logtrics_spark.operators.series import zscore
    from logtrics_spark.streaming.zscore_stream import zscore_stream

    tier_dir = str(tmp_path / "tier_rows")
    ck = str(tmp_path / "ck_z")
    collected = []

    def run_pass():
        stream = spark.readStream.schema(SCHEMA).parquet(tier_dir)
        q = (
            zscore_stream(stream, "avg", window_seconds=300)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ck)
            .foreachBatch(lambda df, _bid: collected.extend(df.collect()))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # two passes over a growing directory: the second must resume the
    # trailing window from state, not restart it.  Values include a
    # constant stretch (sd=0 -> null) and a spike.
    first = [5, 5, 5, 7, 1]
    second = [2, 50, 3]
    spark.createDataFrame(_tier_rows(0, first), SCHEMA).write.mode("append").parquet(
        tier_dir
    )
    run_pass()
    assert len(collected) == len(first)
    spark.createDataFrame(_tier_rows(5, second), SCHEMA).write.mode("append").parquet(
        tier_dir
    )
    run_pass()
    assert len(collected) == len(first) + len(second)

    got = (
        pd.DataFrame([r.asDict() for r in collected])
        .sort_values("window_start")
        .reset_index(drop=True)
    )

    batch_in = spark.createDataFrame(_tier_rows(0, first + second), SCHEMA)
    exp = (
        zscore(batch_in, "avg", window_seconds=300, out_col="z")
        .select("window_start", "avg", "z")
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for g, e in zip(got["z"], exp["z"]):
        if pd.isna(e):
            assert pd.isna(g), (g, e)
        else:
            assert g == pytest.approx(e, abs=1e-9), (g, e)


def test_streaming_zscore_prunes_state_to_window(spark, tmp_path):
    """A slot past the window must leave the state: after a gap larger
    than the window only the post-gap slots shape the score."""
    from logtrics_spark.streaming.zscore_stream import zscore_stream

    tier_dir = str(tmp_path / "tier_rows")
    rows = pd.concat(
        [_tier_rows(0, [1, 9]), _tier_rows(60, [4, 8])], ignore_index=True
    )
    spark.createDataFrame(rows, SCHEMA).write.parquet(tier_dir)
    collected = []
    stream = spark.readStream.schema(SCHEMA).parquet(tier_dir)
    q = (
        zscore_stream(stream, "avg", window_seconds=120)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(lambda df, _bid: collected.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["window_start"]: r["z"] for r in collected}
    # minute 61 slot: window [59:02, 61:01] holds only minutes 60,61 ->
    # mean 6, sd sqrt(8) -> z = 2/2.828... ; the pre-gap slots are gone.
    z_last = got[(BASE + pd.Timedelta(minutes=61)).to_pydatetime()]
    assert z_last == pytest.approx((8 - 6) / 8 ** 0.5, abs=1e-9)


def test_streaming_zscore_validation(spark):
    from logtrics_spark.streaming.zscore_stream import zscore_stream

    with pytest.raises(ValueError):
        zscore_stream(None, "avg", window_seconds=0)
