"""Streaming t-digest (streaming/tdigest_stream.py).

Sharp contract: the streamed digest is BYTE-IDENTICAL to replaying the
same merge([state, build(batch)]) fold driver-side (same arithmetic as
the batch family), state carries across a checkpoint restart, and the
snapshot quantiles sit inside the family's rank-error envelope against
the exact quantiles of everything seen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from logtrics_spark.operators import tdigest as td

SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(spark, src_dir, source, vals):
    pd.DataFrame({"source": [source] * len(vals), "value": vals}).pipe(
        spark.createDataFrame, SCHEMA
    ).write.parquet(src_dir, mode="append")


def _run_pass(spark, src_dir, ck, **kw):
    from logtrics_spark.streaming.tdigest_stream import tdigest_stream

    collected = []
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        tdigest_stream(stream, **kw)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .foreachBatch(lambda df, _bid: collected.extend(df.collect()))
        .start()
    )
    q.awaitTermination(120)
    return collected


def _latest(rows, source):
    mine = [r for r in rows if r["source"] == source]
    return max(mine, key=lambda r: r["seq"]) if mine else None


def test_byte_identity_restart_and_envelope(spark, tmp_path):
    rng = np.random.default_rng(9)
    b1 = rng.lognormal(size=800).tolist()
    b2 = rng.normal(loc=50, scale=5, size=800).tolist()
    src = str(tmp_path / "vals")
    ck = str(tmp_path / "ck")
    _write(spark, src, "web", b1)
    got1 = _run_pass(spark, src, ck)
    _write(spark, src, "web", b2)
    got2 = _run_pass(spark, src, ck)  # restart on the same checkpoint

    latest = _latest(got1 + got2, "web")
    assert latest["n"] == 1600
    assert latest["seq"] == _latest(got1, "web")["seq"] + 1

    # byte identity with the same fold replayed driver-side
    exp = td.merge([td.build(np.array(b1)), td.build(np.array(b2))])
    assert bytes(latest["tdigest"]) == exp

    # rank-error envelope vs exact over EVERYTHING seen
    allv = np.sort(np.array(b1 + b2))
    for q, col in ((0.5, "p5"), (0.95, "p95"), (0.99, "p99")):
        est = latest[col]
        rank = np.searchsorted(allv, est) / len(allv)
        assert abs(rank - q) <= 0.02, (q, est, rank)


def test_groups_isolated_and_blob_queryable(spark, tmp_path):
    src = str(tmp_path / "vals")
    ck = str(tmp_path / "ck")
    _write(spark, src, "web", list(np.arange(1.0, 101.0)))
    _write(spark, src, "api", [7.0] * 10)
    rows = _run_pass(spark, src, ck, qs=(0.5,))
    web = _latest(rows, "web")
    api = _latest(rows, "api")
    assert api["p5"] == 7.0 and api["n"] == 10
    # the blob answers quantiles not requested inline
    p90 = td.quantile(bytes(web["tdigest"]), 0.9)
    assert 85.0 <= p90 <= 95.0
