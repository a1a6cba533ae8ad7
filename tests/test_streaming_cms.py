"""Streaming Count-Min (streaming/cms_stream.py).

Linearity makes the contract sharp: the streamed table after any batch
sequence is BIT-IDENTICAL to one batch scatter over everything seen —
including across a checkpoint restart — and the snapshot row feeds
countmin.cms_query directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logtrics_spark.operators.countmin import _scatter

SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("item", T.StringType()),
    ]
)


def _write(spark, src_dir, source, items):
    pd.DataFrame({"source": [source] * len(items), "item": items}).pipe(
        spark.createDataFrame, SCHEMA
    ).write.parquet(src_dir, mode="append")


def _run_pass(spark, src_dir, ck, depth, width):
    from logtrics_spark.streaming.cms_stream import cms_stream

    collected = []
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        cms_stream(stream, depth=depth, width=width)
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


def test_bit_identity_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "items")
    ck = str(tmp_path / "ck")
    b1 = ["a", "a", "b", "c", "c", "c"]
    b2 = ["b", "d"] * 5
    _write(spark, src, "web", b1)
    got1 = _run_pass(spark, src, ck, depth=3, width=16)
    _write(spark, src, "web", b2)
    got2 = _run_pass(spark, src, ck, depth=3, width=16)

    all_items = pd.Series(b1 + b2).value_counts()
    exp = _scatter(
        all_items.index.to_numpy(dtype=object),
        all_items.to_numpy(dtype=np.int64),
        3,
        16,
    ).tolist()
    latest = _latest(got1 + got2, "web")
    assert list(latest["table"]) == exp
    assert latest["total_n"] == len(b1) + len(b2)
    assert latest["seq"] > _latest(got1, "web")["seq"]


def test_snapshot_feeds_cms_query(spark, tmp_path):
    from logtrics_spark.operators.countmin import cms_query

    src = str(tmp_path / "items")
    ck = str(tmp_path / "ck")
    _write(spark, src, "web", ["x"] * 7 + ["y"] * 2)
    _write(spark, src, "api", ["z"] * 4)
    rows = _run_pass(spark, src, ck, depth=4, width=64)
    latest = [r for r in rows if r["seq"] == max(x["seq"] for x in rows if x["source"] == r["source"])]
    snap = spark.createDataFrame(latest)
    got = {
        (r["source"], r["item"]): r["est_count"]
        for r in cms_query(snap, ["x", "y", "z"]).collect()
    }
    # collision-free regime at width 64 with 3 items: estimates exact
    assert got[("web", "x")] == 7 and got[("web", "y")] == 2
    assert got[("web", "z")] == 0
    assert got[("api", "z")] == 4 and got[("api", "x")] == 0
    # groups emit independently bounded state
    assert {r["source"] for r in rows} == {"web", "api"}
    assert all(len(r["table"]) == 4 * 64 for r in rows)


def test_null_items_ignored(spark, tmp_path):
    src = str(tmp_path / "items")
    ck = str(tmp_path / "ck")
    pd.DataFrame({"source": ["web"] * 3, "item": ["a", None, "a"]}).pipe(
        spark.createDataFrame, SCHEMA
    ).write.parquet(src, mode="append")
    rows = _run_pass(spark, src, ck, depth=2, width=8)
    latest = _latest(rows, "web")
    assert latest["total_n"] == 2  # nulls carry no mass
