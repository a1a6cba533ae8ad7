"""Streaming Misra-Gries heavy hitters (streaming/mg_stream.py).

Pins: state carries across micro-batches AND restarts (second pass on
the same checkpoint), snapshot == batch mg_merge over everything seen,
the exact regime (distinct items <= k -> exact counts, err 0), the MG
frequency guarantee in the clipped regime, and bounded state size.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("item", T.StringType()),
    ]
)


def _rows(source, items):
    return pd.DataFrame({"source": [source] * len(items), "item": items})


def _run_pass(spark, src_dir, ck, k, top=None):
    from logtrics_spark.streaming.mg_stream import mg_topk_stream

    collected = []
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        mg_topk_stream(stream, k=k, top=top)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .foreachBatch(lambda df, _bid: collected.extend(df.collect()))
        .start()
    )
    q.awaitTermination(120)
    return collected


def _latest(rows):
    out = {}
    for r in rows:
        key = r["source"]
        if key not in out or r["seq"] > out[key][0]["seq"]:
            out[key] = [r]
        elif r["seq"] == out[key][0]["seq"]:
            out[key].append(r)
    return out


def test_exact_regime_and_state_across_batches(spark, tmp_path):
    src_dir = str(tmp_path / "items")
    ck = str(tmp_path / "ck")
    # batch 1: a x3, b x1
    _rows("web", ["a", "a", "a", "b"]).pipe(spark.createDataFrame, SCHEMA).write.parquet(
        src_dir, mode="append"
    )
    got1 = _run_pass(spark, src_dir, ck, k=8)
    latest1 = {r["item"]: r for r in _latest(got1)["web"]}
    assert latest1["a"]["est"] == 3 and latest1["b"]["est"] == 1
    assert latest1["a"]["err"] == 0 and latest1["a"]["rank"] == 1

    # batch 2 (same checkpoint -> restart): counts must ACCUMULATE
    _rows("web", ["b", "b", "b", "c"]).pipe(spark.createDataFrame, SCHEMA).write.parquet(
        src_dir, mode="append"
    )
    got2 = _run_pass(spark, src_dir, ck, k=8)
    latest2 = {r["item"]: r for r in _latest(got2)["web"]}
    assert latest2["b"]["est"] == 4 and latest2["b"]["rank"] == 1
    assert latest2["a"]["est"] == 3
    assert latest2["c"]["est"] == 1
    assert latest2["b"]["total_n"] == 8
    assert latest2["b"]["seq"] > latest1["a"]["seq"]


def test_clipped_regime_matches_batch_merge_and_guarantee(spark, tmp_path):
    from logtrics_spark.operators.heavyhitters import mg_merge

    src_dir = str(tmp_path / "items")
    ck = str(tmp_path / "ck")
    items1 = ["hot"] * 50 + [f"t{i}" for i in range(20)]
    items2 = ["hot"] * 30 + ["warm"] * 25 + [f"u{i}" for i in range(20)]
    _rows("web", items1).pipe(spark.createDataFrame, SCHEMA).write.parquet(
        src_dir, mode="append"
    )
    _run_pass(spark, src_dir, ck, k=4)
    _rows("web", items2).pipe(spark.createDataFrame, SCHEMA).write.parquet(
        src_dir, mode="append"
    )
    got = _run_pass(spark, src_dir, ck, k=4)
    latest = {r["item"]: r for r in _latest(got)["web"]}

    # same arithmetic as folding the two batches through batch mg_merge
    def summary(items):
        vc = pd.Series(items).value_counts()
        return (vc.index.tolist(), vc.to_numpy().tolist(), 0, int(vc.sum()))

    s1 = mg_merge([([], [], 0, 0), summary(items1)], 4)
    s2 = mg_merge([s1, summary(items2)], 4)
    exp = dict(zip(s2[0], s2[1]))
    assert {i: r["est"] for i, r in latest.items()} == exp
    # MG guarantee: est <= true <= est + err for the emitted items
    true = pd.Series(items1 + items2).value_counts().to_dict()
    err = next(iter(latest.values()))["err"]
    for item, r in latest.items():
        assert r["est"] <= true[item] <= r["est"] + err
    # any item with true freq > n/(k+1) must be present
    n = len(items1) + len(items2)
    for item, cnt in true.items():
        if cnt > n / 5:
            assert item in latest
    # state (and snapshots) bounded by k
    assert len(latest) <= 4


def test_top_bounds_emission_and_groups_isolated(spark, tmp_path):
    src_dir = str(tmp_path / "items")
    ck = str(tmp_path / "ck")
    pdf = pd.concat(
        [
            _rows("web", ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]),
            _rows("api", ["x"] * 7),
        ],
        ignore_index=True,
    )
    pdf.pipe(spark.createDataFrame, SCHEMA).write.parquet(src_dir, mode="append")
    got = _run_pass(spark, src_dir, ck, k=8, top=2)
    latest = _latest(got)
    assert [r["item"] for r in sorted(latest["web"], key=lambda r: r["rank"])] == ["a", "b"]
    assert latest["api"][0]["item"] == "x" and latest["api"][0]["est"] == 7
