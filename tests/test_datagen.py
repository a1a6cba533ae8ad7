from __future__ import annotations

import numpy as np
import pandas as pd

from logtrics_spark.datagen import SOURCES, gen_tokseq, gen_tokseq_pandas


def test_deterministic_and_partition_independent(spark):
    """Same rows regardless of partition count; matches the pandas oracle."""
    a = gen_tokseq(spark, 500, partitions=1).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = gen_tokseq(spark, 500, partitions=7).toPandas().sort_values("doc_id").reset_index(drop=True)
    o = gen_tokseq_pandas(500).sort_values("doc_id").reset_index(drop=True)
    for col in ["doc_id", "n_tok", "source"]:
        assert (a[col] == b[col]).all()
        assert (a[col] == o[col]).all()
    for x, y, z in zip(a["tokens"], b["tokens"], o["tokens"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
        assert np.array_equal(np.asarray(x), np.asarray(z))


def test_shape_and_skew():
    o = gen_tokseq_pandas(20_000)
    assert o["n_tok"].between(1, 2048).all()
    assert (o["tokens"].map(len) == o["n_tok"]).all()
    assert o["doc_id"].str.fullmatch(r"doc\d{12}").all()
    share = (o["source"] == "web").mean()
    assert 0.35 < share < 0.45  # hot-key skew present (FIXTURES.md F1)
    assert set(o["source"].unique()) <= set(SOURCES)


def test_token_range():
    o = gen_tokseq_pandas(2_000)
    flat = np.concatenate([np.asarray(t) for t in o["tokens"]])
    assert flat.min() >= 0 and flat.max() < 50257
    assert flat.dtype == np.int32
