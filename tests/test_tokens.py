"""Token-sequence operator tests (operators/tokens.py) — the training-
data ops over the north rule's array<int32> payload."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logtrics_spark.datagen import gen_tokseq


@pytest.fixture(scope="module")
def tok(spark):
    return gen_tokseq(spark, 1000, partitions=2).cache()


def test_token_stats_match_python(spark, tok):
    from logtrics_spark.operators.tokens import token_stats

    got = token_stats(tok).toPandas().set_index("doc_id")
    src = tok.select("doc_id", "tokens").toPandas().set_index("doc_id")
    for doc_id, row in src.sample(50, random_state=1).iterrows():
        t = list(row["tokens"])
        g = got.loc[doc_id]
        assert g["n_tok"] == len(t)
        assert g["n_unique"] == len(set(t))
        assert g["min_token"] == min(t) and g["max_token"] == max(t)


def test_vocab_topk_global_and_grouped(spark, tok):
    from logtrics_spark.operators.tokens import vocab_topk

    top = vocab_topk(tok, k=10).toPandas()
    assert len(top) == 10
    assert (top.sort_values("rank")["freq"].diff().dropna() <= 0).all()
    # exact counts vs a pandas fold
    counts = (
        tok.select(F.explode("tokens").alias("t")).toPandas()["t"].value_counts()
    )
    for _, r in top.iterrows():
        assert counts[r["token"]] == r["freq"]
    per_src = vocab_topk(tok, k=5, by="source").toPandas()
    assert (per_src.groupby("source")["rank"].max() <= 5).all()
    assert per_src.groupby("source").size().gt(0).all()


def test_dedup_token_seqs_plants(spark, tok):
    from logtrics_spark.operators.tokens import dedup_token_seqs

    dup = tok.limit(7).withColumn("doc_id", F.concat(F.lit("z"), "doc_id"))
    d = dedup_token_seqs(tok.unionByName(dup)).toPandas()
    assert (d["dup_count"] == 2).sum() == 7
    # representative is the min id (originals sort before 'z' copies)
    assert not d["keep_id"].str.startswith("z").any()


def test_ngram_counts_order_sensitive(spark):
    from logtrics_spark.operators.tokens import ngram_counts

    rows = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": [[1, 2, 3, 4], [1, 2, 3, 5], [3, 2, 1, 2, 3]],
        }
    )
    df = spark.createDataFrame(rows)
    g = ngram_counts(df, n=3, min_freq=1).toPandas()
    g["key"] = g["gram"].map(lambda a: tuple(a))
    freq = dict(zip(g["key"], g["freq"]))
    assert freq[(1, 2, 3)] == 3  # docs a, b and c's tail
    assert freq[(2, 3, 4)] == 1
    assert (3, 2, 1) in freq  # order-sensitive: reverse is its own gram
    assert sum(freq.values()) == 2 + 2 + 3  # n-k+1 grams per doc
