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


def test_deterministic_sample_reproducible(spark, tok):
    from logtrics_spark.operators.sample import deterministic_sample

    s1 = set(deterministic_sample(tok, 0.3).toPandas()["doc_id"])
    s2 = set(deterministic_sample(tok.repartition(7), 0.3).toPandas()["doc_id"])
    assert s1 == s2  # partition-layout independent
    assert 0.2 < len(s1) / 1000 < 0.4  # ~rate
    assert len(set(deterministic_sample(tok, 1.0).toPandas()["doc_id"])) == 1000
    assert len(deterministic_sample(tok, 0.0).toPandas()) == 0


def test_stratified_mix_rates_and_defaults(spark, tok):
    from logtrics_spark.operators.sample import stratified_mix

    out = stratified_mix(tok, {"web": 0.1, "books": 1.0}, by="source").toPandas()
    n_by = out.groupby("source").size()
    src = tok.toPandas().groupby("source").size()
    assert n_by.get("books") == src["books"]  # rate 1.0 keeps everything
    assert 0.02 < n_by.get("web", 0) / src["web"] < 0.25  # ~0.1
    assert set(n_by.index) <= {"web", "books"}  # unlisted groups dropped
    kept_all = stratified_mix(tok, {"web": 0.5}, by="source", default_rate=1.0).toPandas()
    assert set(kept_all["source"]) == set(src.index)


def test_pack_sequences_budget_and_coverage(spark, tok):
    from logtrics_spark.operators.tokens import pack_sequences

    packed = pack_sequences(tok, budget=4096).toPandas()
    src = tok.select("source", "doc_id", "n_tok").toPandas()
    # every doc accounted for exactly once
    assert packed["n_docs"].sum() == len(src)
    assert packed["total_tok"].sum() == src["n_tok"].sum()
    # bins average near budget; overflow bounded by one doc length
    max_doc = src["n_tok"].max()
    inner = packed.sort_values(["source", "bin_id"]).groupby("source").apply(
        lambda g: g.iloc[:-1], include_groups=False
    )
    # interior bins sit within one straddling-doc length of the budget:
    # a doc starting late in bin k pushes its tokens past the boundary,
    # shrinking bin k+1's span by the same amount
    assert (inner["total_tok"] >= 4096 - max_doc).all()
    assert (packed["total_tok"] <= 4096 + max_doc).all()
    # deterministic across partition layouts
    packed2 = pack_sequences(tok.repartition(9), budget=4096).toPandas()
    key = ["source", "bin_id"]
    a = packed.sort_values(key).reset_index(drop=True)
    b = packed2.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_pack_sequences_composite_key(spark, tok):
    """Packing within (source, day) — the scale-safe grouping — keeps
    the same invariants (full coverage, bounded bins, determinism) while
    splitting each source across many independent sort groups."""
    from logtrics_spark.operators.tokens import pack_sequences

    tok2 = tok.withColumn("day", (F.substring("doc_id", 4, 12).cast("long") % 3))
    packed = pack_sequences(tok2, budget=4096, by=["source", "day"]).toPandas()
    src = tok2.select("source", "day", "n_tok").toPandas()
    assert packed["n_docs"].sum() == len(src)
    assert packed["total_tok"].sum() == src["n_tok"].sum()
    max_doc = src["n_tok"].max()
    assert (packed["total_tok"] <= 4096 + max_doc).all()
    # every (source, day) group packs independently
    got_groups = set(map(tuple, packed[["source", "day"]].drop_duplicates().values))
    want_groups = set(map(tuple, src[["source", "day"]].drop_duplicates().values))
    assert got_groups == want_groups
    # deterministic across partition layouts
    packed2 = pack_sequences(
        tok2.repartition(9), budget=4096, by=["source", "day"]
    ).toPandas()
    key = ["source", "day", "bin_id"]
    a = packed.sort_values(key).reset_index(drop=True)
    b = packed2.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_repetition_stats_signal(spark):
    from logtrics_spark.operators.tokens import repetition_stats

    rows = pd.DataFrame(
        {
            "doc_id": ["clean", "loop", "short"],
            "tokens": [[1, 2, 3, 4, 5, 6], [7, 7, 7, 7, 7, 7], [1, 2]],
        }
    )
    got = (
        repetition_stats(spark.createDataFrame(rows), n=3)
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc["clean", "repetition_ratio"] == 0.0  # all grams distinct
    assert got.loc["loop", "n_grams"] == 4 and got.loc["loop", "n_distinct"] == 1
    assert got.loc["loop", "repetition_ratio"] == 0.75
    assert got.loc["short", "n_grams"] == 0 and got.loc["short", "repetition_ratio"] == 0.0


def test_chunk_sequences_disjoint_and_strided(spark):
    import pandas as pd

    from logtrics_spark.operators.tokens import chunk_sequences

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "source": ["a", "a", "b"],
            "tokens": [list(range(10)), list(range(3)), []],
        }
    )
    df = spark.createDataFrame(pdf)
    # disjoint cover: 10 tokens at max_len 4 -> [0..3], [4..7], [8..9]
    got = chunk_sequences(df, max_len=4, keep_cols=["source"]).collect()
    by_key = {(r["doc_id"], r["chunk_id"]): list(r["tokens"]) for r in got}
    assert by_key[(0, 0)] == [0, 1, 2, 3]
    assert by_key[(0, 1)] == [4, 5, 6, 7]
    assert by_key[(0, 2)] == [8, 9]
    assert by_key[(1, 0)] == [0, 1, 2]
    assert all(did != 2 for did, _ in by_key)  # empty doc emits nothing
    # reassembly: ORDER BY chunk_id concatenates back to the original
    parts = [by_key[(0, i)] for i in range(3)]
    assert [t for p in parts for t in p] == list(range(10))
    # strided overlap (GPT-2 eval convention)
    got2 = chunk_sequences(df.where("doc_id = 0"), max_len=4, stride=2).collect()
    by2 = {r["chunk_id"]: list(r["tokens"]) for r in got2}
    assert by2[0] == [0, 1, 2, 3] and by2[1] == [2, 3, 4, 5]
    assert by2[4] == [8, 9]
    # min_len drops short tails
    got3 = chunk_sequences(df.where("doc_id = 0"), max_len=4, min_len=4).collect()
    assert sorted(r["chunk_id"] for r in got3) == [0, 1]
    # full-window chunks only, n_tok stamped
    assert all(r["n_tok"] == 4 for r in got3)


def test_chunk_sequences_validates(spark):
    import pandas as pd
    import pytest as _pt

    from logtrics_spark.operators.tokens import chunk_sequences

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "tokens": [[1]]}))
    with _pt.raises(ValueError):
        chunk_sequences(df, max_len=0)
    with _pt.raises(ValueError):
        chunk_sequences(df, max_len=4, stride=-1)
