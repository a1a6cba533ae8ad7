"""Bigram-LM perplexity (operators/lm.py — the CCNet-style filter).

Pins: the add-alpha math against an independent pure-Python
computation, <unk> mapping, vocab truncation ties, in-distribution
text scoring lower perplexity than garbage, blank docs scoring NULL,
and the pure-JVM plan (no Python stage anywhere).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from logtrics_spark.operators.lm import UNK, perplexity, train_ngram_lm

TRAIN = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran to the mat"),
    (2, "a dog sat on a log"),
]


def _py_model(texts, vocab_size, alpha):
    words = [w for t in texts for w in t.lower().split()]
    from collections import Counter

    c = Counter(words)
    vocab = set(
        w for w, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    mapped = [w if w in vocab else UNK for w in words]
    # recount per doc to keep bigrams within docs
    uni: dict = {}
    bi: dict = {}
    for t in texts:
        ws = [w if w in vocab else UNK for w in t.lower().split()]
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(ws, ws[1:]):
            bi[(x, y)] = bi.get((x, y), 0) + 1
    v = len(uni) + (0 if UNK in uni else 1)
    n = sum(uni.values())
    return uni, bi, v, n, vocab


def _py_ppl(text, uni, bi, v, n, vocab, alpha):
    ws = [w if w in vocab else UNK for w in text.lower().split()]
    if not ws:
        return None
    av = alpha * v
    lps = [math.log(uni.get(ws[0], 0) + alpha) - math.log(n + av)]
    for x, y in zip(ws, ws[1:]):
        lps.append(
            math.log(bi.get((x, y), 0) + alpha) - math.log(uni.get(x, 0) + av)
        )
    return math.exp(-sum(lps) / len(lps))


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(pd.DataFrame(TRAIN, columns=["doc_id", "text"]))


def test_matches_python_reference(spark, corpus):
    model = train_ngram_lm(corpus, vocab_size=100, alpha=0.1)
    texts = [t for _, t in TRAIN] + ["the cat sat", "dog the log a", "zzz qqq"]
    score_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {r["doc_id"]: r for r in perplexity(score_df, model).collect()}
    uni, bi, v, n, vocab = _py_model([t for _, t in TRAIN], 100, 0.1)
    assert model["v"] == v and model["n"] == n
    for i, t in enumerate(texts):
        exp = _py_ppl(t, uni, bi, v, n, vocab, 0.1)
        assert got[i]["perplexity"] == pytest.approx(exp, rel=1e-12), (i, t)
        assert got[i]["n_words"] == len(t.split())


def test_vocab_truncation_and_unk(spark, corpus):
    # vocab_size=3 keeps only 'the'(4), 'a'(2), 'cat'(2)... ties at 2:
    # (a, cat, mat, on, sat) sort ascending -> 'a', 'cat' join 'the'
    model = train_ngram_lm(corpus, vocab_size=3, alpha=0.5)
    kept = {r["w"] for r in model["uni"].collect()}
    assert kept == {"the", "a", "cat", UNK}
    uni, bi, v, n, vocab = _py_model([t for _, t in TRAIN], 3, 0.5)
    score = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["the unseen mat"]})
    )
    got = perplexity(score, model).first()
    exp = _py_ppl("the unseen mat", uni, bi, v, n, vocab, 0.5)
    assert got["perplexity"] == pytest.approx(exp, rel=1e-12)


def test_in_distribution_scores_lower(spark, corpus):
    model = train_ngram_lm(corpus, vocab_size=100)
    score = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "the cat sat on the mat",       # training sentence
                    "mat the on sat cat the",       # same words, shuffled
                    "xylo qwerty zorp blat nix",    # garbage
                ],
            }
        )
    )
    got = {r["doc_id"]: r["perplexity"] for r in perplexity(score, model).collect()}
    # in-distribution text scores FAR below both; the shuffled-vs-
    # garbage order is not asserted (add-alpha gives <unk>-heavy text a
    # flat 1/V bigram floor that can beat known-word unseen bigrams on
    # a tiny corpus)
    assert got[0] < got[1] and got[0] < got[2]
    assert got[0] * 5 < min(got[1], got[2])


def test_blank_doc_scores_null(spark, corpus):
    model = train_ngram_lm(corpus)
    score = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [""]}))
    row = perplexity(score, model).first()
    assert row["perplexity"] is None and row["n_words"] == 0


def test_plan_is_jvm_only(spark, corpus):
    model = train_ngram_lm(corpus)
    plan = (
        perplexity(corpus, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_empty_corpus_raises(spark, corpus):
    with pytest.raises(ValueError, match="empty"):
        train_ngram_lm(corpus.limit(0))


def test_curate_lm_stage(spark, corpus):
    from logtrics_spark.plans.curation import curate

    model = train_ngram_lm(corpus, vocab_size=100)
    score = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "source": ["web", "web"],
                "text": [
                    "the cat sat on the mat",      # in-distribution
                    "xylo qwerty zorp blat nix",   # garbage
                ],
            }
        )
    )
    kept, stats = curate(
        score,
        min_quality=None,
        lm_model=model,
        max_perplexity=10.0,
        near_dup=False,
    )
    assert stats["lm_filter"] == 1
    assert [r["doc_id"] for r in kept.collect()] == [0]
    assert "perplexity" not in kept.columns  # annotation dropped after the cut
