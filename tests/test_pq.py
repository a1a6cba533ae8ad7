"""IVF-PQ (operators/similarity.py — Jégou et al. 2011 IVFADC).

Pins: the exact regime (ks >= distinct residual subvectors =>
quantization error zero => ADC top-k == brute force), refine improving
lossy recall, stored-artifact shapes, dimension validation, and the
pure-Catalyst ADC scan (no Python stage in the query plan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from logtrics_spark.operators.similarity import (
    ann_recall,
    build_ivfpq_index,
    cosine_topk,
    query_ivfpq_index,
    train_pq_codebooks,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(300, 16))
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
    )
    return spark.createDataFrame(pdf)


def test_dim_must_divide(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="divisible"):
        build_ivfpq_index(corpus, str(tmp_path / "bad"), n_centroids=2, m=5, ks=8)


def test_exact_regime_matches_brute_force(spark, corpus, tmp_path):
    path = str(tmp_path / "pq_exact")
    # ks > corpus size: every distinct residual subvector becomes its
    # own codeword -> zero quantization error -> ADC == exact
    build_ivfpq_index(corpus, path, n_centroids=4, m=4, ks=512)
    qs = corpus.where("vec_id < 6")
    got = query_ivfpq_index(spark, path, qs, k=8, nprobe=4)
    exact = cosine_topk(corpus, qs, k=8)
    assert ann_recall(got, exact, k=8) == 1.0
    g = {(r["query_id"], r["rank"]): (r["id"], r["cosine"]) for r in got.collect()}
    e = {(r["query_id"], r["rank"]): (r["id"], r["cosine"]) for r in exact.collect()}
    assert g.keys() == e.keys()
    for key, (gid, gcos) in g.items():
        assert gid == e[key][0]
        assert gcos == pytest.approx(e[key][1], abs=1e-9)


def test_lossy_recall_and_refine(spark, corpus, tmp_path):
    path = str(tmp_path / "pq_lossy")
    build_ivfpq_index(corpus, path, n_centroids=8, m=4, ks=16)
    qs = corpus.where("vec_id < 10")
    exact = cosine_topk(corpus, qs, k=10)
    plain = query_ivfpq_index(spark, path, qs, k=10, nprobe=8)
    refined = query_ivfpq_index(
        spark, path, qs, k=10, nprobe=8, refine_with=corpus, refine_factor=4
    )
    r_plain = ann_recall(plain, exact, k=10)
    r_refined = ann_recall(refined, exact, k=10)
    assert r_refined >= r_plain
    assert r_refined >= 0.8  # 4x candidate cover on 16-codeword books


def test_stored_artifacts(spark, corpus, tmp_path):
    path = str(tmp_path / "pq_store")
    cents, books = build_ivfpq_index(corpus, path, n_centroids=4, m=8, ks=32)
    assert cents.shape == (4, 16)
    assert books.shape == (8, 32, 2)
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.count() == 300
    row = lists.select(F.size("code").alias("s")).first()
    assert row["s"] == 8  # M smallints per vector, not dim floats
    mx = lists.select(F.max(F.array_max("code"))).first()[0]
    assert mx < 32
    books_tbl = spark.read.parquet(f"{path}/codebooks")
    assert books_tbl.count() == 8 * 32


def test_adc_scan_is_jvm_side(spark, corpus, tmp_path):
    path = str(tmp_path / "pq_plan")
    build_ivfpq_index(corpus, path, n_centroids=4, m=4, ks=16)
    qs = corpus.where("vec_id < 3")
    plan = (
        query_ivfpq_index(spark, path, qs, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the ranking scan must not run Python per row: the LUT is
    # precomputed driver-side and summed via Catalyst aggregate()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PartitionFilters" in plan or "cid" in plan


def test_exact_regime_codebooks(spark, corpus):
    # train directly on 20 distinct vectors with ks=32: each distinct
    # subvector must appear verbatim as a codeword
    sub = corpus.where("vec_id < 20").select(F.col("embedding").alias("r"))
    books = train_pq_codebooks(sub, m=2, ks=32)
    sample = np.array(sub.toPandas()["r"].tolist())
    for mi in range(2):
        subv = sample[:, mi * 8 : (mi + 1) * 8]
        for row in subv:
            d = np.abs(books[mi] - row[None, :]).sum(1).min()
            assert d == pytest.approx(0.0, abs=1e-12)


def test_append_matches_rebuild_and_drift(spark, corpus, tmp_path):
    from logtrics_spark.operators.similarity import (
        append_to_ivfpq_index,
        pq_drift,
        train_centroids,
    )

    evens = corpus.where("vec_id % 2 = 0")
    odds = corpus.where("vec_id % 2 = 1")
    cents = train_centroids(corpus, 4)

    # incremental: build on evens, append odds (stored codebooks encode
    # the delta)
    inc = str(tmp_path / "pq_inc")
    _, books = build_ivfpq_index(evens, inc, m=4, ks=32, centroids=cents)
    d = append_to_ivfpq_index(odds, inc)
    assert d["n"] == odds.count()

    # rebuild on the FULL corpus with the same centroids AND codebooks
    full = str(tmp_path / "pq_full")
    build_ivfpq_index(corpus, full, m=4, ks=32, centroids=cents, codebooks=books)

    qs = corpus.where("vec_id < 6")
    got_inc = {
        (r["query_id"], r["rank"]): (r["id"], r["cosine"])
        for r in query_ivfpq_index(spark, inc, qs, k=8, nprobe=4).collect()
    }
    got_full = {
        (r["query_id"], r["rank"]): (r["id"], r["cosine"])
        for r in query_ivfpq_index(spark, full, qs, k=8, nprobe=4).collect()
    }
    assert got_inc == got_full

    # drift: use a lean codebook (ks=4 over 150 training points) so the
    # in-sample baseline generalizes — a same-distribution delta then
    # reads near 1.0, and a shifted delta trips the retrain flag
    dr = str(tmp_path / "pq_drift")
    build_ivfpq_index(evens, dr, m=4, ks=4, centroids=cents)
    append_to_ivfpq_index(odds, dr)
    drift_same = pq_drift(spark, dr, retrain_ratio=1.5)
    assert drift_same["ratio"] < 1.5 and not drift_same["retrain"]
    rng = np.random.default_rng(5)
    shifted = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(10_000, 10_100),
                "embedding": [(v + 8.0).tolist() for v in rng.normal(size=(100, 16))],
            }
        )
    )
    append_to_ivfpq_index(shifted, dr)
    drift_shift = pq_drift(spark, dr, retrain_ratio=1.5)
    assert drift_shift["ratio"] > drift_same["ratio"]
    assert drift_shift["retrain"]
