"""Approximate-nearest-neighbor search over an embedding column.

- cosine_topk: brute-force exact top-k per query (the correctness
  baseline).  Dot products via zip_with/aggregate (JVM-side); ranking
  via a window over the query key.  O(|queries| x |corpus|) — fine for
  a broadcastable query set, which is the common "find neighbors of
  these N probes" shape.
- ivf_topk: the scale path — k-means-ish inverted-file index: corpus
  vectors are assigned to the nearest of C centroids (computed once,
  driver-side, from a bounded sample); queries probe only the nearest
  ``nprobe`` centroid partitions, cutting the scanned fraction to
  nprobe/C.  Recall < 1.0 by construction; exactness is the baseline's
  job.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)


def _norm(x):
    return F.sqrt(_dot(x, x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, id, cosine, rank).

    queries is broadcast (small probe set against a large corpus).
    Self-matches (same id) are excluded when id columns share a domain.
    """
    query_id_col = query_id_col or id_col
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "nv", _norm(F.col("v"))
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")).withColumn(
        "nq", _norm(F.col("qv"))
    )
    joined = c.crossJoin(F.broadcast(q)).where(F.col("id") != F.col("query_id"))
    cos = (_dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq"))).alias("cosine")
    scored = joined.select("query_id", "id", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    sample_rows: int = 10_000,
    seed: int = 42,
) -> np.ndarray:
    """Lloyd's k-means on a bounded driver-side sample (numpy).

    The sample is capped, so driver memory is bounded regardless of
    corpus size; centroids are tiny and get broadcast.
    """
    sample = np.array(
        corpus.select(vec_col).limit(sample_rows).toPandas()[vec_col].tolist(),
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(cent)):
            pts = sample[assign == j]
            if len(pts):
                cent[j] = pts.mean(0)
    return cent


def _nearest_centroids_expr(vec, centroids: np.ndarray, n: int):
    """Column: array of the n nearest centroid ids for a vector column."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(j).alias("cid"),
            )
            for j, c in enumerate(centroids)
        ]
    )
    return F.transform(F.slice(F.array_sort(dists), 1, n), lambda s: s["cid"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: assign corpus to nearest centroid, probe nprobe lists.

    Join key is the centroid id — the corpus side is partitioned by it,
    so each query only scans ~nprobe/n_centroids of the data.
    """
    query_id_col = query_id_col or id_col
    if centroids is None:
        centroids = train_centroids(corpus, n_centroids, vec_col=vec_col)

    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "cid", _nearest_centroids_expr(F.col("v"), centroids, 1)[0]
    ).withColumn("nv", _norm(F.col("v")))
    q = (
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .withColumn("cid", F.explode(_nearest_centroids_expr(F.col("qv"), centroids, nprobe)))
        .withColumn("nq", _norm(F.col("qv")))
    )
    joined = c.join(F.broadcast(q), "cid").where(F.col("id") != F.col("query_id"))
    cos = (_dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq"))).alias("cosine")
    scored = joined.select("query_id", "id", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
