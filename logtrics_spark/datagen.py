"""Deterministic synthetic token-table generator (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    doc_id:string, tokens:array<int32>, n_tok:int32, source:string

Every value is a pure function of (seed, row id) via a SplitMix64-style
counter-based hash — NOT a stateful RNG — so output is bit-identical
regardless of partition count or executor scheduling.  That property is
what makes the generator usable at any scale (spark.range is split
arbitrarily) and makes the pytest oracles reproducible on the driver.

The ``source`` column is zipf-ish skewed (~40% mass on "web",
FIXTURES.md F1) specifically to exercise the salting path (SURVEY.md N10).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42
VOCAB = 50257
MAX_TOK = 2048

# cumulative source-probability table: ~40% "web", long-ish zipf tail
SOURCES = ["web", "books", "code", "wiki", "chat", "news", "forums", "papers"]
_PROBS = np.array([0.40, 0.18, 0.12, 0.09, 0.07, 0.06, 0.05, 0.03])
_CUM = np.cumsum(_PROBS)

TOKSEQ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer: uint64 -> well-mixed uint64."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hash_u64(ids: np.ndarray, stream: int, seed: int = SEED) -> np.ndarray:
    """Counter-based hash of (seed, stream, id) -> uint64."""
    base = np.uint64(seed) * np.uint64(0x100000001B3) ^ np.uint64(stream)
    with np.errstate(over="ignore"):
        return _splitmix64(ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + base)


def _uniform(ids: np.ndarray, stream: int, seed: int = SEED) -> np.ndarray:
    """Deterministic uniform(0,1) per id."""
    return (_hash_u64(ids, stream, seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def gen_batch(ids: np.ndarray, seed: int = SEED, token_cap: int | None = None) -> pd.DataFrame:
    """Generate token-table rows for the given row ids (vectorized).

    ``token_cap`` caps the materialized token-array length (the payload)
    while keeping the full ``n_tok`` distribution (the metric value).
    Correctness tests use the default (len(tokens) == n_tok); large
    scaling benches cap the payload because the rollup pipeline prunes
    ``tokens`` out of every scan anyway — payload bytes only cost
    ingest setup time, not measured work.
    """
    ids = ids.astype(np.int64)
    # lognormal-ish n_tok in [1, MAX_TOK] via Box-Muller on two hashed uniforms
    u1 = np.clip(_uniform(ids, 1, seed), 1e-12, 1.0)
    u2 = _uniform(ids, 2, seed)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    n_tok = np.clip(np.exp(5.0 + 0.8 * z), 1, MAX_TOK).astype(np.int32)

    src_idx = np.searchsorted(_CUM, _uniform(ids, 3, seed), side="right")
    src_idx = np.minimum(src_idx, len(SOURCES) - 1)
    sources = np.array(SOURCES, dtype=object)[src_idx]

    # tokens: one hash per (id, position), fully vectorized via repeat/arange
    n_len = n_tok if token_cap is None else np.minimum(n_tok, np.int32(token_cap))
    total = int(n_len.sum())
    row_rep = np.repeat(ids, n_len)
    offsets = np.concatenate(([0], np.cumsum(n_len)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets, n_len)
    with np.errstate(over="ignore"):
        mixed = row_rep.astype(np.uint64) * np.uint64(1_000_003) + pos.astype(np.uint64)
    flat = (_hash_u64(mixed, 4, seed) % np.uint64(VOCAB)).astype(np.int32)
    bounds = np.cumsum(n_len)[:-1]
    tokens = np.split(flat, bounds)

    return pd.DataFrame(
        {
            "doc_id": np.char.mod("doc%012d", ids),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": sources,
        }
    )


def gen_tokseq(
    spark: SparkSession,
    n_rows: int,
    seed: int = SEED,
    partitions: int | None = None,
    token_cap: int | None = None,
) -> DataFrame:
    """Distributed token table: spark.range -> mapInPandas(gen_batch).

    No shuffle — each range partition generates its slice independently;
    determinism comes from the counter-based hash, not partition order.
    """
    if partitions is None:
        partitions = max(1, min(256, n_rows // 10_000 or 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield gen_batch(pdf["id"].to_numpy(), seed, token_cap)

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(gen, TOKSEQ_SCHEMA)


def gen_tokseq_pandas(n_rows: int, seed: int = SEED) -> pd.DataFrame:
    """Single-node oracle view of the same table (pytest golden source)."""
    return gen_batch(np.arange(n_rows, dtype=np.int64), seed)
