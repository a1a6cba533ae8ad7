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


def _gen_columns(ids: np.ndarray, seed: int, token_cap: int | None):
    """Shared numeric core: (doc_id, flat_tokens, token_offsets, n_tok,
    sources) for the given row ids — every value a pure function of
    (seed, id), identical regardless of which materialization wraps it.
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
    offsets = np.concatenate(([0], np.cumsum(n_len)))
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_len)
    with np.errstate(over="ignore"):
        mixed = row_rep.astype(np.uint64) * np.uint64(1_000_003) + pos.astype(np.uint64)
    flat = (_hash_u64(mixed, 4, seed) % np.uint64(VOCAB)).astype(np.int32)
    doc_id = np.char.mod("doc%012d", ids)
    return doc_id, flat, offsets, n_tok, sources


def gen_batch(ids: np.ndarray, seed: int = SEED, token_cap: int | None = None) -> pd.DataFrame:
    """Generate token-table rows for the given row ids (vectorized).

    ``token_cap`` caps the materialized token-array length (the payload)
    while keeping the full ``n_tok`` distribution (the metric value).
    Correctness tests use the default (len(tokens) == n_tok); large
    scaling benches cap the payload because the rollup pipeline prunes
    ``tokens`` out of every scan anyway — payload bytes only cost
    ingest setup time, not measured work.
    """
    doc_id, flat, offsets, n_tok, sources = _gen_columns(ids, seed, token_cap)
    tokens = np.split(flat, offsets[1:-1])
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": n_tok,
            "source": sources,
        }
    )


def gen_record_batch(ids: np.ndarray, seed: int = SEED, token_cap: int | None = None):
    """Arrow-native twin of :func:`gen_batch`: same values, but the
    token column is ONE ListArray built zero-copy from (values,
    offsets) instead of a million per-row numpy objects that pandas ->
    Arrow conversion must walk one by one.  Feeds gen_tokseq's
    mapInArrow path; gen_batch stays as the pandas/pytest golden view.
    """
    import pyarrow as pa

    doc_id, flat, offsets, n_tok, sources = _gen_columns(ids, seed, token_cap)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int32())
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(doc_id, type=pa.string()),
            tokens,
            pa.array(n_tok, type=pa.int32()),
            pa.array(sources, type=pa.string()),
        ],
        names=["doc_id", "tokens", "n_tok", "source"],
    )


def gen_tokseq(
    spark: SparkSession,
    n_rows: int,
    seed: int = SEED,
    partitions: int | None = None,
    token_cap: int | None = None,
) -> DataFrame:
    """Distributed token table: spark.range -> mapInArrow(gen_record_batch).

    No shuffle — each range partition generates its slice independently;
    determinism comes from the counter-based hash, not partition order.
    mapInArrow (r7): the token lists leave the generator as one Arrow
    ListArray per batch (values + offsets, zero-copy from the numpy
    core) — the previous mapInPandas path re-walked a python object per
    row to rebuild the same ListArray, which dominated ingest at 1M
    rows.  Values are bit-identical (same counter-based hashes, same
    row order; pinned by the pytest goldens against gen_batch).
    """
    if partitions is None:
        partitions = max(1, min(256, n_rows // 10_000 or 1))

    def gen(batches):
        for b in batches:
            if b.num_rows:
                yield gen_record_batch(b.column(0).to_numpy(), seed, token_cap)

    return spark.range(0, n_rows, numPartitions=partitions).mapInArrow(gen, TOKSEQ_SCHEMA)


def gen_tokseq_pandas(n_rows: int, seed: int = SEED) -> pd.DataFrame:
    """Single-node oracle view of the same table (pytest golden source)."""
    return gen_batch(np.arange(n_rows, dtype=np.int64), seed)
