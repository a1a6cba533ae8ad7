"""Reproducible sampling for training-data mixes.

``rand()``-based sampling is nondeterministic across runs, partition
layouts, and engines; training-data pipelines need the OPPOSITE — the
same mix every rerun, auditable row by row.  Both operators here decide
membership from a content-derived hash bucket, so the sample is a pure
function of the row:

- deterministic_sample: keep rows whose md5(id) falls below the rate
  threshold.  The bucket is the first 4 hex chars compared as a string
  (lowercase-hex lexicographic == numeric order), which every engine
  with an md5() reproduces exactly — that is what makes the driver's
  DuckDB oracle possible, and what makes a sample re-derivable years
  later from the raw table alone.
- stratified_mix: per-group rates (e.g. {"web": 0.1, "books": 1.0}) —
  the standard way to rebalance a source mix; unlisted groups default
  to 0 (dropped) or 1 (kept) per ``default_rate``.

Both are single narrow filters: no shuffle, fully pushdown-friendly,
and trivially reproducible at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET_SPACE = 16**4  # first 4 hex chars of md5


def _hex_threshold(rate: float) -> str:
    """Rate in [0,1] -> 4-char lowercase-hex cutoff (string-comparable).

    rate >= 1 is handled by callers (keep-all short-circuit): 'ffff' is
    the largest bucket, so a '< threshold' test can never express 100%.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * _BUCKET_SPACE), _BUCKET_SPACE - 1), "04x")


def _bucket(id_col: str) -> Column:
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)


def deterministic_sample(df: DataFrame, rate: float, id_col: str = "doc_id") -> DataFrame:
    """Keep ~rate of rows, decided by md5(id) — rerun-stable, engine-stable."""
    if rate >= 1.0:
        return df
    return df.where(_bucket(id_col) < _hex_threshold(rate))


def stratified_mix(
    df: DataFrame,
    rates: dict[str, float],
    by: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group deterministic sampling rates (training-mix rebalance)."""
    thr: Column = F.lit(_hex_threshold(default_rate))
    for grp, rate in rates.items():
        thr = F.when(F.col(by) == grp, F.lit(_hex_threshold(rate))).otherwise(thr)
    keep_all: Column = F.lit(False)
    for grp, rate in rates.items():
        if rate >= 1.0:
            keep_all = keep_all | (F.col(by) == grp)
    if default_rate >= 1.0:
        in_listed = F.col(by).isin(list(rates)) if rates else F.lit(False)
        keep_all = keep_all | ~in_listed
    return df.where(keep_all | (_bucket(id_col) < thr))
