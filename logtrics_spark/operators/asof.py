"""As-of join — attach the most recent right-side row at or before each
left timestamp, per series key.

Spark has no native ASOF JOIN; the scalable formulation is the
union + carry-forward window trick (no per-key loops, no range
explosion):

  1. tag left rows (side=1) and right rows (side=0), union on
     (keys..., ts) with right's payload nulled on the left side,
  2. one window per key ordered by (ts, side) — right rows sort before
     left rows at equal ts, so an exact-ts match IS visible —
     carrying last(payload, ignorenulls) forward,
  3. keep left rows; optionally null matches older than ``tolerance``.

Cost: one shuffle + sort per key — the same price as a sort-merge
join, with state bounded per key.  Skewed keys behave like any window
op (AQE/salting if a key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left rows + latest right values at/before ts.

    ``by``: equality keys (series identity); ``value_cols``: right-side
    payload columns to attach (default: every right column not in
    by/on).  Unmatched (or out-of-tolerance) left rows keep nulls.
    """
    by = by or ["source"]
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {on}]

    lcols = left.columns
    l = left.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast("timestamp").alias("_rts"),
    )
    r = right.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(on).cast("timestamp").alias("_rts"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r)
    carried = merged.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("_crts"),
    ).where(F.col("_side") == 1)

    in_tol = (
        F.lit(True)
        if tolerance_seconds is None
        else (
            F.unix_timestamp("_ts") - F.unix_timestamp("_crts")
            <= F.lit(int(tolerance_seconds))
        )
    )
    out_vals = [
        F.when(in_tol, F.col(f"_c_{c}")).alias(f"{c}{suffix}") for c in value_cols
    ]
    return carried.select(*[F.col(f"_l.{c}").alias(c) for c in lcols], *out_vals)
