"""N4/N5/N6 — gap-fill: dense spine, locf, linear interpolation.

The reference's flush ticker emits the *entire* registry every interval
(/root/reference/graphite/graphite.go:84-98) — even metrics that saw no
events still get a line, which is exactly "gap-fill" semantics when the
emit becomes a tumbling window.  These operators densify tier tables:

- ``dense_spine``: every window slot in [min, max] per series, even when
  the rollup has no row there (empty slots get null aggregates).
- ``locf``: last-observation-carried-forward — the gauge semantics
  (last-value-wins, graphite.go:115-125) extended across empty windows.
- ``interp_linear``: proportional fill between the two nearest known
  points; boundary gaps (before first / after last observation) stay
  null, matching TimescaleDB's ``interpolate``.

Scale notes:
- the spine is built from a per-series min/max aggregate (tiny) and
  exploded distributedly — no driver-side materialization.  A series
  spanning a year at 1m is ~525k slots; explode distributes them.
- the spine⟕rollup join is keyed on (series, window_start); both sides
  are tier-sized (already 3-6 orders of magnitude smaller than raw), and
  AQE handles any residual skew.
- locf/linear are window functions partitioned BY SERIES — state per
  task is bounded by one series' slot count, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logtrics_spark.operators.rollup import KEY, tier_seconds

AGG_COLS = ["cnt", "sum", "min", "max", "avg", "last"]


def dense_spine(tier_df: DataFrame, tier: str, key: list[str] | None = None) -> DataFrame:
    """Left-join the rollup onto a dense per-series window spine.

    Missing slots appear with null aggregates (cnt stays null, not 0, so
    callers can distinguish "no data" from "observed zero").
    """
    key = key or KEY
    secs = tier_seconds(tier)
    bounds = tier_df.groupBy(*key).agg(
        F.min(F.unix_timestamp("window_start")).alias("mn"),
        F.max(F.unix_timestamp("window_start")).alias("mx"),
    )
    spine = bounds.select(
        *key,
        F.explode(F.sequence("mn", "mx", F.lit(secs))).alias("epoch"),
    ).select(*key, F.timestamp_seconds("epoch").alias("window_start"))
    return spine.join(tier_df, on=[*key, "window_start"], how="left")


def locf(
    df: DataFrame,
    value_cols: list[str] | None = None,
    key: list[str] | None = None,
    order_col: str = "window_start",
    limit: int | None = None,
) -> DataFrame:
    """Fill nulls with the previous non-null value per series (N5).

    ``limit`` gives Graphite's ``keepLastValue(limit)`` semantics: a
    null RUN is filled only when its whole length is <= limit slots —
    longer outages stay visibly null instead of flatlining forever
    (interior runs measured between the surrounding known slots;
    trailing runs by their length; leading runs never fill).  None =
    unbounded carry (plain locf).
    """
    key = key or KEY
    value_cols = value_cols or AGG_COLS
    w = (
        Window.partitionBy(*key)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if limit is None:
        out = df
        for c in value_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
        return out
    if limit < 1:
        raise ValueError(f"limit must be >= 1, got {limit}")
    # run-length bookkeeping shares ONE ordering: row number per slot,
    # the last known slot's row number behind each slot, the next known
    # slot's ahead — run_len = gap between the surrounding known slots
    wf = (
        Window.partitionBy(*key)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    wall = Window.partitionBy(*key)
    ordw = Window.partitionBy(*key).orderBy(order_col)
    out = df.withColumn("_rn", F.row_number().over(ordw))
    for c in value_cols:
        v = F.col(c)
        known_rn = F.when(v.isNotNull(), F.col("_rn"))
        prev_rn = F.last(known_rn, ignorenulls=True).over(w)
        next_rn = F.first(known_rn, ignorenulls=True).over(wf)
        run_len = F.when(
            next_rn.isNotNull(), next_rn - prev_rn - 1
        ).otherwise(F.max("_rn").over(wall) - prev_rn)
        filled = F.last(v, ignorenulls=True).over(w)
        out = out.withColumn(
            c,
            F.when(v.isNotNull(), v).otherwise(
                F.when(prev_rn.isNotNull() & (run_len <= limit), filled)
            ),
        )
    return out.drop("_rn")


def interp_linear(
    df: DataFrame,
    value_cols: list[str] | None = None,
    key: list[str] | None = None,
    order_col: str = "window_start",
) -> DataFrame:
    """Linear interpolation across interior gaps per series (N6).

    For a null slot at time t with previous known (t0,v0) and next known
    (t1,v1): v = v0 + (v1-v0)*(t-t0)/(t1-t0), as double.  Boundary gaps
    stay null.
    """
    key = key or KEY
    value_cols = value_cols or ["sum", "avg", "last"]
    wb = (
        Window.partitionBy(*key)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*key)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.unix_timestamp(order_col).cast("double")
    out = df
    for c in value_cols:
        v = F.col(c).cast("double")
        t_known = F.when(v.isNotNull(), t)
        pv = F.last(v, ignorenulls=True).over(wb)
        pt = F.last(t_known, ignorenulls=True).over(wb)
        nv = F.first(v, ignorenulls=True).over(wf)
        nt = F.first(t_known, ignorenulls=True).over(wf)
        interp = pv + (nv - pv) * (t - pt) / (nt - pt)
        out = out.withColumn(
            c,
            F.when(v.isNotNull(), v).otherwise(
                F.when(pv.isNotNull() & nv.isNotNull(), interp)
            ),
        )
    return out


def gapfill(
    tier_df: DataFrame,
    tier: str,
    method: str = "locf",
    value_cols: list[str] | None = None,
    key: list[str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Spine + fill in one call: method in {'null', 'locf', 'linear'}.

    ``limit`` (locf only) = Graphite's keepLastValue(limit): fill only
    null runs of <= limit slots."""
    dense = dense_spine(tier_df, tier, key=key)
    if method == "null":
        return dense
    if method == "locf":
        return locf(dense, value_cols=value_cols, key=key, limit=limit)
    if method == "linear":
        return interp_linear(dense, value_cols=value_cols, key=key)
    raise ValueError(f"unknown gapfill method {method!r}")
