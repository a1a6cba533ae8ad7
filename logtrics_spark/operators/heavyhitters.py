"""Mergeable heavy-hitter tiers — Misra-Gries summaries (Misra & Gries
1982; mergeability per Agarwal et al., "Mergeable Summaries", PODS'12).

WHY: "top sources/users per window" is the third aggregate family that
does not compose: the exact `topk_series` answers one tier from its
rows, but the top-k of an hour is NOT derivable from the top-k of its
minutes once the tails were dropped — same trap as percentiles and
distinct counts.  This completes the mergeable-sketch trio alongside
`set_sketch_rollup` (HLL, distinct counts) and `tdigest_rollup`
(quantiles): each fine window stores a bounded (item, count) summary
plus an error bound, coarser tiers MERGE summaries, and any item with
true frequency > n/(k+1) is GUARANTEED to survive every merge.

Summary semantics (per window): up to k items with clipped counts and
a scalar ``err`` such that for every item,

    true_count - err <= est_count(+0 if absent) <= true_count

``total_n`` carries the exact window mass (conserved through merges —
the hash-exact invariant a driver oracle can check).  Merge = sum
counts coordinate-wise, add errs, then if over capacity subtract the
(k+1)-th largest count from all, clip at 0, and fold the subtracted
amount into ``err`` (the PODS'12 reduction).

Execution shape mirrors the t-digest modes, picked by window DENSITY:

  direct (default): per-window item counts via a plain JVM two-key
  groupBy (partial+final native agg — the raw shuffle carries
  (window, item) longs), then collect_list + ONE Arrow reduction pass.
  Right for modest windows, but the collect_list funnels a window's
  whole DISTINCT-ITEM set through one task — at 100 TB a
  high-cardinality column (user ids) makes that task the bottleneck.

  presketch=True: mapInPandas builds a capacity-k MG summary per
  series-window per input BATCH (mergeable, PODS'12), so the shuffle
  carries <= k (item, count) pairs per group per batch instead of the
  full distinct set, and no single task ever sees a window's whole
  cardinality.  Right when windows are huge/high-cardinality — the
  true aggregateByKey regime.  Like any partial-MG pipeline the kept
  ITEM SET can differ from direct mode at the clipped tail (the
  guarantee — any item with true count > n/(k+1) survives, and
  est <= true <= est + err — holds in both).

The summary build and every merge are whole-batch Arrow passes over
collect_list rows — no per-group pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logtrics_spark.operators.rollup import KEY, tier_seconds, window_start

_SUMMARY = "items array<string>, counts array<long>, err long, total_n long"


def _reduce(items: np.ndarray, counts: np.ndarray, k: int):
    """PODS'12 reduction to capacity k; returns (items, counts, delta).

    Deterministic: ties in the (k+1)-th count are resolved by the
    (-count, item) sort, so the same inputs always keep the same items.
    """
    if len(items) <= k:
        order = np.lexsort((items, -counts))
        return items[order], counts[order], 0
    order = np.lexsort((items, -counts))
    items, counts = items[order], counts[order]
    delta = int(counts[k])  # (k+1)-th largest
    counts = counts - delta
    keep = counts > 0
    keep[k:] = False  # ties at the boundary all clipped to <= 0 anyway
    return items[keep], counts[keep], delta


def mg_merge(summaries, k: int):
    """Merge (items, counts, err, total_n) summaries at capacity k."""
    bag: dict[str, int] = {}
    err = 0
    total = 0
    for it, cn, e, n in summaries:
        err += int(e)
        total += int(n)
        for i, c in zip(it, cn):
            bag[i] = bag.get(i, 0) + int(c)
    if not bag:
        return [], [], err, total
    items = np.array(list(bag.keys()), dtype=object)
    counts = np.array(list(bag.values()), dtype=np.int64)
    items, counts, delta = _reduce(items, counts, k)
    return list(items), [int(c) for c in counts], err + delta, total


def _merge_rows_udf(k: int):
    """Arrow pass merging collect_list'ed summaries at capacity k
    (closure factory — pandas_udf rejects extra defaulted params)."""

    @F.pandas_udf(_SUMMARY)
    def merge_rows(it: pd.Series, cn: pd.Series, er: pd.Series, tn: pd.Series) -> pd.DataFrame:
        rows = []
        for its, cns, errs, ns in zip(it, cn, er, tn):
            rows.append(mg_merge(zip(its, cns, errs, ns), k))
        return pd.DataFrame(rows, columns=["items", "counts", "err", "total_n"])

    return merge_rows


def mg_rollup(
    points: DataFrame,
    tier: str,
    item_col: str,
    key: list[str] | None = None,
    k: int = 256,
    presketch: bool = False,
) -> DataFrame:
    """One MG summary per series-window over ``item_col``.

    Direct mode: exact item counting (two-key native groupBy), then the
    summary truncates to capacity k with the MG guarantee; err == 0
    whenever the window's item cardinality <= k (the summary is then
    exact).  presketch mode (see module doc): batch-local capacity-k
    partials merged through the PODS'12 reduction — the shuffle and
    every single task are bounded by k, independent of the window's
    item cardinality.
    """
    key = key or KEY
    gcols = [*key, "window_start"]
    # null items are dropped (no observation), and BEFORE counting: in
    # direct mode collect_list("_item") silently drops nulls while
    # collect_list("_cnt") keeps their counts — misaligned arrays would
    # crash the reduction; filtering here keeps both modes identical
    pts = (
        points.withColumn("window_start", window_start(F.col("ts"), tier))
        .select(*gcols, F.col(item_col).cast("string").alias("_item"))
        .where(F.col("_item").isNotNull())
    )
    if presketch:
        in_fields = {f.name: f for f in pts.schema.fields}
        schema = T.StructType(
            [T.StructField(c, in_fields[c].dataType) for c in gcols]
            + [
                T.StructField("items", T.ArrayType(T.StringType())),
                T.StructField("counts", T.ArrayType(T.LongType())),
                T.StructField("err", T.LongType()),
                T.StructField("total_n", T.LongType()),
            ]
        )

        def partial(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                codes, keys_idx = pd.factorize(
                    pd.MultiIndex.from_frame(pdf[gcols]), sort=False
                )
                cnt = (
                    pd.DataFrame({"_g": codes, "_i": pdf["_item"].to_numpy()})
                    .groupby(["_g", "_i"], sort=False, dropna=False)
                    .size()
                    .reset_index(name="_n")
                    .sort_values("_g", kind="stable")
                )
                garr = cnt["_g"].to_numpy()
                iarr = cnt["_i"].to_numpy(dtype=object)
                narr = cnt["_n"].to_numpy(dtype=np.int64)
                seg = np.flatnonzero(np.r_[True, garr[1:] != garr[:-1]])
                ends = np.append(seg[1:], len(garr))
                rows = []
                for si, ei in zip(seg, ends):
                    i2, c2, delta = _reduce(iarr[si:ei], narr[si:ei], k)
                    rows.append(
                        (
                            *keys_idx[garr[si]],
                            list(i2),
                            [int(x) for x in c2],
                            int(delta),
                            int(narr[si:ei].sum()),
                        )
                    )
                yield pd.DataFrame(rows, columns=[*gcols, "items", "counts", "err", "total_n"])

        partials = pts.mapInPandas(partial, schema)
        merged = partials.groupBy(*gcols).agg(
            F.collect_list("items").alias("_it"),
            F.collect_list("counts").alias("_cn"),
            F.collect_list("err").alias("_er"),
            F.collect_list("total_n").alias("_tn"),
        )
        return merged.withColumn(
            "_s", _merge_rows_udf(k)("_it", "_cn", "_er", "_tn")
        ).select(*gcols, "_s.items", "_s.counts", "_s.err", "_s.total_n")

    # Direct mode runs the PODS'12 reduction in PURE Catalyst: the
    # summary is a per-group sorted (-count, item) struct array, the
    # (k+1)-th count is the clip delta, and the kept prefix is a
    # filter+transform over the first k entries.  The r6 shape shipped
    # every window's (items, counts) arrays through Arrow into a
    # per-ROW pandas loop (one np.lexsort per summary) — at sf1.0 the
    # 1m fine tier has 214k windows and that Python stage dominated the
    # whole mg arm (~10 s); this formulation is value-identical
    # (lexsort over unique (item) keys == sort_array over unique
    # (-count, item) structs, same clip, same kept-prefix order) and
    # never leaves the JVM.
    summ = (
        pts.groupBy(*gcols, "_item")
        .agg(F.count("*").alias("_cnt"))
        .groupBy(*gcols)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct((-F.col("_cnt")).alias("nc"), F.col("_item").alias("it"))
                )
            ).alias("_s"),
            F.sum("_cnt").alias("total_n"),
        )
    )
    delta = (
        F.when(F.size("_s") <= k, F.lit(0).cast("long"))
        .otherwise(-F.element_at("_s", k + 1)["nc"])
    )
    staged = summ.select(
        *gcols,
        delta.alias("_d"),
        F.slice("_s", 1, k).alias("_top"),
        "total_n",
    ).select(
        *gcols,
        F.filter(
            "_top", lambda s: (F.lit(0).cast("long") - s["nc"] - F.col("_d")) > 0
        ).alias("_kept"),
        "_d",
        "total_n",
    )
    return staged.select(
        *gcols,
        F.transform("_kept", lambda s: s["it"]).alias("items"),
        F.transform(
            "_kept", lambda s: (F.lit(0).cast("long") - s["nc"] - F.col("_d")).cast("long")
        ).alias("counts"),
        F.col("_d").cast("long").alias("err"),
        "total_n",
    )


def mg_cascade(fine: DataFrame, fine_tier: str, coarse_tier: str, k: int = 256) -> DataFrame:
    """Merge fine windows' summaries into the coarse window — pure
    Catalyst (r7): explode each summary's (item, count) pairs, bag-sum
    per (group, item) with map-side partial aggregation, then run the
    SAME PODS'12 reduction `mg_rollup` direct mode uses (sorted
    (-count, item) struct array, (k+1)-th count as the clip delta,
    kept prefix where count - delta > 0).

    Value-identical to the former Arrow `mg_merge` pass: the bag is a
    per-item sum either way, `np.lexsort((items, -counts))` over unique
    items orders exactly like `sort_array` over unique (-count, item)
    structs, the clip delta and kept prefix are the same arithmetic,
    and the merged err = sum(input errs) + delta.  Each fine row's
    scalar err/total_n is contributed ONCE via its pos==0 explode row
    (posexplode_outer keeps empty summaries as a null-pos row, so their
    err/total_n still count).  The r6 shape shipped every group's
    summaries through Arrow into a per-row Python dict merge — the one
    remaining Python stage in the mg tier ladder."""
    if tier_seconds(coarse_tier) % tier_seconds(fine_tier) != 0:
        raise ValueError(f"{coarse_tier} is not a multiple of {fine_tier}")
    key = [
        c
        for c in fine.columns
        if c not in ("window_start", "items", "counts", "err", "total_n")
    ]
    gcols = [*key, "window_start"]
    first = F.col("_pos").isNull() | (F.col("_pos") == 0)
    ex = (
        fine.withColumn("window_start", window_start(F.col("window_start"), coarse_tier))
        .select(
            *gcols,
            "err",
            "total_n",
            F.posexplode_outer(F.arrays_zip("items", "counts")).alias("_pos", "_p"),
        )
        .select(
            *gcols,
            F.col("_p.items").alias("_item"),
            F.col("_p.counts").alias("_cnt"),
            F.when(first, F.col("err")).otherwise(F.lit(0)).cast("long").alias("_er"),
            F.when(first, F.col("total_n")).otherwise(F.lit(0)).cast("long").alias("_tn"),
        )
    )
    summ = (
        ex.groupBy(*gcols, "_item")
        .agg(
            F.sum("_cnt").alias("_cnt"),
            F.sum("_er").alias("_er"),
            F.sum("_tn").alias("_tn"),
        )
        .groupBy(*gcols)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("_item").isNotNull(),
                        F.struct((-F.col("_cnt")).alias("nc"), F.col("_item").alias("it")),
                    )
                )
            ).alias("_s"),
            F.sum("_er").alias("_be"),
            F.sum("_tn").alias("total_n"),
        )
    )
    delta = (
        F.when(F.size("_s") <= k, F.lit(0).cast("long"))
        .otherwise(-F.element_at("_s", k + 1)["nc"])
    )
    staged = summ.select(
        *gcols,
        delta.alias("_d"),
        F.slice("_s", 1, k).alias("_top"),
        "_be",
        "total_n",
    ).select(
        *gcols,
        F.filter(
            "_top", lambda s: (F.lit(0).cast("long") - s["nc"] - F.col("_d")) > 0
        ).alias("_kept"),
        "_d",
        "_be",
        "total_n",
    )
    return staged.select(
        *gcols,
        F.transform("_kept", lambda s: s["it"]).alias("items"),
        F.transform(
            "_kept", lambda s: (F.lit(0).cast("long") - s["nc"] - F.col("_d")).cast("long")
        ).alias("counts"),
        (F.col("_be") + F.col("_d")).cast("long").alias("err"),
        "total_n",
    )


def mg_topk(summary_df: DataFrame, n: int = 10) -> DataFrame:
    """Explode the top-n of each summary: (key..., window_start, item,
    est_count, err, total_n, rank).  Summaries store items pre-sorted
    by (-count, item), so rank = array position — no re-sort, and the
    tie order is engine-reproducible (the driver oracle relies on it).
    """
    pre = summary_df.withColumn("_ti", F.slice("items", 1, n)).withColumn(
        "_tc", F.slice("counts", 1, n)
    )
    keep = [c for c in summary_df.columns if c not in ("items", "counts")]
    ex = pre.select(
        *keep, F.posexplode(F.arrays_zip("_ti", "_tc")).alias("_pos", "_pair")
    )
    return ex.select(
        *keep,
        F.col("_pair._ti").alias("item"),
        F.col("_pair._tc").alias("est_count"),
        (F.col("_pos") + 1).alias("rank"),
    )
