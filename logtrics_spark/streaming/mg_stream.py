"""Streaming heavy hitters — Misra-Gries state carried across
micro-batches (the streaming face of operators/heavyhitters.py).

The daemon already maintains sk_mg tables by merging per-batch
PARTIALS at flush time; this operator is the structured-streaming
native version: ``applyInPandasWithState`` keeps ONE capacity-k MG
summary per group in the state store, folds each micro-batch's items
into it (exact batch counts merged at capacity via the PODS'12
reduction — identical arithmetic to the batch ``mg_merge``), and emits
a ranked top-k SNAPSHOT per group per batch.

Snapshot contract (same latest-wins convention as the daemon's sketch
tables): every emission carries a per-group monotonically increasing
``seq``; consumers keep the rows with each group's max seq.  The MG
guarantee holds at every snapshot: for each emitted item,
``est <= true_count <= est + err``, and any item with true frequency
> total_n/(k+1) is present.

State is bounded by construction: k (item, count) pairs + two longs
per group, independent of stream length — no watermark needed (the
summary IS the eviction policy), so GroupStateTimeout.NoTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from logtrics_spark.operators.heavyhitters import mg_merge

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("item", T.StringType()),
        T.StructField("est", T.LongType()),
        T.StructField("err", T.LongType()),
        T.StructField("total_n", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("err", T.LongType()),
        T.StructField("total_n", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def mg_topk_stream(
    items: DataFrame,
    k: int = 256,
    top: int | None = None,
    source_col: str = "source",
    item_col: str = "item",
) -> DataFrame:
    """Streaming (source, item) rows -> per-batch ranked top-k snapshots.

    ``items`` is a STREAMING DataFrame with at least (source_col,
    item_col).  Returns an append-mode stream of snapshot rows; filter
    to each source's max ``seq`` for the current standings.  ``top``
    bounds the emitted rows per snapshot (default: the full capacity-k
    summary).
    """
    emit = top or k

    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        vc = pd.concat(batches, ignore_index=True)["item"].dropna().value_counts()
        if state.exists:
            s_items, s_counts, s_err, s_total, seq = state.get
        else:
            s_items, s_counts, s_err, s_total, seq = [], [], 0, 0, 0
        merged_items, merged_counts, err, total = mg_merge(
            [
                (list(s_items), list(s_counts), s_err, s_total),
                (vc.index.tolist(), vc.to_numpy().tolist(), 0, int(vc.sum())),
            ],
            k,
        )
        seq += 1
        state.update((merged_items, merged_counts, err, total, seq))
        head = min(emit, len(merged_items))
        if head == 0:
            return
        yield pd.DataFrame(
            {
                "source": key[0],
                "seq": seq,
                "rank": range(1, head + 1),
                "item": merged_items[:head],
                "est": merged_counts[:head],
                "err": err,
                "total_n": total,
            }
        )

    return (
        items.select(
            items[source_col].alias("source"), items[item_col].alias("item")
        )
        .groupBy("source")
        .applyInPandasWithState(
            fold, _OUT_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
