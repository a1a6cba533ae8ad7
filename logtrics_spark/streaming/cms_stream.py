"""Streaming Count-Min — linear state carried across micro-batches
(the streaming face of operators/countmin.py, and the simplest
possible stateful sketch: CMS is LINEAR, so fold order cannot matter
and the streaming table is BIT-IDENTICAL to a batch build over
everything seen).

``applyInPandasWithState`` keeps one ``depth x width`` counter table
per group; each micro-batch's items scatter into a batch-local table
(same md5 Kirsch-Mitzenmacher hashing as the batch family — stored and
streamed sketches interoperate) which is added elementwise.  Snapshots
follow the latest-wins seq convention of mg_stream/the daemon sketch
tables; the emitted row IS a valid countmin.py summary row, so
``cms_query`` answers point-frequency straight off the stream output.

State is a fixed ``depth*width`` longs + two scalars per group —
bounded by geometry, not stream length; no watermark needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from logtrics_spark.operators.countmin import _scatter

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("table", T.ArrayType(T.LongType())),
        T.StructField("total_n", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("table", T.ArrayType(T.LongType())),
        T.StructField("total_n", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def cms_stream(
    items: DataFrame,
    depth: int = 4,
    width: int = 128,
    source_col: str = "source",
    item_col: str = "item",
) -> DataFrame:
    """Streaming (source, item) rows -> per-batch CMS table snapshots.

    Returns an append-mode stream; filter to each source's max ``seq``
    for the current table and feed it to ``countmin.cms_query`` (the
    output schema matches the batch summary row: depth/width ride as
    columns so geometries can never mix).
    """

    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        vc = pd.concat(batches, ignore_index=True)["item"].dropna().value_counts()
        delta = _scatter(
            vc.index.to_numpy(dtype=object),
            vc.to_numpy(dtype=np.int64),
            depth,
            width,
        ).ravel()
        if state.exists:
            table, total, seq = state.get
            table = (np.asarray(table, dtype=np.int64) + delta).tolist()
            total = int(total) + int(vc.sum())
        else:
            table = delta.tolist()
            total = int(vc.sum())
            seq = 0
        seq = int(seq) + 1
        state.update((table, total, seq))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "seq": [seq],
                "depth": [depth],
                "width": [width],
                "table": [table],
                "total_n": [total],
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
