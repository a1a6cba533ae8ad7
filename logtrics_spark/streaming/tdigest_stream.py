"""Streaming quantiles — one t-digest per group carried across
micro-batches (the streaming face of operators/tdigest.py; with
mg_stream and cms_stream this completes the streaming twins for the
mergeable families — the fourth, HLL, needs no custom operator:
Spark's native ``hll_sketch_agg`` already runs inside a streaming
aggregation).

``applyInPandasWithState`` keeps ONE serialized digest per group;
each micro-batch folds in as ``merge([state, build(batch)])`` — the
exact same arithmetic as the batch family, so a snapshot is
byte-identical to replaying the same fold driver-side (pinned by
tests), and the t-digest size bound (≈ compression/2 centroids) is
the state bound: fixed per group, independent of stream length.

Snapshots follow the latest-wins seq convention; each emission carries
the digest blob (feed it to ``tdigest.quantile`` for any q later) plus
the requested quantile estimates inline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from logtrics_spark.operators import tdigest as td

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("blob", T.BinaryType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _out_schema(qs: tuple[float, ...]) -> T.StructType:
    return T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("tdigest", T.BinaryType()),
        ]
        + [
            T.StructField(f"p{str(q).replace('0.', '')}", T.DoubleType())
            for q in qs
        ]
    )


def tdigest_stream(
    values: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    compression: float = td.DEFAULT_COMPRESSION,
    source_col: str = "source",
    value_col: str = "value",
) -> DataFrame:
    """Streaming (source, value) rows -> per-batch digest snapshots with
    inline quantile estimates.  Filter to each source's max ``seq`` for
    the current digest; the blob column answers any future q via
    ``tdigest.quantile``."""
    out_schema = _out_schema(qs)
    qcols = [f.name for f in out_schema.fields[4:]]

    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        vals = pd.concat(batches, ignore_index=True)["value"].dropna().to_numpy()
        batch_blob = td.build(vals, compression)
        if state.exists:
            (blob, seq) = state.get
            blob = td.merge([bytes(blob), batch_blob], compression)
        else:
            blob, seq = batch_blob, 0
        seq = int(seq) + 1
        state.update((blob, seq))
        _, weights, _, _, _ = td.from_bytes(blob)
        row = {
            "source": key[0],
            "seq": seq,
            "n": int(weights.sum()),
            "tdigest": bytearray(blob),
        }
        for q, name in zip(qs, qcols):
            row[name] = td.quantile(blob, q)
        yield pd.DataFrame([row])

    return (
        values.select(
            values[source_col].alias("source"), values[value_col].alias("value")
        )
        .groupBy("source")
        .applyInPandasWithState(
            fold, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
