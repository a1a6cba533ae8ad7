"""Numeric coercion with the reference's ToInt64 semantics.

Every metric update path in the reference coerces its Lua argument with
``state.ToInt64`` (/root/reference/graphite/graphite.go:187,194,201,208,215):
numeric strings parse, floats truncate toward zero, anything non-numeric
becomes 0.  These helpers reproduce that exactly, JVM-side (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_int64(col: Column | str) -> Column:
    """string/any -> int64: parse as double, truncate toward zero, else 0.

    cast(double -> long) in Spark truncates toward zero, matching Go's
    float64 -> int64 conversion for in-range values.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("double").cast("long"), F.lit(0).cast("long"))


def to_int64_pandas(s):
    """pandas analog for use inside Arrow UDF handlers (same semantics)."""
    import pandas as pd

    out = pd.to_numeric(s, errors="coerce")
    return out.fillna(0).astype("float64").astype("int64")
