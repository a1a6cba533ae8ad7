from logtrics_spark.functions.coerce import to_int64  # noqa: F401
