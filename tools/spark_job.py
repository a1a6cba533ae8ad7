"""spark-submit entry point: a thin file wrapper over the package CLI.

spark-submit needs a driver *file*; the package itself ships via
``--py-files dist/logtrics_spark.zip`` (tools/package_pyfiles.py).
All subcommands of ``python -m logtrics_spark`` work unchanged:

    spark-submit --py-files dist/logtrics_spark.zip tools/spark_job.py \\
        rollup --input tok.parquet --store /warehouse/logtrics --retention
"""

from __future__ import annotations

import sys

from logtrics_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
