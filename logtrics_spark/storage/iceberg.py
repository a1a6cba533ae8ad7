"""IcebergTableIO — the north rule's real backend for the TableIO seam.

The sandbox ships no Iceberg jars (SURVEY.md §7), so CI exercises the
ParquetTableIO fallback and this module is exercised only when a
runtime has the jars (tests/test_iceberg.py skips otherwise).  The
class maps the seam's path-flavored contract onto Iceberg SQL:

    write_partitioned  -> writeTo(...).overwritePartitions() / append()
    read               -> spark.table + partition-pruned filters
    drop_partition     -> DELETE WHERE (metadata-only partition drop)
    compact_partition  -> CALL <catalog>.system.rewrite_data_files
    lineage            -> plain Iceberg append table; sealed_units is
                          the same latest-wins max_by(seal_seq) view

Path specs like ``"tiers/tier=1m"`` (what RollupJob passes) parse to
(table="tiers", filters={tier: "1m"}) — the directory layout the
parquet fallback materializes IS Iceberg's logical partition spec, so
callers don't change.

Session prerequisites (spark-submit flags, all public Iceberg docs):

    --packages org.apache.iceberg:iceberg-spark-runtime-<ver>
    --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.\
IcebergSparkSessionExtensions
    --conf spark.sql.catalog.<cat>=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.<cat>.type=hadoop
    --conf spark.sql.catalog.<cat>.warehouse=<root>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logtrics_spark.storage.tableio import LINEAGE_SCHEMA, ParquetTableIO


def iceberg_available(spark: SparkSession, catalog: str = "local") -> bool:
    """True when the Iceberg runtime jar AND a configured catalog exist."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — jar probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    try:
        return spark.conf.get(f"spark.sql.catalog.{catalog}") is not None
    except Exception:
        return False


def _parse_spec(spec: str) -> tuple[str, dict[str, str]]:
    """'tiers/tier=1m' -> ('tiers', {'tier': '1m'})."""
    parts = spec.strip("/").split("/")
    filters: dict[str, str] = {}
    for p in parts[1:]:
        k, _, v = p.partition("=")
        if not _:
            raise ValueError(f"bad partition segment {p!r} in table spec {spec!r}")
        filters[k] = v
    return parts[0], filters


class IcebergTableIO:
    """Iceberg implementation of the TableIO seam (see ParquetTableIO).

    Same method surface; ``namespace`` maps the store root.  Seal
    protocol is STRONGER here: every write is an Iceberg snapshot
    commit, so the dynamic-overwrite idempotence the parquet fallback
    argues for by determinism becomes transactional for free, and
    ``compact_partition`` runs concurrently with readers (snapshot
    isolation removes the fallback's no-concurrent-readers caveat).
    """

    def __init__(
        self, spark: SparkSession, namespace: str, catalog: str = "local"
    ) -> None:
        if not iceberg_available(spark, catalog):
            raise RuntimeError(
                f"Iceberg runtime or catalog {catalog!r} not configured; "
                "use ParquetTableIO (the sandbox default) instead"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    # ---- naming --------------------------------------------------------
    def _fqn(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def path(self, *parts: str) -> str:  # seam parity: logical identifier
        return "/".join((self.namespace, *parts))

    def exists(self, *parts: str) -> bool:
        table, filters = _parse_spec("/".join(parts))
        if not self.spark.catalog.tableExists(self._fqn(table)):
            return False
        if not filters:
            return True
        df = self.spark.table(self._fqn(table))
        for k, v in filters.items():
            df = df.where(F.col(k) == v)
        return not df.limit(1).isEmpty()  # partition-pruned metadata probe

    # ---- generic partitioned tables -----------------------------------
    def write_partitioned(
        self,
        df: DataFrame,
        table: str,
        partition_cols: list[str],
        overwrite_dynamic: bool = True,
        cluster: bool = True,
    ) -> None:
        name, filters = _parse_spec(table)
        if filters:
            raise ValueError("write target must be a bare table, not a partition")
        if cluster:
            df = df.repartition(*[F.col(c) for c in partition_cols])
        fqn = self._fqn(name)
        if not self.spark.catalog.tableExists(fqn):
            df.writeTo(fqn).partitionedBy(
                *[F.col(c) for c in partition_cols]
            ).create()
            return
        writer = df.writeTo(fqn)
        if overwrite_dynamic:
            writer.overwritePartitions()
        else:
            writer.append()

    def read(self, table: str) -> DataFrame:
        name, filters = _parse_spec(table)
        df = self.spark.table(self._fqn(name))
        for k, v in filters.items():
            df = df.where(F.col(k) == v)
        return df

    def drop_partition(self, table: str, **partition_values: str) -> bool:
        name, filters = _parse_spec(table)
        filters.update({k: str(v) for k, v in partition_values.items()})
        if not self.exists(
            "/".join([name, *[f"{k}={v}" for k, v in filters.items()]])
        ):
            return False
        where = " AND ".join(f"{k} = '{v}'" for k, v in filters.items())
        # aligned with the partition spec -> metadata-only delete
        self.spark.sql(f"DELETE FROM {self._fqn(name)} WHERE {where}")
        return True

    def compact_partition(self, table: str, **partition_values: str) -> int:
        name, filters = _parse_spec(table)
        filters.update({k: str(v) for k, v in partition_values.items()})
        where = " AND ".join(f"{k} = '{v}'" for k, v in filters.items())
        res = self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files("
            f"table => '{self.namespace}.{name}', where => \"{where}\")"
        ).collect()
        return int(res[0][0]) if res else 0  # rewritten_data_files_count

    def list_partitions(self, table: str, col: str) -> list[str]:
        name, filters = _parse_spec(table)
        df = self.spark.table(self._fqn(name))
        for k, v in filters.items():
            df = df.where(F.col(k) == v)
        return sorted(
            str(r[0]) for r in df.select(col).distinct().collect() if r[0] is not None
        )

    # ---- lineage log ---------------------------------------------------
    _next_seal_seq = ParquetTableIO._next_seal_seq  # same monotonic stamp

    def append_lineage(self, rows: list[dict]) -> None:
        if not rows:
            return
        import pandas as pd

        seq = self._next_seal_seq()
        pdf = pd.DataFrame(
            {
                f.name: [r.get(f.name, seq if f.name == "seal_seq" else None) for r in rows]
                for f in LINEAGE_SCHEMA.fields
            }
        )
        df = self.spark.createDataFrame(pdf, LINEAGE_SCHEMA)
        fqn = self._fqn("lineage")
        if not self.spark.catalog.tableExists(fqn):
            df.writeTo(fqn).create()
        else:
            df.writeTo(fqn).append()

    def read_lineage(self) -> DataFrame:
        if not self.spark.catalog.tableExists(self._fqn("lineage")):
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.table(self._fqn("lineage"))

    # identical latest-wins semantics — shared implementation
    sealed_units = ParquetTableIO.sealed_units
