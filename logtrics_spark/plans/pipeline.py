"""N8/N9 — the end-to-end resumable rollup job with lineage + retention.

Pipeline:  raw token table -> extract points -> 1m rollup -> cascade
(5m/1h/1d) -> Gorilla chunks per tier -> lineage seal -> retention.

Checkpoint/resume semantics (north rule): the unit of progress is a
*seal unit* = (tier, source, day).  A run:

  1. enumerates units present in the raw table,
  2. anti-joins them against the sealed set from the lineage log,
  3. recomputes ONLY pending days (raw scan partition-pruned via a
     broadcast semi-join; a pending day is recomputed for all sources —
     determinism makes re-materializing sealed sources a byte-level
     no-op, and day-level granularity keeps tier tables at (tier, day)
     partitioning: ~sources-times fewer files to commit),
  4. writes ALL tier rows in one clustered dynamic-overwrite job and all
     chunks in a second (idempotent: a replayed partition overwrites
     itself with identical bytes),
  5. appends sealed lineage rows strictly after the data lands, tier by
     tier in cascade order.

Kill the job anywhere and rerun: sealed units are skipped, unsealed
units are recomputed onto the same partitions, and the final tables are
identical to a never-killed run (tested in tests/test_pipeline.py).

Retention: a raw (source, day) partition is dropped once EVERY tier has
a sealed unit covering it — the Iceberg analog is `DELETE WHERE`, the
parquet fallback removes the partition directory.

Skew (N10): the heavy shuffle is the 1m groupBy, which Spark executes
as partial+final native aggregation — the hot "web" source is spread by
(source, metric, kind, window_start) grouping, whose cardinality scales
with time, not rows.  The only grouped-map stage (Gorilla) runs on
tier-sized data keyed down to (series, chunk day).  AQE handles
residual shuffle skew; `operators/skew.py` provides explicit salting
for custom grouped-map stages over raw-sized data.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logtrics_spark.operators.extract import extract_points
from logtrics_spark.operators.gorilla import compress_tier, decompress_chunks
from logtrics_spark.operators.rollup import TIER_ORDER, cascade, rollup
from logtrics_spark.operators.sketchset import KIND_VALS
from logtrics_spark.storage.tableio import ParquetTableIO

DAY_FMT = "yyyy-MM-dd"


def _day(col):
    return F.date_format(col, DAY_FMT)


def _day_str(ts) -> str:
    return ts.strftime("%Y-%m-%d")


class RollupJob:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        tiers: list[str] | None = None,
        per_source_ts: bool = False,
        step_seconds: int = 1,
        chunk_value_cols: list[str] | None = None,
        sketches=None,
    ) -> None:
        """``chunk_value_cols`` picks the aggregate columns archived in
        Gorilla chunks (default gorilla.DEFAULT_VALUE_COLS).  Retention
        drops tier rows, so anything NOT in the chunks is gone for
        dropped days — include "sum_sq" to keep timer stddev derivable
        forever (read_tier_from_chunks then restores a stddev column);
        rate/avg-style columns are derivable from cnt/sum and never need
        archiving.

        ``sketches`` (a ``SketchSet`` or its config-dict shape, e.g.
        ``{"enabled": ["tdigest", "mg", "hll"], "item_col": "value"}``)
        turns on MERGEABLE sketch tiers alongside the scalar tiers:
        run() builds finest-tier tdigest/MG/HLL rows from the same
        pruned points, cascades them up the tier ladder by MERGING
        (never re-reading raw), and lands them as write-once
        ``sk_<kind>`` tables under the same (tier, day) layout and
        pending-unit resume discipline — so quantiles / top-k /
        distinct stay answerable after retention drops raw and the fine
        tiers, without the manual composition test_sketch_store.py
        shows.  Sketch partitions rewrite idempotently on resume
        (dynamic day overwrite; contents equivalent, not byte-pinned —
        digest bytes depend on partition order, their estimates don't).
        """
        from logtrics_spark.operators.sketchset import SketchSet

        self.spark = spark
        self.io = ParquetTableIO(spark, root)
        self.tiers = tiers or TIER_ORDER
        self.per_source_ts = per_source_ts
        self.step_seconds = step_seconds
        self.chunk_value_cols = chunk_value_cols
        if sketches is None or isinstance(sketches, SketchSet):
            self.sketchset = sketches or SketchSet([])
        else:
            self.sketchset = SketchSet.from_config(sketches)

    # ------------------------------------------------------------ ingest
    def ingest_raw(self, df: DataFrame, mode: str = "overwrite_partitions") -> None:
        """Write the raw token table partitioned by (source, day).

        day derives from the doc_id-ordered timestamp, so retention can
        drop raw data at day granularity.  tokens pass through untouched
        (BASELINE.json per-row token-array equality invariant).

        mode='overwrite_partitions' (default): idempotent full/partition
        loads — re-ingesting the same batch replaces, never duplicates.
        mode='append': incremental feeds whose batches share partitions
        with earlier ingests (an overwrite here would silently DROP the
        earlier rows of any day both batches touch).
        """
        if mode not in ("overwrite_partitions", "append"):
            raise ValueError(f"unknown ingest mode {mode!r}")
        from logtrics_spark.operators.extract import with_ts

        raw = with_ts(df, per_source=self.per_source_ts, step_seconds=self.step_seconds)
        raw = raw.withColumn("day", _day("ts"))
        # cluster=False: raw is the big table — collapsing each (source,
        # day) to one file would serialize the hot source through one
        # task (skew) and produce multi-GB files at scale
        self.io.write_partitioned(
            raw,
            "raw",
            ["source", "day"],
            overwrite_dynamic=(mode == "overwrite_partitions"),
            cluster=False,
        )

    def read_raw(self) -> DataFrame:
        return self.io.read("raw")

    # ------------------------------------------------------------- units
    def _all_units(self, raw: DataFrame) -> DataFrame:
        return raw.select("source", "day").distinct()

    def pending_units(
        self, raw: DataFrame, tier: str, seal_before: str | None = None
    ) -> DataFrame:
        sealed = (
            self.io.sealed_units()
            .where(F.col("tier") == tier)
            .select("source", _day("window_start").alias("day"))
        )
        units = self._all_units(raw)
        if seal_before is not None:
            # watermark: never seal a day that may still receive data —
            # sealed units are immutable, so sealing a partial day would
            # silently drop its late arrivals on the next run
            units = units.where(F.col("day") < seal_before)
        return units.join(sealed, ["source", "day"], "left_anti")

    # --------------------------------------------------------------- run
    def run(
        self,
        run_id: str | None = None,
        fail_after_tier: str | None = None,
        seal_before: str | None = None,
    ) -> dict:
        """Compute pending units for every tier; returns per-tier counts.

        ``seal_before`` ('yyyy-MM-dd'): only seal days strictly before
        this watermark, so an in-progress ingest day is never frozen.
        ``fail_after_tier`` injects a crash after sealing that tier —
        used by the kill/resume test; never set in production.
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        raw = self.read_raw()
        stats: dict[str, int] = {t: 0 for t in self.tiers}
        cached: list[DataFrame] = []

        # fast path: a store with no lineage has nothing sealed, so every
        # unit is pending — skip the per-tier anti-join + isEmpty probes.
        fresh = not self.io.exists("lineage")

        # Phase 1 — build every pending tier's DataFrame (all lazy, each
        # persisted for reuse as the next tier's cascade input and for the
        # batched write below).  On the resume path the cascade input is
        # (stored fine rows outside fine-pending days) ∪ (freshly computed
        # fine rows) — storage alone is stale until phase 2 writes land.
        # Recompute granularity is the DAY: when any (source, day) unit is
        # pending, the whole day is recomputed for that tier (deterministic
        # pipeline -> already-sealed sources overwrite with identical
        # bytes).  This lets tier/chunk tables partition by (tier, day)
        # instead of (tier, day, source) — 8x fewer files to commit, and
        # the day-level dynamic overwrite stays exactly unit-aligned.
        tier_plans: list[tuple[str, DataFrame, set | None]] = []
        prev_full: DataFrame | None = None  # fine tier covering ALL days
        sk_kinds = self.sketchset.enabled
        # sketch tiers mirror the scalar resume discipline exactly: one
        # plan frame per (kind, tier) for pending days, one stored-∪-fresh
        # full view per kind feeding the next tier's cascade
        sk_plans: list[tuple[str, str, DataFrame]] = []
        sk_prev: dict[str, DataFrame | None] = {k: None for k in sk_kinds}
        try:
            for i, tier in enumerate(self.tiers):
                if fresh:
                    pending_set = None
                    pending_days = None
                    if seal_before is not None:
                        pending_days = (
                            self._all_units(raw)
                            .where(F.col("day") < seal_before)
                            .select("day")
                            .distinct()
                        )
                else:
                    pending = self.pending_units(raw, tier, seal_before=seal_before)
                    pending_list = [(r["source"], r["day"]) for r in pending.collect()]
                    if not pending_list:
                        prev_full = (
                            self.io.read(f"tiers/tier={tier}")
                            if self.io.exists(f"tiers/tier={tier}")
                            else None
                        )
                        for k in sk_kinds:
                            sk_prev[k] = (
                                self.io.read(f"sk_{k}/tier={tier}")
                                if self.io.exists(f"sk_{k}/tier={tier}")
                                else None
                            )
                        continue
                    pending_set = set(pending_list)
                    pending_days = self.spark.createDataFrame(
                        [(d,) for d in sorted({d for _, d in pending_list})], "day string"
                    )

                def _prune(df: DataFrame) -> DataFrame:
                    if pending_days is None:
                        return df
                    return df.join(F.broadcast(pending_days), ["day"], "left_semi")

                if i == 0:
                    # partition-pruned scan: only pending days
                    points = extract_points(
                        _prune(raw), per_source=self.per_source_ts, step_seconds=self.step_seconds
                    )
                    tier_df = rollup(points, tier)
                    sk_frames = {
                        k: self.sketchset.rollup(points, tier, k) for k in sk_kinds
                    }
                else:
                    assert prev_full is not None, "cascade input missing"
                    fine = _prune(prev_full)
                    tier_df = cascade(fine.drop("day"), self.tiers[i - 1], tier)
                    sk_frames = {}
                    for k in sk_kinds:
                        if sk_prev[k] is None:
                            # sketches enabled on a store whose finer
                            # sketch history doesn't exist (turned on
                            # mid-history, or resume across the enable):
                            # build THIS tier directly from raw points
                            # for its pending days — a sketch tier is
                            # valid at any granularity, this just pays
                            # the scan instead of the cheap merge
                            pts_t = extract_points(
                                _prune(raw),
                                per_source=self.per_source_ts,
                                step_seconds=self.step_seconds,
                            )
                            sk_frames[k] = self.sketchset.rollup(pts_t, tier, k)
                        else:
                            sk_frames[k] = self.sketchset.cascade(
                                k, _prune(sk_prev[k]).drop("day"), self.tiers[i - 1], tier
                            )

                tier_df = tier_df.withColumn("day", _day("window_start")).persist()
                cached.append(tier_df)
                tier_plans.append((tier, tier_df, pending_set))
                sk_cur: dict[str, DataFrame] = {}
                for k in sk_kinds:
                    skf = sk_frames[k].withColumn("day", _day("window_start")).persist()
                    cached.append(skf)
                    sk_plans.append((k, tier, skf))
                    sk_cur[k] = skf

                if fresh or pending_days is None:
                    prev_full = tier_df
                    for k in sk_kinds:
                        sk_prev[k] = sk_cur[k]
                else:
                    stored = (
                        self.io.read(f"tiers/tier={tier}")
                        if self.io.exists(f"tiers/tier={tier}")
                        else None
                    )
                    if stored is None:
                        prev_full = tier_df
                    else:
                        stored = stored.join(F.broadcast(pending_days), ["day"], "left_anti")
                        prev_full = stored.unionByName(tier_df)
                    for k in sk_kinds:
                        skf = sk_cur[k]
                        sk_stored = (
                            self.io.read(f"sk_{k}/tier={tier}")
                            if self.io.exists(f"sk_{k}/tier={tier}")
                            else None
                        )
                        if sk_stored is None:
                            sk_prev[k] = skf
                        else:
                            sk_prev[k] = sk_stored.join(
                                F.broadcast(pending_days), ["day"], "left_anti"
                            ).unionByName(skf)

            if not tier_plans:
                return stats

            # Phase 2 — ONE clustered write for all tier rows and ONE for
            # all chunks.  partitionBy(tier, day) produces the
            # tiers/tier=X/day=Y layout (source stays a data column), and
            # collapses 2*T driver-blocking write jobs into 2 — each
            # partitioned write costs seconds of commit/listing overhead
            # regardless of size, and T*days*sources file commits were the
            # measured bottleneck at bench scale.  Compression likewise
            # runs as ONE grouped-map stage over the unioned tier rows
            # (tier joins the group key) instead of one
            # scan+exchange+Python round-trip per tier.
            all_tiers = None
            for tier, tdf, _pset in tier_plans:
                t = tdf.withColumn("tier", F.lit(tier))
                all_tiers = t if all_tiers is None else all_tiers.unionByName(t)

            all_chunks = (
                compress_tier(
                    all_tiers.drop("day"), tier_plans[0][0], chunk_span="1d",
                    value_cols=self.chunk_value_cols, extra_keys=["tier"],
                )
                .withColumn("day", _day("chunk_start"))
            )

            self.io.write_partitioned(all_tiers, "tiers", ["tier", "day"])
            all_chunks = all_chunks.persist()
            cached.append(all_chunks)
            self.io.write_partitioned(all_chunks, "chunks", ["tier", "day"])

            # sketch tables: one clustered write per kind covering every
            # pending tier, landing BEFORE the lineage seals — a crash
            # here leaves the day's unit unsealed, so the next run
            # rewrites the same partitions (same idempotence as tiers)
            for k in sk_kinds:
                all_sk = None
                for kk, t, f in sk_plans:
                    if kk != k:
                        continue
                    t_f = f.withColumn("tier", F.lit(t))
                    all_sk = t_f if all_sk is None else all_sk.unionByName(t_f)
                if all_sk is not None:
                    self.io.write_partitioned(all_sk, f"sk_{k}", ["tier", "day"])

            # Phase 3 — lineage: one aggregate over the cached chunk rows,
            # appended per tier IN TIER ORDER (a crash between appends
            # leaves earlier tiers sealed, later ones pending — the same
            # resume semantics as per-tier writes).
            lin = (
                all_chunks.groupBy("tier", "source", "chunk_start")
                .agg(F.count("*").alias("row_count"), F.sum("n_points").alias("point_count"))
                .collect()
            )
            for tier, _tdf, pset in tier_plans:
                rows = [r for r in lin if r["tier"] == tier]
                if pset is not None:
                    # whole-day recompute may cover already-sealed sources
                    # of that day — seal only the actually-pending units
                    rows = [
                        r for r in rows if (r["source"], _day_str(r["chunk_start"])) in pset
                    ]
                self.io.append_lineage(
                    [
                        {
                            "tier": tier,
                            "source": r["source"],
                            "window_start": r["chunk_start"],
                            "input_partitions": [f"raw/source={r['source']}"],
                            "row_count": r["row_count"],
                            "point_count": r["point_count"],
                            "sealed": True,
                            "run_id": run_id,
                        }
                        for r in rows
                    ]
                )
                stats[tier] = len({(r["source"], _day_str(r["chunk_start"])) for r in rows})
                if fail_after_tier == tier:
                    raise RuntimeError(f"injected failure after tier {tier}")
        finally:
            for df in cached:
                df.unpersist()
        return stats

    def seal_from_fine(self, fine: DataFrame, run_id: str | None = None) -> dict[str, int]:
        """Archive externally-computed finest-tier rows (the daemon's
        closed days, ``Daemon.archive_closed_days``): cascade to every
        configured tier, land all tier rows in one clustered write and
        all Gorilla chunks in a second (the run() phase-2 shape), then
        append lineage seals in tier order.

        ``fine`` must carry finest-tier rollup rows (KEY + window_start
        + the aggregate columns).  Idempotent like run(): a replay
        overwrites the same (tier, day) partitions with identical bytes
        and the duplicate lineage rows resolve latest-wins.  Returns
        {tier: sealed (source, day) units}.
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        stats: dict[str, int] = {t: 0 for t in self.tiers}
        cached: list[DataFrame] = []
        try:
            prev = fine.withColumn("day", _day("window_start")).persist()
            cached.append(prev)
            frames: list[tuple[str, DataFrame]] = [(self.tiers[0], prev)]
            for i, tier in enumerate(self.tiers[1:], start=1):
                cur = (
                    cascade(prev.drop("day"), self.tiers[i - 1], tier)
                    .withColumn("day", _day("window_start"))
                    .persist()
                )
                cached.append(cur)
                frames.append((tier, cur))
                prev = cur

            all_tiers = None
            for tier, tdf, in frames:
                t = tdf.withColumn("tier", F.lit(tier))
                all_tiers = t if all_tiers is None else all_tiers.unionByName(t)
            all_chunks = (
                compress_tier(
                    all_tiers.drop("day"), self.tiers[0], chunk_span="1d",
                    value_cols=self.chunk_value_cols, extra_keys=["tier"],
                )
                .withColumn("day", _day("chunk_start"))
                .persist()
            )
            cached.append(all_chunks)
            self.io.write_partitioned(all_tiers, "tiers", ["tier", "day"])
            self.io.write_partitioned(all_chunks, "chunks", ["tier", "day"])

            lin = (
                all_chunks.groupBy("tier", "source", "chunk_start")
                .agg(F.count("*").alias("row_count"), F.sum("n_points").alias("point_count"))
                .collect()
            )
            for tier, _tdf in frames:
                rows = [r for r in lin if r["tier"] == tier]
                self.io.append_lineage(
                    [
                        {
                            "tier": tier,
                            "source": r["source"],
                            "window_start": r["chunk_start"],
                            "input_partitions": ["daemon-live-store"],
                            "row_count": r["row_count"],
                            "point_count": r["point_count"],
                            "sealed": True,
                            "run_id": run_id,
                        }
                        for r in rows
                    ]
                )
                stats[tier] = len({(r["source"], _day_str(r["chunk_start"])) for r in rows})
        finally:
            for df in cached:
                df.unpersist()
        return stats

    # --------------------------------------------------------- retention
    def retention(self) -> list[tuple[str, str]]:
        """Drop raw (source, day) partitions covered by seals in ALL tiers."""
        sealed = self.io.sealed_units().select(
            "tier", "source", _day("window_start").alias("day")
        )
        n_tiers = len(self.tiers)
        covered = (
            sealed.where(F.col("tier").isin(self.tiers))
            .groupBy("source", "day")
            .agg(F.countDistinct("tier").alias("n"))
            .where(F.col("n") == n_tiers)
            .collect()
        )
        dropped = []
        for r in covered:
            if self.io.drop_partition("raw", source=r["source"], day=r["day"]):
                dropped.append((r["source"], r["day"]))
        return dropped

    def retention_tiers(self, max_age_days: dict[str, int], today: str) -> list[tuple[str, str]]:
        """Tiered downsampling retention: drop FINE tier/chunk day
        partitions older than their policy window, keeping the coarser
        tiers as the permanent history (the whole point of cascading
        rollups: 1m for a week, 1h for a year, 1d forever).

        ``max_age_days`` maps tier -> days kept (tiers absent from the
        map are kept forever); ``today`` is 'yyyy-MM-dd'.  Day-partition
        drops are pure directory removals (Iceberg: DELETE WHERE day <
        cutoff) — no data rewrite.  Returns [(tier, day)] dropped.
        """
        import datetime as _dt

        t0 = _dt.date.fromisoformat(today)
        dropped: list[tuple[str, str]] = []
        for tier, days in max_age_days.items():
            if tier not in self.tiers:
                raise ValueError(f"unknown tier {tier!r}")
            cutoff = (t0 - _dt.timedelta(days=days)).isoformat()
            # auto-detect EXISTING sk_* tables (mirror the daemon's
            # _sketch_kinds_effective) rather than keying off the
            # configured list: a bare `rollup` CLI run without
            # --sketches must still age out sketch partitions written
            # by an earlier sketch-enabled job, or they live forever
            sk_kinds = set(self.sketchset.enabled) | {
                k for k in KIND_VALS if self.io.exists(f"sk_{k}")
            }
            sk_tables = [
                f"sk_{k}/tier={tier}"
                for k in sorted(sk_kinds)
                if self.io.exists(f"sk_{k}/tier={tier}")
            ]
            for table in (f"tiers/tier={tier}", f"chunks/tier={tier}", *sk_tables):
                for day in self.io.list_partitions(table, "day"):
                    if day < cutoff and self.io.drop_partition(table, day=day):
                        if table.startswith("tiers"):
                            dropped.append((tier, day))
        return dropped

    def compact_tier(self, tier: str) -> dict[str, int]:
        """Compact every day partition of a tier table to one file;
        returns {day: files_before} for days that had >1 file."""
        out: dict[str, int] = {}
        table = f"tiers/tier={tier}"
        for day in self.io.list_partitions(table, "day"):
            n = self.io.compact_partition(table, day=day)
            if n > 1:
                out[day] = n
        return out

    # ------------------------------------------------------------- reads
    def read_tier(self, tier: str) -> DataFrame:
        return self.io.read(f"tiers/tier={tier}").drop("day")

    def read_sketch_tier(self, name: str, tier: str) -> DataFrame:
        """Sketch tier rows (write-once final rows — estimate with
        tdigest_quantiles / mg_topk / set_sketch_estimate).  This is the
        post-retention answer path for quantiles / top-k / distinct:
        coarse sketch tiers remain after ``retention_tiers`` drops the
        fine ones."""
        return self.io.read(f"sk_{name}/tier={tier}").drop("day")

    def read_tier_from_chunks(self, tier: str, ts_from=None, ts_to=None) -> DataFrame:
        """Serve a tier by decompressing its Gorilla chunks (the post-
        retention read path).  When the archived columns include the
        sum_sq moment, the timer stddev is restored as a derived column
        (sample stddev, identical formula to the live tier rows).

        ``ts_from``/``ts_to`` (inclusive) prune at CHUNK granularity on
        the stored min_ts/max_ts stats before any decompression — a
        narrow dashboard range decompresses only overlapping chunks
        (operators/gorilla.py::decompress_chunks_range)."""
        from logtrics_spark.operators.gorilla import decompress_chunks_range

        out = decompress_chunks_range(
            self.io.read(f"chunks/tier={tier}").drop("day"),
            ts_from=ts_from,
            ts_to=ts_to,
            value_cols=self.chunk_value_cols,
        )
        if "sum_sq" in out.columns:
            from logtrics_spark.operators.rollup import stddev_from_moments

            out = out.withColumn(
                "stddev", stddev_from_moments("cnt", "sum", "sum_sq")
            )
        return out
