"""Bench harness — one JSON line for the driver (BENCH_r{N}.json).

Times the headline pipeline (synthesized token table -> extract -> tier
rollups -> Gorilla chunk writes -> lineage, i.e. the BASELINE.json
metric "points/sec through Gorilla-compressed tier writes") plus the
key driver queries at $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR  testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_TOK_ROWS      override token-table rows (default sf * 1e6)

Scaling-efficiency evidence (N vs 4N cores) is produced by
bench/scaling.py, which shells out to this file at two parallelism
levels and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    tok_rows = int(os.environ.get("BENCH_TOK_ROWS", str(int(sf * 1_000_000))))

    import __spark_entry__ as entrymod
    from logtrics_spark.session import get_spark

    spark = get_spark(
        app_name="logtrics-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- headline: token pipeline through Gorilla tier writes ----------
    from logtrics_spark.datagen import gen_tokseq
    from logtrics_spark.plans.pipeline import RollupJob

    # best-of-2 like the queries (r2 showed the two single-shot pipeline
    # timings were exactly where the host's CPU-steal noise landed); each
    # attempt gets a FRESH store so both runs do identical work
    tok = gen_tokseq(spark, tok_rows, partitions=max(cpus, 8))
    best_ingest = best_run = None
    for _ in range(2):
        store = tempfile.mkdtemp(prefix="bench_store_")
        try:
            job = RollupJob(spark, store, step_seconds=1)
            t0 = time.perf_counter()
            job.ingest_raw(tok)
            t_ingest = time.perf_counter() - t0
            t0 = time.perf_counter()
            job.run(run_id="bench")
            t_run = time.perf_counter() - t0
        finally:
            shutil.rmtree(store, ignore_errors=True)
        best_ingest = t_ingest if best_ingest is None else min(best_ingest, t_ingest)
        best_run = t_run if best_run is None else min(best_run, t_run)
    timings["tok_ingest"] = round(best_ingest, 3)
    timings["tok_pipeline"] = round(best_run, 3)
    n_points = 4 * tok_rows  # extract emits 4 metric points per row
    extras["points_per_sec"] = round(n_points / best_run, 1)
    extras["tok_rows"] = tok_rows

    # ---- driver queries at sf_dir ---------------------------------------
    qs = entrymod.queries()
    rows: dict[str, int] = {}
    # r6: the registry composed related queries into chained entries
    # (tiers_chain = rollup_1m+1h+cascade+stddev, instruments_chain =
    # gauge+meter+timer+counter, gapfill_chain_1h = locf+keeplast+
    # linear, text_extract_stats = extract_regex+text_stats), so those
    # bench rows time the CHAIN; vs_prev has no prior row for the new
    # names in their first round.
    for name in [
        "tiers_chain",
        "instruments_chain",
        "gapfill_chain_1h",
        "gorilla_roundtrip",
        "text_extract_stats",
        "dedup_exact",
        "lang_id",
        "similarity_topk",
        "similarity_ivf",
        "similarity_ivf_append",
        "minhash_pairs",
        "simhash_pairs",
        "embedding_dupes",
        "graphite_lines",
        "dedup_groups",
        "moving_avg_1h",
        "anomaly_zscore_1h",
        "topk_sources_1h",
        "distinct_users_1h",
        "holtwinters_1h",
        "lttb_1m",
        "sessions_30m",
        "tdigest_1h",
        "freq_sketch_1h",
        "error_ratio_1h",
        "series_select_1h",
        "series_threshold_1h",
        "transform_chain_1h",
        "linreg_1h",
        "moving_stddev_1h",
    ]:
        # best-of-K: the shared host shows episodic CPU-steal bursts
        # (BENCH/BASELINE.md caveat); noise only ever adds time, so the
        # min is the faithful plan-cost estimate.  Queries are cheap, so
        # K=3 by default; the pipeline stays best-of-2 (it dominates).
        attempts = int(os.environ.get("BENCH_QUERY_ATTEMPTS", "3"))
        best = None
        for _ in range(attempts):
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        rows[name] = n

    # ---- composed curation pipeline (plans/curation.py) ------------------
    # the single most user-visible composition in the repo: annotate ->
    # filters -> exact dedup -> LSH near-dedup -> sample, timed end to
    # end over the sf documents table (stats off: one lazy plan)
    from logtrics_spark.plans.curation import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    best_cur = n_kept = None
    for _ in range(2):
        t0 = time.perf_counter()
        kept, _ = curate(
            docs,
            min_quality=0.0,
            near_dup=True,
            jaccard_threshold=0.6,
            sample_rate=0.9,
            collect_stats=False,
        )
        n_kept = kept.count()
        dt = time.perf_counter() - t0
        best_cur = dt if best_cur is None or dt < best_cur else best_cur
    timings["curation"] = round(best_cur, 3)
    rows["curation"] = n_kept

    # ---- BPE tokenization (operators/bpe.py) ------------------------------
    # the documents -> tokens bridge, timed end to end: bounded-sample
    # training + distributed Arrow encode + the token-count action
    from logtrics_spark.operators.bpe import bpe_encode, train_bpe

    best_bpe = n_bpe_tokens = None
    for _ in range(2):
        t0 = time.perf_counter()
        model = train_bpe(docs, vocab_size=512, sample_rows=20_000)
        tok_out = bpe_encode(docs, model, keep_cols=["source"])
        n_bpe_tokens = tok_out.agg({"n_tok": "sum"}).first()[0]
        dt = time.perf_counter() - t0
        best_bpe = dt if best_bpe is None or dt < best_bpe else best_bpe
    timings["bpe_tokenize"] = round(best_bpe, 3)
    rows["bpe_tokenize"] = int(n_bpe_tokens or 0)
    extras["bpe_tokens_per_sec"] = round((n_bpe_tokens or 0) / best_bpe, 1)

    # ---- delta vs the previous round's recorded bench -------------------
    # regressions must be mechanically visible: vs_prev[q] = t_now/t_prev
    # at the same sf (>1 slower, <1 faster).  Prefer the full result files
    # this script writes (BENCH/result_r{N}.json) — the driver's stdout
    # capture truncated r4's line, so BENCH_r*.json "parsed" can be null.
    vs_prev: dict[str, float] = {}
    prev_name = None
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    import glob
    import re

    def _round_files(pattern: str) -> list[tuple[int, str]]:
        out = []
        for p in glob.glob(os.path.join(repo_dir, pattern)):
            m = re.search(r"_r(\d+)\.json$", p)
            if m:
                out.append((int(m.group(1)), p))
        return out

    driver_rounds = _round_files("BENCH_r*.json")
    this_round = (max(n for n, _ in driver_rounds) + 1) if driver_rounds else 1
    prev_cands = sorted(
        _round_files(os.path.join("BENCH", "result_r*.json")) + driver_rounds,
        # ascending; within a round the full result file sorts after the
        # driver capture so reversed() tries it first
        key=lambda t: (t[0], os.sep + "BENCH" + os.sep in t[1]),
    )
    for n, prev_path in reversed(prev_cands):
        if n >= this_round:
            continue
        try:
            with open(prev_path) as fh:
                prev = json.load(fh)
            prev = prev.get("parsed") or prev  # driver wraps the JSON line
            if prev.get("sf") == sf and prev.get("queries"):
                pq = prev["queries"]
                vs_prev = {
                    k: round(t / pq[k], 3)
                    for k, t in timings.items()
                    if pq.get(k)
                }
                prev_name = os.path.relpath(prev_path, repo_dir)
                break
        except Exception:
            continue

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline wall-clock (token pipeline + driver queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": sf,
        "cpus": cpus,
        "points_per_sec": extras["points_per_sec"],
        "tok_rows": extras["tok_rows"],
        "bpe_tokens_per_sec": extras.get("bpe_tokens_per_sec"),
        "vs_prev": vs_prev,
        "prev_bench": prev_name,
        "timing": "queries best-of-3, tok pipeline best-of-2 (fresh store per attempt)",
    }
    # Full object to a file (machine-readable even if stdout is truncated);
    # stdout gets a compact line (no rows/vs_prev) that fits the driver's
    # capture window.
    result_file = None
    try:
        result_file = os.path.join("BENCH", f"result_r{this_round}.json")
        with open(os.path.join(repo_dir, result_file), "w") as fh:
            json.dump(result, fh, indent=1)
    except OSError:
        result_file = None
    compact = {
        "metric": result["metric"],
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "points_per_sec": extras["points_per_sec"],
        "tok_rows": extras["tok_rows"],
        "result_file": result_file,
    }
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
