"""End-to-end LLM-training-data pipeline — every stage in one runnable
script, raw documents to queryable time-series store:

    documents.parquet
      -> curate()        PII redaction, Gopher rules, exact + LSH
                         near-dedup, benchmark decontamination,
                         deterministic sampling      (plans/curation.py)
      -> train_bpe()/bpe_encode()   documents -> token table
                                                  (operators/bpe.py)
      -> chunk_sequences()          long docs -> training windows
                                                  (operators/tokens.py)
      -> pack_sequences()           batching manifest
      -> extract_points() -> RollupJob   tiers + Gorilla chunks +
                                         mergeable sketch tiers
                                                  (plans/pipeline.py)
      -> read back: hourly rows, post-retention p95 from the stored
         t-digest tier, top sources from the MG tier

Run (defaults suit the sandbox's sf0.001 test data):

    python examples/llm_pipeline.py [docs_parquet] [work_dir]

Everything here is the library's public surface — the same calls the
CLI subcommands (`curate`, `tokenize`, `rollup`, `sketch`) wrap.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

# runnable from anywhere: the repo root is the package root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(
    docs_path: str = "/root/testdata/sf0.001/documents.parquet",
    work_dir: str | None = None,
) -> dict:
    from logtrics_spark import get_spark
    from logtrics_spark.operators.bpe import bpe_encode, train_bpe
    from logtrics_spark.operators.heavyhitters import mg_topk
    from logtrics_spark.operators.tdigest import tdigest_quantiles
    from logtrics_spark.operators.tokens import chunk_sequences, pack_sequences
    from logtrics_spark.plans.curation import curate
    from logtrics_spark.plans.pipeline import RollupJob

    from pyspark.sql import SparkSession

    own_dir = work_dir is None
    work_dir = work_dir or tempfile.mkdtemp(prefix="llm_pipeline_")
    # only a session WE create is ours to stop (embedding-safe)
    own_spark = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="llm-pipeline-example")
    report: dict = {}
    try:
        docs = spark.read.parquet(docs_path)

        # 1. curation: scrub, filter, dedup, decontaminate, sample
        bench = docs.where(F.col("doc_id") % 10 == 7)  # pretend eval split
        kept, stats = curate(
            docs.where(F.col("doc_id") % 10 != 7),
            redact=True,
            min_quality=None,
            gopher=True,
            gopher_opts={"min_words": 10, "min_stop_hits": 0},
            gopher_top_ns={2: 0.9},
            gopher_dup_ns={},
            near_dup=True,
            jaccard_threshold=0.6,
            benchmark=bench,
            decontam_n=8,
            sample_rate=0.95,
        )
        report["curation"] = stats

        # 2. tokenize: the documents -> tokens bridge
        model = train_bpe(kept, vocab_size=300, sample_rows=10_000)
        tok = bpe_encode(kept, model, keep_cols=["source"])
        report["tokens"] = {
            "docs": tok.count(),
            "vocab": len(model["vocab"]),
            "total_tokens": tok.agg(F.sum("n_tok")).first()[0],
        }

        # 3. training-window prep: chunk long docs, pack the manifest
        chunks = chunk_sequences(tok, max_len=64, keep_cols=["source"])
        manifest = pack_sequences(
            chunks.withColumn(
                "chunk_key", F.col("doc_id") * 10_000 + F.col("chunk_id")
            ),
            budget=512,
            by="source",
            id_col="chunk_key",
        )
        report["windows"] = {
            "chunks": chunks.count(),
            "bins": manifest.count(),
        }

        # 4. the time-series engine: tokens -> points -> tiers + sketches
        # (the engine's input contract is the north-rule token table:
        # doc_id strings whose sequence number orders event time)
        engine_tok = tok.select(
            F.format_string("doc%012d", F.col("doc_id")).alias("doc_id"),
            "tokens",
            "n_tok",
            "source",
        )
        job = RollupJob(
            spark,
            f"{work_dir}/store",
            tiers=["1m", "1h"],
            sketches={"enabled": ["tdigest", "mg"], "item_col": "value"},
        )
        job.ingest_raw(engine_tok)
        job.run()
        report["tiers"] = {"hourly_rows": job.read_tier("1h").count()}

        # 5. query the sketch tiers (these survive raw retention)
        p95 = tdigest_quantiles(job.read_sketch_tier("tdigest", "1h"), [0.95])
        top = mg_topk(job.read_sketch_tier("mg", "1h"), n=3)
        report["queries"] = {
            "p95_windows": p95.count(),
            "top_rows": top.count(),
        }
        return report
    finally:
        if own_spark:
            spark.stop()
        if own_dir:
            shutil.rmtree(work_dir, ignore_errors=True)


if __name__ == "__main__":
    out = main(*sys.argv[1:3])
    print(json.dumps(out, default=str, indent=2))
