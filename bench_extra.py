"""Stage-isolation probes for the optimization round (guide §1.4).

NOT the driver's bench (bench.py is frozen): this file times the
internal stages of the expensive bench entries with the noop sink so
the computation is measured, not the sink or the `.count()` column
pruning.  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [probe ...]

Prints one `probe stage seconds [rows]` line per stage.  Numbers are
cited in OPTIMIZATION_r07.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def probe_simhash(spark, sf_dir, log):
    from logtrics_spark.operators.dedup import (
        ngram_jaccard_pairs,
        simhash64,
        simhash_band_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spark.sparkContext.setJobDescription("simhash: signatures")
    log("simhash", "simhash64", _noop(simhash64(docs)))
    sims = simhash64(docs).localCheckpoint()
    spark.sparkContext.setJobDescription("simhash: band pairs")
    dt, n = _count(simhash_band_pairs(sims, band_bits=8))
    log("simhash", "band_pairs(bb=8)", dt, n)
    cand = simhash_band_pairs(sims, band_bits=8).where("hamming <= 7").localCheckpoint()
    spark.sparkContext.setJobDescription("simhash: verify")
    dt, n = _count(
        ngram_jaccard_pairs(
            docs, cand.select("id_a", "id_b"), n=5, min_jaccard=0.6
        ).where(F.col("jaccard") >= 0.6)
    )
    log("simhash", "verify", dt, n)


def probe_minhash(spark, sf_dir, log):
    from logtrics_spark.operators.dedup import (
        minhash_lsh_dupes,
        minhash_signature,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spark.sparkContext.setJobDescription("minhash: signatures")
    log("minhash", "signature", _noop(minhash_signature(docs, num_hashes=64)))
    spark.sparkContext.setJobDescription("minhash: lsh candidates")
    dt, n = _count(minhash_lsh_dupes(docs, num_hashes=64, bands=32, include_est=False))
    log("minhash", "lsh_cand(b=32)", dt, n)
    cand = minhash_lsh_dupes(
        docs, num_hashes=64, bands=32, include_est=False
    ).localCheckpoint()
    spark.sparkContext.setJobDescription("minhash: verify")
    dt, n = _count(
        ngram_jaccard_pairs(
            docs, cand.select("id_a", "id_b"), n=5, min_jaccard=0.6
        ).where(F.col("jaccard") >= 0.6)
    )
    log("minhash", "verify", dt, n)


def probe_embdupes(spark, sf_dir, log):
    from logtrics_spark.operators.dedup import hyperplane_signatures

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = embs.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = (
        base.where("vec_id < 25")
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x, i: x * (1.0 + 0.25 * F.sin((i + 1) * (F.col("vec_id") + 1))),
            ).alias("embedding"),
        )
        .withColumn("vec_id", F.col("vec_id") + 1_000_000)
    )
    df = base.unionByName(pert)
    spark.sparkContext.setJobDescription("embdupes: signatures")
    sigs = hyperplane_signatures(df, "vec_id", "embedding", 16, 8)
    log("embdupes", "signatures", _noop(sigs))
    # NOTE: the r6 shape materialized + deduplicated every same-bucket
    # id pair here (13.95M rows / 18.5 s at sf1.0) before any cosine was
    # compared; the r7 operator verifies per (band, bucket) with one
    # chunked numpy matmul per group, so there is no candidate-pair
    # stage left to probe separately.
    from logtrics_spark.operators.dedup import embedding_cosine_dupes

    spark.sparkContext.setJobDescription("embdupes: full")
    dt, n = _count(embedding_cosine_dupes(df, threshold=0.9))
    log("embdupes", "full", dt, n)


def probe_curation(spark, sf_dir, log):
    from logtrics_spark.operators.dedup import (
        dedup_groups,
        minhash_lsh_dupes,
        ngram_jaccard_pairs,
    )
    from logtrics_spark.operators.sample import deterministic_sample
    from logtrics_spark.operators.text import language_id, quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cur = docs.withColumn("quality", quality_score(F.col("text"))).withColumn(
        "lang", language_id(F.col("text"))
    )
    cur = cur.where(F.col("quality") >= 0.0)
    spark.sparkContext.setJobDescription("curation: annotate+filter")
    log("curation", "annotate", _noop(cur))
    keepers = (
        cur.select(F.xxhash64(F.col("text")).alias("_fp"), F.col("doc_id"))
        .groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    cur2 = cur.join(keepers, "doc_id", "left_semi")
    spark.sparkContext.setJobDescription("curation: exact dedup")
    log("curation", "exact_dedup", _noop(cur2))
    spark.sparkContext.setJobDescription("curation: lsh cand")
    t0 = time.perf_counter()
    cand = minhash_lsh_dupes(
        cur2, "text", "doc_id", num_hashes=64, bands=16, include_est=False,
        max_bucket_size=4096,
    ).localCheckpoint()
    log("curation", "lsh_cand(b=16)", time.perf_counter() - t0, cand.count())
    spark.sparkContext.setJobDescription("curation: verify")
    t0 = time.perf_counter()
    verified = (
        ngram_jaccard_pairs(cur2, cand, "text", "doc_id", min_jaccard=0.6)
        .where(F.col("jaccard") >= 0.6)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    log("curation", "verify", time.perf_counter() - t0, verified.count())
    spark.sparkContext.setJobDescription("curation: closure+anti")
    t0 = time.perf_counter()
    drops = (
        dedup_groups(verified)
        .where(F.col("id") != F.col("group_id"))
        .select(F.col("id").alias("doc_id"))
    )
    cur3 = cur2.join(drops, "doc_id", "left_anti")
    final = deterministic_sample(cur3, 0.9, id_col="doc_id")
    dt, n = _count(final)
    log("curation", "closure+sample", dt, n)


def probe_groups(spark, sf_dir, log):
    from logtrics_spark.operators.dedup import (
        dedup_groups,
        minhash_lsh_dupes,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cand = minhash_lsh_dupes(
        docs, num_hashes=64, bands=32, include_est=False, max_bucket_size=4096
    ).localCheckpoint()
    ver = (
        ngram_jaccard_pairs(docs, cand.select("id_a", "id_b"), n=5, min_jaccard=0.6)
        .where(F.col("jaccard") >= 0.6)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    spark.sparkContext.setJobDescription("groups: cc loop only")
    t0 = time.perf_counter()
    n = dedup_groups(ver).count()
    log("groups", "cc_loop_only", time.perf_counter() - t0, n)


def probe_text(spark, sf_dir, log):
    from logtrics_spark.operators.decontam import decontaminate
    from logtrics_spark.operators.text import top_ngram_char_frac

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spark.sparkContext.setJobDescription("text: top2gram")
    log("text", "top2gram", _noop(top_ngram_char_frac(docs, 2)))
    spark.sparkContext.setJobDescription("text: decontam")
    log(
        "text",
        "decontam",
        _noop(
            decontaminate(
                docs.where(F.col("doc_id") % 10 != 7),
                docs.where(F.col("doc_id") % 10 == 7),
                n=8,
            )
        ),
    )


def probe_freq(spark, sf_dir, log):
    from logtrics_spark.operators.countmin import cms_cascade, cms_query, cms_rollup
    from logtrics_spark.operators.heavyhitters import mg_cascade, mg_rollup, mg_topk

    pts = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("source"),
        F.lit("ev.users").alias("metric"),
        F.lit("set").alias("kind"),
        "ts",
        "user_id",
    )
    spark.sparkContext.setJobDescription("freq: mg arm")
    fine = mg_rollup(pts, "1m", "user_id", k=8192)
    hour = mg_cascade(fine, "1m", "1h", k=8192)
    log("freq", "mg_arm", _noop(mg_topk(hour, n=5)))
    spark.sparkContext.setJobDescription("freq: cms arm")
    cfine = cms_rollup(pts, "1h", "user_id", depth=4, width=128)
    cday = cms_cascade(cfine, "1h", "1d")
    log("freq", "cms_arm", _noop(cms_query(cday, ["1", "2", "3"])))


def probe_ivf(spark, sf_dir, log):
    import __spark_entry__ as entrymod

    t0 = time.perf_counter()
    n = entrymod.queries()["similarity_ivf"](spark, sf_dir).count()
    log("ivf", "full_query", time.perf_counter() - t0, n)


PROBES = {
    "simhash": probe_simhash,
    "minhash": probe_minhash,
    "embdupes": probe_embdupes,
    "curation": probe_curation,
    "groups": probe_groups,
    "text": probe_text,
    "freq": probe_freq,
    "ivf": probe_ivf,
}


def main(argv: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from logtrics_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def log(probe, stage, secs, rows=None):
        extra = f" rows={rows}" if rows is not None else ""
        print(f"{probe:10s} {stage:22s} {secs:8.3f}s{extra}", flush=True)

    names = argv or list(PROBES)
    for name in names:
        PROBES[name](spark, sf_dir, log)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
