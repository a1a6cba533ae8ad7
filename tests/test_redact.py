"""PII redaction (operators/redact.py).

Pins: each category's pattern, the masking ORDER (card before phone so
a card never half-matches as a phone), count-after-earlier-masking
semantics, keep_original, the pure-JVM plan, and the curate() stage
running FIRST.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from logtrics_spark.operators.redact import redact_pii

DOCS = [
    (0, "write to alice.smith+spam@mail-host.co.uk for details"),
    (1, "server 192.168.0.1 and 10.0.0.255 are up"),
    (2, "call 555-123-4567 or +4915112345678 today"),
    (3, "card 4111 1111 1111 1111 expires soon"),
    (4, "clean text with no identifiers at all"),
    (5, "alice@example.com met 10.0.0.1 at 555-123-4567 w/ 4111-1111-1111-1111"),
]


def _run(spark, **kw):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return {r["doc_id"]: r for r in redact_pii(df, **kw).collect()}


def test_each_category_masks_and_counts(spark):
    got = _run(spark)
    assert got[0]["text"] == "write to <email> for details"
    assert got[0]["n_email"] == 1 and got[0]["n_pii"] == 1
    assert got[1]["text"] == "server <ip> and <ip> are up"
    assert got[1]["n_ipv4"] == 2
    assert got[2]["text"] == "call <phone> or <phone> today"
    assert got[2]["n_phone"] == 2
    assert got[3]["text"] == "card <card> expires soon"
    assert got[3]["n_card"] == 1
    assert got[4]["text"] == "clean text with no identifiers at all"
    assert got[4]["n_pii"] == 0


def test_order_card_not_eaten_by_phone_and_total(spark):
    got = _run(spark)
    r = got[5]
    assert r["text"] == "<email> met <ip> at <phone> w/ <card>"
    assert (r["n_email"], r["n_card"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1, 1)
    assert r["n_pii"] == 4
    # mask-token count in the output equals n_pii (count-after-masking
    # semantics hold)
    assert r["text"].count("<") == r["n_pii"]


def test_keep_original(spark):
    got = _run(spark, keep_original=True)
    assert got[0]["text_raw"] == DOCS[0][1]
    assert got[0]["text"] == "write to <email> for details"


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # one projection, no shuffle


def test_curate_redact_stage_runs_first(spark):
    from logtrics_spark.plans.curation import curate

    rows = [
        (0, "src", "the quick brown fox writes to bob@mail.com about the plan"),
        (1, "src", "the quick brown fox writes to eve@mail.com about the plan"),
        (2, "src", "totally unrelated clean text about rivers and stones"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
    kept, stats = curate(df, min_quality=None, redact=True, near_dup=False)
    assert stats["redact_docs_hit"] == 2
    # redaction runs BEFORE exact dedup: docs 0 and 1 become identical
    # once their emails are masked, so one of them drops
    assert stats["exact_dedup"] == 2
    texts = {r["text"] for r in kept.select("text").collect()}
    assert all("@" not in t for t in texts)


def test_null_text_counts_zero(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": [None, "mail a@b.co"]})
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[0]["text"] is None and got[0]["n_pii"] == 0
    assert got[1]["n_pii"] == 1
