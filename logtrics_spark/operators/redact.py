"""PII redaction — the scrub stage of a training-data pipeline.

Regex-based detection and masking of the classic high-precision PII
shapes (the C4/CCNet-era public practice: pattern scrubbing for
emails, IPs, phone numbers, card-like digit runs — NOT an NER model;
a model-based pass is a deployment add-on behind the same column
contract).  Everything is pure Catalyst ``regexp_count`` /
``regexp_replace`` — one codegen'd projection, no Python, no shuffle —
so the scrub runs at scan speed on 100 TB.

Pattern notes (pinned so the DuckDB oracle replicates exactly):

- patterns use no lookarounds (Java regex AND RE2 compatible),
- masking applies in the CATEGORIES dict order — card before phone,
  so a 16-digit card never half-matches as a phone number,
- counts follow the SEQUENTIAL masking order: each category's count
  is whatever its regex finds with the earlier categories already
  masked (a card is counted as a card and can then never half-match
  as a phone number) — exactly how the masked text itself behaves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# category -> (regex, mask token); ORDER IS THE MASKING ORDER
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<email>"),
    "card": (r"\b\d{4}[ \-]?\d{4}[ \-]?\d{4}[ \-]?\d{4}\b", "<card>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<ip>"),
    "phone": (r"\+\d{7,15}\b|\b\d{3}[.\-]\d{3}[.\-]\d{4}\b", "<phone>"),
}


def _c(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category match counts over the text AS MASKING WOULD SEE IT
    (each category counted after the earlier categories are masked, so
    the counts always sum to the number of mask tokens in the output).
    """
    out: dict[str, Column] = {}
    cur = _c(text)
    for name, (pat, token) in PII_PATTERNS.items():
        # null text counts as 0 matches (regexp_count propagates null)
        out[name] = F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0))
        cur = F.regexp_replace(cur, pat, token)
    return out


def redact_text(text: Column | str) -> Column:
    """The masked text: every category replaced by its token, applied
    in PII_PATTERNS order."""
    cur = _c(text)
    for _, (pat, token) in PII_PATTERNS.items():
        cur = F.regexp_replace(cur, pat, token)
    return cur


def redact_pii(
    df: DataFrame, text_col: str = "text", keep_original: bool = False
) -> DataFrame:
    """Scrub a document frame: ``text_col`` is replaced by the masked
    text, one ``n_<category>`` count column per category is appended,
    and ``n_pii`` totals them.  ``keep_original=True`` preserves the
    raw text under ``<text_col>_raw`` (off by default — the point of
    the stage is that the raw PII does NOT travel further down the
    pipeline).
    """
    counts = pii_counts(F.col(text_col))
    cols = [c for c in df.columns if c != text_col]
    sel = [F.col(c) for c in cols]
    if keep_original:
        sel.append(F.col(text_col).alias(f"{text_col}_raw"))
    sel.append(redact_text(F.col(text_col)).alias(text_col))
    total = None
    for name, cnt in counts.items():
        sel.append(cnt.alias(f"n_{name}"))
        total = cnt if total is None else total + cnt
    sel.append(total.alias("n_pii"))
    return df.select(*sel)
