"""PII detection / redaction over a text column.

Standard training-data-pipeline scrub (the C4 / Dolma / RedPajama
pipelines all carry an analogous pass): count and mask emails, IPv4
addresses, and dashed phone numbers. Everything stays JVM-side --
`regexp_count` / `regexp_replace` run inside whole-stage codegen, so the
pass is a single projection over the scan with no shuffle and no Python.

The patterns are deliberately RE2-compatible (character classes,
bounded quantifiers, ``\\b``; no backreferences or lookaround) so the
DuckDB oracle in plans/queries.py evaluates the exact same regexes.
Redaction order is fixed (email -> IPv4 -> phone) and counts are taken
on the ORIGINAL text, so the two are independent and deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\+?\d{1,3}-\d{3}-\d{4}"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
SSN_TOKEN = "<SSN>"
PHONE_TOKEN = "<PHONE>"


def scrub_pii(text: Column) -> Column:
    """Mask all PII spans, fixed order email -> IPv4 -> SSN -> phone (SSN
    before phone: the 3-2-4 dash shape must not be half-eaten by a later
    pattern; the phone's 3-3-4 shape cannot match inside an SSN)."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IPV4_TOKEN)
    out = F.regexp_replace(out, SSN_RE, SSN_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def pii_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document PII counts + the redacted text's fingerprint.

    The md5 of the redacted text (rather than the text itself) keeps the
    result narrow while still pinning the exact redaction byte-for-byte
    against the oracle. The input is widened first (no-op when the scan
    already has enough splits) so a single-row-group file doesn't run the
    whole regex stack in one task; ``redact`` (the streaming/filtering
    form) stays projection-only."""
    from .dedup import _widen

    df = _widen(df)
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
        F.regexp_count(t, F.lit(SSN_RE)).cast("bigint").alias("n_ssns"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.md5(scrub_pii(t)).alias("redacted_fp"),
    )


def redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Same scrub, returning the full redacted text column in place."""
    return df.withColumn(text_col, scrub_pii(F.col(text_col)))
