"""PII scrub: exact redaction strings, count independence, edge placement."""

from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators.pii import (
    pii_stats,
    scrub_pii,
)


def _scrub(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return [r[0] for r in df.select(scrub_pii(F.col("text"))).orderBy("doc_id").collect()]


def test_redaction_exact_strings(spark):
    out = _scrub(spark, [
        "mail a.b-c_d%e+f@sub.example.co.uk now",
        "hosts 10.0.0.1 and 255.255.255.255.",
        "call +1-555-0100 or 44-201-9999",
        "clean text with no pii at all",
        "email@x.io next to 192.168.1.1 and +1-555-0000",
    ])
    assert out == [
        "mail <EMAIL> now",
        "hosts <IP> and <IP>.",
        "call <PHONE> or <PHONE>",
        "clean text with no pii at all",
        "<EMAIL> next to <IP> and <PHONE>",
    ]


def test_counts_taken_on_original_text(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io c@d.io 10.1.2.3 +1-555-1234"), (2, "nothing here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (2, 1, 1)
    assert (rows[2]["n_emails"], rows[2]["n_ips"], rows[2]["n_phones"]) == (0, 0, 0)


def test_ip_word_boundary_not_inside_longer_number(spark):
    # version-ish strings with >3-digit octets must not be masked
    out = _scrub(spark, ["build 1234.5.6.7 stays, 8.9.10.11 goes"])
    assert out == ["build 1234.5.6.7 stays, <IP> goes"]


def test_null_and_empty_text(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert rows[2]["n_emails"] == 0 and rows[2]["redacted_fp"] is not None
    assert rows[1]["redacted_fp"] is None
