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
        "ssn 123-45-6789 but build 1234-56-7890 stays",
    ])
    assert out == [
        "mail <EMAIL> now",
        "hosts <IP> and <IP>.",
        "call <PHONE> or <PHONE>",
        "clean text with no pii at all",
        "<EMAIL> next to <IP> and <PHONE>",
        "ssn <SSN> but build 1234-56-7890 stays",
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


def test_cross_engine_regex_fuzz(spark):
    """Seeded fuzz of the PII regexes across Spark (Java regex) and DuckDB
    (RE2): the patterns are deliberately restricted to the common subset, so
    redaction and counts must agree byte-for-byte on adversarial inputs —
    near-emails, >3-digit octets, unicode neighbors, stacked separators."""
    import random

    import duckdb

    from action_pdf_accessibility_paddle_docker_spark.operators.pii import (
        CARD_RE,
        EMAIL_RE,
        INTL_PHONE_RE,
        IPV4_RE,
        PHONE_RE,
        SSN_RE,
        pii_stats,
    )

    rng = random.Random(20260816)
    frags = [
        "a@b.io", "x.y+z@sub.domain.example", "not-an-email@", "@no.local",
        "a@b", "a@b.c", "user@@double.io", "tld@dot.museum", ".@x.io",
        "10.0.0.1", "255.255.255.255", "999.999.999.999", "1234.5.6.7",
        "1.2.3.4.5", "1.2.3", "v1.2.3.4b", "0.0.0.0",
        "+1-555-0100", "44-201-9999", "1-23-4567", "+123-456-7890",
        "12345-678-9012", "+-555-0100", "555-01000", "--555-0100",
        "123-45-6789", "000-00-0000", "1234-56-7890", "123-456-789",
        "a123-45-6789", "123-45-67890",
        "word", "über", "naïve@café.fr", "日本語", "a.b", "...", "@",
        "+", "-", "()", "a_b%c@d-e.fg", "5.5", "tel:+1-555-1234.",
        "4111-1111-1111-1111", "4111 1111 1111 1111", "3782-822463-10005",
        "4111111111111111", "12345678901234567890", "1234-5678-9012",
        "4111-1111-1111-111", "card4111111111111111x",
        "+44 20 7946 0958", "+1 (555) 123-4567", "+91-98765-43210",
        "+999 (12345) 99-99-99", "+1 ()", "+44  20", "(555) 123-4567",
    ]
    texts = [
        " ".join(rng.choice(frags) for _ in range(rng.randint(0, 12)))
        + rng.choice(["", " trailing", ".", "@", " 1.2.3.4"])
        for _ in range(400)
    ]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    srows = {
        r["doc_id"]: r
        for r in pii_stats(df).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    drows = con.execute(
        f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(text, '{IPV4_RE}')) AS n_ips,
               len(regexp_extract_all(text, '{CARD_RE}')) AS n_cards,
               len(regexp_extract_all(text, '{SSN_RE}')) AS n_ssns,
               len(regexp_extract_all(text, '{INTL_PHONE_RE}')) AS n_intl_phones,
               len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
               md5(regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                             '{IPV4_RE}', '<IP>', 'g'),
                           '{CARD_RE}', '<CARD>', 'g'),
                         '{SSN_RE}', '<SSN>', 'g'),
                       '{INTL_PHONE_RE}', '<PHONE>', 'g'),
                     '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
        FROM t ORDER BY doc_id
        """
    ).fetchall()
    for doc_id, n_emails, n_ips, n_cards, n_ssns, n_intl, n_phones, fp in drows:
        s = srows[doc_id]
        got = (s["n_emails"], s["n_ips"], s["n_cards"], s["n_ssns"],
               s["n_intl_phones"], s["n_phones"], s["redacted_fp"])
        assert got == (n_emails, n_ips, n_cards, n_ssns, n_intl, n_phones,
                       fp), (doc_id, texts[doc_id], got)


def test_card_and_intl_phone_redaction(spark):
    out = _scrub(spark, [
        "pay 4111-1111-1111-1111 or 4111 1111 1111 1111 or 378282246310005",
        "amex grouped 3782-822463-10005 ok",
        "ring +44 20 7946 0958 or +1 (555) 123-4567 or +91-98765-43210",
        "a 20-digit id 12345678901234567890 survives the card pattern",
        "ungrouped 12-digit 123456789012 survives too",
    ])
    assert out == [
        "pay <CARD> or <CARD> or <CARD>",
        "amex grouped <CARD> ok",
        "ring <PHONE> or <PHONE> or <PHONE>",
        "a 20-digit id 12345678901234567890 survives the card pattern",
        "ungrouped 12-digit 123456789012 survives too",
    ]


def test_luhn_check_known_vectors(spark):
    """luhn_check (JVM-expression validator for extracted candidates):
    textbook vectors -- Visa/Amex test numbers valid, off-by-one invalid,
    too-short invalid even when the checksum happens to pass."""
    from action_pdf_accessibility_paddle_docker_spark.operators.pii import luhn_check

    rows = [
        (1, "4111-1111-1111-1111", True),
        (2, "4111 1111 1111 1111", True),
        (3, "378282246310005", True),       # Amex
        (4, "5555555555554444", True),      # MC
        (5, "4111111111111112", False),     # checksum off by one
        (6, "0000000000000", True),         # 13 zeros: sum 0, valid length
        (7, "59", False),                   # Luhn-valid pair but too short
        (8, "12345678901234567890", False), # 20 digits: too long
    ]
    df = spark.createDataFrame([(i, c) for i, c, _ in rows], "id long, c string")
    got = {r["id"]: r["ok"] for r in
           df.select("id", luhn_check(F.col("c")).alias("ok")).collect()}
    assert got == {i: want for i, _, want in rows}


def test_card_candidates_surface_and_validated_stats(spark):
    """luhn_check's consumable surfaces (r5 verdict item 7): the
    card_candidates review queue (one row per card-shaped span with its
    Luhn verdict) and pii_stats(validate_cards=True)'s n_valid_cards
    column, which must count exactly the passing candidates while the
    default form keeps its hot projection regex-only (no n_valid_cards
    column at all)."""
    from action_pdf_accessibility_paddle_docker_spark.operators.pii import (
        card_candidates,
        pii_stats,
    )

    df = spark.createDataFrame(
        [
            (0, "pay 4111-1111-1111-1111 or 4111 1111 1111 1112 today"),
            (1, "amex 378282246310005 and order id 1234567890123456"),
            (2, "no cards at all in this text"),
        ],
        "doc_id long, text string",
    )
    cands = {(r["doc_id"], r["candidate"]): r["luhn_valid"]
             for r in card_candidates(df).collect()}
    assert cands == {
        (0, "4111-1111-1111-1111"): True,
        (0, "4111 1111 1111 1112"): False,
        (1, "378282246310005"): True,
        (1, "1234567890123456"): False,
    }

    stats = {r["doc_id"]: r for r in
             pii_stats(df, validate_cards=True).collect()}
    assert [(stats[i]["n_cards"], stats[i]["n_valid_cards"])
            for i in range(3)] == [(2, 1), (2, 1), (0, 0)]
    assert "n_valid_cards" not in pii_stats(df).columns
