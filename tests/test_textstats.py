"""Repetition quality signals (Gopher-style): exact fractions on hand-built
documents, plus degenerate shapes (single word, all-one-phrase)."""

import pytest
from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators import textstats as T


@pytest.fixture(scope="module")
def rows(spark):
    docs = [
        (1, "the cat sat on the mat"),          # 6 words, 5 distinct, 5 bigrams all unique
        (2, "buy now buy now buy now"),         # 6 words, 2 distinct; 'buy now' x3 of 5
        (3, "word"),                            # single word: no bigrams
        (4, "a a a a"),                         # one word repeated: 'a a' x3 of 3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = T.repetition_signals(df).collect()
    return {r.doc_id: r for r in out}


def test_distinct_word_frac(rows):
    assert rows[1].n_words == 6 and rows[1].distinct_word_frac == round(5 / 6, 6)
    assert rows[2].distinct_word_frac == round(2 / 6, 6)
    assert rows[4].distinct_word_frac == 0.25


def test_top_bigram_frac(rows):
    assert rows[1].n_bigrams == 5 and rows[1].top_bigram_frac == 0.2
    # "buy now buy now buy now": bigrams = [buy now, now buy, buy now, now buy, buy now]
    assert rows[2].n_bigrams == 5 and rows[2].top_bigram_frac == 0.6
    assert rows[4].n_bigrams == 3 and rows[4].top_bigram_frac == 1.0


def test_single_word_doc_has_zero_bigrams(rows):
    assert rows[3].n_words == 1
    assert rows[3].n_bigrams == 0
    assert rows[3].top_bigram_frac == 0.0


def test_quality_gate_reasons_and_keep(spark):
    docs = [
        (1, "the cat sat on a mat and the dog ran to the park in the rain "
            "with a big red ball of yarn and string"),      # clean: long, stopwords, diverse
        (2, "short text here"),                             # too_short (+low_stopword)
        (3, "buy now " * 15),                               # repetitive + low distinct
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in docs], "doc_id long, text string")
    out = {r.doc_id: r for r in T.quality_gate(df).collect()}
    assert out[1].keep and out[1].reject_reasons == ""
    assert not out[2].keep and "too_short" in out[2].reject_reasons
    r3 = out[3].reject_reasons.split(",")
    assert "low_distinct" in r3 and "repetitive_bigram" in r3
    # reasons appear in fixed declaration order
    assert r3 == [x for x in
                  ["too_short", "high_punct", "low_stopword", "low_distinct", "repetitive_bigram"]
                  if x in r3]


def test_concat_chunk_packing_spans_boundary(spark):
    from action_pdf_accessibility_paddle_docker_spark.operators.packing import (
        concat_chunk_packs,
    )

    # single shard (n_shards=1) so the layout is the doc_id order itself
    docs = [(i, " ".join(["w"] * n)) for i, n in [(1, 6), (2, 3), (3, 4), (4, 10)]]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in concat_chunk_packs(df, capacity=8, n_shards=1).collect()}
    # stream: doc1 tokens 0-5 (pack 0), doc2 6-8 (spans 0->1), doc3 9-12 (pack 1),
    # doc4 13-22 (spans 1->2)
    assert (out[1].start_pack, out[1].end_pack, out[1].pack_offset) == (0, 0, 0)
    assert (out[2].start_pack, out[2].end_pack, out[2].pack_offset) == (0, 1, 6)
    assert (out[3].start_pack, out[3].end_pack, out[3].pack_offset) == (1, 1, 1)
    assert (out[4].start_pack, out[4].end_pack, out[4].pack_offset) == (1, 2, 5)


def test_cap_per_stratum_exact_and_rate(spark):
    """Per-domain caps: the exact form keeps exactly min(cap, n) per
    stratum with a deterministic membership DuckDB reproduces from the same
    md5 recipe; the rate form (the windowless 100 TB path) keeps ~cap in
    expectation and is also engine-independent. Both must be re-shard
    stable (membership unchanged under a different partition layout)."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import (
        cap_per_stratum,
    )

    docs = [(i, f"src{i % 3}") for i in range(300)]
    df = spark.createDataFrame(docs, "doc_id long, source string")

    # -- exact: per-stratum counts hit the cap exactly
    exact = cap_per_stratum(df, cap=7, method="exact")
    counts = {r["source"]: r["n"] for r in
              exact.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"src0": 7, "src1": 7, "src2": 7}
    got = sorted((r["source"], r["doc_id"]) for r in exact.collect())
    oracle = duckdb.sql("""
        WITH d AS (SELECT unnest(range(300)) AS doc_id),
        s AS (SELECT doc_id, 'src' || (doc_id % 3) AS source FROM d),
        r AS (
          SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5('cap:' || source || ':' || doc_id), doc_id) AS rk
          FROM s
        )
        SELECT source, doc_id FROM r WHERE rk <= 7 ORDER BY source, doc_id
    """).fetchall()
    assert got == [(s, i) for s, i in oracle]

    # -- rate: approximately cap per stratum, never an empty stratum at
    # this cap/n ratio; cap >= n keeps everything
    rate = cap_per_stratum(df, cap=50, method="rate")
    rcounts = {r["source"]: r["n"] for r in
               rate.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in rcounts.items():
        assert 25 <= n <= 75, (s, n)  # ~50 expected of 100, binomial jitter
    assert cap_per_stratum(df, cap=100, method="rate").count() == 300
    assert cap_per_stratum(df, cap=1000, method="rate").count() == 300
    # cap > 2147: the cap*1e6 product must be a long, not an ANSI int
    # overflow (the corpus_job default cap is 10000)
    assert cap_per_stratum(df, cap=10000, method="rate").count() == 300

    # -- re-shard stability: same survivors under a different layout
    reshard = cap_per_stratum(df.repartition(13), cap=7, method="exact")
    assert sorted((r["source"], r["doc_id"]) for r in reshard.collect()) == got
    rate_a = {r["doc_id"] for r in cap_per_stratum(df, 50).collect()}
    rate_b = {r["doc_id"] for r in cap_per_stratum(df.repartition(13), 50).collect()}
    assert rate_a == rate_b

    # -- checkpoint=True is rate-form-only: the exact form references its
    # input once, so the flag would be a silent no-op -- rejected loudly
    import pytest

    with pytest.raises(ValueError, match="rate"):
        cap_per_stratum(df, cap=7, method="exact", checkpoint=True)


def test_cap_per_stratum_rate_form_has_no_window(spark):
    """The rate form is the scale path precisely because it has NO per-key
    window (AQE cannot split a skewed window partition) -- the stratum
    count side must ride a broadcast join."""
    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import (
        cap_per_stratum,
    )

    df = spark.createDataFrame([(i, "web") for i in range(10)],
                               "doc_id long, source string")
    plan = (
        cap_per_stratum(df, cap=3, method="rate")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_phrases_and_stable_split_vs_duckdb(spark):
    """Direct value checks for the two operators whose registry entries
    were consolidated away in round 4 (top_phrases dropped as a redundant
    certification; stable_split certified transitively via q_training_mix):
    the pytest oracle keeps their exact semantics pinned."""
    import duckdb

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )

    got = [(r["phrase"], r["n_occurrences"], r["n_docs"])
           for r in T.top_phrases(docs, k=20).collect()]
    want = con.sql("""
        WITH toks AS (
          SELECT doc_id,
                 regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS t
          FROM documents
        ), phrases AS (
          SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS phrase
          FROM toks WHERE len(t) >= 2
        )
        SELECT phrase, count(*)::BIGINT AS n_occurrences,
               count(DISTINCT doc_id)::BIGINT AS n_docs
        FROM phrases WHERE length(phrase) > 0
        GROUP BY phrase ORDER BY n_occurrences DESC, phrase ASC LIMIT 20
    """).fetchall()
    assert got == want

    got_split = sorted((r["doc_id"], r["split"])
                       for r in T.stable_split(docs).select("doc_id", "split").collect())
    want_split = con.sql("""
        SELECT doc_id,
               CASE WHEN b < 5 THEN 'test' WHEN b < 10 THEN 'val' ELSE 'train' END AS split
        FROM (SELECT doc_id,
                     (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT)::BIGINT % 100 AS b
              FROM documents) ORDER BY doc_id
    """).fetchall()
    assert got_split == [(i, s) for i, s in want_split]


@pytest.mark.parametrize("n_docs", [4, 7, 10])
def test_lm_quality_bucket_knot_cases_match_duckdb(spark, n_docs):
    """Tercile cutpoints where (n-1)/3 is an integer land EXACTLY on a
    score (no interpolation) -- the <= bucketing must then agree across
    engines on the boundary document itself. n=4 and n=7 are knot cases
    ((n-1)*1/3 and (n-1)*2/3 integral); n=10 is the interpolated case."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_spark.plans.queries import REGISTRY

    # distinct word-soup docs with strictly increasing rarity profiles
    rows = [(i, " ".join(["common"] * (n_docs - i) + [f"rare{i}"] * (i + 1)))
            for i in range(n_docs)]
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in rows],
                      "text": [r[1] for r in rows],
                      "lang": ["en"] * n_docs, "source": ["web"] * n_docs,
                      "n_chars": [len(r[1]) for r in rows]}),
            f"{d}/documents.parquet",
        )
        fn, sql = REGISTRY["q_lm_quality"]
        got = [(r["doc_id"], r["bucket"], r["mean_nll"])
               for r in fn(spark, d).collect()]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        want = [(r[0], r[5], r[4]) for r in con.sql(sql).fetchall()]
    assert got == want


def test_cap_per_stratum_null_stratum_is_capped_not_dropped(spark):
    """NULL is one stratum: the rate form's count join keys on a coalesced
    sentinel, so NULL-source docs are capped like any other source instead
    of vanishing through a never-matching NULL equi-join; the exact form's
    window groups NULL naturally. cap >= n keeps every NULL row."""
    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import (
        cap_per_stratum,
    )

    rows = [(i, "web" if i % 2 == 0 else None) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept_all = cap_per_stratum(df, cap=100, method="rate")
    assert kept_all.count() == 60
    assert kept_all.where(F.col("source").isNull()).count() == 30
    capped = cap_per_stratum(df, cap=10, method="rate")
    n_null = capped.where(F.col("source").isNull()).count()
    assert 2 <= n_null <= 20  # ~10 expected of 30
    exact = cap_per_stratum(df, cap=7, method="exact")
    assert exact.where(F.col("source").isNull()).count() == 7


def test_cap_then_sample_realized_rate_is_unbiased(spark):
    """Composing cap -> stratified_sample (the corpus_job stage order) must
    realize the sample rate ON THE CAP SURVIVORS. The cap draw is salted
    ('cap:' prefix) precisely so it is independent of the sampling draw on
    the same (stratum, id) key: unsalted, a binding cap with threshold
    t < 10^4 (here t = ceil(50/10000*1e6) = 5000) leaves every survivor
    with sample-hash = cap-hash < t, so a 0.5 sample would keep 100% of
    them (threshold 5000 > every survivor's residue) instead of ~50%."""
    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import (
        cap_per_stratum,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "web") for i in range(10_000)], "doc_id long, source string"
    )
    capped = cap_per_stratum(df, cap=50, stratum_col="source", method="rate")
    n_cap = capped.count()
    assert 25 <= n_cap <= 80, n_cap  # ~50 expected, binomial jitter
    sampled = stratified_sample(
        capped, rates={"web": 0.5}, stratum_col="source"
    )
    n_s = sampled.count()
    # binomial(n_cap, 0.5): w.h.p. well inside [0.2, 0.8]*n_cap; the
    # correlated (unsalted) draw keeps ALL n_cap rows
    assert 0.2 * n_cap <= n_s <= 0.8 * n_cap, (n_cap, n_s)


def test_temperature_mix_rates(spark):
    """mT5-style temperature mixing: T=1 reproduces natural proportions
    (all rates equal to keep_fraction), large T flattens toward uniform
    (tail sources keep proportionally more), rates match the closed form,
    and composing with stratified_sample realizes the flattened shares."""
    import numpy as np

    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import (
        stratified_sample,
        temperature_mix_rates,
    )

    counts = {"head": 8000, "mid": 1500, "tail": 500}
    rows = [(f"{s}_{i}", s) for s, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, source string")

    # T=1: natural proportions -- every source keeps exactly keep_fraction
    r1 = temperature_mix_rates(df, temperature=1.0, keep_fraction=0.5)
    assert all(abs(v - 0.5) < 1e-9 for v in r1.values()), r1

    # T=2: closed form sqrt-flattening
    r2 = temperature_mix_rates(df, temperature=2.0, keep_fraction=0.5)
    n = np.array([counts["head"], counts["mid"], counts["tail"]], float)
    p = n / n.sum()
    q = np.sqrt(p) / np.sqrt(p).sum()
    want = np.minimum(1.0, 0.5 * n.sum() * q / n)
    got = np.array([r2["head"], r2["mid"], r2["tail"]])
    assert np.allclose(got, want, atol=1e-9), (got, want)
    # flattening direction: tail keeps a HIGHER rate than head
    assert r2["tail"] > r2["mid"] > r2["head"]

    # composition: realized counts land near the flattened expectation
    kept = stratified_sample(df, rates=r2, stratum_col="source",
                             id_col="doc_id")
    per = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for i, s in enumerate(["head", "mid", "tail"]):
        expect = counts[s] * want[i]
        assert abs(per[s] - expect) < 4 * (expect ** 0.5) + 20, (s, per[s], expect)

    # clamp: a tiny source cannot oversupply -- rate caps at 1.0
    rbig = temperature_mix_rates(df, temperature=100.0, keep_fraction=0.9)
    assert rbig["tail"] == 1.0
    # degenerate inputs
    assert temperature_mix_rates(df.where("1=0")) == {}
    import pytest

    with pytest.raises(ValueError, match="temperature"):
        temperature_mix_rates(df, temperature=0.0)


def test_stratified_sample_null_stratum_is_governed_not_dropped(spark):
    """NULL is one stratum: before round 5 the membership hash went NULL
    for NULL-source rows and the filter silently dropped them at every
    rate (even default_rate=1.0). Now the key coalesces to a sentinel
    (same contract as cap_per_stratum): default_rate governs NULL, an
    explicit rates[None] entry overrides, and temperature_mix_rates
    includes the NULL stratum in the mix under the None key."""
    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import (
        stratified_sample,
        temperature_mix_rates,
    )

    rows = [(i, "web" if i % 2 == 0 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    kept_all = stratified_sample(df, rates={"web": 1.0}, stratum_col="source",
                                 default_rate=1.0)
    assert kept_all.count() == 200  # NULL rows kept under default_rate
    dropped = stratified_sample(df, rates={"web": 1.0}, stratum_col="source",
                                default_rate=0.0)
    assert dropped.count() == 100  # NULL rows governed, web untouched
    half_null = stratified_sample(
        df, rates={"web": 1.0, None: 0.5}, stratum_col="source",
        default_rate=0.0,
    )
    n = half_null.where(F.col("source").isNull()).count()
    assert 25 <= n <= 75, n  # ~50 of 100, binomial jitter
    assert half_null.where(F.col("source").isNotNull()).count() == 100

    rates = temperature_mix_rates(df, temperature=1.0, keep_fraction=0.5)
    assert set(rates) == {"web", None}
    assert all(abs(v - 0.5) < 1e-9 for v in rates.values())


def test_corpus_report_consistent_with_certified_operators(spark):
    """corpus_report is ONE fused scan+aggregate; every number it emits
    must equal the aggregation of the independently-oracled per-doc
    operators (quality_gate, document_stats, pii_stats, exact_dedup) on
    the same input -- self-consistency across certified surfaces. The
    default dup estimate uses approx_count_distinct (no Expand rewrite;
    one pass); exact_dup=True must be exactly right."""
    from pyspark.sql import functions as F

    from action_pdf_accessibility_paddle_docker_spark.operators.dedup import (
        exact_dedup,
    )
    from action_pdf_accessibility_paddle_docker_spark.operators.pii import (
        pii_stats,
    )
    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import (
        corpus_report,
        document_stats,
        quality_gate,
    )

    good = ("the quick brown fox jumps over the lazy dog and keeps going. "
            "a second sentence of perfectly ordinary content follows it. "
            "the third one wraps the document up with a clean full stop.")
    es = ("el perro corre por la calle y los gatos miran desde la ventana "
          "de la casa. la gente pasa y en el parque los arboles crecen.")
    rows = [
        (0, good + " mail a@b.io or card 4111-1111-1111-1111 now."),
        (1, good),
        (2, good),                       # exact dup of 1
        (3, "tiny."),                    # too_short reject
        (4, es),
        (5, None),                       # null text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    rep = corpus_report(df, exact_dup=True).collect()[0].asDict()

    gate = quality_gate(df).collect()
    assert rep["n_docs"] == 6
    assert rep["gate_keep_frac"] == round(
        sum(1 for r in gate if r["keep"]) / 6, 6)
    for reason in ("too_short", "high_punct", "low_stopword",
                   "low_distinct", "repetitive_bigram"):
        want = sum(1 for r in gate if reason in (r["reject_reasons"] or ""))
        assert rep[f"rej_{reason}"] == want, reason

    stats = document_stats(df).collect()   # NULL text rides along as 'und'
    for code in ("en", "es", "und"):
        assert rep[f"lang_{code}"] == sum(
            1 for r in stats if r["lang_guess"] == code), code
    assert rep["total_chars"] == sum(len(t) for _, t in rows if t is not None)

    pii = pii_stats(df.where(F.col("text").isNotNull())).collect()
    assert rep["docs_with_email"] == sum(1 for r in pii if r["n_emails"] > 0)
    assert rep["docs_with_card"] == sum(1 for r in pii if r["n_cards"] > 0)
    assert rep["docs_with_ssn"] == 0

    n_fp = exact_dedup(df.where(F.col("text").isNotNull())).count()
    assert rep["docs_null_text"] == 1
    assert rep["n_distinct_fp"] == n_fp
    assert rep["est_dup_docs"] == 5 - n_fp == 1

    # default (one-pass approx) form: same exact columns, HLL estimate
    # within its documented error on this cardinality
    rep2 = corpus_report(df).collect()[0].asDict()
    assert {k: v for k, v in rep2.items()
            if k not in ("n_distinct_fp", "est_dup_docs")} == \
           {k: v for k, v in rep.items()
            if k not in ("n_distinct_fp", "est_dup_docs")}
    assert abs(rep2["n_distinct_fp"] - n_fp) <= max(1, int(0.05 * n_fp))


def test_shuffled_deterministic_global_order(spark):
    """shuffled(): reproducible global permutation by md5(salt, id) --
    partition-layout-independent, salt = independent epoch order."""
    import hashlib

    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import shuffled

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], "doc_id bigint, text string"
    )
    want = sorted(
        range(500),
        key=lambda i: hashlib.md5(f"shuffle:s1:{i}".encode()).hexdigest(),
    )
    got = [r["doc_id"] for r in shuffled(df, salt="s1").collect()]
    assert got == want
    # same order under a different input layout
    got2 = [r["doc_id"] for r in shuffled(df.repartition(13), salt="s1").collect()]
    assert got2 == want
    # a different salt is a different (complete) permutation
    other = [r["doc_id"] for r in shuffled(df, salt="s2").collect()]
    assert other != want and sorted(other) == list(range(500))


def test_quality_gate_survives_empty_text(spark):
    """Empty text (possible after corpus-wide dup-line removal empties a
    doc) must not kill the job under ANSI division -- the doc is rejected
    by too_short, punct_ratio reads 0.0."""
    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import (
        apply_quality_gate,
        document_stats,
        quality_gate,
    )

    df = spark.createDataFrame(
        [(0, ""), (1, None),
         (2, "the quick brown fox jumps over the lazy dog and keeps on "
             "going to the very end of this line today, naturally.")],
        "doc_id bigint, text string",
    )
    g = {r["doc_id"]: r for r in quality_gate(df).collect()}
    assert g[0]["keep"] is False and "too_short" in g[0]["reject_reasons"]
    assert g[2]["keep"] is True
    assert [r["doc_id"] for r in apply_quality_gate(df).collect()] == [2]
    s = {r["doc_id"]: r for r in document_stats(df).collect()}
    assert s[0]["punct_ratio"] == 0.0
