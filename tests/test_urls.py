"""URL curation operators: normalization chain, registered-domain
heuristic, blocklist filtering, URL dedup."""

import pytest
from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators.urls import (
    domain_stats,
    filter_blocked_domains,
    normalize_url,
    registered_domain,
    url_dedup,
    url_domain,
    url_host,
    url_stats,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]


# (input, canonical) — each case exercises one documented rule
NORM_CASES = [
    # scheme + host lowercased, path case preserved
    ("HTTPS://Example.COM/Path/File", "https://example.com/Path/File"),
    # fragment stripped
    ("https://a.com/x#section-2", "https://a.com/x"),
    # www. stripped
    ("https://www.example.com/x", "https://example.com/x"),
    # default ports stripped, non-default kept
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    ("https://a.com:80/x", "https://a.com:80/x"),  # 80 is NOT https default
    # userinfo dropped
    ("https://user:pw@a.com/x", "https://a.com/x"),
    # trailing slashes stripped; bare root collapses
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com/", "https://a.com"),
    ("https://a.com", "https://a.com"),
    # tracking params dropped, remainder sorted, empties dropped
    ("https://a.com/x?utm_source=tw&b=2&a=1", "https://a.com/x?a=1&b=2"),
    ("https://a.com/x?z=9&fbclid=abc", "https://a.com/x?z=9"),
    ("https://a.com/x?utm_campaign=c", "https://a.com/x"),
    ("https://a.com/x?b=2&&a=1", "https://a.com/x?a=1&b=2"),
    # query directly after authority (no path)
    ("https://a.com?b=2&a=1", "https://a.com?a=1&b=2"),
    # percent-encoding normalization (RFC 3986 6.2.2, round 7):
    # unreserved escapes decode; other valid escapes get uppercase hex;
    # invalid/truncated '%' runs stay verbatim; hosts normalize too
    ("https://a.com/%7Euser", "https://a.com/~user"),
    ("https://a.com/a%2fb", "https://a.com/a%2Fb"),
    ("https://a.com/%41%62%39%2D%2e", "https://a.com/Ab9-."),
    ("https://a.com/x%zz%4", "https://a.com/x%zz%4"),
    ("https://a.com/%%41", "https://a.com/%A"),
    ("https://ex%61mple.com/x", "https://example.com/x"),
    ("https://a.com/x?%62=1&a=2", "https://a.com/x?a=2&b=1"),
    # www.<single-label> is itself the host -- never stripped to a TLD
    ("https://www.com/page", "https://www.com/page"),
    # unparseable -> NULL
    ("not a url", None),
    ("", None),
    (None, None),
]


def test_normalize_url_cases(spark):
    got = _norm(spark, [u for u, _ in NORM_CASES])
    for (inp, want), g in zip(NORM_CASES, got):
        assert g == want, (inp, g, want)


def test_normalization_idempotent(spark):
    """normalize(normalize(u)) == normalize(u) for every parseable case."""
    canon = [w for _, w in NORM_CASES if w is not None]
    assert _norm(spark, canon) == canon


DOMAIN_CASES = [
    ("https://www.news.bbc.co.uk/x", "bbc.co.uk"),     # two-level suffix
    ("https://bbc.co.uk/x", "bbc.co.uk"),
    ("https://blog.example.com/x", "example.com"),      # last-two fallback
    ("https://example.com/x", "example.com"),
    ("https://localhost/x", "localhost"),               # single label
    ("http://192.168.0.1:8080/x", "192.168.0.1"),       # IPv4 literal
    ("https://www.com/x", "www.com"),                   # www. kept: 2 labels
    # PSL snapshot cases (round 7): ccTLD registries the old two-level
    # heuristic missed, private registries, wildcard + exception rules
    ("https://shop.example.com.hk/x", "example.com.hk"),
    ("https://news.daum.co.kr/x", "daum.co.kr"),
    ("https://user.github.io/proj", "user.github.io"),   # private suffix
    ("https://www.user.github.io/p", "user.github.io"),
    ("https://myblog.blogspot.com/p", "myblog.blogspot.com"),
    ("https://deep.sub.user.github.io/p", "user.github.io"),
    ("https://a.b.ck/x", "a.b.ck"),                      # wildcard *.ck
    ("https://foo.www.ck/x", "www.ck"),                  # exception !www.ck
    ("https://sub.city.kobe.jp/x", "city.kobe.jp"),      # !city.kobe.jp
    ("https://a.ward.kobe.jp/x", "a.ward.kobe.jp"),      # *.kobe.jp
    ("https://vm.x1.compute.amazonaws.com/x", "vm.x1.compute.amazonaws.com"),
    ("nope", None),
]


def test_url_domain_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in DOMAIN_CASES], "url string")
    got = [r[0] for r in df.select(url_domain(F.col("url"))).collect()]
    assert got == [w for _, w in DOMAIN_CASES]


def test_url_host_keeps_www(spark):
    df = spark.createDataFrame([("https://WWW.A.com/x",)], "url string")
    assert df.select(url_host(F.col("url"))).first()[0] == "www.a.com"


def test_registered_domain_on_bare_host(spark):
    df = spark.createDataFrame(
        [("a.b.co.jp",), ("x.y.z.example.org",)], "host string"
    )
    got = [r[0] for r in df.select(registered_domain(F.col("host"))).collect()]
    assert got == ["b.co.jp", "example.org"]


def _docs(spark):
    rows = [
        (0, "https://www.a.com/x?utm_source=s", "keep-a"),
        (1, "https://A.com/x", "dup-of-0"),          # same canonical, bigger id
        (2, "https://a.com/y", "keep-b"),
        (3, "not a url", "unparseable-1"),
        (4, "also not", "unparseable-2"),
        (5, "https://spam.example.co.uk/z", "blocked"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, url string, text string")


def test_url_dedup_keeps_min_id_and_passes_unparseable(spark):
    out = url_dedup(_docs(spark)).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [0, 2, 3, 4, 5]
    assert sorted(out[0].asDict().keys()) == ["doc_id", "text", "url"]


def test_url_dedup_plan_is_one_partial_aggregate(spark):
    """The only shuffle is the groupBy on the md5 key with a map-side
    partial (hot-URL posture, same as exact_dedup); no join anywhere."""
    plan = url_dedup(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_min" in plan or "HashAggregate" in plan


def test_filter_blocked_domains_list_and_df(spark):
    docs = _docs(spark)
    want = [0, 1, 2, 3, 4]  # NULL-domain docs kept; blocked domain dropped
    got_list = filter_blocked_domains(docs, ["example.co.uk", "other.com"])
    assert sorted(r["doc_id"] for r in got_list.collect()) == want
    # DF form must normalize case/whitespace like the iterable form
    bl = spark.createDataFrame([("  Example.CO.uk ",)], "domain string")
    got_df = filter_blocked_domains(docs, bl)
    assert sorted(r["doc_id"] for r in got_df.collect()) == want
    # empty list is a no-op
    assert filter_blocked_domains(docs, []).count() == docs.count()


def test_blocklist_df_form_is_broadcast_anti(spark):
    bl = spark.createDataFrame([("example.co.uk",)], "domain string")
    plan = (
        filter_blocked_domains(_docs(spark), bl)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_url_stats_and_domain_stats(spark):
    stats = {r["doc_id"]: r for r in url_stats(_docs(spark)).collect()}
    assert stats[0]["norm_url"] == "https://a.com/x"
    assert stats[0]["host"] == "www.a.com"
    assert stats[0]["url_domain"] == "a.com"
    assert stats[3]["norm_url"] is None and stats[3]["url_domain"] is None
    ds = {r["url_domain"]: r["n_docs"] for r in domain_stats(_docs(spark)).collect()}
    assert ds == {"a.com": 3, "example.co.uk": 1, None: 2}


def test_domain_stats_feeds_cap_per_stratum(spark):
    """The RefinedWeb per-domain cap recipe: domain column + cap_per_stratum."""
    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import cap_per_stratum

    rows = [(i, f"https://hot.com/p{i}", f"t{i}") for i in range(40)] + [
        (100 + i, f"https://cold{i}.org/", f"c{i}") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    with_dom = df.withColumn("url_domain", url_domain(F.col("url")))
    capped = cap_per_stratum(
        with_dom, cap=10, stratum_col="url_domain", id_col="doc_id",
        method="exact",
    )
    per = {
        r["url_domain"]: r["n"]
        for r in capped.groupBy("url_domain").agg(F.count("*").alias("n")).collect()
    }
    assert per["hot.com"] == 10  # exact form binds the mega-domain
    assert sum(1 for d in per if d.startswith("cold")) == 5  # cold survive


def test_hot_url_drill(spark):
    """95% of a 20k-doc shard shares ONE canonical URL (syndicated mirror
    case): one survivor for the hot URL, everything else intact -- the
    map-side-combined min-struct posture under real skew."""
    from pyspark.sql import functions as F  # noqa: F811

    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 20 != 0,
            F.lit("https://www.mirror.com/story?utm_source=feed"),
        ).otherwise(
            F.concat(F.lit("https://site.com/p/"), F.col("id").cast("string"))
        ).alias("url"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
    )
    out = url_dedup(df)
    assert out.count() == 1_000 + 1  # 1000 unique + 1 hot survivor
    hot = out.where(F.col("url").contains("mirror.com")).collect()
    assert len(hot) == 1 and hot[0]["doc_id"] == 1  # min id wins


def test_url_dedup_longest_policy(spark):
    """policy='longest': the fullest capture of a URL supersedes (recrawl
    corpora); ties break to min id; NULL text loses to any text."""
    import pytest as _pytest

    rows = [
        (0, "https://a.com/x", "short"),
        (1, "https://www.a.com/x/", "much longer recrawl capture"),
        (2, "https://A.com/x", None),                  # NULL text loses
        (3, "https://b.org/y", "tie"),
        (4, "https://b.org/y/", "eit"),                # same length: min id
        (5, "not a url", "passes"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    out = sorted(r["doc_id"] for r in url_dedup(df, policy="longest").collect())
    assert out == [1, 3, 5]
    with _pytest.raises(ValueError, match="policy"):
        url_dedup(df, policy="bogus")


def test_url_dedup_property_vs_scalar(spark):
    """Property pin: url_dedup's survivors under BOTH policies equal a
    scalar python computation over the fuzz reference's normalizer."""
    from tests.test_urls_fuzz import norm_py

    rows = [
        (i,
         ["https://A.com/x", "https://www.a.com/x?utm_source=s",
          "http://a.com:80/x", "https://b.org/p", "https://b.org/p/",
          "junk", None][i % 7],
         None if i % 11 == 0 else ("t" * ((i * 7) % 13)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    for policy in ("min_id", "longest"):
        got = sorted(
            r["doc_id"] for r in url_dedup(df, policy=policy).collect()
        )
        groups = {}
        passthrough = []
        for i, u, t in rows:
            n = norm_py(u)
            if n is None:
                passthrough.append(i)
            else:
                groups.setdefault(n, []).append((i, t))
        want = list(passthrough)
        for members in groups.values():
            if policy == "min_id":
                want.append(min(i for i, _ in members))
            else:
                want.append(min(
                    members,
                    key=lambda m: (-(len(m[1]) if m[1] is not None else -1), m[0]),
                )[0])
        assert got == sorted(want), policy
