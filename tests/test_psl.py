"""Vendored Public-Suffix-List snapshot: the three consumers (Spark CASE,
DuckDB-generated CASE, scalar python walk) agree on every rule class --
exact 2/3-level, private registries, wildcard, exception, IPv4, fallback --
and the snapshot parses into the expected rule shapes."""

import duckdb
from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators.psl import (
    PSL_EXACT,
    PSL_EXCEPTIONS,
    PSL_SNAPSHOT,
    PSL_WILDCARD,
    parse_psl,
    registered_domain_expr,
    registered_domain_py,
    registered_domain_sql,
)

HOSTS = [
    # fallback (implicit * rule)
    "example.com", "blog.example.com", "a.b.c.example.org", "example.de",
    # exact 2-level ccTLD registries
    "bbc.co.uk", "news.bbc.co.uk", "shop.example.com.hk", "daum.co.kr",
    "x.gov.br", "y.ac.il", "z.com.tr", "site.on.ca",
    # a host that IS a public suffix (documented deviation: itself)
    "co.uk", "github.io", "kobe.jp",
    # private registries (incl. 3-level exact)
    "user.github.io", "deep.sub.user.github.io", "me.blogspot.com",
    "me.blogspot.com.au", "app.herokuapp.com", "x.pages.dev",
    # wildcard rules
    "a.b.ck", "x.a.b.ck", "site.anything.bd", "a.ward.kobe.jp",
    "vm.x1.compute.amazonaws.com", "lb.zone.elb.amazonaws.com",
    # exception rules
    "www.ck", "foo.www.ck", "city.kobe.jp", "sub.city.kobe.jp",
    "city.nagoya.jp",
    # IPv4 / single label / oddballs
    "192.168.0.1", "localhost", "com", "ck",
]

WANT = {
    "example.com": "example.com",
    "blog.example.com": "example.com",
    "a.b.c.example.org": "example.org",
    "example.de": "example.de",
    "bbc.co.uk": "bbc.co.uk",
    "news.bbc.co.uk": "bbc.co.uk",
    "shop.example.com.hk": "example.com.hk",
    "daum.co.kr": "daum.co.kr",
    "x.gov.br": "x.gov.br",
    "y.ac.il": "y.ac.il",
    "z.com.tr": "z.com.tr",
    "site.on.ca": "site.on.ca",
    "co.uk": "co.uk",
    "github.io": "github.io",
    "kobe.jp": "kobe.jp",
    "user.github.io": "user.github.io",
    "deep.sub.user.github.io": "user.github.io",
    "me.blogspot.com": "me.blogspot.com",
    "me.blogspot.com.au": "me.blogspot.com.au",
    "app.herokuapp.com": "app.herokuapp.com",
    "x.pages.dev": "x.pages.dev",
    "a.b.ck": "a.b.ck",
    "x.a.b.ck": "a.b.ck",
    "site.anything.bd": "site.anything.bd",
    "a.ward.kobe.jp": "a.ward.kobe.jp",
    "vm.x1.compute.amazonaws.com": "vm.x1.compute.amazonaws.com",
    "lb.zone.elb.amazonaws.com": "lb.zone.elb.amazonaws.com",
    "www.ck": "www.ck",
    "foo.www.ck": "www.ck",
    "city.kobe.jp": "city.kobe.jp",
    "sub.city.kobe.jp": "city.kobe.jp",
    "city.nagoya.jp": "city.nagoya.jp",
    "192.168.0.1": "192.168.0.1",
    "localhost": "localhost",
    "com": "com",
    "ck": "ck",
}


def test_snapshot_parses_into_expected_shapes():
    exact, wild, exc = parse_psl(PSL_SNAPSHOT)
    assert (exact, wild, exc) == (PSL_EXACT, PSL_WILDCARD, PSL_EXCEPTIONS)
    assert "co.uk" in exact[2] and "github.io" in exact[2]
    assert "blogspot.com.au" in exact[3]
    assert "ck" in wild[1] and "kobe.jp" in wild[2]
    assert "compute.amazonaws.com" in wild[3]
    assert "www.ck" in exc[2] and "city.kobe.jp" in exc[3]
    # comments and blanks dropped; everything lowercased
    for rules in (*exact.values(), *wild.values(), *exc.values()):
        assert all(r == r.lower() and not r.startswith("//") for r in rules)


def test_scalar_reference_pins():
    for h in HOSTS:
        assert registered_domain_py(h) == WANT[h], h
    assert registered_domain_py(None) is None


def test_spark_expr_matches_reference(spark):
    df = spark.createDataFrame([(h,) for h in HOSTS] + [(None,)], "host string")
    got = {
        r["host"]: r["rd"]
        for r in df.select(
            "host", registered_domain_expr(F.col("host")).alias("rd")
        ).collect()
    }
    assert got == {**WANT, None: None}


def test_duckdb_sql_matches_reference():
    con = duckdb.connect()
    con.execute("CREATE TABLE hosts(host VARCHAR)")
    con.executemany("INSERT INTO hosts VALUES (?)", [(h,) for h in HOSTS] + [(None,)])
    rows = con.execute(
        f"SELECT host, {registered_domain_sql('host')} FROM hosts"
    ).fetchall()
    got = dict(rows)
    assert got == {**WANT, None: None}


def test_spark_plan_is_single_projection(spark):
    """The PSL walk stays a codegen'd CASE: no join, no shuffle, no UDF."""
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    plan = (
        df.select(registered_domain_expr(F.col("host")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Join", "Exchange", "PythonUDF", "BatchEvalPython"):
        assert bad not in plan
