"""URL-level curation operators: normalization, registered-domain
extraction, blocklist filtering, and URL dedup (RefinedWeb Penedo et al.
2023 §3.1, C4 Raffel et al. 2020 §2.2 — the cheapest curation signals a web
corpus has, applied BEFORE any text-content pass).

Everything here is a pure JVM projection (regexp/array expressions — no
UDFs, no explode, no shuffle except ``url_dedup``'s single map-side-combined
groupBy), and every step is deliberately restricted to expressions DuckDB
can replay verbatim (``regexp_extract``/``split``/``list_filter``/
``list_sort``), so the driver row (`q_doc_stats`'s url leg) hash-checks the
whole normalization chain.

Canonical form produced by ``normalize_url`` (documented because it IS the
dedup key):

  * fragment stripped; scheme and host lowercased; path case preserved
  * userinfo (``user:pass@``) dropped; leading ``www.`` dropped
  * default ports stripped (``:80`` for http, ``:443`` for https); other
    ports kept verbatim (no leading-zero canonicalization)
  * trailing slashes stripped from the path (root ``/`` collapses to '')
  * query: empty params and tracking params (``utm_*``, fbclid, gclid, …)
    dropped, the rest sorted lexicographically as whole ``k=v`` strings
  * no percent-encoding or IDN normalization (out of scope; documented)
  * inputs with no ``scheme://`` parse to NULL — unparseable URLs are
    passed through untouched by the consuming forms, never silently merged

``registered_domain`` is a public-suffix HEURISTIC, not the PSL: a short
literal list of common two-level suffixes (co.uk, com.au, …) plus the
last-two-labels fallback; IPv4 hosts return themselves. At 100 TB the full
PSL would ride the same expression as a generated CASE (bounded, ~9k rules)
— the plan shape does not change.

Scale shape: normalization and blocklist are embarrassingly parallel
codegen'd projections; ``url_dedup`` is ONE hash groupBy on the (fixed
width, post-md5) canonical key with map-side combine — a hot URL reaches
its reducer as one partial per mapper, the same posture as
``dedup.exact_dedup``. ``domain_stats`` feeds ``textstats.cap_per_stratum``
(stratum_col='domain') for RefinedWeb-style per-domain caps.
"""

from __future__ import annotations

from typing import Iterable, Union

from pyspark.sql import Column, DataFrame, functions as F

# mirrored literally by the DuckDB oracle (plans/queries.py) — keep in sync
TRACKING_PARAMS = (
    "fbclid", "gclid", "msclkid", "igshid", "ref", "mc_cid", "mc_eid", "_ga",
)
TRACKING_PREFIX = "utm_"
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.in", "co.nz", "com.br", "com.cn",
    "com.mx", "com.tr", "com.sg", "co.za", "com.ar",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$"


def _parts(url: Column) -> tuple[Column, Column, Column, Column]:
    """(scheme, authority, path, query) of the fragment-stripped url.
    scheme is '' when unparseable (no ``://``)."""
    s = F.substring_index(F.trim(url), "#", 1)  # strip fragment
    scheme = F.lower(F.regexp_extract(s, _SCHEME_RE, 1))
    rest = F.regexp_extract(s, _REST_RE, 1)
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    return scheme, authority, path, query


def _host_port(authority: Column) -> tuple[Column, Column]:
    """(lowercased host, port string or '') — userinfo dropped."""
    hp = F.regexp_replace(authority, r"^.*@", "")
    host = F.lower(F.regexp_replace(hp, r":[0-9]*$", ""))
    port = F.regexp_extract(hp, r":([0-9]+)$", 1)
    return host, port


def _param_kept(p: Column) -> Column:
    key = F.lower(F.substring_index(p, "=", 1))
    return (
        (p != F.lit(""))
        & ~key.isin(*TRACKING_PARAMS)
        & ~key.startswith(TRACKING_PREFIX)
    )


def _strip_www(host: Column) -> Column:
    """Drop a leading ``www.`` ONLY when at least two labels remain
    (``www.example.com`` -> ``example.com``, but ``www.com`` is itself a
    registrable host -- stripping would collapse it to the bare TLD and
    merge it with malformed ``https://com/...`` URLs). The guard regex is
    RE2-safe (no lookahead) so the DuckDB oracle mirrors it verbatim."""
    return F.when(
        host.rlike(r"^www\..+\."), F.regexp_replace(host, r"^www\.", "")
    ).otherwise(host)


def normalize_url(url: Column) -> Column:
    """The canonical URL (see module docstring), or NULL if unparseable."""
    scheme, authority, path, query = _parts(url)
    host, port = _host_port(authority)
    host = _strip_www(host)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port != "") & ~default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    cleanpath = F.regexp_replace(path, r"/+$", "")
    kept = F.array_sort(F.filter(F.split(query, "&"), _param_kept))
    qs = F.array_join(kept, "&")
    qpart = F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit(""))
    return F.when(
        (scheme != "") & (host != ""),
        F.concat(scheme, F.lit("://"), host, portpart, cleanpath, qpart),
    )


def url_host(url: Column) -> Column:
    """Lowercased host (www. kept — it is part of the real host), or NULL."""
    scheme, authority, _, _ = _parts(url)
    host, _ = _host_port(authority)
    return F.when((scheme != "") & (host != ""), host)


def registered_domain(host: Column) -> Column:
    """Heuristic registered domain of a (lowercased) host — see docstring."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    is_ip = host.rlike(r"^[0-9]+(\.[0-9]+){3}$")
    return F.when(host.isNull(), F.lit(None).cast("string")).when(
        is_ip | (n <= 2), host
    ).when(last2.isin(*TWO_LEVEL_SUFFIXES) & (n >= 3), last3).otherwise(last2)


def url_domain(url: Column) -> Column:
    """Registered domain straight from a raw URL (www. stripped first so
    ``www.bbc.co.uk`` and ``bbc.co.uk`` agree; ``www.com`` keeps its www --
    see ``_strip_www``), or NULL if unparseable."""
    return registered_domain(_strip_www(url_host(url)))


def url_stats(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """Per-document URL signals: canonical url, host, registered domain.
    One codegen'd projection; NULLs mark unparseable inputs."""
    u = F.col(url_col)
    return df.select(
        F.col(id_col),
        normalize_url(u).alias("norm_url"),
        url_host(u).alias("host"),
        url_domain(u).alias("url_domain"),
    )


def url_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    policy: str = "min_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep ONE document per canonical URL; documents whose URL does not
    parse pass through untouched (a NULL key must never merge unrelated
    docs). Two deterministic keep policies:

    * ``'min_id'`` (default): min id wins — the same canonical rule as
      ``dedup.exact_dedup``.
    * ``'longest'``: the capture with the most ``text_col`` characters
      wins (recrawl corpora: the later, fuller capture of a page should
      supersede a truncated earlier one), ties broken by min id.

    Scale shape: the only shuffle is one hash groupBy on ``md5(norm_url)``
    (fixed-width key, map-side combine — a hot URL is one partial per
    mapper); the unparseable branch is a filter union, no join anywhere."""
    if policy not in ("min_id", "longest"):
        raise ValueError(f"policy must be 'min_id' or 'longest', got {policy!r}")
    norm = normalize_url(F.col(url_col))
    with_key = df.withColumn("_u", F.md5(norm))
    other_cols = [c for c in with_key.columns if c not in (id_col, "_u")]
    if policy == "longest":
        # order key: (n_chars desc, id asc) via min over (-n_chars, id);
        # NULL text sorts last (coalesced to -1 chars -> negated to 1)
        order = F.struct(
            (-F.coalesce(F.length(F.col(text_col)), F.lit(-1))).alias("_neg"),
            F.col(id_col).alias("_id"),
        )
    else:
        order = F.struct(F.col(id_col).alias("_id"))
    row = F.struct(order.alias("_o"), F.struct(id_col, *other_cols).alias("_r"))
    canon = (
        with_key.where(F.col("_u").isNotNull())
        .groupBy("_u")
        .agg(F.min(row).alias("_w"))
        .select("_u", "_w._r.*")
    )
    return canon.drop("_u").unionByName(
        with_key.where(F.col("_u").isNull()).drop("_u")
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: Union[Iterable[str], DataFrame],
    url_col: str = "url",
) -> DataFrame:
    """Drop documents whose registered domain is blocklisted.

    ``blocked`` is either an in-config iterable of domains (bounded — the
    usual adult/spam list is thousands of rows; compiled to one ``isin``
    literal, zero joins) or a DataFrame with a ``domain`` column (broadcast
    LEFT ANTI — the corpus streams map-only). Unparseable URLs (NULL
    domain) are KEPT: the blocklist is an exclusion signal, absence of a
    URL is not membership."""
    dom = url_domain(F.col(url_col))
    if isinstance(blocked, DataFrame):
        # normalize the blocklist side exactly like the iterable form --
        # url_domain is always lowercase, so a raw 'Example.com ' row
        # would silently match nothing
        return (
            df.withColumn("_dom", dom)
            .join(
                F.broadcast(
                    blocked.select(
                        F.lower(F.trim(F.col("domain"))).alias("_dom")
                    )
                ),
                "_dom",
                "left_anti",
            )
            .drop("_dom")
        )
    domains = sorted(set(str(d).strip().lower() for d in blocked if str(d).strip()))
    if not domains:
        return df
    return df.where(dom.isNull() | ~dom.isin(*domains))


def domain_stats(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-registered-domain corpus share: doc count and char volume — the
    input to RefinedWeb-style per-domain caps (compose with
    ``textstats.cap_per_stratum(stratum_col='url_domain')``). One map-side-
    combined aggregate; NULL domains grouped under the NULL row so the
    report is a partition of the corpus."""
    return (
        df.select(
            url_domain(F.col(url_col)).alias("url_domain"),
            F.length(F.col(text_col)).alias("_n"),
        )
        .groupBy("url_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").cast("bigint").alias("n_chars"),
        )
    )
