"""Third-engine pin for the URL normalization chain: a scalar Python
reference implements the documented canonical form independently of the
Spark column expressions (and of the DuckDB oracle), and hypothesis feeds
both URL-shaped and garbage strings through both. A divergence here means
the regexes drifted from the spec."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators.urls import (
    TRACKING_PARAMS,
    TRACKING_PREFIX,
    TWO_LEVEL_SUFFIXES,
    normalize_url,
    url_domain,
)


def norm_py(url):
    """Scalar reference of normalize_url (module docstring spec).

    Whitespace/regex semantics deliberately mirror the SPARK chain, which
    is the spec: F.trim strips ASCII spaces only (not tabs/newlines), and
    Java regex '.' excludes newlines with no DOTALL anywhere -- an
    interior newline therefore makes the URL unparseable (NULL), which is
    the right verdict for a crawl artifact."""
    if url is None:
        return None
    s = url.strip(" ").split("#", 1)[0]
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://(.*)$", s)
    if not m:
        return None
    scheme, rest = m.group(1).lower(), m.group(2)
    am = re.match(r"^([^/?]*)", rest)
    authority = am.group(1)
    path = re.match(r"^[^/?]*([^?]*)", rest).group(1)
    qm = re.match(r"^[^?]*\?(.*)$", rest)
    query = qm.group(1) if qm else ""
    hp = re.sub(r"^.*@", "", authority)
    host = re.sub(r":[0-9]*$", "", hp).lower()
    pm = re.search(r":([0-9]+)$", hp)
    port = pm.group(1) if pm else ""
    if re.match(r"^www\..+\.", host):
        host = re.sub(r"^www\.", "", host, count=1)
    if not scheme or not host:
        return None
    default = (scheme == "http" and port == "80") or (
        scheme == "https" and port == "443"
    )
    portpart = f":{port}" if port and not default else ""
    cleanpath = re.sub(r"/+$", "", path)
    kept = sorted(
        p
        for p in query.split("&")
        if p != ""
        and not (k := p.split("=", 1)[0].lower()) in TRACKING_PARAMS
        and not k.startswith(TRACKING_PREFIX)
    )
    qpart = "?" + "&".join(kept) if kept else ""
    return f"{scheme}://{host}{portpart}{cleanpath}{qpart}"


def domain_py(url):
    """Scalar reference of url_domain -- mirrors the SPARK path
    (url_host -> _strip_www -> registered_domain on the RAW url), not a
    re-parse of the normalized string: garbage like 'http://0:80\t'
    legally keeps ':80\t' inside the host (the tab defeats the anchored
    port strip on both engines), and the reference must agree."""
    if url is None:
        return None
    s = url.strip(" ").split("#", 1)[0]
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://(.*)$", s)
    if not m:
        return None
    scheme, rest = m.group(1).lower(), m.group(2)
    authority = re.match(r"^([^/?]*)", rest).group(1)
    hp = re.sub(r"^.*@", "", authority)
    host = re.sub(r":[0-9]*$", "", hp).lower()
    if not scheme or not host:
        return None
    if re.match(r"^www\..+\.", host):
        host = re.sub(r"^www\.", "", host, count=1)
    if re.search(r"^[0-9]+(\.[0-9]+){3}$", host):
        return host
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in TWO_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


_label = st.text(
    alphabet="abcdefgHIJ0129-_", min_size=1, max_size=6
).filter(lambda s: "." not in s)

# whitespace shapes around and inside the url -- F.trim only strips
# ASCII spaces, and interior newlines must parse to NULL on both sides
_pad = st.sampled_from(["", " ", "  ", "\t", "\n", " \t"])

_urlish = st.builds(
    lambda scheme, www, labels, port, segs, slash, params, frag: (
        f"{scheme}://{'www.' if www else ''}{'.'.join(labels)}"
        f"{port}{''.join('/' + s for s in segs)}{'/' if slash else ''}"
        f"{'?' + '&'.join(params) if params else ''}"
        f"{'#' + frag if frag else ''}"
    ),
    scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp"]),
    www=st.booleans(),
    labels=st.lists(_label, min_size=1, max_size=4),
    port=st.sampled_from(["", ":80", ":443", ":8080", ":0080"]),
    segs=st.lists(
        st.text(alphabet="abcXYZ019._-", min_size=0, max_size=5), max_size=3
    ),
    slash=st.booleans(),
    params=st.lists(
        st.sampled_from(
            ["a=1", "b=2", "z=9", "utm_source=x", "UTM_medium=y",
             "fbclid=q", "REF=z", "", "noval", "k=v=w"]
        ),
        max_size=4,
    ),
    frag=st.sampled_from(["", "frag", "a#b"]),
)

_urlish = st.builds(
    lambda lead, u, tail: lead + u + tail, _pad, _urlish, _pad
)

_garbage = st.text(max_size=30)  # includes \n/\t/unicode by default


# a 300-example sweep ran clean at commit time; 60 keeps CI fast
@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(_urlish, _garbage), min_size=1, max_size=40))
def test_normalize_matches_scalar_reference(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        (r[0], r[1])
        for r in df.select(
            normalize_url(F.col("url")), url_domain(F.col("url"))
        ).collect()
    ]
    want = [(norm_py(u), domain_py(u)) for u in urls]
    assert got == want, [
        (u, g, w) for u, g, w in zip(urls, got, want) if g != w
    ][:3]
