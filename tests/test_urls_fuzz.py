"""Third-engine pin for the URL normalization chain: a scalar Python
reference implements the documented canonical form independently of the
Spark column expressions (and of the DuckDB oracle), and hypothesis feeds
both URL-shaped and garbage strings through both. A divergence here means
the regexes drifted from the spec."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators.psl import (
    registered_domain_py,
)
from action_pdf_accessibility_paddle_docker_spark.operators.urls import (
    TRACKING_PARAMS,
    TRACKING_PREFIX,
    normalize_url,
    url_domain,
)


def pct_py(s):
    """Scalar reference of percent_normalize: decode unreserved escapes,
    uppercase the hex of valid others, keep invalid '%' runs verbatim."""
    parts = s.split("%")
    if len(parts) == 1:
        return s
    out = [parts[0]]
    for p in parts[1:]:
        if re.match(r"^[0-9A-Fa-f]{2}", p):
            code = int(p[:2], 16)
            if (
                48 <= code <= 57 or 65 <= code <= 90 or 97 <= code <= 122
                or code in (45, 46, 95, 126)
            ):
                out.append(chr(code) + p[2:])
            else:
                out.append("%" + p[:2].upper() + p[2:])
        else:
            out.append("%" + p)
    return "".join(out)


def norm_py(url):
    """Scalar reference of normalize_url (module docstring spec).

    Whitespace/regex semantics deliberately mirror the SPARK chain, which
    is the spec: F.trim strips ASCII spaces only (not tabs/newlines), and
    Java regex '.' excludes newlines with no DOTALL anywhere -- an
    interior newline therefore makes the URL unparseable (NULL), which is
    the right verdict for a crawl artifact."""
    if url is None:
        return None
    s = pct_py(url.strip(" ").split("#", 1)[0])
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
    s = pct_py(url.strip(" ").split("#", 1)[0])
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
    # registered-domain step: the psl module's own scalar reference (an
    # independent control-flow restatement of the PSL walk over the same
    # vendored rule sets the Spark CASE is compiled from)
    return registered_domain_py(host)


_label = st.one_of(
    st.text(alphabet="abcdefgHIJ0129-_", min_size=1, max_size=6).filter(
        lambda s: "." not in s
    ),
    # PSL-loaded labels so composed hosts regularly hit exact, wildcard and
    # exception rules of the vendored snapshot (e.g. a.co.uk, x.kobe.jp,
    # city.kobe.jp, foo.www.ck, siteN.github.io)
    st.sampled_from(
        ["co", "uk", "jp", "kobe", "city", "ck", "www", "github", "io",
         "com", "hk", "blogspot", "amazonaws", "compute", "kr"]
    ),
)

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
        st.one_of(
            st.text(alphabet="abcXYZ019._-", min_size=0, max_size=5),
            # percent-escape shapes: unreserved (decode), reserved (hex
            # uppercase), invalid, truncated, doubled, lowercase hex
            st.sampled_from(
                ["%7Euser", "%41b", "%2fq", "%2Fq", "%zz", "%4", "%",
                 "%%41", "a%20b", "%2e%2e", "%Ff", "%fF1"]
            ),
        ),
        max_size=3,
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
