"""Public-Suffix-List registered-domain extraction, compiled to bounded
JVM expressions (no UDF, no join -- one CASE over label-slice membership
tests, the exact plan shape the previous two-level heuristic had).

``PSL_SNAPSHOT`` is a VENDORED snapshot in the standard PSL file format
(https://publicsuffix.org/list/ -- one rule per line, ``//`` comments,
``*.`` wildcard rules, ``!`` exception rules). This copy is deliberately
partial: the most common ccTLD second-level registries plus well-known
private registries (github.io, blogspot.com, *.compute.amazonaws.com, ...).
Upgrading to the full ~9k-rule list is a data swap -- replace the string
below (or point ``parse_psl`` at the downloaded file) and every consumer
(Spark expression, DuckDB oracle SQL, scalar reference) recompiles from it;
the plan stays one projection because membership tests over a few thousand
literals are still a bounded ``isin``.

Matching semantics (publicsuffix.org algorithm):

* a rule matches when its labels equal the host's rightmost labels
  (``*`` matches exactly one label);
* if any EXCEPTION rule matches it prevails: the public suffix is the
  exception minus its leftmost label, so the registered domain IS the
  exception's matched labels;
* otherwise the longest matching rule wins; the registered domain is the
  public suffix plus one label;
* no rule matches -> the implicit ``*`` rule: suffix is the last label,
  registered domain the last two.

Documented deviations (shared by every consumer, pinned by tests):

* a host that IS a public suffix returns itself (the reference algorithm
  says "no registrable part"; returning the host keeps caps/blocklists
  total functions -- same deviation the old heuristic had);
* IPv4 hosts return themselves; single-label hosts return themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

PSL_SNAPSHOT = """
// ===== ICANN DOMAINS (partial vendored snapshot) =====
// uk
co.uk
org.uk
me.uk
ltd.uk
plc.uk
net.uk
sch.uk
ac.uk
gov.uk
nhs.uk
police.uk
// jp
co.jp
ne.jp
or.jp
ac.jp
ad.jp
ed.jp
go.jp
gr.jp
lg.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// au
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
// nz
co.nz
net.nz
org.nz
govt.nz
ac.nz
school.nz
geek.nz
gen.nz
kiwi.nz
maori.nz
// br
com.br
net.br
org.br
gov.br
edu.br
art.br
blog.br
// cn
com.cn
net.cn
org.cn
gov.cn
edu.cn
ac.cn
// hk
com.hk
edu.hk
gov.hk
idv.hk
net.hk
org.hk
// tw
com.tw
net.tw
org.tw
edu.tw
gov.tw
idv.tw
// kr
co.kr
ne.kr
or.kr
re.kr
pe.kr
go.kr
mil.kr
ac.kr
hs.kr
ms.kr
es.kr
sc.kr
kg.kr
seoul.kr
busan.kr
// il
co.il
org.il
net.il
ac.il
gov.il
muni.il
idf.il
// in
co.in
net.in
org.in
firm.in
gen.in
ind.in
ac.in
edu.in
res.in
gov.in
mil.in
nic.in
// za
co.za
net.za
org.za
web.za
gov.za
edu.za
ac.za
// mx
com.mx
net.mx
org.mx
edu.mx
gob.mx
// ar
com.ar
net.ar
org.ar
edu.ar
gob.ar
int.ar
mil.ar
tur.ar
// tr
com.tr
net.tr
org.tr
edu.tr
gov.tr
mil.tr
bel.tr
gen.tr
web.tr
// sg
com.sg
net.sg
org.sg
edu.sg
gov.sg
per.sg
// my
com.my
net.my
org.my
edu.my
gov.my
mil.my
name.my
// th
co.th
ac.th
go.th
in.th
mi.th
net.th
or.th
// id
co.id
ac.id
go.id
mil.id
net.id
or.id
sch.id
web.id
my.id
biz.id
// ph
com.ph
net.ph
org.ph
gov.ph
edu.ph
ngo.ph
mil.ph
i.ph
// vn
com.vn
net.vn
org.vn
edu.vn
gov.vn
int.vn
ac.vn
biz.vn
info.vn
name.vn
pro.vn
health.vn
// ua
com.ua
net.ua
org.ua
edu.ua
gov.ua
in.ua
// pl
com.pl
net.pl
org.pl
edu.pl
gov.pl
info.pl
waw.pl
// eg
com.eg
net.eg
org.eg
edu.eg
gov.eg
sci.eg
// sa
com.sa
net.sa
org.sa
edu.sa
gov.sa
med.sa
sch.sa
// ae
co.ae
net.ae
org.ae
sch.ae
ac.ae
gov.ae
mil.ae
// ng
com.ng
net.ng
org.ng
edu.ng
gov.ng
i.ng
// ke
co.ke
or.ke
ne.ke
go.ke
ac.ke
sc.ke
me.ke
info.ke
// gr
com.gr
net.gr
org.gr
edu.gr
gov.gr
// pt
com.pt
net.pt
org.pt
edu.pt
gov.pt
int.pt
publ.pt
// co (Colombia)
com.co
net.co
org.co
edu.co
gov.co
mil.co
nom.co
// cl / pe / uy / ec / bo / py / ve
gob.cl
gov.cl
mil.cl
com.pe
net.pe
org.pe
edu.pe
gob.pe
mil.pe
com.uy
net.uy
org.uy
edu.uy
gub.uy
mil.uy
com.ec
net.ec
org.ec
edu.ec
gob.ec
mil.ec
com.bo
net.bo
org.bo
edu.bo
gob.bo
mil.bo
com.py
net.py
org.py
edu.py
gov.py
mil.py
com.ve
net.ve
org.ve
edu.ve
gob.ve
mil.ve
// ca (provinces)
ab.ca
bc.ca
mb.ca
nb.ca
nf.ca
nl.ca
ns.ca
nt.ca
nu.ca
on.ca
pe.ca
qc.ca
sk.ca
yk.ca
gc.ca
// ru / by / kz
com.ru
net.ru
org.ru
gov.ru
int.ru
mil.ru
edu.ru
ac.ru
com.by
gov.by
mil.by
of.by
com.kz
net.kz
org.kz
edu.kz
gov.kz
mil.kz
// wildcard-only ccTLDs
*.bd
*.ck
!www.ck
*.er
*.fk
*.jm
*.kh
*.mm
*.np
*.pg
// ===== PRIVATE DOMAINS (partial vendored snapshot) =====
github.io
githubusercontent.com
gitlab.io
blogspot.com
blogspot.co.uk
blogspot.com.au
blogspot.com.br
blogspot.de
blogspot.fr
blogspot.in
blogspot.jp
blogspot.mx
appspot.com
herokuapp.com
netlify.app
vercel.app
azurewebsites.net
cloudfront.net
firebaseapp.com
web.app
pages.dev
workers.dev
glitch.me
readthedocs.io
onrender.com
surge.sh
neocities.org
fly.dev
deno.dev
ngrok.io
repl.co
wordpress.com
wixsite.com
*.compute.amazonaws.com
*.compute-1.amazonaws.com
*.elb.amazonaws.com
"""


def parse_psl(
    text: str,
) -> tuple[dict[int, tuple[str, ...]], dict[int, tuple[str, ...]], dict[int, tuple[str, ...]]]:
    """Parse PSL-format text into ``(exact, wildcard, exception)`` rule sets,
    each a ``{label_depth: sorted tuple of rules}`` dict. Wildcard rules are
    keyed/stored by their BASE (``*.kobe.jp`` -> ``kobe.jp`` at depth 2);
    exception rules by their full labels without the ``!``."""
    exact: dict[int, set[str]] = {}
    wild: dict[int, set[str]] = {}
    exc: dict[int, set[str]] = {}
    for raw in text.splitlines():
        line = raw.strip().lower()
        if not line or line.startswith("//"):
            continue
        if line.startswith("!"):
            rule = line[1:]
            exc.setdefault(rule.count(".") + 1, set()).add(rule)
        elif line.startswith("*."):
            base = line[2:]
            wild.setdefault(base.count(".") + 1, set()).add(base)
        else:
            exact.setdefault(line.count(".") + 1, set()).add(line)
    srt = lambda d: {k: tuple(sorted(v)) for k, v in sorted(d.items())}
    return srt(exact), srt(wild), srt(exc)


PSL_EXACT, PSL_WILDCARD, PSL_EXCEPTIONS = parse_psl(PSL_SNAPSHOT)

#: deepest public suffix any vendored rule can produce (wildcard base depth
#: + 1 for the wildcard label); bounds the CASE the compilers emit
MAX_SUFFIX_DEPTH = max(
    max(PSL_EXACT, default=1), max((d + 1 for d in PSL_WILDCARD), default=1)
)

_IPV4_RE = r"^[0-9]+(\.[0-9]+){3}$"


def registered_domain_expr(host: Column) -> Column:
    """Registered (registrable) domain of a lowercased host under the
    vendored PSL snapshot -- ONE codegen'd CASE over label-slice membership
    tests; NULL host -> NULL. See module docstring for the deviations."""
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def lastk(k: int) -> Column:
        return F.array_join(F.slice(labels, -k, k), ".")

    out = F.when(host.isNull(), F.lit(None).cast("string")).when(
        host.rlike(_IPV4_RE) | (n <= 1), host
    )
    # exception rules prevail over every other matching rule: the matched
    # labels ARE the registered domain (suffix = exception minus one label)
    for d in sorted(PSL_EXCEPTIONS, reverse=True):
        out = out.when((n >= d) & lastk(d).isin(*PSL_EXCEPTIONS[d]), lastk(d))
    # longest matching rule wins: walk suffix depths downward; a depth-k
    # suffix comes from an exact depth-k rule or a wildcard with a depth-
    # (k-1) base. n == k (host IS the suffix) returns the host (deviation).
    for k in range(MAX_SUFFIX_DEPTH, 1, -1):
        conds = []
        if k in PSL_EXACT:
            conds.append(lastk(k).isin(*PSL_EXACT[k]))
        if (k - 1) in PSL_WILDCARD:
            conds.append(lastk(k - 1).isin(*PSL_WILDCARD[k - 1]))
        if not conds:
            continue
        hit = conds[0]
        for c in conds[1:]:
            hit = hit | c
        out = out.when((n > k) & hit, lastk(k + 1)).when((n == k) & hit, host)
    # implicit '*' rule: last label is the suffix, registered = last two
    return out.otherwise(lastk(2))


def _sql_list(rules: tuple[str, ...]) -> str:
    return "[" + ",".join(f"'{r}'" for r in rules) + "]"


def registered_domain_sql(host: str) -> str:
    """DuckDB replay of ``registered_domain_expr`` over the SQL expression
    ``host`` -- generated from the SAME parsed rule sets so the two engines
    cannot drift. Returns a CASE expression (NULL host propagates)."""
    lab = f"string_split({host}, '.')"
    n = f"len({lab})"

    def lastk(k: int) -> str:
        return f"array_to_string({lab}[-{k}:], '.')"

    branches: list[str] = [
        f"WHEN regexp_matches({host}, '^[0-9]+(\\.[0-9]+){{3}}$') "
        f"OR {n} <= 1 THEN {host}"
    ]
    for d in sorted(PSL_EXCEPTIONS, reverse=True):
        branches.append(
            f"WHEN {n} >= {d} AND list_contains({_sql_list(PSL_EXCEPTIONS[d])}, "
            f"{lastk(d)}) THEN {lastk(d)}"
        )
    for k in range(MAX_SUFFIX_DEPTH, 1, -1):
        conds = []
        if k in PSL_EXACT:
            conds.append(f"list_contains({_sql_list(PSL_EXACT[k])}, {lastk(k)})")
        if (k - 1) in PSL_WILDCARD:
            conds.append(
                f"list_contains({_sql_list(PSL_WILDCARD[k - 1])}, {lastk(k - 1)})"
            )
        if not conds:
            continue
        hit = "(" + " OR ".join(conds) + ")"
        branches.append(f"WHEN {n} > {k} AND {hit} THEN {lastk(k + 1)}")
        branches.append(f"WHEN {n} = {k} AND {hit} THEN {host}")
    branches.append(f"ELSE {lastk(2)}")
    return "CASE " + " ".join(branches) + " END"


def registered_domain_py(host: str | None) -> str | None:
    """Scalar python reference of the same algorithm (third engine for the
    fuzz tests) -- independent control flow, same parsed rule sets."""
    if host is None:
        return None
    import re

    labels = host.split(".")
    n = len(labels)
    if re.match(_IPV4_RE, host) or n <= 1:
        return host
    for d in sorted(PSL_EXCEPTIONS, reverse=True):
        if n >= d and ".".join(labels[-d:]) in PSL_EXCEPTIONS[d]:
            return ".".join(labels[-d:])
    for k in range(MAX_SUFFIX_DEPTH, 1, -1):
        hit = (k in PSL_EXACT and ".".join(labels[-k:]) in PSL_EXACT[k]) or (
            (k - 1) in PSL_WILDCARD and ".".join(labels[-(k - 1):]) in PSL_WILDCARD[k - 1]
        )
        if n > k and hit:
            return ".".join(labels[-(k + 1):])
        if n == k and hit:
            return host
    return ".".join(labels[-2:])
