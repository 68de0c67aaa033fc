"""LaTeX -> MathML conversion (reference: src/ai.py:189-263).

The reference wraps ``latex2mathml.converter.convert`` and returns ``""`` on
any failure (src/ai.py:199-205). That library is a public PyPI package; when
it is importable we use it. In this sandbox it is absent, so we fall back to
a small deterministic converter covering the token subset our synthetic
payload generator emits (identifiers, digits, + - = / ( ), ``^``/``_``
scripts, ``\\frac{}{}``, ``\\sqrt{}``, and a few greek commands). Both the
oracle and the Spark kernel call this same module, exactly as both reference
entry points call the same library.

``add_mathml_metadata`` mirrors src/ai.py:207-263: wrap children in
``<semantics>`` and append two plain-text ``<annotation>`` elements when not
already present.
"""

from __future__ import annotations

import functools as _functools
import re
from xml.etree import ElementTree as ET

try:  # pragma: no cover - exercised only where the library exists
    import latex2mathml.converter as _l2m
except Exception:  # ModuleNotFoundError in this sandbox
    _l2m = None

MATHML_NS = "http://www.w3.org/1998/Math/MathML"

_GREEK = {
    "alpha": "\u03b1", "beta": "\u03b2", "gamma": "\u03b3", "delta": "\u03b4",
    "epsilon": "\u03b5", "theta": "\u03b8", "lambda": "\u03bb", "mu": "\u03bc",
    "pi": "\u03c0", "sigma": "\u03c3", "phi": "\u03c6", "omega": "\u03c9",
}

_TOKEN_RE = re.compile(r"\\[a-zA-Z]+|[0-9]+(?:\.[0-9]+)?|[a-zA-Z]|[+\-=/()*,.]|\^|_|\{|\}|\s+")


def _tokenize(latex: str) -> list[str]:
    pos = 0
    out: list[str] = []
    while pos < len(latex):
        m = _TOKEN_RE.match(latex, pos)
        if m is None:
            raise ValueError(f"unsupported latex at {pos!r}: {latex[pos:]}")
        tok = m.group(0)
        pos = m.end()
        if not tok.isspace():
            out.append(tok)
    return out


def _parse_group(tokens: list[str], i: int) -> tuple[list[ET.Element], int]:
    """Parse one argument: a braced group or a single token."""
    if i < len(tokens) and tokens[i] == "{":
        depth_nodes: list[ET.Element] = []
        i += 1
        while i < len(tokens) and tokens[i] != "}":
            node, i = _parse_token(tokens, i)
            depth_nodes.extend(node)
        if i >= len(tokens):
            raise ValueError("unbalanced brace")
        return depth_nodes, i + 1
    return _parse_token(tokens, i)


def _el(tag: str, text: str | None = None, children: list[ET.Element] | None = None) -> ET.Element:
    e = ET.Element(tag)
    if text is not None:
        e.text = text
    for c in children or []:
        e.append(c)
    return e


def _wrap(nodes: list[ET.Element]) -> ET.Element:
    if len(nodes) == 1:
        return nodes[0]
    return _el("mrow", children=nodes)


def _parse_token(tokens: list[str], i: int) -> tuple[list[ET.Element], int]:
    tok = tokens[i]
    i += 1
    base: ET.Element
    if tok.startswith("\\"):
        name = tok[1:]
        if name == "frac":
            num, i = _parse_group(tokens, i)
            den, i = _parse_group(tokens, i)
            base = _el("mfrac", children=[_wrap(num), _wrap(den)])
        elif name == "sqrt":
            arg, i = _parse_group(tokens, i)
            base = _el("msqrt", children=[_wrap(arg)])
        elif name in _GREEK:
            base = _el("mi", _GREEK[name])
        else:
            raise ValueError(f"unsupported command \\{name}")
    elif tok[0].isdigit():
        base = _el("mn", tok)
    elif tok.isalpha():
        base = _el("mi", tok)
    elif tok in "{}":
        raise ValueError("unexpected brace")
    else:
        base = _el("mo", tok)

    # scripts bind to the preceding base
    while i < len(tokens) and tokens[i] in ("^", "_"):
        kind = tokens[i]
        script, i2 = _parse_group(tokens, i + 1)
        i = i2
        tag = "msup" if kind == "^" else "msub"
        base = _el(tag, children=[base, _wrap(script)])
    return [base], i


def _fallback_convert(latex: str) -> str:
    tokens = _tokenize(latex)
    nodes: list[ET.Element] = []
    i = 0
    while i < len(tokens):
        got, i = _parse_token(tokens, i)
        nodes.extend(got)
    root = _el("math")
    root.set("xmlns", MATHML_NS)
    row = _el("mrow", children=nodes)
    root.append(row)
    return ET.tostring(root, encoding="unicode")


@_functools.lru_cache(maxsize=4096)
def latex_to_mathml(latex: str) -> str:
    """Convert LaTeX to MathML; empty string on any failure
    (matches src/ai.py:189-205 error contract). Pure string->string, so a
    bounded per-worker cache makes repeated formulas free."""
    try:
        if _l2m is not None:
            return _l2m.convert(latex)
        return _fallback_convert(latex)
    except Exception:
        return ""


def add_mathml_metadata(mathml_str: str) -> str:
    """Wrap in <semantics> + two plain-text annotations (src/ai.py:207-263)."""
    try:
        root = ET.fromstring(mathml_str)
    except ET.ParseError:
        return mathml_str
    if root.tag not in (f"{{{MATHML_NS}}}math", "math"):
        return mathml_str

    ns = {"m": MATHML_NS}
    ET.register_namespace("", MATHML_NS)
    prefix = f"{{{MATHML_NS}}}" if root.tag.startswith("{") else ""

    semantics = root.find(f"{prefix}semantics" if prefix else "semantics")
    if semantics is None and prefix:
        semantics = root.find("m:semantics", ns)
    if semantics is None:
        semantics = ET.Element(f"{prefix}semantics")
        for child in list(root):
            semantics.append(child)
            root.remove(child)
        root.append(semantics)

    texts = {ann.text for ann in semantics.iter() if ann.tag.endswith("annotation") and ann.text}
    for note in ("Generated by PaddleX AI", "Converted from LaTeX to MathML using latex2mathml"):
        if note not in texts:
            ann = ET.Element(f"{prefix}annotation")
            ann.text = note
            ann.set("encoding", "text/plain")
            semantics.append(ann)
    return ET.tostring(root, encoding="unicode")
