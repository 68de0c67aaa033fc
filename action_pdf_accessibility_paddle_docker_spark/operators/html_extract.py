"""HTML main-content extraction (boilerplate strip) via DOM heuristics.

Semantics aligned with the reference's artifact-flag rules: regions of kind
header / footer / aside / nav (and link-dense navigation blocks) are flagged
``artifact`` and excluded from main content, exactly as the reference flags
header/footer/aside_text/seal/number regions as artifacts and PDF consumers
drop them (/root/reference/src/template_json.py:255-258,287-294,315-322,
328-332,348-350). Scoring uses the classic text-density / link-density /
tag-depth triple (north_star axes).

Pure-Python and dependency-free; called from both the oracle and the Spark
``mapInArrow`` kernel (it is a scalar library function, like latex2mathml in
the reference).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

# Subtrees that are structural boilerplate; maps to the reference artifact
# labels (header -> header, footer -> footer, aside/nav -> aside_text).
_ARTIFACT_CONTAINERS = {
    "header": "header",
    "footer": "footer",
    "nav": "aside_text",
    "aside": "aside_text",
}
_SKIP_ENTIRELY = {"script", "style", "noscript", "template", "svg"}
_BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "body", "li", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "figcaption",
    "title",
}
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}

# Keep rule (applied to non-artifact leaf blocks):
MIN_WORDS = 5          # short crumbs are boilerplate
MAX_LINK_DENSITY = 0.4  # link chars / text chars
MAX_FRAGMENT_DEPTH = 12  # tag-depth scoring: deeper than this, short text
MIN_DEEP_CHARS = 60      # fragments are widget/boilerplate debris


@dataclass(slots=True)
class HtmlBlock:
    label: str            # text | paragraph_title | doc_title | header | footer | aside_text
    text: str
    depth: int
    n_links: int = 0
    link_chars: int = 0
    n_tags: int = 1
    artifact: bool = False
    heading: str | None = None
    parts: list[str] = field(default_factory=list)

    @property
    def text_chars(self) -> int:
        return len(self.text)

    @property
    def link_density(self) -> float:
        return self.link_chars / self.text_chars if self.text_chars else 0.0

    @property
    def text_density(self) -> float:
        return self.text_chars / max(1, self.n_tags)


_WS_RE = re.compile(r"\s+")


def _norm(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


class _BlockParser(HTMLParser):
    """Collect leaf-ish text blocks with per-block link/tag stats."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[HtmlBlock] = []
        self._stack: list[str] = []
        self._artifact_depth = 0
        self._artifact_label: list[str] = []
        self._skip_depth = 0
        self._open: list[HtmlBlock] = []
        self._link_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        self._stack.append(tag)
        if tag in _SKIP_ENTIRELY:
            self._skip_depth += 1
            return
        if tag in _ARTIFACT_CONTAINERS:
            self._artifact_depth += 1
            self._artifact_label.append(_ARTIFACT_CONTAINERS[tag])
        if tag == "a":
            self._link_depth += 1
        for b in self._open:
            b.n_tags += 1
        if tag in _BLOCK_TAGS:
            label = "text"
            heading = None
            if tag in _HEADING_TAGS:
                label = "paragraph_title"
                heading = tag if tag == "h1" else "h1"
            elif tag == "title":
                label = "doc_title"
            if self._artifact_depth:
                label = self._artifact_label[-1]
            self._open.append(
                HtmlBlock(
                    label=label,
                    text="",
                    depth=len(self._stack),
                    artifact=self._artifact_depth > 0,
                    heading=heading if label == "paragraph_title" else None,
                )
            )

    def handle_endtag(self, tag: str) -> None:
        # fast path: well-nested close (almost always) avoids the O(depth)
        # membership scan per end tag
        if self._stack and self._stack[-1] == tag:
            self._pop_one(tag)
            self._stack.pop()
            return
        # pop stack down to the matching open tag (tolerant of bad nesting)
        if tag in self._stack:
            while self._stack and self._stack[-1] != tag:
                self._pop_one(self._stack[-1])
                self._stack.pop()
            if self._stack:
                self._pop_one(tag)
                self._stack.pop()

    def _pop_one(self, tag: str) -> None:
        if tag in _SKIP_ENTIRELY:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _ARTIFACT_CONTAINERS and self._artifact_depth:
            self._artifact_depth -= 1
            self._artifact_label.pop()
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS and self._open:
            block = self._open.pop()
            block.text = _norm(" ".join(block.parts))
            # only keep blocks that directly held text (leaf blocks); a parent
            # containing only child blocks contributes nothing itself
            if block.text:
                self.blocks.append(block)

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        txt = data
        if not txt or txt.isspace():
            return
        if self._open:
            b = self._open[-1]
            b.parts.append(txt)
            if self._link_depth:
                b.link_chars += len(_norm(txt))
                b.n_links += 1


def parse_blocks_stdlib(html: str) -> list[HtmlBlock]:
    """Parse an HTML document into scored leaf blocks in document order,
    via the stdlib HTMLParser. Kept as the slow-but-battle-tested twin of
    ``parse_blocks`` (tests assert equality on the supported doc family)."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    # close any dangling blocks
    while p._open:
        block = p._open.pop()
        block.text = _norm(" ".join(block.parts))
        if block.text:
            p.blocks.append(block)
    return p.blocks


# fast tokenizer: comments / doctype / tags / text runs in one pass
_TOKEN = re.compile(r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<![^>]*>|<[^>]*>|[^<]+", re.DOTALL)
_TAGNAME = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")


def parse_blocks(html: str) -> list[HtmlBlock]:
    """Fast single-pass regex tokenizer feeding the same block events as the
    stdlib parser (the stdlib HTMLParser costs ~35% of the whole extraction
    kernel; this path is ~5x faster). Entities decoded on text nodes only;
    attributes are irrelevant to the block heuristics and skipped."""
    import html as html_mod

    p = _BlockParser()
    raw_until: str | None = None  # CDATA mode: inside <script>/<style>,
    # everything is raw text until the exact close tag (stdlib semantics --
    # an unclosed <script> swallows the rest of the document)
    for m in _TOKEN.finditer(html):
        tok = m.group(0)
        c0 = tok[0]
        if c0 != "<":
            if p._skip_depth or not p._open:
                continue  # dropped by handle_data anyway; skip the unescape
            text = html_mod.unescape(tok) if ("&" in tok) else tok
            p.handle_data(text)
            continue
        if raw_until is not None:
            if tok[1:2] == "/":
                tm = _TAGNAME.match(tok)
                if tm is not None and tm.group(1).lower() == raw_until:
                    p.handle_endtag(raw_until)
                    raw_until = None
            continue  # tag-shaped content inside script/style is raw text
        if tok.startswith("<!"):
            continue  # comment / doctype / cdata
        if tok.startswith("<?"):
            continue
        tm = _TAGNAME.match(tok)
        if tm is None:
            continue  # stray '<' junk
        tag = tm.group(1).lower()
        if tok[1] == "/":
            p.handle_endtag(tag)
        else:
            p.handle_starttag(tag, [])
            if tok.endswith("/>") and tag not in _BLOCK_TAGS:
                # self-closing void inline tag: close immediately
                p.handle_endtag(tag)
            elif tag in ("script", "style") and not tok.endswith("/>"):
                raw_until = tag
    # close any dangling blocks
    while p._open:
        block = p._open.pop()
        block.text = _norm(" ".join(block.parts))
        if block.text:
            p.blocks.append(block)
    return p.blocks


def classify_block(block: HtmlBlock) -> bool:
    """True -> main content; False -> boilerplate (artifact)."""
    if block.artifact:
        return False
    if block.label in ("paragraph_title", "doc_title"):
        return bool(block.text)
    words = block.text.count(" ") + 1 if block.text else 0
    if words < MIN_WORDS:
        return False
    if block.link_density > MAX_LINK_DENSITY:
        return False
    # tag-depth scoring: a short text fragment buried deep in the DOM is
    # widget/boilerplate debris even when it is not link-dense
    if block.depth > MAX_FRAGMENT_DEPTH and block.text_chars < MIN_DEEP_CHARS:
        return False
    return True


def extract_html(html: str) -> tuple[str, list[dict]]:
    """Extract main-content text + region dicts from an HTML document.

    Returns (text, regions); regions carry label/flags/kept info in document
    order. Main text is kept blocks joined by newline.
    """
    blocks = parse_blocks(html)
    regions: list[dict] = []
    kept_texts: list[str] = []
    for i, b in enumerate(blocks):
        keep = classify_block(b)
        flag_bits = []
        if not keep:
            flag_bits.append("artifact")
        flag_bits.append("no_join|no_split")
        regions.append(
            {
                "ordinal": i,
                "label": b.label if (b.artifact or keep) else "aside_text",
                "text": b.text,
                "flags": "|".join(flag_bits),
                "heading": b.heading,
                "depth": b.depth,
                "link_density": round(b.link_density, 6),
                "text_density": round(b.text_density, 6),
                "kept": keep,
            }
        )
        if keep:
            kept_texts.append(b.text)
    return "\n".join(kept_texts), regions
