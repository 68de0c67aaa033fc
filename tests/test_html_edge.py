"""HTML extractor robustness: malformed/hostile markup must not crash and
must behave deterministically."""

from action_pdf_accessibility_paddle_docker_spark.operators.html_extract import (
    extract_html,
    parse_blocks,
)


def test_unclosed_tags():
    text, regions = extract_html(
        "<html><body><p>first paragraph with plenty of words to keep here"
        "<p>second paragraph also has plenty of words to keep around</body></html>"
    )
    assert "first paragraph" in text and "second paragraph" in text


def test_stray_close_tags():
    text, _ = extract_html(
        "</div><html><body></span><article><p>content paragraph with plenty of "
        "words to keep</p></article></aside></body></html>"
    )
    assert text.startswith("content paragraph")


def test_entities_decoded():
    text, _ = extract_html(
        "<html><body><p>salt &amp; pepper &lt;quoted&gt; words keep this line</p></body></html>"
    )
    assert "salt & pepper <quoted>" in text


def test_script_style_dropped_entirely():
    text, _ = extract_html(
        "<html><body><script>var x = 'not content words here at all';</script>"
        "<style>.c { color: red; }</style>"
        "<p>real content paragraph with plenty of words to keep</p></body></html>"
    )
    assert "var x" not in text and "color" not in text
    assert "real content" in text


def test_nested_artifact_containers():
    _, regions = extract_html(
        "<html><body><header><nav><div>nav inside header block</div></nav></header>"
        "<p>body paragraph with plenty of words to keep here</p></body></html>"
    )
    by_text = {r["text"]: r for r in regions}
    nav = by_text["nav inside header block"]
    assert "artifact" in nav["flags"]
    # innermost container label wins
    assert nav["label"] == "aside_text"


def test_empty_and_whitespace_docs():
    assert extract_html("<html></html>") == ("", [])
    assert extract_html("<html><body>   \n\t  </body></html>")[0] == ""


def test_deeply_nested_does_not_blow_up():
    long_para = "deep paragraph with plenty of words to keep " * 3
    doc = "<html><body>" + "<div>" * 200 + f"<p>{long_para}</p>" \
        + "</div>" * 200 + "</body></html>"
    text, _ = extract_html(doc)
    # long text survives any depth; the parse itself must not recurse/blow up
    assert "deep paragraph" in text
    # a SHORT fragment at that depth is tag-depth-scored out
    short = "<html><body>" + "<div>" * 200 + "<p>short deep widget words</p>" + "</div>" * 200 + "</body></html>"
    assert extract_html(short)[0] == ""


def test_attributes_and_comments_ignored():
    text, _ = extract_html(
        '<html><body><!-- hidden comment words --><p class="x" data-y="z">'
        "visible paragraph content with plenty of words to keep</p></body></html>"
    )
    assert "hidden comment" not in text
    assert "visible paragraph" in text


def test_fast_parser_equals_stdlib():
    # the fast regex tokenizer must match the stdlib-HTMLParser twin
    from action_pdf_accessibility_paddle_docker_spark.operators.html_extract import (
        parse_blocks,
        parse_blocks_stdlib,
    )

    docs = [
        "<html><body><p>unclosed<p>second block words here</body></html>",
        "<html><body><p>salt &amp; pepper &lt;q&gt; more words here</p></body></html>",
        "<html><body><script>var x='<p>no</p>';</script><p>yes words</p></body></html>",
        "<html><body><!-- c --><p class='x'>attr &quot;t&quot;</p><br/><p>m</p></body></html>",
        "<!DOCTYPE html><html><head><title>T</title></head><body>"
        "<header><div>h</div></header><nav><a href='/x'>x</a></nav>"
        "<article><h1>H</h1><p>body words enough to keep here today</p></article>"
        "<footer><p>f</p></footer></body></html>",
        # regression (found by the fuzz below): an UNCLOSED <script> swallows
        # the document tail as raw text (stdlib CDATA mode); the fast
        # tokenizer must not keep firing tag events past it
        '<html><body><p id="q">;<script id="q"><br/></body></html>',
        "<html><body><p>kept words here</p><style>.x{}</style>"
        "<script>if (a<b) { document.write('<p>ghost</p>'); }</script></body></html>",
    ]
    for d in docs:
        a = [(b.label, b.text, b.artifact, b.link_chars, b.n_tags, b.depth) for b in parse_blocks(d)]
        b_ = [(b.label, b.text, b.artifact, b.link_chars, b.n_tags, b.depth) for b in parse_blocks_stdlib(d)]
        assert a == b_, d


def test_tag_depth_scoring_drops_deep_fragments():
    from action_pdf_accessibility_paddle_docker_spark.operators.html_extract import (
        extract_html,
    )

    deep_frag = "<div>" * 14 + "<p>tiny deep widget text here ok</p>" + "</div>" * 14
    doc = (
        "<html><body><article><p>normal article paragraph with plenty of words "
        "to keep in the output</p></article>" + deep_frag + "</body></html>"
    )
    text, regions = extract_html(doc)
    assert "normal article paragraph" in text
    assert "tiny deep widget" not in text
    # a LONG paragraph at the same depth survives (depth alone is not fatal)
    long_deep = "<div>" * 14 + "<p>" + ("word " * 30).strip() + "</p>" + "</div>" * 14
    text2, _ = extract_html("<html><body>" + long_deep + "</body></html>")
    assert text2.startswith("word word")


# --------------------------------------------------------------------------
# property fuzz: the fast regex tokenizer must equal the stdlib twin on the
# supported doc family (well-formed-ish HTML: no '>' inside attribute
# values, no bare '<' in text -- everything else goes: misnesting, comments,
# entities, self-closing voids, skip-subtrees, artifact containers)
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_TAGS = ["p", "div", "article", "section", "h1", "h2", "title", "span",
         "a", "b", "li", "nav", "header", "footer", "aside", "script", "style"]
_text = st.text(alphabet="ab c.&;x ", max_size=24)


def _node(children):
    leaf = _text.map(lambda t: t)
    comment = _text.map(lambda t: f"<!-- {t.replace('-', ' ')} -->")
    void = st.sampled_from(["<br/>", "<img src='x'/>", "<hr>"])
    elem = st.tuples(
        st.sampled_from(_TAGS),
        st.lists(children, max_size=3),
        st.booleans(),  # drop the close tag (misnesting)
    ).map(
        lambda t: f"<{t[0]} id=\"q\">" + "".join(t[1]) + (f"</{t[0]}>" if t[2] else "")
    )
    stray_close = st.sampled_from(_TAGS).map(lambda t: f"</{t}>")
    return st.one_of(leaf, comment, void, elem, stray_close)


_doc = st.recursive(_text, _node, max_leaves=20).map(
    lambda body: f"<html><body>{body}</body></html>"
)


@settings(max_examples=300, deadline=None)
@given(_doc)
def test_fast_parser_equals_stdlib_fuzz(doc):
    from action_pdf_accessibility_paddle_docker_spark.operators.html_extract import (
        parse_blocks,
        parse_blocks_stdlib,
    )

    key = lambda bs: [
        (b.label, b.text, b.artifact, b.link_chars, b.n_tags, b.depth, b.heading)
        for b in bs
    ]
    assert key(parse_blocks(doc)) == key(parse_blocks_stdlib(doc))
