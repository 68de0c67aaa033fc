"""HTML boilerplate-strip heuristics (SURVEY.md phase 2; artifact semantics
aligned with /root/reference/src/template_json.py:287-294,315-322)."""

from action_pdf_accessibility_paddle_docker_spark.operators.html_extract import (
    classify_block,
    extract_html,
    parse_blocks,
)

DOC = (
    "<!DOCTYPE html><html><head><title>Page Title Words</title></head><body>"
    "<header><div>site banner words here</div></header>"
    '<nav><div><a href="/a">alpha</a> <a href="/b">beta</a> <a href="/c">gamma</a></div></nav>'
    "<article><h1>Main Heading</h1>"
    "<p>This is the first main content paragraph with enough words to keep.</p>"
    "<p>Second paragraph of real article text that should also be kept here.</p></article>"
    '<div><ul><li><a href="/x">related link one</a></li><li><a href="/y">related link two</a></li></ul></div>'
    "<aside><p>sidebar promo text that is boilerplate and excluded always</p></aside>"
    "<footer><p>copyright 2026 example corp</p></footer>"
    "</body></html>"
)


def test_extract_html_keeps_article_only():
    text, regions = extract_html(DOC)
    lines = text.split("\n")
    assert "Main Heading" in lines
    assert any(line.startswith("This is the first main content") for line in lines)
    assert any(line.startswith("Second paragraph") for line in lines)
    assert not any("banner" in line for line in lines)
    assert not any("alpha" in line for line in lines)
    assert not any("sidebar" in line for line in lines)
    assert not any("copyright" in line for line in lines)
    assert not any("related link" in line for line in lines)


def test_artifact_labels_match_reference_semantics():
    _, regions = extract_html(DOC)
    by_text = {r["text"]: r for r in regions}
    assert by_text["site banner words here"]["label"] == "header"
    assert "artifact" in by_text["site banner words here"]["flags"]
    assert by_text["copyright 2026 example corp"]["label"] == "footer"
    aside = by_text["sidebar promo text that is boilerplate and excluded always"]
    assert aside["label"] == "aside_text"
    assert "artifact" in aside["flags"]


def test_link_density_rejects_nav_blocks():
    blocks = parse_blocks(
        '<html><body><div><p><a href="/1">one two three four five six</a></p></div></body></html>'
    )
    assert len(blocks) == 1
    assert blocks[0].link_density > 0.9
    assert classify_block(blocks[0]) is False


def test_short_crumbs_rejected():
    blocks = parse_blocks("<html><body><p>ok fine</p></body></html>")
    assert classify_block(blocks[0]) is False


def test_heading_kept_even_when_short():
    text, _ = extract_html("<html><body><article><h2>Tiny Heading</h2>"
                           "<p>body text with plenty of words to keep around</p></article></body></html>")
    assert text.split("\n")[0] == "Tiny Heading"


def test_deterministic():
    assert extract_html(DOC) == extract_html(DOC)
