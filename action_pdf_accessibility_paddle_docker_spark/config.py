"""Shared constants: the 23-class label set, per-class score thresholds,
label -> element mapping, and payload sentinels.

Semantics derived from the reference (cited as file:line into /root/reference):

* class-id order and default thresholds: ``src/main.py:419-453`` (dict build)
  and ``src/main.py:111-271`` (argparse defaults: 0.3 for paragraph_title,
  formula, header, seal, header_image; 0.5 otherwise), clamped to
  [0.05, 0.95] (``src/main.py:45-57``).
* label -> tag/flags/type/heading mapping: ``src/template_json.py:244-380``.
* 17-class model drops class ids 17-22: ``src/ai.py:46-49``.
"""

from __future__ import annotations

# Class-id order exactly as the reference builds its threshold dictionary
# (src/main.py:419-453).
CLASS_LABELS: tuple[str, ...] = (
    "paragraph_title",  # 0
    "image",            # 1
    "text",             # 2
    "number",           # 3
    "abstract",         # 4
    "content",          # 5
    "figure_title",     # 6
    "formula",          # 7
    "table",            # 8
    "table_title",      # 9
    "reference",        # 10
    "doc_title",        # 11
    "footnote",         # 12
    "header",           # 13
    "algorithm",        # 14
    "footer",           # 15
    "seal",             # 16
    "chart_title",      # 17
    "chart",            # 18
    "formula_number",   # 19
    "header_image",     # 20
    "footer_image",     # 21
    "aside_text",       # 22
)

LABEL_TO_CLASS_ID: dict[str, int] = {lbl: i for i, lbl in enumerate(CLASS_LABELS)}

# argparse defaults, src/main.py:111-271 (already within the [0.05, 0.95]
# clamp of src/main.py:45-57).
DEFAULT_THRESHOLDS: dict[int, float] = {
    i: (0.3 if CLASS_LABELS[i] in ("paragraph_title", "formula", "header", "seal", "header_image") else 0.5)
    for i in range(len(CLASS_LABELS))
}

# Unknown labels (not produced by either reference model) fall back to 0.5.
UNKNOWN_LABEL_THRESHOLD: float = 0.5


def clamp(value: float, min_value: float = 0.05, max_value: float = 0.95) -> float:
    """Clamp threshold; reference src/main.py:45-57."""
    return max(min_value, min(max_value, value))


def effective_thresholds(
    overrides: dict[int, float] | None = None, model: str = "PP-DocLayout-L"
) -> dict[int, float]:
    """Build the per-class threshold dict, clamped, with the 17-class model
    pruning classes 17-22 (reference src/ai.py:46-49, src/main.py:419-453)."""
    th = dict(DEFAULT_THRESHOLDS)
    if overrides:
        for k, v in overrides.items():
            th[k] = clamp(float(v))
    if model == "RT-DETR-H_layout_17cls":
        for key in range(17, 23):
            th.pop(key, None)
    return th


# PDFix element-type string per label (src/template_json.py:244-380).
PDE_TEXT = "pde_text"
PDE_IMAGE = "pde_image"
PDE_TABLE = "pde_table"
PDE_CELL = "pde_cell"

# PDFix SDK numeric element-type code used in the FNV-1a id string for
# formulas (src/template_json.py:303 uses kPdeImage). The exact numeric
# value only needs to be internally consistent between our oracle and our
# Spark kernel; we pin it here.
KPDE_IMAGE = 5

# label -> (tag, flag, text_flag, type, heading); src/template_json.py:244-380.
# flag of "number" is resolved at runtime ("header"/"footer" prefix,
# src/template_json.py:328-332,440-453).
LABEL_ELEMENT_MAP: dict[str, dict[str, str | None]] = {
    "abstract":       {"tag": None,      "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "algorithm":      {"tag": None,      "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "aside_text":     {"tag": None,      "flag": "artifact|no_join|no_split",        "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "chart":          {"tag": None,      "flag": "no_join|no_split",                 "text_flag": None,          "type": PDE_IMAGE, "heading": None},
    "chart_title":    {"tag": "Caption", "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "content":        {"tag": None,      "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "doc_title":      {"tag": "Title",   "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "figure_title":   {"tag": "Caption", "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "footer":         {"tag": None,      "flag": "footer|artifact|no_join|no_split", "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "footer_image":   {"tag": None,      "flag": "footer|artifact|no_join|no_split", "text_flag": None,          "type": PDE_IMAGE, "heading": None},
    "footnote":       {"tag": None,      "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "formula":        {"tag": "Formula", "flag": "no_join|no_split",                 "text_flag": None,          "type": PDE_IMAGE, "heading": None},
    "formula_number": {"tag": None,      "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "header":         {"tag": None,      "flag": "header|artifact|no_join|no_split", "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "header_image":   {"tag": None,      "flag": "header|artifact|no_join|no_split", "text_flag": None,          "type": PDE_IMAGE, "heading": None},
    "image":          {"tag": None,      "flag": "no_join|no_split",                 "text_flag": None,          "type": PDE_IMAGE, "heading": None},
    "number":         {"tag": None,      "flag": "{hf}|artifact|no_join|no_split",   "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "paragraph_title": {"tag": None,     "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": "h1"},
    "reference":      {"tag": None,      "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "seal":           {"tag": None,      "flag": "artifact|no_join|no_split",        "text_flag": None,          "type": PDE_IMAGE, "heading": None},
    "table":          {"tag": None,      "flag": "no_join|no_split",                 "text_flag": None,          "type": PDE_TABLE, "heading": None},
    "table_title":    {"tag": "Caption", "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
    "text":           {"tag": None,      "flag": "no_join|no_split",                 "text_flag": "no_new_line", "type": PDE_TEXT,  "heading": None},
}

# The catch-all `case _:` arm (src/template_json.py:377-380).
DEFAULT_ELEMENT_MAP: dict[str, str | None] = {
    "tag": None, "flag": "no_join|no_split", "text_flag": "no_new_line", "type": PDE_TEXT, "heading": None,
}

# Numeric type code used in region ids (our extension: every region gets an
# FNV id; the reference only ids formulas, src/template_json.py:301-305).
PDE_TYPE_CODE: dict[str, int] = {PDE_TEXT: 1, PDE_IMAGE: KPDE_IMAGE, PDE_TABLE: 10, PDE_CELL: 11}

# NMS special-case thresholds (src/process_bboxes.py:107-119).
NMS_SMALL_OVERLAP_PCT = 50.0
NMS_CONTAIN_HI_PCT = 95.0
NMS_CONTAIN_LO_PCT = 75.0

# Table grid-line clustering tolerance: strictly-greater-than 2 px
# (src/process_table.py:180-184).
LINE_CLUSTER_TOLERANCE_PX = 2

# Reading-order tiebreak constant (src/template_json.py:194).
READING_ORDER_X_CAP = 1000.0

# Payload sentinels (FIXTURES.md section 2).
PDF_PAYLOAD_SENTINEL = "%LAYOUT1%"
HTML_PREFIXES = ("<!doctype html", "<html")

PAYLOAD_KIND_PDF = "pdf"
PAYLOAD_KIND_HTML = "html"
PAYLOAD_KIND_TEXT = "text"
# Raw PDF bytes (a real document, not the structured %LAYOUT1% payload):
# requires the production rasterize+layout-model path (PaddleX seam); the
# stub engine surfaces an explicit error instead of silently treating the
# bytes as plain text.
PAYLOAD_KIND_PDF_BYTES = "pdf_bytes"
PDF_BYTES_MAGIC = "%PDF-"


def classify_payload(text: str) -> str:
    """Route a turn's ``text`` column to an extraction branch
    (reference analog: extension routing, src/main.py:342,384,409-416)."""
    if text is None:
        return PAYLOAD_KIND_TEXT
    if text.startswith(PDF_PAYLOAD_SENTINEL):
        return PAYLOAD_KIND_PDF
    if text.startswith(PDF_BYTES_MAGIC):
        return PAYLOAD_KIND_PDF_BYTES
    stripped = text.lstrip()[:15].lower()
    if stripped.startswith(HTML_PREFIXES):
        return PAYLOAD_KIND_HTML
    return PAYLOAD_KIND_TEXT


ARTIFACT_LABELS: frozenset[str] = frozenset(
    lbl for lbl, m in LABEL_ELEMENT_MAP.items() if "artifact" in (m["flag"] or "")
) | frozenset({"number"})
