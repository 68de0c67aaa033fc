"""PDFix tag-template JSON builder -- the reference's K2 output shape.

Reproduces the document template the reference writes
(/root/reference/src/template_json.py):

* document wrapper: metadata + template.element_create (one entry per page)
  + pagemap (``create_json_dict_for_document``, :35-73). The reference
  stamps ``date.today()`` -- non-deterministic, so created/modified and all
  version strings are INJECTED parameters here (SURVEY.md section 1.2).
* per page: ``{"comment": "Page N", "elements": [...], "query":
  {"$and": [{"$page_num": N}]}, "statement": "$if"}`` (:75-98).
* per element: bbox as stringified floats [l, b, r, t], ``comment``
  "label NN%", flag/text_flag/type/tag/heading per the 23-way label arm
  (:219-382), formula ``id`` only when MathML was produced (:301-305),
  tables carry row_num/col_num + nested cell elements with stringified
  cell_row/cell_column/spans and "Cell Pos: [r, c] Span: [rs, cs]"
  comments (:384-426), formulas overlapped by text nest under the text
  element's ``element_template`` (:180-190).

The builder consumes a neutral per-element representation; both the oracle
and the Spark kernel adapt their region structures into it, and tests assert
the two template documents are equal per turn.
"""

from __future__ import annotations

from typing import Any

from ..config import DEFAULT_ELEMENT_MAP, LABEL_ELEMENT_MAP, PDE_TABLE


def _spec_for(label: str) -> dict[str, str | None]:
    return LABEL_ELEMENT_MAP.get(label, DEFAULT_ELEMENT_MAP)


def element_template_dict(
    label: str,
    score: float,
    bbox: list[float],
    flags: str,
    formula_id: int | None,
    row_num: int | None,
    col_num: int | None,
    cells: list[dict[str, Any]] | None,
    nested: list[dict[str, Any]] | None,
) -> dict[str, Any]:
    """One element in reference template shape. ``cells``/``nested`` are
    already-built child template dicts."""
    spec = _spec_for(label)
    el: dict[str, Any] = {
        "bbox": [str(float(b)) for b in bbox],
        "comment": f"{label} {round(score * 100)}%",
    }
    if spec["tag"]:
        el["tag"] = spec["tag"]
    if formula_id is not None:
        el["id"] = str(formula_id)
    if spec["heading"]:
        el["heading"] = spec["heading"]
    el["flag"] = flags
    if spec["text_flag"]:
        el["text_flag"] = spec["text_flag"]
    el["type"] = spec["type"]
    # A table never carries nested children in the current pipeline (only
    # 'text' elements nest formulas); guard so a future caller can't silently
    # drop the cell template by overwriting element_template.
    if cells is not None and nested:
        raise ValueError(
            "element cannot carry both table cells and nested children "
            "(element_template would be overwritten)"
        )
    if label == "table" and cells is not None:
        el["element_template"] = {
            "template": {
                "element_create": [{"elements": cells, "query": {}, "statement": "$if"}],
                "table_update": [{"cell_header": "true", "statement": "$if"}],
            },
        }
        el["row_num"] = row_num
        el["col_num"] = col_num
    if nested:
        el["element_template"] = {
            "template": {
                "element_create": [{"elements": nested, "statement": "$if"}],
            },
        }
    return el


def cell_template_dict(
    row: int, column: int, row_span: int, column_span: int, bbox: list[float] | None
) -> dict[str, Any]:
    cell: dict[str, Any] = {
        "cell_column": str(column),
        "cell_column_span": str(column_span),
        "cell_row": str(row),
        "cell_row_span": str(row_span),
        "comment": f"Cell Pos: [{row}, {column}] Span: [{row_span}, {column_span}]",
        "type": "pde_cell",
    }
    if bbox is not None:
        cell["bbox"] = [str(float(b)) for b in bbox]
    return cell


def page_template_dict(page_number: int, elements: list[dict[str, Any]]) -> dict[str, Any]:
    return {
        "comment": f"Page {page_number}",
        "elements": elements,
        "query": {"$and": [{"$page_num": page_number}]},
        "statement": "$if",
    }


def document_template_dict(
    pages: list[dict[str, Any]],
    model: str = "PP-DocLayout-L",
    zoom: float = 2.0,
    engine_version: str = "0.1.0",
    sdk_version: str = "spark-engine",
    created: str = "1970-01-01",
) -> dict[str, Any]:
    """Document wrapper; all timestamps/versions injected for determinism."""
    image_info = f"transforms in this docker image of version {engine_version}"
    return {
        "metadata": {
            "author": f"Generated using PaddleX AI {engine_version}",
            "created": created,
            "modified": created,
            "notes": (
                f"Created using PaddleX layout model: {model}, PDFix SDK and "
                f"{image_info} with zoom: {zoom}"
            ),
            "sdk_version": sdk_version,
            "version": "1",
        },
        "template": {
            "element_create": pages,
            "pagemap": [
                {
                    "graphic_table_detect": "0",
                    "statement": "$if",
                    "text_table_detect": "0",
                    "label_image_detect": "0",
                    "label_word_detect": "0",
                }
            ],
        },
    }


def template_from_region_rows(
    regions: list[dict[str, Any]],
    mathml_ids: set[int],
    model: str = "PP-DocLayout-L",
    zoom: float = 2.0,
    **doc_kw: Any,
) -> dict[str, Any]:
    """Build the document template from FLATTENED region rows (the engine's
    output schema): top-level elements in emission (reading) order, nested
    formulas attached by parent_region_id, cells attached under their table
    (placeholder cells carry an all-zero bbox -> no bbox key, matching the
    reference's bbox-less placeholders)."""
    by_page: dict[int, list[dict[str, Any]]] = {}
    children: dict[int, list[dict[str, Any]]] = {}
    cellmap: dict[int, list[dict[str, Any]]] = {}

    for r in regions:
        parent = r.get("parent_region_id")
        if r["rtype"] == "pde_cell":
            bbox = r["bbox"]
            has_bbox = any(float(b) != 0.0 for b in bbox)
            cellmap.setdefault(parent, []).append(
                cell_template_dict(
                    r["row_num"], r["col_num"],
                    r.get("row_span", 0) or 0, r.get("col_span", 0) or 0,
                    bbox if has_bbox else None,
                )
            )
        elif parent is not None:  # nested formula
            children.setdefault(parent, []).append(r)
        else:
            by_page.setdefault(int(r["page"]), []).append(r)

    pages = []
    for page_number in sorted(by_page):
        elements = []
        for r in by_page[page_number]:
            nested = [
                element_template_dict(
                    c["label"], c["score"], c["bbox"], c["flags"],
                    c["region_id"] if c["region_id"] in mathml_ids else None,
                    None, None, None, None,
                )
                for c in children.get(r["region_id"], [])
            ]
            cells = cellmap.get(r["region_id"])
            elements.append(
                element_template_dict(
                    r["label"], r["score"], r["bbox"], r["flags"],
                    r["region_id"] if (r["label"] == "formula" and r["region_id"] in mathml_ids) else None,
                    r.get("row_num"), r.get("col_num"),
                    cells if r["rtype"] == PDE_TABLE else None,
                    nested or None,
                )
            )
        pages.append(page_template_dict(page_number, elements))

    return document_template_dict(pages, model=model, zoom=zoom, **doc_kw)
