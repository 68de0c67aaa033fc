"""Per-turn oracle extraction: the single-process golden implementation.

Mirrors the reference `template` pipeline end-to-end for one turn
(/root/reference/src/create_template.py:66-189 calling src/ai.py ->
src/process_bboxes.py -> src/process_table.py -> src/template_json.py),
with the detector replaced by the deterministic payload parser (the stub
detector of SURVEY.md section 2.7) and text assembly added (the reference
delegates text to the PDFix tag pass; we emit the main-content text column).

The Spark kernel in ``operators/payload.py`` is an independent vectorized
implementation; tests assert per-turn equality against this module.
"""

from __future__ import annotations

import json
from typing import Any

from ..config import (
    DEFAULT_ELEMENT_MAP,
    LABEL_ELEMENT_MAP,
    LABEL_TO_CLASS_ID,
    PAYLOAD_KIND_HTML,
    PAYLOAD_KIND_PDF,
    PDE_TABLE,
    PDE_TEXT,
    PDE_TYPE_CODE,
    PDF_PAYLOAD_SENTINEL,
    UNKNOWN_LABEL_THRESHOLD,
    classify_payload,
    effective_thresholds,
)
from ..functions.mathml import latex_to_mathml
from ..operators.html_extract import extract_html
from . import kernels as K

Region = dict[str, Any]


def _threshold_for(label: str, thresholds: dict[int, float]) -> float:
    cid = LABEL_TO_CLASS_ID.get(label)
    if cid is None:
        return UNKNOWN_LABEL_THRESHOLD
    # classes pruned for the 17-cls model are not filtered at all
    # (reference passes the dict to the detector; a missing key means the
    # model default applies -- our stub admits the box).
    return thresholds.get(cid, 0.0)


def _convert_element(
    box: dict,
    page_number: int,
    page_h_px: float,
    zoom: float,
    formulas: list[tuple[int, str]],
) -> Region:
    """Scalar port of src/template_json.py:219-382 (element conversion)."""
    label = str(box["label"]).lower()
    spec = LABEL_ELEMENT_MAP.get(label, DEFAULT_ELEMENT_MAP)
    page_bbox = K.element_bbox_to_page(box["coordinate"], page_h_px, zoom)

    flag = spec["flag"] or ""
    if label == "number":
        hf = "footer" if K.number_is_footer(page_bbox[3], page_h_px) else "header"
        flag = flag.replace("{hf}", hf)

    el: Region = {
        "label": label,
        "score": float(box["score"]),
        "bbox": page_bbox,
        "tag": spec["tag"],
        "flags": flag,
        "type": spec["type"],
        "heading": spec["heading"],
        "text": box.get("text", "") or "",
        "region_id": K.fnv1a_region_id(
            page_number, PDE_TYPE_CODE[spec["type"] or PDE_TEXT], box["coordinate"]
        ),
        "page": page_number,
        "row_num": None,
        "col_num": None,
        "cells": None,
        "nested": [],
        "formula_id": None,
    }

    if label == "formula" and "custom" in box:
        fid = K.formula_id(page_number, box["coordinate"])
        formulas.append((fid, box["custom"]))
        el["formula_id"] = fid
        el["region_id"] = fid

    if label == "table" and "custom" in box:
        custom = box["custom"]
        cells = []
        for cell in custom["cells"]:
            c: Region = {
                "row": cell["row"],
                "column": cell["column"],
                "row_span": cell["row_span"],
                "column_span": cell["column_span"],
                "text": cell.get("text", "") or "",
            }
            if "bbox" in cell:
                c["bbox"] = K.cell_bbox_to_page(cell["bbox"], page_h_px, zoom)
                c["region_id"] = K.fnv1a_region_id(
                    page_number, PDE_TYPE_CODE["pde_cell"], cell["bbox"]
                )
            else:
                c["bbox"] = [0.0, 0.0, 0.0, 0.0]
                c["region_id"] = K.fnv1a_region_id(
                    page_number, PDE_TYPE_CODE["pde_cell"], [0, 0, 0, 0]
                )
            cells.append(c)
        el["cells"] = cells
        el["row_num"] = custom["rows"]
        el["col_num"] = custom["columns"]

    return el


def _boxes_content_equal(b1: dict, b2: dict) -> bool:
    """The reference skips 'self' in the nesting pass via dict equality
    (src/template_json.py:211-213), so identical-content duplicates are
    mutually skipped. Compare full content."""
    return b1 == b2


def extract_pdf_payload(
    text: str,
    thresholds: dict[int, float],
    process_table: bool = True,
    process_formula: bool = True,
) -> dict[str, Any]:
    payload = json.loads(text[len(PDF_PAYLOAD_SENTINEL):])
    zoom = float(payload.get("zoom", 2.0))
    page_h_px = float(payload.get("page_h", 1584))

    regions_out: list[Region] = []
    formulas: list[tuple[int, str]] = []
    page_texts: list[str] = []
    n_artifacts = 0

    for page in payload.get("pages", []):
        page_number = int(page["page"])
        # stub detector: threshold filter pushed into the "scan"
        # (reference src/ai.py:72-77; thresholds built src/main.py:419-453)
        boxes = [
            b for b in page.get("boxes", [])
            if float(b["score"]) >= _threshold_for(str(b["label"]).lower(), thresholds)
        ]

        # table / formula sub-pipelines attach "custom" (src/ai.py:105-148)
        for box in boxes:
            label = str(box["label"]).lower()
            if label == "table" and process_table and "cells" in box:
                cell_boxes = [
                    {"coordinate": c["coordinate"], "text": c.get("text", "")}
                    for c in box["cells"]
                ]
                box["custom"] = K.table_grid(cell_boxes, box["coordinate"])
            elif label == "formula" and process_formula and "latex" in box:
                mathml = latex_to_mathml(box["latex"])
                if mathml != "":
                    box["custom"] = mathml

        # NMS (src/process_bboxes.py:38-57)
        boxes = K.process_bboxes(boxes)

        # element creation + formula nesting (src/template_json.py:146-196)
        elements: list[Region] = []
        for box in boxes:
            overlaps = [
                b2 for b2 in boxes
                if not _boxes_content_equal(box, b2)
                and K.bboxes_overlap(box["coordinate"], b2["coordinate"])
            ]
            text_overlaps = [o for o in overlaps if str(o["label"]).lower() == "text"]
            if str(box["label"]).lower() == "formula" and text_overlaps:
                continue  # re-emitted nested under the text element
            el = _convert_element(box, page_number, page_h_px, zoom, formulas)
            formula_overlaps = [o for o in overlaps if str(o["label"]).lower() == "formula"]
            if str(box["label"]).lower() == "text" and formula_overlaps:
                el["nested"] = [
                    _convert_element(f, page_number, page_h_px, zoom, formulas)
                    for f in formula_overlaps
                ]
            elements.append(el)

        elements = K.sort_reading_order(elements)
        for rank, el in enumerate(elements, start=1):
            el["reading_rank"] = rank

        # text assembly: artifacts excluded; reading order; tables linearized
        # row-major with tab-joined cells
        contributions: list[str] = []
        for el in elements:
            if "artifact" in el["flags"]:
                n_artifacts += 1
                continue
            if el["type"] == PDE_TEXT:
                if el["text"]:
                    contributions.append(el["text"])
            elif el["type"] == PDE_TABLE and el["cells"] is not None:
                ncols = el["col_num"] or 0
                if ncols > 0:
                    rows: list[str] = []
                    cells = el["cells"]
                    for r0 in range(0, len(cells), ncols):
                        rows.append("\t".join(c["text"] for c in cells[r0:r0 + ncols]))
                    tbl_text = "\n".join(rows)
                    if tbl_text.strip():
                        contributions.append(tbl_text)
            # pde_image (incl. formulas) contributes no text
        page_texts.append("\n".join(contributions))
        regions_out.extend(elements)

    return {
        "extracted_text": "\n".join(t for t in page_texts if t),
        "regions": regions_out,
        "mathml": formulas,
        "n_artifacts": n_artifacts,
        "n_pages": len(payload.get("pages", [])),
    }


def extract_turn(
    text: str,
    thresholds: dict[int, float] | None = None,
    process_table: bool = True,
    process_formula: bool = True,
) -> dict[str, Any]:
    """Oracle extraction for one turn's ``text`` payload."""
    th = thresholds if thresholds is not None else effective_thresholds()
    kind = classify_payload(text)
    if kind == PAYLOAD_KIND_PDF:
        out = extract_pdf_payload(text, th, process_table, process_formula)
        out["payload_kind"] = kind
        return out
    if kind == PAYLOAD_KIND_HTML:
        extracted, regions = extract_html(text)
        return {
            "payload_kind": kind,
            "extracted_text": extracted,
            "regions": regions,
            "mathml": [],
            "n_artifacts": sum(1 for r in regions if not r["kept"]),
            "n_pages": 1,
        }
    return {
        "payload_kind": kind,
        "extracted_text": (text or "").strip(),
        "regions": [],
        "mathml": [],
        "n_artifacts": 0,
        "n_pages": 0,
    }

def flatten_regions(res: dict[str, Any]) -> list[Region]:
    """Flatten the oracle's nested region structure into the engine's
    region-row shape (same fields as plans/extraction.REGION_DDL)."""
    rows: list[Region] = []

    def row(**kw: Any) -> Region:
        base = {
            "page": None, "ordinal": len(rows), "label": None, "score": None,
            "bbox": None, "tag": None, "flags": "", "rtype": None,
            "heading": None, "text": "", "reading_rank": 0, "region_id": None,
            "parent_region_id": None, "row_num": None, "col_num": None,
            "row_span": None, "col_span": None,
        }
        base.update(kw)
        return base

    for el in res.get("regions", []):
        if "type" not in el:  # html block dicts -> region-row shape
            rows.append(row(
                page=1, label=el["label"], score=1.0, bbox=[0.0, 0.0, 0.0, 0.0],
                flags=el["flags"], rtype=PDE_TEXT, heading=el.get("heading"),
                text=el["text"],
                region_id=K.fnv1a_region_id(
                    1, PDE_TYPE_CODE[PDE_TEXT], [el["ordinal"], 0, 0, 0]
                ),
            ))
            continue
        rows.append(row(
            page=el["page"], label=el["label"], score=el["score"], bbox=el["bbox"],
            tag=el["tag"], flags=el["flags"], rtype=el["type"], heading=el["heading"],
            text=el["text"], reading_rank=el["reading_rank"], region_id=el["region_id"],
            row_num=el["row_num"], col_num=el["col_num"],
        ))
        for nested in el["nested"]:
            rows.append(row(
                page=nested["page"], label=nested["label"], score=nested["score"],
                bbox=nested["bbox"], tag=nested["tag"], flags=nested["flags"],
                rtype=nested["type"], heading=nested["heading"], text=nested["text"],
                region_id=nested["region_id"], parent_region_id=el["region_id"],
            ))
        if el["type"] == "pde_table" and el["cells"]:
            for c in el["cells"]:
                rows.append(row(
                    page=el["page"], label="cell", score=el["score"],
                    bbox=c["bbox"], rtype="pde_cell", text=c.get("text", ""),
                    region_id=c["region_id"], parent_region_id=el["region_id"],
                    row_num=c["row"], col_num=c["column"],
                    row_span=c["row_span"], col_span=c["column_span"],
                ))
    return rows


def template_for_turn(res: dict[str, Any], zoom: float = 2.0) -> dict[str, Any]:
    """Reference-shaped tag-template document for one turn (K2 output)."""
    from ..functions.template import template_from_region_rows

    mathml_ids = {fid for fid, _ in res.get("mathml", [])}
    return template_from_region_rows(flatten_regions(res), mathml_ids, zoom=zoom)
