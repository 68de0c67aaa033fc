"""Scalar reference-semantics kernels (oracle side).

Each function re-states, in plain Python, the exact behavior of the cited
reference code (/root/reference). Quirks are preserved deliberately; see
SURVEY.md section 2.9. This module must stay dependency-free (no numpy) so it
is an independent implementation from the vectorized Spark kernels in
``operators/kernels.py``.
"""

from __future__ import annotations

import math
from typing import Any

from ..config import (
    KPDE_IMAGE,
    LINE_CLUSTER_TOLERANCE_PX,
    NMS_CONTAIN_HI_PCT,
    NMS_CONTAIN_LO_PCT,
    NMS_SMALL_OVERLAP_PCT,
    READING_ORDER_X_CAP,
)

Box = dict[str, Any]


# ---------------------------------------------------------------------------
# Overlap predicate + percentages (src/process_bboxes.py:1-20,121-176)
# ---------------------------------------------------------------------------

def bboxes_overlap(c1: list[float], c2: list[float]) -> bool:
    """Strict-inequality overlap test: boxes sharing an edge DO overlap
    (reference src/process_bboxes.py:15-20 uses < / > not <= / >=)."""
    x_min_1, y_min_1, x_max_1, y_max_1 = c1
    x_min_2, y_min_2, x_max_2, y_max_2 = c2
    return not (
        x_max_1 < x_min_2
        or x_min_1 > x_max_2
        or y_max_1 < y_min_2
        or y_min_1 > y_max_2
    )


def overlap_percentages(c1: list[float], c2: list[float]) -> tuple[float, float]:
    """Intersection area as a percent of each box's own area
    (src/process_bboxes.py:121-176); 0 when a box has zero area."""

    def area(c: list[float]) -> float:
        return max(0, c[2] - c[0]) * max(0, c[3] - c[1])

    x_overlap = max(0, min(c1[2], c2[2]) - max(c1[0], c2[0]))
    y_overlap = max(0, min(c1[3], c2[3]) - max(c1[1], c2[1]))
    inter = x_overlap * y_overlap
    a1, a2 = area(c1), area(c2)
    return (inter / a1 * 100 if a1 > 0 else 0, inter / a2 * 100 if a2 > 0 else 0)


def is_special_case_of_overlap(c1: list[float], c2: list[float]) -> bool:
    """Overlaps ignored by NMS (src/process_bboxes.py:94-119):
    - both overlap fractions < 50% -> ignore;
    - containment case (one > 95%, other < 75%) *would* spare
      formula-inside-text, but ``_is_formula_inside_text`` unconditionally
      returns False (src/process_bboxes.py:189-190, TODO PVQ-4049), so the
      containment branch never ignores. Preserved."""
    overlap_1, overlap_2 = overlap_percentages(c1, c2)
    if overlap_1 < NMS_SMALL_OVERLAP_PCT and overlap_2 < NMS_SMALL_OVERLAP_PCT:
        return True
    if (overlap_1 > NMS_CONTAIN_HI_PCT and overlap_2 < NMS_CONTAIN_LO_PCT) or (
        overlap_2 > NMS_CONTAIN_HI_PCT and overlap_1 < NMS_CONTAIN_LO_PCT
    ):
        if False:  # _is_formula_inside_text disabled in reference
            return True
    return False


# ---------------------------------------------------------------------------
# NMS over the overlap graph (src/process_bboxes.py:38-389)
# ---------------------------------------------------------------------------

def find_overlap_pairs(boxes: list[Box]) -> list[tuple[int, int]]:
    """All-pairs (i < j) overlapping and not special-cased
    (src/process_bboxes.py:59-79)."""
    pairs: list[tuple[int, int]] = []
    n = len(boxes)
    for i in range(n):
        ci = boxes[i]["coordinate"]
        for j in range(i + 1, n):
            cj = boxes[j]["coordinate"]
            if bboxes_overlap(ci, cj) and not is_special_case_of_overlap(ci, cj):
                pairs.append((i, j))
    return pairs


def group_overlaps(pairs: list[tuple[int, int]]) -> list[set[int]]:
    """Overlap groups exactly as the reference builds them
    (src/process_bboxes.py:225-282): grow a group per member from its DIRECT
    neighbours (first group containing the member wins), then merge groups in
    a SINGLE forward pass (no fixpoint). Deliberately NOT connected
    components: when a later merge enlarges a group after an earlier group
    was already scanned past, the result can contain NON-disjoint groups, and
    NMS then unions the per-group removals -- e.g. 6 boxes with adjacency
    (0-4)(2-4)(2-3)(3-5)(1-5) and scores [.1,.9,.1,.7,.2,.8] keep {1,4} here
    but {1,3,4} under true CC (pinned in tests/test_kernels.py).

    Membership iteration is ascending index: the reference iterates a CPython
    set of small ints, which iterates in value order whenever the ints are
    smaller than the hash-table size -- always true for per-page box-index
    sets (load factor < 1 guarantees table size > n > max index)."""
    members = sorted({i for pair in pairs for i in pair})
    groups: list[set[int]] = []
    for box_index in members:
        gi = next((i for i, g in enumerate(groups) if box_index in g), -1)
        group = groups[gi] if gi >= 0 else set()
        for a, b in pairs:
            if box_index == a:
                group.add(b)
            if box_index == b:
                group.add(a)
        if gi < 0:
            groups.append(group)
    # Single forward merge pass (src/process_bboxes.py:257-271): a group that
    # was checked before g1 grew is NOT re-checked -- no fixpoint, preserved.
    dropped: set[int] = set()
    unique: list[set[int]] = []
    for i1 in range(len(groups)):
        if i1 in dropped:
            continue
        g1 = groups[i1]
        for i2 in range(i1 + 1, len(groups)):
            if i2 in dropped:
                continue
            if g1.intersection(groups[i2]):
                g1 = g1.union(groups[i2])
                dropped.add(i2)
        unique.append(g1)
    return unique


def nms_removals(boxes: list[Box]) -> set[int]:
    """Greedy max-score NMS per overlap group (src/process_bboxes.py:304-368):
    repeatedly take the highest-score member (ties -> smallest index, matching
    CPython small-int set iteration in practice), remove its direct
    neighbours, keep the rest for the next round. Groups may be NON-disjoint
    (see group_overlaps); removals union across groups, so a box kept in one
    group can still be removed via another -- reference behavior."""
    pairs = find_overlap_pairs(boxes)
    pairset = set(pairs)
    removed: set[int] = set()
    for group in group_overlaps(pairs):
        pending = set(group)
        while pending:
            best = max(sorted(pending), key=lambda i: float(boxes[i]["score"]))
            nxt: set[int] = set()
            for member in pending:
                if member == best:
                    continue
                if (best, member) in pairset or (member, best) in pairset:
                    removed.add(member)
                else:
                    nxt.add(member)
            pending = nxt
    return removed


def process_bboxes(boxes: list[Box]) -> list[Box]:
    """End-to-end NMS filter preserving input order
    (src/process_bboxes.py:38-57)."""
    removing = nms_removals(boxes)
    return [b for i, b in enumerate(boxes) if i not in removing]


# ---------------------------------------------------------------------------
# Table grid inference (src/process_table.py)
# ---------------------------------------------------------------------------

def create_lines(cell_boxes: list[list[float]], min_index: int, max_index: int) -> list[int]:
    """Collect rounded distinct edges (src/process_table.py:142-164)."""
    lines: list[int] = []
    for c in cell_boxes:
        lo = round(c[min_index])
        hi = round(c[max_index])
        if lo not in lines:
            lines.append(lo)
        if hi not in lines:
            lines.append(hi)
    return lines


def clean_lines(lines: list[int]) -> list[int]:
    """Sort; drop lines within 2 px of the previous (strict ``> 2`` keeps a
    gap of 3, merges a gap of 2; src/process_table.py:166-186). Note the
    reference advances ``previous_line`` even for dropped lines."""
    lines = sorted(lines)
    previous = -10
    out: list[int] = []
    for line in lines:
        if line - previous > LINE_CLUSTER_TOLERANCE_PX:
            out.append(line)
        previous = line
    return out


def find_line_index(target: int, lines: list[int]) -> int:
    """Nearest line by absolute distance, first win on ties
    (src/process_table.py:210-221)."""
    return min(range(len(lines)), key=lambda i: abs(lines[i] - target))


def indexes_position_span(lo: int, hi: int, lines: list[int]) -> tuple[int, int, int, int]:
    """(min_index, max_index, position = min_index+1, span = max-min);
    src/process_table.py:188-208."""
    min_idx = find_line_index(lo, lines)
    max_idx = find_line_index(hi, lines)
    return min_idx, max_idx, min_idx + 1, max_idx - min_idx


def table_grid(cell_results: list[Box], table_coordinate: list[float]) -> dict[str, Any]:
    """Full table post-processing (src/process_table.py:11-122): grid lines,
    per-cell position/span, grid-snapped bboxes, dense row-major fill with
    last-writer-wins on (row, col) collisions (quirk 9)."""
    if not cell_results:
        return {"rows": 0, "columns": 0, "cells": []}

    coords = [c["coordinate"] for c in cell_results]
    row_lines = clean_lines(create_lines(coords, 1, 3))
    column_lines = clean_lines(create_lines(coords, 0, 2))
    number_rows = len(row_lines) - 1
    number_columns = len(column_lines) - 1
    table_min_x, table_min_y = table_coordinate[0], table_coordinate[1]

    cells: list[dict[str, Any]] = []
    for cell in cell_results:
        min_x, min_y, max_x, max_y = cell["coordinate"]
        r_min, r_max, row_number, row_span = indexes_position_span(int(min_y), int(max_y), row_lines)
        c_min, c_max, col_number, col_span = indexes_position_span(int(min_x), int(max_x), column_lines)
        box = [column_lines[c_min], row_lines[r_min], column_lines[c_max], row_lines[r_max]]
        cells.append(
            {
                "row": row_number,
                "column": col_number,
                "row_span": row_span,
                "column_span": col_span,
                "box": box,
                "bbox": [table_min_x + box[0], table_min_y + box[1], table_min_x + box[2], table_min_y + box[3]],
                "text": cell.get("text", ""),
            }
        )

    # Dense fill + flatten row-major (src/process_table.py:85-122).
    if not cells:
        filled: list[dict[str, Any]] = []
    else:
        grid: list[list[dict[str, Any]]] = [
            [
                {"row": r, "column": c, "row_span": 0, "column_span": 0}
                for c in range(1, number_columns + 1)
            ]
            for r in range(1, number_rows + 1)
        ]
        for cell in cells:
            r_i, c_i = cell["row"] - 1, cell["column"] - 1
            if 0 <= r_i < number_rows and 0 <= c_i < number_columns:
                grid[r_i][c_i] = cell
        filled = [cell for row in grid for cell in row]

    return {"rows": number_rows, "columns": number_columns, "cells": filled}


# ---------------------------------------------------------------------------
# FNV-1a 32-bit id (src/template_json.py:116-144)
# ---------------------------------------------------------------------------

def fnv1a_region_id(page_number: int, type_code: int, coordinate: list[float]) -> int:
    """32-bit FNV-1a over ``f"{page}{type}{int(x0)}{int(y0)}{int(x1)}{int(y1)}"``
    with basis 0x811C9DC5 and prime 0x1000193, masked to 32 bits each step.
    (The reference comments 'never return 0' but does not re-check; we match
    the code, not the comment.)"""
    s = f"{page_number}{type_code}"
    for index in range(4):
        s += str(int(coordinate[index]))
    h = 0x811C9DC5
    for ch in s:
        h ^= ord(ch)
        h = (h * 0x1000193) & 0xFFFFFFFF
    return h


def formula_id(page_number: int, coordinate: list[float]) -> int:
    """Formula ids hash with type = kPdeImage (src/template_json.py:303)."""
    return fnv1a_region_id(page_number, KPDE_IMAGE, coordinate)


# ---------------------------------------------------------------------------
# Coordinate transforms (src/template_json.py:233-239,416-421 + RectToPage)
# ---------------------------------------------------------------------------

def element_bbox_to_page(coordinate: list[float], page_h_px: float, zoom: float) -> list[float]:
    """Element rounding is *outward*: floor(min) / ceil(max) in device px,
    then device->page: x/zoom, y flipped ((H - y)/zoom). Returns
    [left, bottom, right, top] in page points (src/template_json.py:233-239)."""
    left_px = math.floor(coordinate[0])
    top_px = math.floor(coordinate[1])
    right_px = math.ceil(coordinate[2])
    bottom_px = math.ceil(coordinate[3])
    return [
        left_px / zoom,
        (page_h_px - bottom_px) / zoom,
        right_px / zoom,
        (page_h_px - top_px) / zoom,
    ]


def cell_bbox_to_page(bbox: list[float], page_h_px: float, zoom: float) -> list[float]:
    """Cell rounding is *inward*: ceil(min) / floor(max)
    (src/template_json.py:416-420); same device->page transform."""
    left_px = math.ceil(bbox[0])
    top_px = math.ceil(bbox[1])
    right_px = math.floor(bbox[2])
    bottom_px = math.floor(bbox[3])
    return [
        left_px / zoom,
        (page_h_px - bottom_px) / zoom,
        right_px / zoom,
        (page_h_px - top_px) / zoom,
    ]


def number_is_footer(page_bbox_top: float, page_h_px: float) -> bool:
    """'number' regions: footer when the page-space top is below half the
    *device* height (unit mismatch preserved; src/template_json.py:440-453)."""
    return page_bbox_top < page_h_px / 2


# ---------------------------------------------------------------------------
# Reading order (src/template_json.py:194)
# ---------------------------------------------------------------------------

def reading_order_key(page_bbox: list[float]) -> tuple[float, float]:
    """Sort DESC by (top, 1000.0 - left): top-of-page first, ties
    left-to-right; the 1000.0 constant mis-orders x > 1000 — preserved."""
    return (float(page_bbox[3]), READING_ORDER_X_CAP - float(page_bbox[0]))


def sort_reading_order(elements: list[dict[str, Any]]) -> list[dict[str, Any]]:
    return sorted(elements, key=lambda e: reading_order_key(e["bbox"]), reverse=True)
