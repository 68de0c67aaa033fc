"""Unit tests for the reference-semantics kernels (SURVEY.md section 5.2 item 2).

Every case pins a behavior cited from /root/reference (file:line in the
docstrings of the kernels under test)."""

import numpy as np
import pytest

from action_pdf_accessibility_paddle_docker_spark.oracle import kernels as OK
from action_pdf_accessibility_paddle_docker_spark.operators import kernels as VK


def B(label, score, coord):
    return {"label": label, "score": score, "coordinate": list(map(float, coord))}


# --- overlap predicate (strict inequalities: shared edges DO overlap) -------

def test_shared_edge_overlaps():
    assert OK.bboxes_overlap([0, 0, 10, 10], [10, 0, 20, 10]) is True
    assert OK.bboxes_overlap([0, 0, 10, 10], [10.0001, 0, 20, 10]) is False
    assert OK.bboxes_overlap([0, 0, 10, 10], [0, 10, 10, 20]) is True
    assert OK.bboxes_overlap([0, 0, 10, 10], [11, 11, 20, 20]) is False


def test_overlap_matrix_matches_scalar():
    coords = np.array(
        [[0, 0, 10, 10], [10, 0, 20, 10], [5, 5, 15, 15], [30, 30, 40, 40]], dtype=float
    )
    m = VK.overlap_matrix(coords)
    for i in range(4):
        for j in range(4):
            assert m[i, j] == OK.bboxes_overlap(coords[i].tolist(), coords[j].tolist())


# --- overlap percentages -----------------------------------------------------

def test_overlap_percentages_zero_area():
    assert OK.overlap_percentages([0, 0, 0, 10], [0, 0, 10, 10]) == (0, 0)


def test_overlap_percentages_containment():
    p1, p2 = OK.overlap_percentages([2, 2, 4, 4], [0, 0, 10, 10])
    assert p1 == pytest.approx(100.0)
    assert p2 == pytest.approx(4.0)


# --- NMS special cases (50 / 95 / 75) ---------------------------------------

def test_small_mutual_overlap_ignored():
    # both fractions < 50% -> ignored (kept out of the overlap graph)
    assert OK.is_special_case_of_overlap([0, 0, 10, 10], [5, 5, 15, 15]) is True


def test_exactly_50_not_ignored():
    # 50.0 is NOT < 50.0 -> not a special case
    c1, c2 = [0, 0, 10, 10], [0, 5, 10, 15]  # each overlaps exactly 50%
    assert OK.overlap_percentages(c1, c2) == (50.0, 50.0)
    assert OK.is_special_case_of_overlap(c1, c2) is False


def test_containment_not_ignored_because_formula_check_disabled():
    # quirk 1: _is_formula_inside_text returns False unconditionally
    inner, outer = [2, 2, 4, 4], [0, 0, 10, 10]
    assert OK.is_special_case_of_overlap(inner, outer) is False


def test_nms_pair_keeps_higher_score():
    boxes = [B("text", 0.9, [0, 0, 10, 10]), B("image", 0.7, [1, 1, 9, 9])]
    assert OK.process_bboxes(boxes) == [boxes[0]]
    keep = VK.nms_keep_mask(np.array([b["coordinate"] for b in boxes]), np.array([0.9, 0.7]))
    assert keep.tolist() == [True, False]


def test_nms_formula_inside_text_removed():
    # quirk 1 preserved: the contained formula is deleted by NMS
    boxes = [B("text", 0.9, [0, 0, 100, 100]), B("formula", 0.6, [10, 10, 50, 30])]
    assert OK.process_bboxes(boxes) == [boxes[0]]


def test_nms_transitive_chain_greedy():
    # A(0.95) overlaps B(0.6); B overlaps C(0.8); A does not overlap C.
    # Greedy: A wins, removes B; C survives in the next round.
    boxes = [
        B("text", 0.95, [0, 0, 100, 50]),
        B("image", 0.6, [40, 0, 140, 50]),   # 60% overlap with A and with C
        B("chart", 0.8, [80, 0, 180, 50]),   # only 20% overlap with A -> special-cased
    ]
    coords = np.array([b["coordinate"] for b in boxes])
    scores = np.array([b["score"] for b in boxes])
    # sanity: B-C overlap must be a real (non-special) edge
    assert OK.is_special_case_of_overlap(boxes[1]["coordinate"], boxes[2]["coordinate"]) is False
    out = OK.process_bboxes(boxes)
    assert [b["label"] for b in out] == ["text", "chart"]
    assert VK.nms_keep_mask(coords, scores).tolist() == [True, False, True]


def test_nms_single_merge_pass_non_disjoint_groups():
    """The reference's group build merges in ONE forward pass (no fixpoint,
    src/process_bboxes.py:257-271), so groups can be NON-disjoint and the
    unioned per-group removals differ from true connected components.
    Counterexample: chain 0-4-2-3-5-1 (adjacency pairs (0,4)(2,4)(2,3)(3,5)
    (1,5)), scores [.1,.9,.1,.7,.2,.8] -> reference keeps {1,4}; CC-based
    NMS would keep {1,3,4}. Both oracle and vectorized kernels must match
    the reference."""
    # Boxes of width 100 along a strip; chain-neighbours overlap 60 px (60%
    # mutual, a real edge), next-but-one overlap 20 px (<50% both, special-
    # cased away). Chain order 0,4,2,3,5,1 at x = 0,40,80,120,160,200.
    xs = {0: 0, 4: 40, 2: 80, 3: 120, 5: 160, 1: 200}
    coords = np.array([[xs[i], 0.0, xs[i] + 100.0, 10.0] for i in range(6)])
    scores = np.array([0.1, 0.9, 0.1, 0.7, 0.2, 0.8])
    boxes = [B("text", scores[i], coords[i]) for i in range(6)]

    # group structure itself: non-disjoint (3 and 5 appear in both groups)
    pairs = OK.find_overlap_pairs(boxes)
    assert set(pairs) == {(0, 4), (2, 4), (2, 3), (3, 5), (1, 5)}
    groups = OK.group_overlaps(pairs)
    assert groups == [{0, 2, 3, 4, 5}, {1, 3, 5}]

    kept = [boxes.index(b) for b in OK.process_bboxes(boxes)]
    assert kept == [1, 4]
    assert VK.nms_keep_mask(coords, scores).tolist() == [
        False, True, False, False, True, False,
    ]


def test_nms_tie_breaks_to_smallest_index():
    boxes = [B("text", 0.8, [0, 0, 10, 10]), B("image", 0.8, [0, 0, 10, 10])]
    assert OK.process_bboxes(boxes) == [boxes[0]]
    keep = VK.nms_keep_mask(np.array([b["coordinate"] for b in boxes]), np.array([0.8, 0.8]))
    assert keep.tolist() == [True, False]


# --- table grid --------------------------------------------------------------

def test_line_clustering_strict_gt_2():
    # gap of exactly 2 merges; gap of 3 survives (src/process_table.py:180-184)
    assert OK.clean_lines([0, 2, 4]) == [0]          # chained 2px drops
    assert OK.clean_lines([0, 3]) == [0, 3]
    assert OK.clean_lines([0, 2, 5]) == [0, 5]       # previous advances even when dropped
    got = VK._grid_lines(np.array([0, 2, 4], dtype=float))
    assert got.tolist() == [0]
    assert VK._grid_lines(np.array([0, 2, 5], dtype=float)).tolist() == [0, 5]


def test_span_math():
    lines = [0, 100, 200, 300]
    min_idx, max_idx, pos, span = OK.indexes_position_span(0, 200, lines)
    assert (min_idx, max_idx, pos, span) == (0, 2, 1, 2)


def test_nearest_line_snap_first_tie_wins():
    lines = [0, 10]
    assert OK.find_line_index(5, lines) == 0  # equidistant -> first
    assert VK._nearest_index(np.array([5]), np.array(lines)).tolist() == [0]


def test_table_grid_dense_fill_and_spans():
    # 2x2 grid with a 2-col spanning cell in row 1 and a missing (2,2)
    cells = [
        {"coordinate": [0.0, 0.0, 200.0, 50.0], "text": "span"},
        {"coordinate": [0.0, 50.0, 100.0, 100.0], "text": "a"},
    ]
    got = OK.table_grid(cells, [10.0, 20.0, 210.0, 120.0])
    assert (got["rows"], got["columns"]) == (2, 2)
    assert len(got["cells"]) == 4  # dense
    spanning = got["cells"][0]
    assert (spanning["row"], spanning["column"], spanning["column_span"], spanning["row_span"]) == (1, 1, 2, 1)
    assert spanning["bbox"] == [10.0, 20.0, 210.0, 70.0]
    placeholder = got["cells"][3]
    assert (placeholder["row_span"], placeholder["column_span"]) == (0, 0)
    got_np = VK.table_grid_np(
        np.array([c["coordinate"] for c in cells]), [c["text"] for c in cells],
        np.array([10.0, 20.0, 210.0, 120.0]),
    )
    assert got_np["rows"] == got["rows"] and got_np["columns"] == got["columns"]
    assert [
        (c.get("row"), c.get("column"), c.get("row_span"), c.get("column_span"), c.get("bbox"))
        for c in got_np["cells"]
    ] == [
        (c.get("row"), c.get("column"), c.get("row_span"), c.get("column_span"), c.get("bbox"))
        for c in got["cells"]
    ]


def test_table_grid_empty():
    assert OK.table_grid([], [0, 0, 10, 10]) == {"rows": 0, "columns": 0, "cells": []}
    assert VK.table_grid_np(np.zeros((0, 4)), [], np.array([0, 0, 10, 10]))["cells"] == []


def test_table_grid_collision_last_writer_wins():
    # two detected cells snapping to the same (row, col): input order, last wins
    cells = [
        {"coordinate": [0.0, 0.0, 100.0, 50.0], "text": "first"},
        {"coordinate": [1.0, 1.0, 99.0, 49.0], "text": "second"},
        {"coordinate": [0.0, 50.0, 100.0, 100.0], "text": "other"},
    ]
    got = OK.table_grid(cells, [0.0, 0.0, 100.0, 100.0])
    texts = [c.get("text") for c in got["cells"]]
    assert "second" in texts and "first" not in texts


# --- FNV-1a ------------------------------------------------------------------

def test_fnv1a_known_vectors():
    # canonical 32-bit FNV-1a test vectors
    assert VK.fnv1a32("") == 0x811C9DC5
    assert VK.fnv1a32("a") == 0xE40C292C
    assert VK.fnv1a32("foobar") == 0xBF9CF968


def test_region_id_matches_between_impls():
    for page, code, coord in [(1, 5, [100.7, 40.2, 1100.9, 110.0]), (2, 1, [0, 0, 1, 1])]:
        assert OK.fnv1a_region_id(page, code, coord) == VK.region_id(page, code, coord)


def test_region_id_truncates_coordinates():
    # int() truncation: 100.9 -> "100"
    a = OK.fnv1a_region_id(1, 5, [100.9, 40.0, 1100.0, 110.0])
    b = OK.fnv1a_region_id(1, 5, [100.0, 40.0, 1100.0, 110.0])
    assert a == b


# --- coordinate transforms ---------------------------------------------------

def test_rounding_asymmetry_elements_vs_cells():
    coord = [10.3, 20.7, 99.2, 199.5]
    el = OK.element_bbox_to_page(coord, 1584, 2.0)
    cell = OK.cell_bbox_to_page(coord, 1584, 2.0)
    # element: floor mins (10, 20), ceil maxes (100, 200)
    assert el == [10 / 2, (1584 - 200) / 2, 100 / 2, (1584 - 20) / 2]
    # cell: ceil mins (11, 21), floor maxes (99, 199)
    assert cell == [11 / 2, (1584 - 199) / 2, 99 / 2, (1584 - 21) / 2]
    np_el = VK.element_bboxes_to_page(np.array([coord]), 1584, 2.0)[0].tolist()
    np_cell = VK.cell_bbox_to_page_np(coord, 1584, 2.0)
    assert np_el == el and np_cell == cell


def test_number_header_footer_rule():
    # footer when page-space top < device_height/2 (unit mismatch preserved)
    assert OK.number_is_footer(700.0, 1584) is True
    assert OK.number_is_footer(792.0, 1584) is False


# --- reading order -----------------------------------------------------------

def test_reading_order_top_down_then_left_right():
    els = [
        {"bbox": [50.0, 0.0, 60.0, 700.0]},   # lower on page
        {"bbox": [10.0, 0.0, 20.0, 750.0]},   # top, left
        {"bbox": [500.0, 0.0, 510.0, 750.0]},  # top, right
    ]
    got = OK.sort_reading_order(els)
    assert [e["bbox"][0] for e in got] == [10.0, 500.0, 50.0]
    idx = VK.reading_order_np(np.array([e["bbox"] for e in els]))
    assert idx.tolist() == [1, 2, 0]


def test_reading_order_x_cap_anomaly():
    # x > 1000 makes (1000 - x) negative: a box at x=1100 sorts AFTER one at
    # x=900 on the same line -- but the anomaly is that it also sorts after
    # any x < 1000 regardless of magnitude; preserved bit-for-bit.
    els = [{"bbox": [1100.0, 0.0, 1110.0, 700.0]}, {"bbox": [900.0, 0.0, 910.0, 700.0]}]
    got = OK.sort_reading_order(els)
    assert got[0]["bbox"][0] == 900.0
    assert VK.reading_order_np(np.array([e["bbox"] for e in els])).tolist() == [1, 0]


def test_reading_order_stable_on_full_ties():
    els = [{"bbox": [10.0, 0.0, 20.0, 700.0], "k": i} for i in range(3)]
    got = OK.sort_reading_order(els)
    assert [e["k"] for e in got] == [0, 1, 2]
    assert VK.reading_order_np(np.array([e["bbox"] for e in els])).tolist() == [0, 1, 2]
