"""Recursive XY-cut reading order (engine extension beyond the reference's
single-sort approximation)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from action_pdf_accessibility_paddle_docker_spark.operators.xycut import xycut_order


def B(x0, y0, x1, y1):
    return [float(x0), float(y0), float(x1), float(y1)]


def test_two_column_layout_reads_column_major():
    # left column: A(top), B(bottom); right column: C(top), D(bottom).
    # The reference sort would interleave A, C, B, D; XY-cut reads A, B, C, D.
    boxes = np.array([
        B(100, 100, 500, 300),    # A
        B(100, 350, 500, 600),    # B
        B(600, 100, 1000, 300),   # C
        B(600, 350, 1000, 600),   # D
    ])
    # no horizontal gap spans the full width (columns overlap vertically),
    # vertical gap at x ~ 500-600 splits columns
    assert xycut_order(boxes).tolist() == [0, 1, 2, 3]


def test_title_then_columns():
    boxes = np.array([
        B(100, 40, 1000, 100),    # full-width title
        B(100, 150, 500, 600),    # left col
        B(600, 150, 1000, 600),   # right col
    ])
    assert xycut_order(boxes).tolist() == [0, 1, 2]


def test_single_column_falls_back_to_top_left():
    boxes = np.array([
        B(100, 400, 500, 500),
        B(100, 402, 500, 502),   # 2px lower -> after
        B(600, 400, 900, 500),   # same band, right of first
    ])
    got = xycut_order(boxes).tolist()
    assert got[0] == 0 and set(got) == {0, 1, 2}


def test_empty_and_single():
    assert xycut_order(np.zeros((0, 4))).tolist() == []
    assert xycut_order(np.array([B(0, 0, 10, 10)])).tolist() == [0]


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.tuples(st.floats(0, 1000), st.floats(0, 1400), st.floats(5, 300), st.floats(5, 200)),
    max_size=14,
))
def test_permutation_and_determinism(raw):
    boxes = np.array([B(x, y, x + w, y + h) for x, y, w, h in raw]).reshape(len(raw), 4)
    a = xycut_order(boxes)
    b = xycut_order(boxes)
    assert a.tolist() == b.tolist()
    assert sorted(a.tolist()) == list(range(len(raw)))


def test_input_order_invariance():
    boxes = np.array([
        B(100, 40, 1000, 100),
        B(100, 150, 500, 600),
        B(600, 150, 1000, 600),
        B(100, 700, 1000, 800),
    ])
    base = [tuple(boxes[i]) for i in xycut_order(boxes)]
    perm = np.array([boxes[2], boxes[0], boxes[3], boxes[1]])
    got = [tuple(perm[i]) for i in xycut_order(perm)]
    assert got == base
