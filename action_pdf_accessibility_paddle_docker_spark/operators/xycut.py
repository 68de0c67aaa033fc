"""Recursive XY-cut reading order.

The reference approximates reading order with a single sort by
(top DESC, 1000 - left DESC) (/root/reference/src/template_json.py:194);
that mis-orders multi-column layouts (it interleaves columns row by row).
This module adds the classic recursive XY-cut as an engine extension:

  1. find the widest horizontal gap (projection profile valley) across the
     region set; if found, split top-to-bottom and recurse;
  2. otherwise find the widest vertical gap, split left-to-right, recurse;
  3. leaves fall back to the reference's (top, left) sort.

Deterministic, numpy-vectorized, page-local (runs inside the extraction
kernel when ``reading_order="xycut"``). Device coordinates, y-down.
"""

from __future__ import annotations

import numpy as np

MIN_GAP_PX = 8.0  # gaps narrower than this are line spacing, not structure


def _gaps(starts: np.ndarray, ends: np.ndarray) -> list[tuple[float, float]]:
    """Maximal gaps of the 1-D union of [start, end] intervals."""
    order = np.argsort(starts, kind="stable")
    gaps: list[tuple[float, float]] = []
    cover_end = ends[order[0]]
    for i in order[1:]:
        if starts[i] > cover_end:
            gaps.append((float(cover_end), float(starts[i])))
        cover_end = max(cover_end, ends[i])
    return gaps


def _widest_gap(starts: np.ndarray, ends: np.ndarray) -> tuple[float, float] | None:
    gaps = [(a, b) for a, b in _gaps(starts, ends) if b - a >= MIN_GAP_PX]
    if not gaps:
        return None
    return max(gaps, key=lambda g: g[1] - g[0])


def xycut_order(coords: np.ndarray) -> np.ndarray:
    """Return reading-order indices for (n, 4) [x0, y0, x1, y1] device
    boxes (y-down)."""
    n = len(coords)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.arange(n)

    def rec(ids: np.ndarray) -> list[int]:
        if len(ids) <= 1:
            return list(ids)
        c = coords[ids]
        # cut along the axis with the WIDER structural gap (a column gutter
        # beats row spacing; ties favour the horizontal cut = top-to-bottom)
        gy = _widest_gap(c[:, 1], c[:, 3])
        gx = _widest_gap(c[:, 0], c[:, 2])
        candidates = []
        if gy is not None:
            candidates.append((gy[1] - gy[0], "y", gy))
        if gx is not None:
            candidates.append((gx[1] - gx[0], "x", gx))
        candidates.sort(key=lambda t: (-t[0], t[1] != "y"))
        for _width, axis, gap in candidates:
            lo, hi = (1, 3) if axis == "y" else (0, 2)
            mid = (gap[0] + gap[1]) / 2
            first = ids[c[:, hi] <= mid + 1e-9]
            second = ids[c[:, hi] > mid + 1e-9]
            if len(first) and len(second):
                return rec(first) + rec(second)
        # no structural gap: reference-style (top asc in device space, left asc)
        order = np.lexsort((c[:, 0], c[:, 1]))
        return list(ids[order])

    return np.array(rec(idx), dtype=np.int64)
