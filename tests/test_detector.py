"""Detector seam: stub threshold pushdown + production path contract."""

import pytest

from action_pdf_accessibility_paddle_docker_spark.config import effective_thresholds
from action_pdf_accessibility_paddle_docker_spark.operators.detector import (
    PaddleXDetector,
    StubDetector,
    get_detector,
)


def test_stub_applies_per_class_thresholds():
    det = StubDetector(effective_thresholds())
    page = {"boxes": [
        {"label": "paragraph_title", "score": 0.31, "coordinate": [0, 0, 1, 1]},  # th 0.3
        {"label": "paragraph_title", "score": 0.29, "coordinate": [0, 0, 1, 1]},
        {"label": "text", "score": 0.49, "coordinate": [0, 0, 1, 1]},             # th 0.5
        {"label": "text", "score": 0.50, "coordinate": [0, 0, 1, 1]},
        {"label": "never_heard_of", "score": 0.45, "coordinate": [0, 0, 1, 1]},   # 0.5 fallback
    ]}
    got = det.detect_page(page)
    assert [round(b["score"], 2) for b in got] == [0.31, 0.5]


def test_stub_respects_17cls_pruning():
    th = effective_thresholds(model="RT-DETR-H_layout_17cls")
    det = StubDetector(th)
    # class 18 (chart) threshold removed -> box admitted regardless of score
    page = {"boxes": [{"label": "chart", "score": 0.01, "coordinate": [0, 0, 1, 1]}]}
    assert len(det.detect_page(page)) == 1


def test_paddlex_detector_unavailable_raises_cleanly():
    with pytest.raises(NotImplementedError, match="paddlex runtime"):
        PaddleXDetector("PP-DocLayout-L", effective_thresholds(), "/models/x")


def test_get_detector_dispatch():
    assert isinstance(get_detector(effective_thresholds(), "stub"), StubDetector)
    with pytest.raises(ValueError):
        get_detector(effective_thresholds(), "nope")
