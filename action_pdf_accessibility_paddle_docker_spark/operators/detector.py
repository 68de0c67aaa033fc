"""Pluggable layout-detector seam (SURVEY.md section 2.7).

The reference calls four PaddleX models per page, RE-CREATING each model on
every call (/root/reference/src/ai.py:72-77,173-179,283-289,302-308 --
``create_model(...)`` inside the per-page/per-region functions, batch_size=1,
cpu). That is the single biggest inefficiency in the reference; this engine
fixes it structurally:

* ONE detector instance per Python worker process (module-level singleton,
  created lazily inside the mapInPandas kernel), scoring whole Arrow batches.
* The detector is a seam: tests/bench use ``StubDetector`` (parses the
  deterministic structured payloads into the exact `boxes` shape PaddleX
  emits -- {label, score, coordinate:[x0,y0,x1,y1]}, src/ai.py:79-153);
  production swaps ``PaddleXDetector`` which rasterizes payload bytes and
  runs PP-DocLayout-L / RT-DETR-H_layout_17cls. The geometric post-processing
  downstream is identical either way, which is why the stub exercises the
  full engine.

Threshold pushdown: per-class score thresholds are applied detector-side
(the reference hands them to ``create_model(threshold=...)``,
src/ai.py:72-77; the stub filters identically).
"""

from __future__ import annotations

from typing import Any, Protocol

import numpy as np

from ..config import LABEL_TO_CLASS_ID, UNKNOWN_LABEL_THRESHOLD


class Detector(Protocol):
    def detect_page(self, page: dict[str, Any]) -> list[dict[str, Any]]:
        """Return PaddleX-shaped boxes for one page, thresholds applied."""
        ...


class StubDetector:
    """Deterministic detector: reads boxes straight from the structured
    payload and applies the per-class threshold pushdown (P1)."""

    def __init__(self, thresholds: dict[int, float]):
        self.thresholds = thresholds

    def _threshold_for(self, label: str) -> float:
        cid = LABEL_TO_CLASS_ID.get(label)
        if cid is None:
            return UNKNOWN_LABEL_THRESHOLD
        return self.thresholds.get(cid, 0.0)

    def detect_page(self, page: dict[str, Any]) -> list[dict[str, Any]]:
        out = []
        for b in page.get("boxes", []):
            label = str(b["label"]).lower()
            if float(b["score"]) >= self._threshold_for(label):
                out.append(b)
        return out

    def threshold_vector(self, labels: list[str]) -> np.ndarray:
        v = np.empty(len(labels), dtype=np.float64)
        for i, lbl in enumerate(labels):
            v[i] = self._threshold_for(lbl)
        return v


class PaddleXDetector:  # pragma: no cover - paddlex not installed here
    """Production detector: PaddleX layout model, loaded ONCE per Python
    worker, scoring batches (fixing the reference's per-page re-creation).

    Not runnable in this sandbox (paddlex/cv2 absent); the constructor
    raises with a clear message. The interface contract is the same
    ``detect_page`` seam the stub implements.
    """

    _singleton = None

    def __init__(self, model: str, thresholds: dict[int, float], model_dir: str):
        try:
            from paddlex import create_model  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "PaddleXDetector requires the paddlex runtime (not shipped in "
                "this environment); use StubDetector for structured payloads"
            ) from e
        self._model = create_model(  # loaded once per worker process
            model_name=model, model_dir=model_dir, device="cpu", threshold=thresholds
        )

    @classmethod
    def get(cls, model: str, thresholds: dict[int, float], model_dir: str):
        if cls._singleton is None:
            cls._singleton = cls(model, thresholds, model_dir)
        return cls._singleton

    def detect_page(self, page: dict[str, Any]) -> list[dict[str, Any]]:
        image = page["image"]  # decoded ndarray from the payload bytes
        res = next(iter(self._model.predict(input=image, batch_size=1, layout_nms=True)))
        return list(res.get("boxes", []))


def get_detector(thresholds: dict[int, float], kind: str = "stub", **kw) -> Detector:
    if kind == "stub":
        return StubDetector(thresholds)
    if kind == "paddlex":
        return PaddleXDetector.get(kw["model"], thresholds, kw["model_dir"])
    raise ValueError(f"unknown detector kind {kind!r}")
