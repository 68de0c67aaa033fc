"""Pluggable model seam (SURVEY.md section 2.7): layout detection (M1),
table wired/wireless classification (M2), table cell detection (M3) and
formula recognition (M4) behind ONE Detector interface.

The reference calls four PaddleX models per page, RE-CREATING each model on
every call (/root/reference/src/ai.py:72-77,173-179,283-289,302-307 --
``create_model(...)`` inside the per-page/per-region functions, batch_size=1,
cpu). That is the single biggest inefficiency in the reference; this engine
fixes it structurally:

* ONE detector instance per Python worker process (module-level singleton,
  created lazily inside the mapInPandas kernel), each model loaded at most
  once per worker, scoring whole Arrow batches.
* The detector is a seam: tests/bench use ``StubDetector`` (parses the
  deterministic structured payloads into the exact shapes PaddleX emits --
  boxes {label, score, coordinate:[x0,y0,x1,y1]} per src/ai.py:79-153,
  cell boxes in crop-local coordinates per src/ai.py:291-308); production
  swaps ``PaddleXDetector``. ``extract_pdf_turn`` drives BOTH through the
  same three hooks -- ``detect_page`` / ``table_cells`` / ``formula_latex``
  -- so the geometric post-processing downstream is one code path and only
  the detector differs.

Threshold pushdown: per-class score thresholds are applied detector-side
(the reference hands them to ``create_model(threshold=...)``,
src/ai.py:72-77; the stub filters identically).
"""

from __future__ import annotations

from typing import Any, Protocol

import numpy as np

from ..config import LABEL_TO_CLASS_ID, UNKNOWN_LABEL_THRESHOLD
from ..functions.table_cls import cell_det_model_name

# The reference crops the model input 1 px around the region bbox
# (src/ai.py:114,138 -> src/page_renderer.py:92-109).
CROP_OFFSET_PX = 1


class Detector(Protocol):
    def detect_page(self, page: dict[str, Any]) -> list[dict[str, Any]]:
        """Return PaddleX-shaped boxes for one page, thresholds applied (M1)."""
        ...

    def table_cells(self, page: dict[str, Any], box: dict[str, Any]) -> list[dict[str, Any]] | None:
        """Cell boxes (crop-local coordinates) for one table region, or None
        (M2 wired/wireless classification + M3 cell detection)."""
        ...

    def formula_latex(self, page: dict[str, Any], box: dict[str, Any]) -> str | None:
        """LaTeX string for one formula region, or None (M4)."""
        ...

    # Optional hook (dispatched by hasattr in extract_series): a detector
    # that can rasterize RAW %PDF- bytes implements
    #   detect_pdf_bytes(text: str) -> extraction-result dict
    # Detectors without it (the stub) leave raw-PDF turns to the explicit
    # 'pdf-bytes-unsupported-without-paddlex' error row.


class StubDetector:
    """Deterministic detector: reads boxes/cells/latex straight from the
    structured payload and applies the per-class threshold pushdown (P1)."""

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

    def table_cells(self, page: dict[str, Any], box: dict[str, Any]) -> list[dict[str, Any]] | None:
        return box.get("cells")

    def formula_latex(self, page: dict[str, Any], box: dict[str, Any]) -> str | None:
        return box.get("latex")

    def threshold_vector(self, labels: list[str]) -> np.ndarray:
        v = np.empty(len(labels), dtype=np.float64)
        for i, lbl in enumerate(labels):
            v[i] = self._threshold_for(lbl)
        return v


def crop_region(image: np.ndarray, coordinate: list[float], offset: int = CROP_OFFSET_PX) -> np.ndarray:
    """Numpy slice of the page raster around a region bbox (the reference's
    create_image_from_part_of_page, src/page_renderer.py:92-109; negative
    starts clamped -- python slicing with a negative start would wrap)."""
    y0 = max(0, int(coordinate[1]) - offset)
    y1 = int(coordinate[3]) + offset
    x0 = max(0, int(coordinate[0]) - offset)
    x1 = int(coordinate[2]) + offset
    return image[y0:y1, x0:x1]


class PaddleXDetector:  # pragma: no cover - paddlex not installed here
    """Production detector: the four PaddleX models, each loaded ONCE per
    Python worker and reused across every page/region of every Arrow batch
    (fixing the reference's per-call re-creation).

    Not runnable in this sandbox (paddlex/cv2 absent); the constructor
    raises with a clear message. The interface contract is the same
    three-hook seam the stub implements, so ``extract_pdf_turn`` is the one
    shared code path. An integration test runs when paddlex is importable
    (tests/test_detector.py, skipif-guarded).

    Page rasters: ``page["image"]`` carries the decoded ndarray (the payload
    decode step supplies it; the reference renders via PDFix + cv2,
    src/page_renderer.py:27-89).
    """

    _singleton = None

    # model names per the reference (src/ai.py:72,279,294-299,170)
    TABLE_CLS_MODEL = "PP-LCNet_x1_0_table_cls"
    FORMULA_MODEL = "PP-FormulaNet-L"

    def __init__(self, model: str, thresholds: dict[int, float], model_dir: str):
        try:
            from paddlex import create_model
        except ImportError as e:
            raise NotImplementedError(
                "PaddleXDetector requires the paddlex runtime (not shipped in "
                "this environment); use StubDetector for structured payloads"
            ) from e
        self._create_model = create_model
        self._model_root = model_dir
        # layout model loaded eagerly (every page needs it); sub-models lazily
        self._layout = create_model(
            model_name=model, model_dir=f"{model_dir}/{model}", device="cpu",
            threshold=thresholds,
        )
        self._models: dict[str, Any] = {}

    def _model(self, name: str):
        """Lazy per-worker singleton per sub-model (vs the reference's
        create_model on every region, src/ai.py:283-289,302-307,173-179)."""
        if name not in self._models:
            self._models[name] = self._create_model(
                model_name=name, model_dir=f"{self._model_root}/{name}", device="cpu"
            )
        return self._models[name]

    @classmethod
    def get(cls, model: str, thresholds: dict[int, float], model_dir: str):
        if cls._singleton is None:
            cls._singleton = cls(model, thresholds, model_dir)
        return cls._singleton

    def detect_page(self, page: dict[str, Any]) -> list[dict[str, Any]]:
        image = page["image"]  # decoded ndarray from the payload bytes
        res = next(iter(self._layout.predict(input=image, batch_size=1, layout_nms=True)))
        return list(res.get("boxes", []))

    def table_cells(self, page: dict[str, Any], box: dict[str, Any]) -> list[dict[str, Any]] | None:
        """M2 + M3: classify wired/wireless on the cropped table image, then
        run the matching cell detector (src/ai.py:265-318). Returns cell
        boxes in crop-local coordinates (as the cell detector emits)."""
        crop = crop_region(page["image"], box["coordinate"])
        cls_out = next(iter(self._model(self.TABLE_CLS_MODEL).predict(input=crop, batch_size=1)), None)
        if cls_out is None:
            return None
        cell_model = cell_det_model_name(
            list(cls_out["scores"]), list(cls_out["label_names"])
        )
        cell_out = next(iter(self._model(cell_model).predict(input=crop, batch_size=1)), None)
        if cell_out is None:
            return None
        return [
            {"coordinate": list(c["coordinate"]), "text": c.get("text", "") or ""}
            for c in cell_out.get("boxes", [])
        ]

    def formula_latex(self, page: dict[str, Any], box: dict[str, Any]) -> str | None:
        """M4: PP-FormulaNet on the cropped formula image
        (src/ai.py:159-187); LaTeX -> MathML happens in the shared kernel."""
        crop = crop_region(page["image"], box["coordinate"])
        res = next(iter(self._model(self.FORMULA_MODEL).predict(input=crop, batch_size=1)), None)
        if res is None:
            return None
        return res.get("rec_formula") or None

    def detect_pdf_bytes(self, text: str) -> dict[str, Any]:
        """Raw %PDF- bytes need a rasterizer (the reference renders via the
        PDFix SDK, src/page_renderer.py:27-89 -- a licensed component we do
        not ship). Raising here keeps the error row accurate ('decode
        failed: rasterizer not wired') instead of the misleading
        'unsupported-without-paddlex' a hook-less detector would produce."""
        raise NotImplementedError(
            "raw-PDF rasterization is not wired into PaddleXDetector "
            "(needs a PDF renderer such as pdfium/PDFix); feed structured "
            "%LAYOUT1% payloads or page rasters"
        )


def get_detector(thresholds: dict[int, float], kind: str = "stub", **kw) -> Detector:
    if kind == "stub":
        return StubDetector(thresholds)
    if kind == "paddlex":
        return PaddleXDetector.get(kw["model"], thresholds, kw["model_dir"])
    raise ValueError(f"unknown detector kind {kind!r}")
