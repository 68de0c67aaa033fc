"""Raw-PDF page rasterization via pypdfium2 (public, Apache-2.0/BSD pdfium
binding) -- the open substitute for the reference's licensed PDFix renderer
(/root/reference/src/page_renderer.py:27-89, which draws each page at
``zoom`` into a BGR ndarray for the layout model).

Import-guarded exactly like the paddlex seam: the sandbox ships neither, so
callers get a clear NotImplementedError that extract_series converts into a
per-turn error row. When pypdfium2 IS importable (production image), a real
``%PDF-`` payload renders into page ndarrays and flows through the same
M1-M4 detector pipeline as structured payloads.
"""

from __future__ import annotations

import numpy as np


def pdfium_available() -> bool:
    try:
        import pypdfium2  # noqa: F401
    except Exception:
        return False
    return True


def rasterize_pdf_bytes(data: bytes, scale: float = 2.0) -> list[np.ndarray]:
    """Render every page of a PDF byte string to an RGB uint8 ndarray
    (H x W x 3) at ``scale`` x 72 dpi -- the same zoom semantics as the
    reference's ``RenderPage(zoom=...)`` (src/page_renderer.py:44-66)."""
    try:
        import pypdfium2 as pdfium
    except ImportError as e:
        raise NotImplementedError(
            "raw-PDF rasterization needs pypdfium2 (pip install pypdfium2); "
            "not shipped in this environment"
        ) from e
    doc = pdfium.PdfDocument(data)
    try:
        out: list[np.ndarray] = []
        for i in range(len(doc)):
            page = doc[i]
            bitmap = page.render(scale=float(scale))
            arr = np.asarray(bitmap.to_numpy())
            if arr.ndim == 3 and arr.shape[2] == 4:  # BGRA/RGBA -> drop alpha
                arr = arr[:, :, :3]
            out.append(np.ascontiguousarray(arr))
        return out
    finally:
        doc.close()
