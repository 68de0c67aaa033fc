"""Debug-image sink (K3): per-page region-overlay images.

The reference saves annotated page renders as a debugging side effect
(`/root/reference/src/ai.py:82-84` ``res.save_to_img(...)`` per page,
`/root/reference/src/ai.py:311` per table). Here it is a first-class
DataFrame sink: each extracted turn yields one PNG per page with every
region drawn as a colored rectangle (color keyed off the label hash, so the
palette is deterministic and stable across runs).

Dependency-free: the PNG encoder is pure numpy + stdlib zlib (no cv2/PIL in
this environment), which also keeps the output byte-deterministic -- the
sink is value-testable, unlike the reference's side-effect-only writes.

Scale shape: one ``mapInPandas`` over the extraction output (narrow; no
shuffle); images are bounded by the downscale factor, and the sink is
opt-in (``--debug-images`` in the job), exactly like the reference's
``save_images`` flag.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .kernels import fnv1a32

DEBUG_IMAGE_DDL = (
    "conv_id string, turn_idx int, page int, width int, height int, png binary"
)

# rendered page box in points; regions land in page space [l,b,r,t] y-up
PAGE_W_PT = 612.0
PAGE_H_PT = 792.0
SCALE = 0.5  # points -> pixels


def label_color(label: str) -> tuple[int, int, int]:
    """Deterministic per-label RGB from the same FNV hash the ids use."""
    h = fnv1a32(label or "")
    # keep channels away from white so boxes are visible on the canvas
    return (h & 0xFF) % 200, ((h >> 8) & 0xFF) % 200, ((h >> 16) & 0xFF) % 200


def encode_png(rgb: np.ndarray) -> bytes:
    """Minimal PNG encoder: 8-bit RGB, filter 0, one IDAT. Deterministic."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = rgb.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 6))
        + chunk(b"IEND", b"")
    )


def decode_png_rgb(png: bytes) -> np.ndarray:
    """Decode PNGs produced by :func:`encode_png` (filter-0 8-bit RGB only);
    test-side verifier so the sink is round-trippable without cv2/PIL."""
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w, h = 8, b"", 0, 0
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos:pos + 4])
        tag = png[pos + 4:pos + 8]
        body = png[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", body[:8])
            assert body[8:13] == bytes([8, 2, 0, 0, 0]), "not filter-0 8-bit RGB"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    assert (raw[:, 0] == 0).all(), "non-zero scanline filter"
    return raw[:, 1:].reshape(h, w, 3)


def render_page(regions: list[dict], width: int, height: int) -> np.ndarray:
    """White canvas + 2px rectangle borders per region (page space y-up ->
    raster y-down), drawn in (ordinal) input order -- last writer wins on
    overlap, matching the reference's draw-in-order overlays."""
    img = np.full((height, width, 3), 255, dtype=np.uint8)
    for r in regions:
        bbox = r.get("bbox")  # list or numpy array via Arrow; no `or` (ambiguous)
        if bbox is None or len(bbox) != 4:
            continue
        l, b, rt, t = (float(x) for x in bbox)
        x0 = max(0, min(width - 1, int(l * SCALE)))
        x1 = max(0, min(width - 1, int(rt * SCALE)))
        y0 = max(0, min(height - 1, int((PAGE_H_PT - t) * SCALE)))
        y1 = max(0, min(height - 1, int((PAGE_H_PT - b) * SCALE)))
        if x1 <= x0 or y1 <= y0:
            continue
        color = np.array(label_color(r.get("label") or ""), dtype=np.uint8)
        img[y0:y0 + 2, x0:x1 + 1] = color
        img[max(y0, y1 - 1):y1 + 1, x0:x1 + 1] = color
        img[y0:y1 + 1, x0:x0 + 2] = color
        img[y0:y1 + 1, max(x0, x1 - 1):x1 + 1] = color
    return img


def debug_images(extracted: DataFrame) -> DataFrame:
    """K3 sink: (conv_id, turn_idx, page, width, height, png) -- one image
    per page of each turn that produced regions."""
    width = int(PAGE_W_PT * SCALE)
    height = int(PAGE_H_PT * SCALE)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, regions in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["regions"]
            ):
                if regions is None or len(regions) == 0:
                    continue
                by_page: dict[int, list] = {}
                for r in regions:
                    rd = r if isinstance(r, dict) else r.asDict()
                    by_page.setdefault(int(rd["page"]), []).append(rd)
                for page in sorted(by_page):
                    img = render_page(by_page[page], width, height)
                    rows.append(
                        (conv_id, int(turn_idx), page, width, height,
                         encode_png(img))
                    )
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "page", "width", "height", "png"],
            )

    return extracted.select("conv_id", "turn_idx", "regions").mapInPandas(
        kernel, schema=DEBUG_IMAGE_DDL
    )
