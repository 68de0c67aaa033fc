"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample as Arrow
batch (``mapInPandas``) stages.

The real decoders (cv2 / PIL / torchaudio) are NOT in this container, so the
decode step is STUBBED: when the libraries are absent we parse a tiny
deterministic fake container format, and the real-decoder branch raises
``NotImplementedError`` with a clear message. The Spark-side plumbing --
schema, batch shape, partitioning, UDF signatures -- is real and tested.

Fake container format (used by tests and the synthesizer):
  b"IMG1" | uint16be width | uint16be height | width*height bytes gray pixels
  b"AUD1" | uint16be sample_rate/100 | uint16be n_samples | n_samples bytes
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

try:  # pragma: no cover - not present in this container
    import cv2  # noqa: F401

    _HAS_CV2 = True
except Exception:
    _HAS_CV2 = False

IMG_MAGIC = b"IMG1"
AUD_MAGIC = b"AUD1"
# Fake formula-image container: the deterministic stand-in for a rendered
# formula raster (the stub twin of PP-FormulaNet, playing the same role
# StubDetector plays for layout): b"FML1" | uint16be len | latex utf-8.
FML_MAGIC = b"FML1"

DECODE_DDL = (
    "media_id bigint, kind string, width int, height int, sample_rate int, "
    "n_samples int, mean_value double, ok boolean, error string"
)

RESIZE_DDL = "media_id bigint, out_w int, out_h int, payload binary"


def make_fake_image(media_id: int, w: int, h: int) -> bytes:
    """Deterministic fake image: pixel = (x + 2*y + media_id) % 256."""
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    px = ((x + 2 * y + media_id) % 256).astype(np.uint8)
    return IMG_MAGIC + struct.pack(">HH", w, h) + px.tobytes()


def make_fake_formula_image(latex: str) -> bytes:
    raw = latex.encode("utf-8")
    return FML_MAGIC + struct.pack(">H", len(raw)) + raw


def make_fake_audio(media_id: int, rate: int, n: int) -> bytes:
    t = np.arange(n, dtype=np.int64)
    samples = ((t * (media_id + 3)) % 256).astype(np.uint8)
    return AUD_MAGIC + struct.pack(">HH", rate // 100, n) + samples.tobytes()


def _decode_one(media_id: int, payload: bytes) -> dict:
    if payload is None or len(payload) < 8:
        return dict(media_id=media_id, kind="unknown", width=None, height=None,
                    sample_rate=None, n_samples=None, mean_value=None, ok=False,
                    error="payload too short")
    magic = bytes(payload[:4])
    if magic == IMG_MAGIC:
        w, h = struct.unpack(">HH", bytes(payload[4:8]))
        # truncated body or zero-area header: degrade to an error ROW (the
        # contract mathml_from_images relies on), never a task failure or
        # an ok=True row whose empty-slice mean is NaN
        if w * h == 0:
            return dict(media_id=media_id, kind="image", width=w, height=h,
                        sample_rate=None, n_samples=None, mean_value=None,
                        ok=False, error="zero-area image")
        if len(payload) < 8 + w * h:
            return dict(media_id=media_id, kind="image", width=w, height=h,
                        sample_rate=None, n_samples=None, mean_value=None,
                        ok=False, error="truncated image body")
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=8)
        return dict(media_id=media_id, kind="image", width=w, height=h,
                    sample_rate=None, n_samples=None,
                    mean_value=float(np.round(px.mean(), 6)), ok=True, error=None)
    if magic == AUD_MAGIC:
        rate100, n = struct.unpack(">HH", bytes(payload[4:8]))
        if n == 0 or len(payload) < 8 + n:
            return dict(media_id=media_id, kind="audio", width=None,
                        height=None, sample_rate=rate100 * 100, n_samples=n,
                        mean_value=None, ok=False,
                        error=("empty audio" if n == 0 else
                               "truncated audio body"))
        samples = np.frombuffer(payload, dtype=np.uint8, count=n, offset=8)
        return dict(media_id=media_id, kind="audio", width=None, height=None,
                    sample_rate=rate100 * 100, n_samples=n,
                    mean_value=float(np.round(samples.mean(), 6)), ok=True, error=None)
    if _HAS_CV2:  # pragma: no cover
        raise NotImplementedError(
            "real image decode (cv2.imdecode) is wired here in production; "
            "this sandbox only ships the fake container format"
        )
    return dict(media_id=media_id, kind="unknown", width=None, height=None,
                sample_rate=None, n_samples=None, mean_value=None, ok=False,
                error=f"unknown magic {magic!r}")


def decode_base64_media(
    df: DataFrame, id_col: str = "media_id", b64_col: str = "data_url"
) -> DataFrame:
    """Data-URL media: split the 'data:...;base64,' header and b64-decode,
    then decode the container (reference analog: header-split + b64decode +
    cv2.imdecode, /root/reference/src/page_renderer.py:111-124). The
    header-split + unbase64 stay JVM-side; only container decode hits Python."""
    from pyspark.sql import functions as F

    binary = df.select(
        F.col(id_col),
        F.unbase64(F.substring_index(F.col(b64_col), ",", -1)).alias("payload"),
    )
    return decode_media(binary, id_col=id_col, bin_col="payload")


def decode_media(df: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """Batch decode: binary column -> typed metadata + features."""

    _cols = ["media_id", "kind", "width", "height", "sample_rate",
             "n_samples", "mean_value", "ok", "error"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_one(int(i), p) for i, p in zip(pdf[id_col], pdf[bin_col])]
            # explicit columns: a zero-row batch must still carry the schema
            yield pd.DataFrame(rows, columns=_cols)

    return df.mapInPandas(kernel, schema=DECODE_DDL)


MATHML_FROM_IMAGE_DDL = "media_id bigint, latex string, mathml string, ok boolean, error string"


def mathml_from_images(df: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """The reference's `mathml` entry point 3 composed as one Spark stage:
    image payload -> formula recognition -> LaTeX -> annotated MathML XML
    (/root/reference/src/generate_mathml.py:54-78: cv2.imread ->
    process_formula_image_with_ai -> write XML; src/ai.py:159-263 for the
    model + semantics annotation).

    Recognition is the seam: the fake FML1 container decodes to its embedded
    LaTeX (stub twin of PP-FormulaNet); with cv2/paddlex present the real
    raster branch raises until wired, same honesty contract as decode_media.
    The LaTeX -> MathML -> <semantics> annotation path is the SAME shared
    code (functions/mathml.py) the extraction kernel uses."""
    from ..functions.mathml import add_mathml_metadata, latex_to_mathml

    def one(mid: int, p) -> dict:
        p = bytes(p) if p is not None else b""
        if p[:4] == FML_MAGIC:
            if len(p) < 6:
                return dict(media_id=mid, latex=None, mathml=None,
                            ok=False, error="truncated FML1 header")
            (n,) = struct.unpack(">H", p[4:6])
            body = p[6:6 + n]
            if len(body) < n:
                return dict(media_id=mid, latex=None, mathml=None,
                            ok=False, error="truncated FML1 body")
            latex = body.decode("utf-8")
        elif p[:4] == IMG_MAGIC and _HAS_CV2:  # pragma: no cover
            raise NotImplementedError(
                "real formula recognition (PP-FormulaNet on a raster) "
                "is wired here in production; this sandbox ships the "
                "FML1 stub container"
            )
        else:
            return dict(media_id=mid, latex=None, mathml=None,
                        ok=False, error=f"unknown magic {p[:4]!r}")
        mathml = latex_to_mathml(latex)
        if mathml == "":
            return dict(media_id=mid, latex=latex, mathml=None,
                        ok=False, error="latex-to-mathml failed")
        return dict(media_id=mid, latex=latex, mathml=add_mathml_metadata(mathml),
                    ok=True, error=None)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                mid = int(i)
                # per-row error contract: a corrupt payload degrades to an
                # error row (same guarantee as decode_media/extract_series),
                # never a task failure
                try:
                    rows.append(one(mid, p))
                except Exception as e:  # noqa: BLE001
                    rows.append(dict(media_id=mid, latex=None, mathml=None,
                                     ok=False,
                                     error=f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=["media_id", "latex", "mathml", "ok", "error"])

    return df.mapInPandas(kernel, schema=MATHML_FROM_IMAGE_DDL)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "media_id", bin_col: str = "payload"
) -> DataFrame:
    """Nearest-neighbour resize of fake images (real path would call cv2).
    Output re-encoded in the same container format."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                p = bytes(p) if p is not None else b""
                if p[:4] != IMG_MAGIC:
                    continue
                w, h = struct.unpack(">HH", p[4:8])
                px = np.frombuffer(p, np.uint8, count=w * h, offset=8).reshape(h, w)
                ys = (np.arange(out_h) * h // out_h)
                xs = (np.arange(out_w) * w // out_w)
                small = px[ys][:, xs]
                out.append(
                    dict(media_id=int(i), out_w=out_w, out_h=out_h,
                         payload=IMG_MAGIC + struct.pack(">HH", out_w, out_h) + small.tobytes())
                )
            yield pd.DataFrame(out, columns=["media_id", "out_w", "out_h", "payload"])

    return df.mapInPandas(kernel, schema=RESIZE_DDL)


def sample_frames(
    df: DataFrame, every_n: int = 4, id_col: str = "media_id", bin_col: str = "payload"
) -> DataFrame:
    """Frame/sample subsampling for audio payloads: keep every n-th sample."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                p = bytes(p) if p is not None else b""
                if p[:4] != AUD_MAGIC:
                    continue
                rate100, n = struct.unpack(">HH", p[4:8])
                samples = np.frombuffer(p, np.uint8, count=n, offset=8)[::every_n]
                out.append(
                    dict(media_id=int(i), out_w=len(samples), out_h=0,
                         payload=AUD_MAGIC + struct.pack(">HH", rate100, len(samples)) + samples.tobytes())
                )
            yield pd.DataFrame(out, columns=["media_id", "out_w", "out_h", "payload"])

    return df.mapInPandas(kernel, schema=RESIZE_DDL)
