"""K3 debug-image sink: PNG round-trip, deterministic bytes, drawn borders."""

import numpy as np

from action_pdf_accessibility_paddle_docker_spark.operators.debug_image import (
    PAGE_H_PT,
    SCALE,
    debug_images,
    decode_png_rgb,
    encode_png,
    label_color,
    render_page,
)


def test_png_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(40, 30, 3), dtype=np.uint8)
    assert (decode_png_rgb(encode_png(img)) == img).all()


def test_render_draws_border_and_is_deterministic():
    regions = [{"label": "text", "bbox": [100.0, 500.0, 300.0, 700.0]}]
    img = render_page(regions, 306, 396)
    color = np.array(label_color("text"), dtype=np.uint8)
    x0, x1 = int(100 * SCALE), int(300 * SCALE)
    y0, y1 = int((PAGE_H_PT - 700) * SCALE), int((PAGE_H_PT - 500) * SCALE)
    assert (img[y0, x0:x1 + 1] == color).all()          # top border
    assert (img[y1, x0:x1 + 1] == color).all()          # bottom border
    assert (img[y0:y1 + 1, x0] == color).all()          # left border
    assert (img[(y0 + y1) // 2, (x0 + x1) // 2] == 255).all()  # interior white
    assert (img[0, 0] == 255).all()
    assert encode_png(img) == encode_png(render_page(regions, 306, 396))


def test_debug_images_spark(spark, tmp_path):
    from action_pdf_accessibility_paddle_docker_spark.plans.extraction import (
        build_extraction,
    )
    from action_pdf_accessibility_paddle_docker_spark.sources.transcripts import (
        write_transcripts_parquet,
    )

    p = tmp_path / "in"
    n = write_transcripts_parquet(str(p), n_convs=6, median_turns=4, seed=5)
    out = build_extraction(spark.read.parquet(str(p)))
    imgs = debug_images(out).collect()
    assert imgs, "payload turns must yield debug images"
    seen_nonwhite = 0
    for r in imgs:
        rgb = decode_png_rgb(bytes(r["png"]))
        assert rgb.shape == (r["height"], r["width"], 3)
        if (rgb != 255).any():
            seen_nonwhite += 1
    assert seen_nonwhite > 0, "at least one image must have drawn regions"
