"""Contract-vs-implementation edges from the round-7 operator audit:
zero-norm vectors, NULL group keys, zero medians, truncated media payloads,
NULL binary payloads, IVF fail-loud, duplicate-id packing determinism."""

import pytest
from pyspark.sql import functions as F


def test_cosine_zero_norm_matches_duckdb_convention(spark):
    """A zero-norm embedding yields -1.0 (DuckDB's list_cosine_similarity
    convention) on BOTH engines -- previously ANSI Spark raised
    DIVIDE_BY_ZERO and killed the job on the embedding of empty text."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0]),
         ([0.0, 0.0], [0.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = [r["s"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("s")).collect()]
    assert got[0] == -1.0 and got[2] == -1.0
    assert abs(got[1] - 1.0) < 1e-12
    duck = duckdb.sql(
        "SELECT list_cosine_similarity([0.0,0.0], [1.0,2.0])"
    ).fetchone()[0]
    assert duck == got[0]


def test_ivf_null_embedding_fails_loudly(spark):
    """The IVF entry points carry the same per-row fail-loud contract as the
    LSH ones: a NULL/ragged embedding raises a READABLE message, never a
    batch-level np.stack shape error."""
    import numpy as np

    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
        ivf_assignments,
    )

    # prefitted centers so the SCORING UDF is the path under test (the
    # unfitted path also fails loudly, but inside MLlib's own fit UDF
    # before this guard can phrase the message)
    centers = np.array([[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]])
    good = [(i, [float(i), 1.0, 0.0, 1.0]) for i in range(8)]
    df = spark.createDataFrame(
        good + [(99, None)], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(Exception, match="null or ragged"):
        ivf_assignments(df, centers=centers).collect()
    ragged = spark.createDataFrame(
        good + [(99, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(Exception, match="null or ragged"):
        ivf_assignments(ragged, centers=centers).collect()


def test_decode_media_degrades_truncated_payloads_to_error_rows(spark):
    """Truncated or zero-area media bodies must come back as ok=False error
    ROWS (the contract mathml_from_images relies on), never a task failure
    or an ok=True row whose empty-slice mean is NaN."""
    import struct

    from action_pdf_accessibility_paddle_docker_spark.operators.multimodal import (
        AUD_MAGIC,
        IMG_MAGIC,
        decode_media,
        make_fake_image,
    )

    rows = [
        (0, IMG_MAGIC + struct.pack(">HH", 100, 100) + b"\x00" * 10),  # short
        (1, IMG_MAGIC + struct.pack(">HH", 0, 24)),                     # 0-area
        (2, AUD_MAGIC + struct.pack(">HH", 160, 500) + b"\x00" * 5),    # short
        (3, make_fake_image(3, 4, 4)),                                  # fine
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r["media_id"]: r for r in decode_media(df).collect()}
    assert not got[0]["ok"] and "truncated" in got[0]["error"]
    assert not got[1]["ok"] and "zero-area" in got[1]["error"]
    assert not got[2]["ok"] and "truncated" in got[2]["error"]
    assert got[3]["ok"] and got[3]["mean_value"] is not None


def test_resize_and_sample_skip_null_payloads(spark):
    """A NULL binary payload must be skipped per-row (like the unknown-magic
    rows), not crash the task with bytes(None)."""
    from action_pdf_accessibility_paddle_docker_spark.operators.multimodal import (
        make_fake_audio,
        make_fake_image,
        resize_images,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(0, make_fake_image(0, 8, 8)), (1, None), (2, make_fake_audio(2, 16000, 64))],
        "media_id bigint, payload binary",
    )
    assert [r["media_id"] for r in resize_images(df, 4, 4).collect()] == [0]
    assert [r["media_id"] for r in sample_frames(df, every_n=4).collect()] == [2]


def test_sketch_accuracy_null_group_and_zero_median(spark):
    """The two aggregation passes join NULL-safely (a NULL group key must
    not vanish), and zero exact values pin booleans instead of raising
    DIVIDE_BY_ZERO under ANSI."""
    from action_pdf_accessibility_paddle_docker_spark.operators.sketches import (
        sketch_accuracy,
    )

    rows = (
        [(None, f"d{i}", 0.0) for i in range(4)]           # NULL group, p50=0
        + [("g", f"e{i}", float(i + 1)) for i in range(6)]  # normal group
    )
    df = spark.createDataFrame(rows, "grp string, d string, v double")
    got = {r["grp"]: r for r in sketch_accuracy(df, "grp", "d", "v").collect()}
    assert set(got) == {None, "g"}                 # NULL group survives
    assert got[None]["n_distinct_exact"] == 4
    assert got[None]["p50_exact"] == 0.0
    assert got[None]["p50_within_tol"] in (True, False)  # boolean, no raise
    assert got["g"]["distinct_within_tol"] is True


def test_packing_duplicate_ids_have_total_material_order(spark):
    """Duplicate doc_ids with different lengths must not make the pack
    layout run-dependent: the (id, n_tokens) window order totalizes the
    material layout."""
    from action_pdf_accessibility_paddle_docker_spark.operators.packing import (
        concat_chunk_packs,
    )

    df = spark.createDataFrame(
        [(7, "one two three"), (7, "one two three four five six seven"),
         (8, "tail doc here")],
        "doc_id bigint, text string",
    )
    a = sorted(map(tuple, concat_chunk_packs(df, capacity=5, n_shards=1).collect()))
    b = sorted(map(tuple, concat_chunk_packs(
        df.repartition(3), capacity=5, n_shards=1).collect()))
    assert a == b
