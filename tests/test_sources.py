"""Multi-format transcript sources: json/csv landing formats produce the
same extraction output as parquet."""

import pytest

from action_pdf_accessibility_paddle_docker_spark.plans.extraction import (
    build_extraction,
    read_transcripts,
)
from action_pdf_accessibility_paddle_docker_spark.sources.transcripts import iter_rows


@pytest.fixture(scope="module")
def three_formats(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fmt")
    rows = list(iter_rows(8, 4, seed=21))
    df = spark.createDataFrame(rows)
    df.write.parquet(str(base / "pq"))
    df.write.json(str(base / "js"))
    (
        df.write.option("header", "true").option("escape", '"')
        .csv(str(base / "cs"))
    )
    return base, len(rows)


def test_json_and_csv_match_parquet(spark, three_formats):
    base, n = three_formats

    def extract(path, fmt):
        df = read_transcripts(spark, str(path), format=fmt)
        out = build_extraction(df).select("conv_id", "turn_idx", "extracted_text")
        return sorted(map(tuple, out.collect()))

    pq = extract(base / "pq", "parquet")
    assert len(pq) == n
    assert extract(base / "js", "json") == pq
    assert extract(base / "cs", "csv") == pq


def test_unknown_format_raises(spark, three_formats):
    base, _ = three_formats
    with pytest.raises(ValueError, match="unknown transcripts format"):
        read_transcripts(spark, str(base / "pq"), format="orc2")
