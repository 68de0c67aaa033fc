"""Fixture-oracle freshness guard: the committed fixture parquets under
tests/fixtures/ must equal what scripts/make_fixture_oracles.py produces
from the current scalar oracle. If an oracle/generator change lands without
regenerating the fixtures, this fails before the driver's value-check does
(the Spark-vs-fixture value equality itself runs in test_queries_vs_duckdb
via the registered read_parquet oracle SQL)."""

import os

import pyarrow.parquet as pq
import pytest

from scripts.make_fixture_oracles import (
    FIXTURE_DIR,
    extract_transcripts_fixture,
    lsh_band_planes_fixture,
    lsh_planes_fixture,
    mathml_from_image_fixture,
    multimodal_decode_fixture,
    pipeline_extract_dedup_fixture,
    semdedup_centers_fixture,
    tag_tree_fixture,
)

# fixture-file basename per generator: the oracle fixtures use an _oracle
# suffix; the plane fixtures are data inputs to SQL oracles and keep their
# plain names
_BASENAME = {
    "extract_transcripts_fixture": "extract_transcripts_oracle",
    "pipeline_extract_dedup_fixture": "pipeline_extract_dedup_oracle",
    "multimodal_decode_fixture": "multimodal_decode_oracle",
    "mathml_from_image_fixture": "mathml_from_image_oracle",
    "tag_tree_fixture": "tag_tree_oracle",
    "lsh_planes_fixture": "lsh_planes",
    "lsh_band_planes_fixture": "lsh_band_planes",
    "semdedup_centers_fixture": "semdedup_centers",
}


@pytest.mark.parametrize(
    "gen",
    [
        extract_transcripts_fixture,
        pipeline_extract_dedup_fixture,
        multimodal_decode_fixture,
        mathml_from_image_fixture,
        tag_tree_fixture,
        lsh_planes_fixture,
        lsh_band_planes_fixture,
        semdedup_centers_fixture,
    ],
    ids=lambda f: f.__name__,
)
def test_fixture_is_fresh(gen, tmp_path, monkeypatch):
    name = _BASENAME[gen.__name__]
    committed_path = os.path.join(FIXTURE_DIR, f"{name}.parquet")
    assert os.path.exists(committed_path), (
        f"missing fixture {committed_path}; run scripts/make_fixture_oracles.py"
    )
    committed = pq.read_table(committed_path)
    import scripts.make_fixture_oracles as m

    monkeypatch.setattr(m, "FIXTURE_DIR", str(tmp_path))
    fresh = pq.read_table(gen())
    assert fresh.schema.equals(committed.schema)
    assert fresh.equals(committed), (
        f"fixture {name} is stale; re-run scripts/make_fixture_oracles.py"
    )
