"""Tag-template JSON (the reference's K2 output shape): Spark template_json
column equals the oracle's template document per turn; structural parity with
/root/reference/src/template_json.py."""

import itertools
import json

import pytest

from action_pdf_accessibility_paddle_docker_spark.oracle.extract import (
    extract_turn,
    template_for_turn,
)
from action_pdf_accessibility_paddle_docker_spark.plans.extraction import build_extraction
from action_pdf_accessibility_paddle_docker_spark.sources.transcripts import iter_rows


@pytest.fixture(scope="module")
def turns(spark):
    rows = list(itertools.islice(iter_rows(25, 5, seed=9), 0, 400))
    df = spark.createDataFrame(rows)
    out = build_extraction(df, include_template=True).collect()
    return rows, {(r["conv_id"], r["turn_idx"]): r for r in out}


def test_template_equals_oracle(turns):
    rows, got = turns
    n_pdf = 0
    for r in rows:
        exp = extract_turn(r["text"])
        exp_tpl = template_for_turn(exp)
        spark_tpl = json.loads(got[(r["conv_id"], r["turn_idx"])]["template_json"])
        assert spark_tpl == exp_tpl, (r["conv_id"], r["turn_idx"])
        if exp["payload_kind"] == "pdf":
            n_pdf += 1
    assert n_pdf > 30


def test_template_reference_shape(turns):
    rows, got = turns
    pdf_row = next(
        got[(r["conv_id"], r["turn_idx"])] for r in rows
        if got[(r["conv_id"], r["turn_idx"])]["payload_kind"] == "pdf"
        and got[(r["conv_id"], r["turn_idx"])]["n_regions"] > 3
    )
    tpl = json.loads(pdf_row["template_json"])
    # document wrapper (src/template_json.py:35-73)
    assert set(tpl) == {"metadata", "template"}
    assert tpl["metadata"]["version"] == "1"
    assert "PaddleX layout model" in tpl["metadata"]["notes"]
    assert tpl["template"]["pagemap"][0]["statement"] == "$if"
    # page wrapper (src/template_json.py:75-98)
    page = tpl["template"]["element_create"][0]
    assert page["comment"].startswith("Page ")
    assert page["query"]["$and"][0]["$page_num"] == 1
    assert page["statement"] == "$if"
    # elements: bbox stringified floats, comment "label NN%"
    for el in page["elements"]:
        assert all(isinstance(b, str) and float(b) == float(b) for b in el["bbox"])
        label, pct = el["comment"].rsplit(" ", 1)
        assert pct.endswith("%")
        assert el["type"].startswith("pde_")
        if el["type"] == "pde_table" and "element_template" in el:
            cells = el["element_template"]["template"]["element_create"][0]["elements"]
            for c in cells:
                assert c["type"] == "pde_cell"
                assert c["comment"].startswith("Cell Pos: [")
                assert isinstance(c["cell_row"], str)
            assert el["element_template"]["template"]["table_update"] == [
                {"cell_header": "true", "statement": "$if"}
            ]


def test_formula_ids_match_mathml(turns):
    rows, got = turns
    for r in rows:
        row = got[(r["conv_id"], r["turn_idx"])]
        if not row["mathml"]:
            continue
        tpl = json.loads(row["template_json"])
        ids_in_tpl = set()

        def walk(elements):
            for el in elements:
                if "id" in el:
                    ids_in_tpl.add(int(el["id"]))
                nested = el.get("element_template", {}).get("template", {}).get("element_create", [])
                for blk in nested:
                    walk(blk.get("elements", []))

        for page in tpl["template"]["element_create"]:
            walk(page["elements"])
        assert ids_in_tpl == {m["region_id"] for m in row["mathml"]}
