"""Tag-tree rows: pre-order ids, parent/child integrity, reference-DFS
(F7 regex search) and formula id join (J4) as row-table operations."""

import json

from action_pdf_accessibility_paddle_docker_spark.functions.tagtree import (
    tag_tree,
    tag_tree_rows,
)
from action_pdf_accessibility_paddle_docker_spark.functions.template import (
    template_from_region_rows,
)

# node tuple layout (see tagtree.TAG_TREE_DDL minus conv_id/turn_idx)
NODE_ID, PARENT, DEPTH, CHILD_IDX, PAGE, TAG, TYPE = 0, 1, 2, 3, 4, 5, 6
FLAG, HEADING, FORMULA_ID, CELL_ROW, CELL_COL, BBOX = 7, 8, 9, 10, 11, 12


def _template_for(payload_text):
    import pandas as pd

    from action_pdf_accessibility_paddle_docker_spark.operators.payload import (
        extract_series,
        region_as_dict,
    )

    res = next(iter(extract_series(pd.Series([payload_text]))))
    return template_from_region_rows(
        [region_as_dict(r) for r in res["regions"]],
        {m[0] for m in res["mathml"]},
    )


def _payload(pages):
    from action_pdf_accessibility_paddle_docker_spark.config import PDF_PAYLOAD_SENTINEL

    return PDF_PAYLOAD_SENTINEL + json.dumps(
        {"zoom": 2.0, "page_w": 1224, "page_h": 1584, "pages": pages}
    )


def test_tree_rows_structure():
    # formula overlaps text by <50% of each (NMS special case ignores the
    # pair, quirk 2) so it survives NMS and nests under the text element
    payload = _payload([
        {"page": 1, "boxes": [
            {"label": "table", "score": 0.9, "coordinate": [100, 100, 400, 300],
             "cells": [
                 {"coordinate": [100, 100, 250, 200], "text": "a"},
                 {"coordinate": [250, 100, 400, 200], "text": "b"},
             ]},
            {"label": "text", "score": 0.8, "coordinate": [100, 400, 400, 500],
             "text": "body"},
            {"label": "formula", "score": 0.7, "coordinate": [80, 380, 150, 420],
             "latex": "a+b"},
        ]},
    ])
    rows = tag_tree_rows(_template_for(payload))
    by_id = {r[NODE_ID]: r for r in rows}
    # pre-order dense ids; every parent exists and precedes its child
    assert [r[NODE_ID] for r in rows] == list(range(len(rows)))
    for r in rows:
        if r[PARENT] is not None:
            assert r[PARENT] in by_id and r[PARENT] < r[NODE_ID]
    # table node has pde_cell children carrying the grid position
    cells = [r for r in rows if r[TYPE] == "pde_cell"]
    assert len(cells) >= 2
    for c in cells:
        assert by_id[c[PARENT]][TYPE] == "pde_table"
        assert c[CELL_ROW] is not None and c[CELL_COL] is not None
    # the surviving formula nests under the text element with its id (J4 key)
    nested = [r for r in rows if r[DEPTH] == 1 and r[FORMULA_ID] is not None]
    assert len(nested) == 1
    assert by_id[nested[0][PARENT]][TYPE] == "pde_text"
    assert nested[0][TAG] == "Formula"
    # child_index is dense per parent
    sibs = [r[CHILD_IDX] for r in cells]
    assert sorted(sibs) == list(range(len(sibs)))


def test_tag_tree_spark(spark, tmp_path):
    from pyspark.sql import functions as F

    from action_pdf_accessibility_paddle_docker_spark.plans.extraction import (
        build_extraction,
    )
    from action_pdf_accessibility_paddle_docker_spark.sources.transcripts import (
        write_transcripts_parquet,
    )

    p = tmp_path / "in"
    write_transcripts_parquet(str(p), n_convs=8, median_turns=4, seed=13)
    out = build_extraction(spark.read.parquet(str(p)), include_template=True)
    tree = tag_tree(out).cache()
    assert tree.count() > 0
    # F7 analog: regex tag-DFS becomes an rlike filter on the row table
    assert tree.where(F.col("tag").rlike("^(Title|Caption|Formula)$")).count() > 0
    # J4 analog: formula nodes expose the id join key
    assert tree.where(F.col("formula_id").isNotNull()).count() > 0
    # nested structure present (cells under tables, formulas under text)
    assert tree.where("depth > 0").count() > 0
    # parent integrity per turn: no orphan children
    kids = tree.where(F.col("parent_node_id").isNotNull())
    orphans = kids.join(
        tree.select(
            "conv_id", "turn_idx", F.col("node_id").alias("parent_node_id")
        ),
        ["conv_id", "turn_idx", "parent_node_id"],
        "left_anti",
    )
    assert orphans.count() == 0
    # depth 0 <=> null parent
    assert tree.where(
        (F.col("depth") == 0) != F.col("parent_node_id").isNull()
    ).count() == 0
