"""Tag-tree rows: the relational twin of the reference's PDF struct tree.

The reference materializes the template as a native ``PdsStructTree`` inside
the PDF (`/root/reference/src/autotag.py:224-260` ``doc.AddTags``; DFS over
it in `/root/reference/src/utils_sdk.py:61-97`). SURVEY declared the
template struct the engine boundary; this module closes the last gap by
flattening the same hierarchy into ROWS -- (node_id, parent_node_id, depth,
child_index, page, tag, type, ...) -- so every tree operation the reference
performs natively (regex-DFS tag search F7, formula id join J4) becomes a
DataFrame filter/join on the row table, and a consumer can reconstruct the
exact tree from (parent_node_id, child_index).

Node ids are depth-first pre-order ordinals per turn: deterministic, dense,
and reproducible across engines and runs.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

from pyspark.sql import DataFrame

TAG_TREE_DDL = (
    "conv_id string, turn_idx int, node_id int, parent_node_id int, "
    "depth int, child_index int, page int, tag string, type string, "
    "flag string, heading string, formula_id bigint, "
    "cell_row int, cell_column int, bbox array<double>"
)


def _walk(
    el: dict[str, Any],
    page: int,
    parent: int | None,
    depth: int,
    child_index: int,
    counter: list[int],
    out: list[tuple],
) -> None:
    node_id = counter[0]
    counter[0] += 1
    bbox = [float(b) for b in el.get("bbox", [])] or None
    out.append(
        (
            node_id,
            parent,
            depth,
            child_index,
            page,
            el.get("tag"),
            el.get("type"),
            el.get("flag"),
            el.get("heading"),
            int(el["id"]) if "id" in el else None,
            int(el["cell_row"]) if "cell_row" in el else None,
            int(el["cell_column"]) if "cell_column" in el else None,
            bbox,
        )
    )
    tmpl = el.get("element_template")
    if tmpl:
        ci = 0
        for create in tmpl["template"]["element_create"]:
            for child in create.get("elements", []):
                _walk(child, page, node_id, depth + 1, ci, counter, out)
                ci += 1


def tag_tree_rows(template: dict[str, Any]) -> list[tuple]:
    """Flatten a document template (K2 shape) into pre-order tag-tree rows.

    Page wrappers are not nodes (the reference's ``element_create`` query
    clauses select the page; the struct elements start at the elements
    themselves), matching how ``doc.AddTags`` consumes the template."""
    out: list[tuple] = []
    counter = [0]
    for page_entry in template["template"]["element_create"]:
        page = int(page_entry["query"]["$and"][0]["$page_num"])
        ci = 0
        for el in page_entry.get("elements", []):
            _walk(el, page, None, 0, ci, counter, out)
            ci += 1
    return out


def tag_tree(extracted_with_template: DataFrame) -> DataFrame:
    """Per-turn tag-tree row table from the ``template_json`` column
    (requires ``build_extraction(include_template=True)``)."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "node_id", "parent_node_id", "depth", "child_index", "page",
            "tag", "type", "flag", "heading", "formula_id",
            "cell_row", "cell_column", "bbox",
        ]
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, tj in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["template_json"]
            ):
                if not tj:
                    continue
                for node in tag_tree_rows(json.loads(tj)):
                    rows.append((conv_id, int(turn_idx), *node))
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx", *cols])

    return extracted_with_template.select(
        "conv_id", "turn_idx", "template_json"
    ).mapInPandas(kernel, schema=TAG_TREE_DDL)
