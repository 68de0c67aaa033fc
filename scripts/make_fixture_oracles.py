"""Generate deterministic ORACLE fixture parquets for the harness entries
whose semantics are not ANSI-SQL-expressible (geometric extraction kernels,
binary decode plumbing), upgrading them from rows-only to value-checked:
the driver's oracle_sql() for these queries is a plain
``SELECT ... FROM read_parquet('<fixture>')``.

Every fixture is computed SCALAR-SIDE (no Spark):

* ``extract_transcripts_oracle``   -- the independent scalar oracle
  (oracle/extract.py, a from-the-reference re-derivation, NOT the engine
  kernel) over the same deterministic synthetic transcripts
  q_extract_transcripts generates executor-side (same (seed, conv, turn)
  substreams; sources/transcripts.iter_rows == distributed_transcripts).
* ``pipeline_extract_dedup_oracle`` -- scalar oracle extraction -> python
  md5-of-normalized-text exact-dedup groups.
* ``multimodal_decode_oracle`` / ``mathml_from_image_oracle`` -- the same
  pure decode functions the Spark kernels call, evaluated directly; these
  pin the mapInPandas plumbing (schema, batching, ordering), the functions
  themselves are pytest-covered.

Deterministic by construction: re-running this script must be a no-op diff.
Run from the repo root:  python scripts/make_fixture_oracles.py
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from action_pdf_accessibility_paddle_docker_spark.config import PDE_TABLE  # noqa: E402
from action_pdf_accessibility_paddle_docker_spark.oracle.extract import (  # noqa: E402
    extract_turn,
)
from action_pdf_accessibility_paddle_docker_spark.sources.transcripts import (  # noqa: E402
    iter_rows,
)

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures"
)


def _count_regions(res: dict) -> int:
    """Engine-comparable flattened region count (top + nested + cells for
    PDF; one row per block for HTML; 0 for plain text)."""
    if res["payload_kind"] != "pdf":
        return len(res["regions"])
    n = 0
    for el in res["regions"]:
        n += 1 + len(el["nested"])
        if el["type"] == PDE_TABLE and el["cells"]:
            n += len(el["cells"])
    return n


def _normalized(s: str) -> str:
    """Python twin of operators.dedup.normalized (Spark trim strips spaces;
    Java \\s is the ASCII class)."""
    return re.sub(r"\s+", " ", s.strip(" "), flags=re.ASCII).lower()


def _write(name: str, table: pa.Table) -> str:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(FIXTURE_DIR, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=65536)
    return path


def extract_transcripts_fixture() -> str:
    """Mirror of q_extract_transcripts (n_convs=30, median_turns=6, seed=42)."""
    cols = {k: [] for k in (
        "conv_id", "turn_idx", "payload_kind", "extracted_text",
        "n_regions", "n_artifacts",
    )}
    for row in iter_rows(30, 6, seed=42):
        res = extract_turn(row["text"])
        cols["conv_id"].append(row["conv_id"])
        cols["turn_idx"].append(row["turn_idx"])
        cols["payload_kind"].append(res["payload_kind"])
        cols["extracted_text"].append(res["extracted_text"])
        cols["n_regions"].append(_count_regions(res))
        cols["n_artifacts"].append(res["n_artifacts"])
    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("payload_kind", pa.string()), ("extracted_text", pa.string()),
        ("n_regions", pa.int32()), ("n_artifacts", pa.int32()),
    ])
    return _write("extract_transcripts_oracle", pa.table(cols, schema=schema))


def pipeline_extract_dedup_fixture() -> str:
    """Mirror of q_pipeline_extract_dedup (n_convs=25, median_turns=5,
    seed=17): extraction -> nonempty -> md5(normalized) groups with
    lexicographic-min canonical id."""
    groups: dict[str, list[str]] = {}
    for row in iter_rows(25, 5, seed=17):
        res = extract_turn(row["text"])
        text = res["extracted_text"]
        if len(text) == 0:
            continue
        fp = hashlib.md5(_normalized(text).encode("utf-8")).hexdigest()
        groups.setdefault(fp, []).append(f"{row['conv_id']}#{row['turn_idx']}")
    fps = sorted(groups)
    schema = pa.schema([
        ("fingerprint", pa.string()), ("canonical_id", pa.string()),
        ("n_dups", pa.int64()),
    ])
    return _write("pipeline_extract_dedup_oracle", pa.table({
        "fingerprint": fps,
        "canonical_id": [min(groups[f]) for f in fps],
        "n_dups": [len(groups[f]) for f in fps],
    }, schema=schema))


def multimodal_decode_fixture() -> str:
    """Mirror of q_multimodal_decode's executor-side synthesis (64 media
    ids, alternating fake image / fake audio)."""
    from action_pdf_accessibility_paddle_docker_spark.operators.multimodal import (
        _decode_one,
        make_fake_audio,
        make_fake_image,
    )

    rows = []
    for i in range(64):
        payload = (make_fake_image(i, 32 + i % 8, 24) if i % 2 == 0
                   else make_fake_audio(i, 16000, 200 + i))
        rows.append(_decode_one(i, payload))
    schema = pa.schema([
        ("media_id", pa.int64()), ("kind", pa.string()),
        ("width", pa.int32()), ("height", pa.int32()),
        ("sample_rate", pa.int32()), ("n_samples", pa.int32()),
        ("mean_value", pa.float64()), ("ok", pa.bool_()),
        ("error", pa.string()),
    ])
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    return _write("multimodal_decode_oracle", pa.table(cols, schema=schema))


def mathml_from_image_fixture() -> str:
    """Mirror of q_mathml_from_image (32 ids over 4 latex payloads)."""
    from action_pdf_accessibility_paddle_docker_spark.functions.mathml import (
        add_mathml_metadata,
        latex_to_mathml,
    )
    from action_pdf_accessibility_paddle_docker_spark.operators.multimodal import (
        make_fake_formula_image,
    )

    latexes = [r"x^{2}+y_{1}", r"\frac{a}{b}+c", r"\sqrt{z}=\alpha", r"E=mc^2"]
    rows = []
    for i in range(32):
        latex = latexes[i % 4]
        # same decode path the kernel takes for FML1 containers
        payload = make_fake_formula_image(latex)
        assert payload[:4] == b"FML1"
        mathml = latex_to_mathml(latex)
        ok = mathml != ""
        rows.append({
            "media_id": i, "latex": latex,
            "mathml": add_mathml_metadata(mathml) if ok else None,
            "ok": ok, "error": None if ok else "latex-to-mathml failed",
        })
    schema = pa.schema([
        ("media_id", pa.int64()), ("latex", pa.string()),
        ("mathml", pa.string()), ("ok", pa.bool_()), ("error", pa.string()),
    ])
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    return _write("mathml_from_image_oracle", pa.table(cols, schema=schema))


def _walk_template_independent(template: dict) -> list[tuple]:
    """INDEPENDENT re-derivation of the pre-order tag-tree flattening (the
    engine's twin lives in functions/tagtree.tag_tree_rows; this one is
    iterative with an explicit stack instead of recursive, written from the
    same contract: depth-first pre-order ordinals per turn, page wrappers
    are not nodes, children come from element_template.template
    .element_create[*].elements in order)."""
    out: list[tuple] = []
    counter = 0
    for page_entry in template["template"]["element_create"]:
        page = int(page_entry["query"]["$and"][0]["$page_num"])
        # stack of (element, parent_node_id, depth, child_index); pushed in
        # reverse so pops preserve document order
        stack = [
            (el, None, 0, ci)
            for ci, el in reversed(list(enumerate(page_entry.get("elements", []))))
        ]
        while stack:
            el, parent, depth, child_index = stack.pop()
            node_id = counter
            counter += 1
            bbox = [float(b) for b in el.get("bbox", [])] or None
            out.append((
                node_id, parent, depth, child_index, page,
                el.get("tag"), el.get("type"), el.get("flag"),
                el.get("heading"),
                int(el["id"]) if "id" in el else None,
                int(el["cell_row"]) if "cell_row" in el else None,
                int(el["cell_column"]) if "cell_column" in el else None,
                bbox,
            ))
            tmpl = el.get("element_template")
            if tmpl:
                kids = [
                    child
                    for create in tmpl["template"]["element_create"]
                    for child in create.get("elements", [])
                ]
                stack.extend(
                    (child, node_id, depth + 1, ci)
                    for ci, child in reversed(list(enumerate(kids)))
                )
    return out


def tag_tree_fixture() -> str:
    """Mirror of q_tag_tree (n_convs=30, median_turns=6, seed=42): scalar
    oracle extraction -> reference-shaped template (oracle/extract.py
    template_for_turn) -> flattened pre-order tag-tree rows via the
    INDEPENDENT walk above (the engine's recursive twin is
    functions/tagtree.tag_tree_rows; both flattenings of every template are
    additionally asserted equal here, so a quiet divergence in either walk
    fails fixture generation/freshness before the driver sees it).
    Nullable ints are scalarized to -1 and the bbox to four rounded doubles
    (-1.0 when absent) because the driver's value-hash canonicalizer
    handles neither mixed None/int columns nor list columns."""
    from action_pdf_accessibility_paddle_docker_spark.functions.tagtree import (
        tag_tree_rows,
    )
    from action_pdf_accessibility_paddle_docker_spark.oracle.extract import (
        template_for_turn,
    )

    names = (
        "conv_id", "turn_idx", "node_id", "parent_node_id", "depth",
        "child_index", "page", "tag", "type", "flag", "heading",
        "formula_id", "cell_row", "cell_column",
        "bbox_x0", "bbox_y0", "bbox_x1", "bbox_y1",
    )
    cols = {k: [] for k in names}
    for row in iter_rows(30, 6, seed=42):
        res = extract_turn(row["text"])
        template = template_for_turn(res)
        nodes = _walk_template_independent(template)
        assert nodes == tag_tree_rows(template), (
            f"independent walk != engine walk for {row['conv_id']}#{row['turn_idx']}"
        )
        for node in nodes:
            (node_id, parent, depth, child_index, page, tag, type_, flag,
             heading, fid, crow, ccol, bbox) = node
            cols["conv_id"].append(row["conv_id"])
            cols["turn_idx"].append(row["turn_idx"])
            cols["node_id"].append(node_id)
            cols["parent_node_id"].append(-1 if parent is None else parent)
            cols["depth"].append(depth)
            cols["child_index"].append(child_index)
            cols["page"].append(page)
            cols["tag"].append(tag or "")
            cols["type"].append(type_ or "")
            cols["flag"].append(flag or "")
            cols["heading"].append(heading or "")
            cols["formula_id"].append(-1 if fid is None else fid)
            cols["cell_row"].append(-1 if crow is None else crow)
            cols["cell_column"].append(-1 if ccol is None else ccol)
            b = bbox if bbox is not None else [-1.0] * 4
            for i, suffix in enumerate(("x0", "y0", "x1", "y1")):
                cols[f"bbox_{suffix}"].append(round(float(b[i]), 6))
    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("node_id", pa.int32()), ("parent_node_id", pa.int32()),
        ("depth", pa.int32()), ("child_index", pa.int32()),
        ("page", pa.int32()), ("tag", pa.string()), ("type", pa.string()),
        ("flag", pa.string()), ("heading", pa.string()),
        ("formula_id", pa.int64()), ("cell_row", pa.int32()),
        ("cell_column", pa.int32()), ("bbox_x0", pa.float64()),
        ("bbox_y0", pa.float64()), ("bbox_x1", pa.float64()),
        ("bbox_y1", pa.float64()),
    ])
    return _write("tag_tree_oracle", pa.table(cols, schema=schema))


def lsh_planes_fixture() -> str:
    """The deterministic hyperplanes behind q_lsh_ann_topk (single set,
    8 planes, dim 64, default salt). With the planes as data, DuckDB can
    compute the identical sign-bit buckets via list_dot_product -- which is
    what upgrades the LSH-ANN entry from rows-only to value-checked."""
    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
        hyperplanes,
    )

    planes = hyperplanes(64, 8)
    schema = pa.schema([("plane_idx", pa.int32()),
                        ("coeffs", pa.list_(pa.float64()))])
    return _write("lsh_planes", pa.table({
        "plane_idx": list(range(planes.shape[0])),
        "coeffs": [p.tolist() for p in planes],
    }, schema=schema))


def lsh_band_planes_fixture() -> str:
    """The banded plane sets behind q_embedding_near_dup_lsh (threshold
    0.35 -> 16 bands x 4 planes, dim 64; salts band:0..band:15)."""
    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
        band_planes,
    )

    rows = {"band": [], "plane_idx": [], "coeffs": []}
    for band, planes in enumerate(band_planes(16, 4, 64)):
        for p_idx, p in enumerate(planes):
            rows["band"].append(band)
            rows["plane_idx"].append(p_idx)
            rows["coeffs"].append(p.tolist())
    schema = pa.schema([("band", pa.int32()), ("plane_idx", pa.int32()),
                        ("coeffs", pa.list_(pa.float64()))])
    return _write("lsh_band_planes", pa.table(rows, schema=schema))


def semdedup_centers_fixture() -> str:
    """Deterministic coarse-quantizer centers for the semantic-dedup
    fixture oracle: 8 evenly-strided embeddings from the sf0.01 table
    (data-derived, like a kmeans++ init, so the Voronoi cells are
    balanced -- md5-seeded Gaussian centers left 5 of 8 cells empty
    because the ||c||^2/2 term of the Euclidean-argmin score dominates
    arbitrary-norm centers). No KMeans fit: with FIXED centers,
    semantic_dedup's entire pipeline is replayable by DuckDB (assignment
    = argmax of list_dot_product(v, c) - ||c||^2/2, pairs a within-cell
    cosine join, representatives a recursive-CTE closure) and the cid
    labels are canonical (no KMeans renumbering). The committed fixture
    stays valid against ANY input -- both engines read the same matrix --
    the stride choice only keeps the cells populated at sf0.01."""
    emb = pq.read_table("/root/testdata/sf0.01/embeddings.parquet")
    ids = emb.column("vec_id").to_pylist()
    vecs = emb.column("embedding").to_pylist()
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    stride = len(order) // 8
    picked = [order[i * stride] for i in range(8)]
    schema = pa.schema([("cid", pa.int32()),
                        ("coeffs", pa.list_(pa.float64()))])
    return _write("semdedup_centers", pa.table({
        "cid": list(range(8)),
        "coeffs": [[float(x) for x in vecs[i]] for i in picked],
    }, schema=schema))


if __name__ == "__main__":
    for fn in (extract_transcripts_fixture, pipeline_extract_dedup_fixture,
               multimodal_decode_fixture, mathml_from_image_fixture,
               tag_tree_fixture, lsh_planes_fixture, lsh_band_planes_fixture,
               semdedup_centers_fixture):
        print(fn())
