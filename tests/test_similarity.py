"""Similarity search: LSH recall vs brute force; multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators.multimodal import (
    decode_media,
    make_fake_audio,
    make_fake_formula_image,
    make_fake_image,
    mathml_from_images,
    resize_images,
    sample_frames,
)
from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_bucketed_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_brute_force_topk_shape(spark, emb):
    out = brute_force_topk(emb, emb.where(F.col("vec_id") < 10), k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(10))
    for q, rows in by_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
        sims = [r["sim"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_lsh_recall_at_5(spark, emb):
    exact = brute_force_topk(emb, emb.where(F.col("vec_id") < 20), k=5).collect()
    approx = lsh_bucketed_topk(emb, emb.where(F.col("vec_id") < 20), k=5, n_planes=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q, s in exact_sets.items():
        total += len(s)
        hits += len(s & approx_sets.get(q, set()))
    recall = hits / total
    # 4 planes over 64-dim random vectors: bucket match is coarse; recall
    # must at least beat random chance substantially and be deterministic
    assert recall > 0.1, recall
    again = lsh_bucketed_topk(emb, emb.where(F.col("vec_id") < 20), k=5, n_planes=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, approx))


def test_near_dup_lsh_front_door_recall(spark, emb):
    """The default (banded-LSH) near-dup path must recover most exact pairs
    at the harness threshold and only emit true positives (every candidate
    is exact-cosine re-checked)."""
    exact = set(map(tuple, embedding_near_dup_pairs(
        emb, threshold=0.35, method="exact").select("id_a", "id_b").collect()))
    approx = set(map(tuple, embedding_near_dup_pairs(
        emb, threshold=0.35).select("id_a", "id_b").collect()))
    assert approx <= exact  # no false positives (exact re-check)
    assert exact, "fixture must produce near-dup pairs"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6, recall
    # determinism
    again = set(map(tuple, embedding_near_dup_pairs(
        emb, threshold=0.35).select("id_a", "id_b").collect()))
    assert again == approx


def test_mathml_from_images(spark):
    """Image->XML composed path (reference src/generate_mathml.py:54-78):
    recognition seam -> shared LaTeX->MathML -> <semantics> annotation."""
    from action_pdf_accessibility_paddle_docker_spark.functions.mathml import (
        add_mathml_metadata,
        latex_to_mathml,
    )

    rows = [(1, make_fake_formula_image(r"x^{2}+y_{1}")),
            (2, make_fake_formula_image(r"\frac{a}{b}")),
            (3, b"JUNKxxxx")]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r["media_id"]: r for r in mathml_from_images(df).collect()}
    assert out[1]["ok"] and out[1]["latex"] == r"x^{2}+y_{1}"
    assert out[1]["mathml"] == add_mathml_metadata(latex_to_mathml(r"x^{2}+y_{1}"))
    assert "semantics" in out[1]["mathml"] and "annotation" in out[1]["mathml"]
    assert out[2]["ok"] and "mfrac" in out[2]["mathml"]
    assert out[3]["ok"] is False and "unknown magic" in out[3]["error"]


def test_multimodal_decode(spark):
    rows = [(1, make_fake_image(1, 40, 30)), (2, make_fake_audio(2, 16000, 100)),
            (3, b"JUNKxxxxxxxx"), (4, b"")]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r["media_id"]: r for r in decode_media(df).collect()}
    assert out[1]["kind"] == "image" and (out[1]["width"], out[1]["height"]) == (40, 30)
    assert out[1]["ok"] and out[1]["mean_value"] is not None
    assert out[2]["kind"] == "audio" and out[2]["sample_rate"] == 16000 and out[2]["n_samples"] == 100
    assert out[3]["ok"] is False and "unknown magic" in out[3]["error"]
    assert out[4]["ok"] is False


def test_multimodal_resize_and_frames(spark):
    rows = [(1, make_fake_image(1, 64, 48)), (2, make_fake_audio(2, 8000, 128))]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    rs = resize_images(df, 16, 12).collect()
    assert len(rs) == 1 and (rs[0]["out_w"], rs[0]["out_h"]) == (16, 12)
    assert len(rs[0]["payload"]) == 8 + 16 * 12
    fr = sample_frames(df, every_n=4).collect()
    assert len(fr) == 1 and fr[0]["out_w"] == 32
    # decode of resized output round-trips
    back = decode_media(spark.createDataFrame(
        [(9, bytes(rs[0]["payload"]))], "media_id bigint, payload binary")).collect()[0]
    assert back["kind"] == "image" and (back["width"], back["height"]) == (16, 12)


def test_ivf_recall_and_exhaustive_probe(spark, emb):
    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
        ivf_topk,
    )

    queries = emb.where(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(s & approx_sets.get(q, set())) for q, s in exact_sets.items())
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total > 0.3, hits / total

    # probing ALL centroids must reproduce brute force exactly
    full = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, exact))


def test_ivf_partitioned_layout_prunes_probe_scan(spark, tmp_path):
    """SCALE.md's IVF claim made concrete: write the corpus partitioned by
    its coarse-quantizer cell (ivf_assignments -> partitionBy('cid')); a
    probe restricted to n_probe cells must show PartitionFilters on cid in
    the scan -- i.e. the probe reads n_probe/n_centroids of the data, it
    does not filter after a full scan."""
    from pyspark.sql import functions as F

    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
        ivf_assignments,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned = ivf_assignments(emb, n_centroids=8)
    out = tmp_path / "ivf_layout"
    assigned.write.partitionBy("cid").parquet(str(out))

    probed = spark.read.parquet(str(out)).where(F.col("cid").isin([0, 3]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters")[1][:120]
    # the pruned read returns exactly the two cells' rows
    cids = {r["cid"] for r in probed.select("cid").distinct().collect()}
    assert cids <= {0, 3}
    full = spark.read.parquet(str(out)).count()
    assert 0 < probed.count() < full


def test_null_or_ragged_embedding_fails_loudly(spark):
    """The LSH entry points must ERROR on null/ragged embeddings, not
    silently drop them: signature_udf maps invalid rows to NULL buckets
    that the bucket join / posexplode would swallow, quietly
    under-reporting near-duplicates. _assert_dim raises per-row on both
    the NULL and the wrong-dim case (with a readable message)."""
    import pytest

    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
        embedding_near_dup_pairs,
        lsh_bucketed_topk,
    )

    good = [(i, [float(i), 1.0, 0.5, -0.25]) for i in range(6)]
    for bad_vec in (None, [1.0, 2.0]):  # NULL and ragged
        df = spark.createDataFrame(
            good + [(99, bad_vec)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="NULL or dimension"):
            embedding_near_dup_pairs(df, threshold=0.5, dim=4).collect()
        with pytest.raises(Exception, match="NULL or dimension"):
            embedding_near_dup_pairs(
                df, threshold=0.5, dim=4, method="exact"
            ).collect()
        with pytest.raises(Exception, match="NULL or dimension"):
            lsh_bucketed_topk(df, df.where("vec_id < 2"), k=2, dim=4).collect()
    # pre-filtered input (the documented caller-side contract) works
    df = spark.createDataFrame(
        good + [(99, None)], "vec_id long, embedding array<double>"
    )
    pairs = embedding_near_dup_pairs(
        df.where("embedding IS NOT NULL"), threshold=0.5, dim=4
    )
    assert pairs.count() >= 0


def test_semantic_dedup_collapses_within_cluster_groups(spark):
    """SemDeDup-style semantic dedup: identical (and near-identical)
    embeddings collapse to their min-id representative inside a KMeans
    cluster; distinct directions survive; assignments are stable under a
    re-shard. Composing the survivors with cap_per_stratum on cid gives
    the paper's cluster-balanced diversity sampling."""
    import numpy as np

    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
        semantic_dedup,
    )
    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import (
        cap_per_stratum,
    )

    rng = np.random.default_rng(3)
    e = np.eye(8)
    rows = []
    # group A: ids 0-3 around +x, group B: ids 10-12 around +y
    for i in range(4):
        rows.append((i, (e[0] + 0.01 * rng.standard_normal(8)).tolist()))
    for i in range(10, 13):
        rows.append((i, (e[1] + 0.01 * rng.standard_normal(8)).tolist()))
    # five mutually-distant singletons
    for j, i in enumerate(range(20, 25)):
        rows.append((i, e[2 + j].tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = semantic_dedup(df, threshold=0.95, n_clusters=3)
    got = {r["vec_id"]: (r["cid"], r["rep_id"]) for r in out.collect()}
    assert len(got) == len(rows)
    # groups collapse to min id
    assert all(got[i][1] == 0 for i in range(4))
    assert all(got[i][1] == 10 for i in range(10, 13))
    # singletons survive as their own rep (they may share a KMeans cell,
    # but their cosine ~0 keeps them apart)
    assert all(got[i][1] == i for i in range(20, 25))
    survivors = {i for i, (_, rep) in got.items() if rep == i}
    assert survivors == {0, 10, 20, 21, 22, 23, 24}

    # re-shard stability of the SEMANTIC grouping: rep assignment is
    # stable; cid labels are not canonical (the KMeans fit can number its
    # cells differently on a different partitioning), so only reps compare
    out2 = semantic_dedup(df.repartition(7), threshold=0.95, n_clusters=3)
    assert {r["vec_id"]: r["rep_id"] for r in out2.collect()} == {
        i: rep for i, (_, rep) in got.items()
    }

    # cluster-balanced sampling: at most 2 survivors per KMeans cell
    surv = out.where(F.col("rep_id") == F.col("vec_id"))
    capped = cap_per_stratum(
        surv, cap=2, stratum_col="cid", id_col="vec_id", method="exact"
    )
    per_cell = {r["cid"]: r["n"] for r in
                capped.groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n <= 2 for n in per_cell.values())
    assert capped.count() >= 3  # every non-empty cell keeps something


def test_semantic_dedup_matches_duckdb_fixture_oracle(spark):
    """Driver-strength certification of semantic_dedup (round-5 verdict
    item 5): with the committed centers fixture (prefitted quantizer, no
    KMeans fit), the ENTIRE pipeline is replayed in DuckDB -- assignment
    as an argmax of list_dot_product(v,c) - ||c||^2/2 (exactly the
    Euclidean-argmin score the Arrow UDF computes), within-cell cosine
    pairs, and the connected components as a recursive-CTE closure --
    and every (vec_id, cid, rep_id) row must agree. With fixed centers
    the cid labels are canonical, so they compare too (not just reps).
    Runs at sf0.01 (the driver's own comparison scale): 500 vectors, all
    8 cells populated, 79 within-cell pairs at threshold 0.35 -- multiple
    multi-member components, so the closure is binding."""
    import os

    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
        semantic_dedup,
    )

    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      "semdedup_centers.parquet")
    t = pq.read_table(fx)
    cids = t.column("cid").to_pylist()
    coeffs = t.column("coeffs").to_pylist()
    centers = np.array(
        [coeffs[cids.index(c)] for c in sorted(cids)], dtype=np.float64
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = semantic_dedup(emb, threshold=0.35, centers=centers)
    got = sorted((r["vec_id"], r["cid"], r["rep_id"]) for r in out.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "'/root/testdata/sf0.01/embeddings.parquet'"
    )
    want = sorted(map(tuple, con.sql(f"""
        WITH RECURSIVE
        cent AS (SELECT cid, coeffs FROM read_parquet('{fx}')),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
          SELECT e.vec_id, c.cid,
                 list_dot_product(e.v, c.coeffs)
                   - 0.5 * list_dot_product(c.coeffs, c.coeffs) AS score
          FROM e CROSS JOIN cent c
        ),
        assign AS (
          -- numpy argmax takes the FIRST maximum: ties (measure-zero on
          -- real data) break toward the lower cid on both sides
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid, row_number() OVER (
              PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
            FROM scored) WHERE rn = 1
        ),
        cand AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM assign a JOIN assign b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
          JOIN e ea ON ea.vec_id = a.vec_id
          JOIN e eb ON eb.vec_id = b.vec_id
          WHERE list_cosine_similarity(ea.v, eb.v) >= 0.35
        ),
        edges AS (
          SELECT id_a, id_b FROM cand UNION ALL SELECT id_b, id_a FROM cand
        ),
        reach(a, b) AS (
          SELECT vec_id, vec_id FROM e
          UNION
          SELECT r.a, x.id_b FROM reach r JOIN edges x ON r.b = x.id_a
        )
        SELECT s.vec_id, s.cid, l.rep_id
        FROM assign s JOIN (
          SELECT a AS vec_id, min(b) AS rep_id FROM reach GROUP BY a
        ) l USING (vec_id)
        ORDER BY s.vec_id
    """).fetchall()))
    assert got == want
    # discriminating: some groups actually collapsed
    n_collapsed = sum(1 for vid, _, rep in got if rep != vid)
    assert n_collapsed >= 10, n_collapsed


def test_semantic_dedup_empty_input_yields_empty_not_jvm_crash(spark):
    """An emptied pipeline (quality gate dropped everything, or an
    embedding side table disjoint from the surviving ids) must produce an
    empty (id, cid, rep_id) frame -- NOT MLlib's 'Nothing has been added
    to this summarizer' JVM crash from fitting KMeans on zero rows.
    fit_quantizer itself fails loudly with the actual cause."""
    import pytest

    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
        fit_quantizer,
        semantic_dedup,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semantic_dedup(empty, threshold=0.9, n_clusters=4)
    assert out.columns == ["vec_id", "cid", "rep_id"]
    assert out.count() == 0
    # dtypes stable so downstream joins/caps still resolve
    assert dict(out.dtypes) == {
        "vec_id": "bigint", "cid": "int", "rep_id": "bigint"
    }
    with pytest.raises(ValueError, match="no rows"):
        fit_quantizer(empty, n_centroids=4)
