"""Train and commit the quality-classifier weights fixture.

Trains the fastText/DCLM-style linear quality model
(``operators/quality_clf.py``) on the stock ``sf0.01`` documents table with
gate-derived weak labels (``label_from_gate`` -- the DCLM bootstrap when no
curated positive set exists), then writes the ``(term, weight)`` rows plus
the ``BIAS_SENTINEL`` intercept row as ONE pyarrow parquet file at
``tests/fixtures/qclf_weights.parquet``.

The committed artifact -- not retraining -- is the contract: scoring under
these FIXED weights is plain relational algebra, so the q_quality_gate
driver leg and the DuckDB oracle replay it exactly (the same pattern as the
committed LSH planes and SemDeDup centers). ``tests/test_quality_clf.py``
guards the fixture (sentinel present, scores replay vs DuckDB, high
agreement with the gate labels it was fit on); training determinism across
environments is NOT required.

Run from the repo root:  python scripts/make_qclf_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from action_pdf_accessibility_paddle_docker_spark.operators import quality_clf as C  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "fixtures", "qclf_weights.parquet")
TRAIN_SF_DIR = "/root/testdata/sf0.01"

# Mild L2 keeps the committed weights small in magnitude (score sums stay
# far from double-rounding hazards); vocab cap is the broadcast bound.
VOCAB_SIZE = 4096
REG_PARAM = 1e-3
MAX_ITER = 100


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make-qclf-fixture")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(f"{TRAIN_SF_DIR}/documents.parquet")
        labeled = C.label_from_gate(docs)
        weights, bias = C.train_quality_classifier(
            labeled, vocab_size=VOCAB_SIZE, reg_param=REG_PARAM,
            max_iter=MAX_ITER,
        )
        rows = sorted(
            (r["term"], r["weight"]) for r in weights.collect()
        )  # vocab-bounded collect; sorted for a stable committed file
        rows.append((C.BIAS_SENTINEL, bias))
        table = pa.table(
            {
                "term": pa.array([t for t, _ in rows], pa.string()),
                "weight": pa.array([w for _, w in rows], pa.float64()),
            }
        )
        pq.write_table(table, OUT)
        print(f"wrote {OUT}: {len(rows) - 1} weights, bias={bias:.6f}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
