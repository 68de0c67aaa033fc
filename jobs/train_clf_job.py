#!/usr/bin/env python
"""Train the model-based quality classifier and persist the artifact.

The DCLM recipe: fit a linear bag-of-words model on a BOUNDED labeled
sample (curated positives vs raw negatives -- or, bootstrap mode, the
heuristic gate's verdict as weak labels), then ship the weights to
``corpus_job --stages classify`` which scores the full corpus with pure
JVM relational algebra (one scan, broadcast weights join).

Examples:
  # curated labels in the input table
  spark-submit --py-files pkg.zip jobs/train_clf_job.py \
      --input /data/labeled_sample --label-col label \
      --output /models/qclf

  # weak-label bootstrap from the heuristic gate (no curated set yet)
  spark-submit --py-files pkg.zip jobs/train_clf_job.py \
      --input /data/sample --weak-labels --output /models/qclf

Prints ONE JSON line: vocab size kept, bias, label balance, and training
agreement (share of the sample the fitted model re-labels correctly --
an optimizer sanity check, not a generalization claim; hold out an eval
split for that).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)


def main() -> None:
    ap = argparse.ArgumentParser(description="Train the quality classifier")
    ap.add_argument("--input", required=True,
                    help="labeled sample parquet (bounded -- DCLM fits on "
                         "~1e6 docs, never the corpus)")
    ap.add_argument("--output", required=True,
                    help="model artifact path (parquet; weights + bias row)")
    ap.add_argument("--label-col", default="label",
                    help="0/1 quality label column on the input")
    ap.add_argument("--weak-labels", action="store_true",
                    help="ignore --label-col; derive weak labels from the "
                         "heuristic quality gate (gate-pass = 1.0)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--vocab-size", type=int, default=1 << 18)
    ap.add_argument("--min-df", type=float, default=1.0,
                    help="CountVectorizer minDF (int >= 1: doc count; "
                         "float < 1: doc fraction)")
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--reg-param", type=float, default=1e-3)
    ap.add_argument("--elastic-net", type=float, default=0.0,
                    help="L1 share (sparsifies the artifact)")
    ap.add_argument("--no-bigrams", action="store_true",
                    help="unigram features only")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="threshold used for the reported train agreement")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from action_pdf_accessibility_paddle_docker_spark.operators import (
        quality_clf as QC,
    )

    spark = SparkSession.builder.appName("train-quality-clf").getOrCreate()
    df = spark.read.parquet(args.input)
    if args.weak_labels:
        labeled = QC.label_from_gate(df, text_col=args.text_col)
        label_col = "label"
    else:
        if args.label_col not in df.columns:
            raise SystemExit(
                f"--label-col {args.label_col!r} not on the input "
                f"(columns: {df.columns}); pass --weak-labels to bootstrap "
                "from the heuristic gate"
            )
        labeled, label_col = df, args.label_col
    bigrams = not args.no_bigrams
    weights, bias = QC.train_quality_classifier(
        labeled, label_col=label_col, text_col=args.text_col,
        vocab_size=args.vocab_size, min_df=args.min_df,
        max_iter=args.max_iter, reg_param=args.reg_param,
        elastic_net=args.elastic_net, bigrams=bigrams,
    )
    QC.save_classifier(weights, bias, args.output)

    # train agreement: score the sample under the saved model (bounded)
    scored = QC.score_documents(
        labeled, weights, bias=bias, threshold=args.threshold,
        text_col=args.text_col, id_col=args.id_col, bigrams=bigrams,
    ).join(labeled.select(args.id_col, label_col), args.id_col)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("double")).alias("n_pos"),
        F.sum(
            (F.col("clf_keep") == (F.col(label_col) == 1.0)).cast("long")
        ).alias("n_agree"),
    ).collect()[0]
    print(json.dumps({
        "mode": "train-clf",
        "n_weights": weights.count(),
        "bias": bias,
        "n_train": int(agg["n"]),
        "n_pos": int(agg["n_pos"]),
        "train_agreement": round(int(agg["n_agree"]) / max(1, int(agg["n"])), 4),
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
