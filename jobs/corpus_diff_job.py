#!/usr/bin/env python
"""Diff two corpus snapshots: what was added, removed, changed, unchanged.

The data-ops companion to the CDC dedup family -- run it between crawl N
and crawl N+1, before/after a curation pass, or across a retention prune,
and get both the bounded summary (always printed as the job's JSON line)
and, with ``--output``, the full per-key verdict table for downstream
investigation (e.g. join 'changed' back to the corpus to sample rewrites).

Examples:
  spark-submit --py-files pkg.zip jobs/corpus_diff_job.py \
      --old /data/crawl_n --new /data/crawl_n1            # id-keyed verdicts

  spark-submit ... --by content                            # id-free set diff
  spark-submit ... --output /reports/diff_n_n1             # + verdict table

Scale shape: one union + one map-side-combined aggregate on the key --
never a join (see operators.dedup.corpus_diff). The summary collect is at
most 4 rows (the status domain).

Prints ONE JSON line: {"mode": "corpus-diff", "by": ..., "counts": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)


def run_diff(spark, args) -> dict:
    """The job body on a provided session (tested in-session; the
    spark-submit surface is exercised by the verify drive)."""
    from action_pdf_accessibility_paddle_docker_spark.operators import dedup as D

    old = spark.read.parquet(args.old)
    new = spark.read.parquet(args.new)
    diff = D.corpus_diff(
        old, new, by=args.by, id_col=args.id_col, text_col=args.text_col
    )
    if args.output:
        # write once, summarize from the written table -- the diff
        # aggregate never executes twice
        diff.write.mode("error").parquet(args.output)
        diff = spark.read.parquet(args.output)
    counts = {
        r["status"]: r["count"]
        for r in diff.groupBy("status").count().collect()
    }
    return {
        "mode": "corpus-diff", "by": args.by, "counts": counts,
        "output": args.output,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description="Diff two corpus snapshots")
    ap.add_argument("--old", required=True,
                    help="parquet dir of the EARLIER snapshot")
    ap.add_argument("--new", required=True,
                    help="parquet dir of the LATER snapshot")
    ap.add_argument("--by", choices=("id", "content"), default="id",
                    help="'id': per-document verdicts keyed on --id-col; "
                         "'content': id-free fingerprint set diff "
                         "(recrawls that renumber documents)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--output", default=None,
                    help="optional parquet dir for the full verdict table "
                         "(the summary prints either way)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("corpus-diff").getOrCreate()
    try:
        print(json.dumps(run_diff(spark, args)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
