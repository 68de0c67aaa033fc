#!/usr/bin/env python
"""Sign the q_minhash_lsh driver-bench drift (1.01s r2 -> 1.39 r3 -> 1.95 r4).

The operator's md5-path expressions are bit-identical to round 2 (verified
by git diff of minhash_signatures/minhash_lsh_candidates/shingle_table/
normalized between the r2 snapshot and HEAD), so a code A/B cannot explain
the drift -- the only candidates are the measurement window and the bench
session context. This probe measures the HISTORICAL md5 family explicitly
(the family the r2-r4 numbers were taken on -- the registry default moved
to md5mix in round 5, so building the registry entry would time the wrong
code), ISOLATED in a fresh session, interleaved round-robin with a
non-drifted control (q_simhash: same input, same explode+agg family,
stable 1.17-1.5s across rounds), min-of-N per leg -- the paired protocol
from BASELINE.md. The md5mix leg rides along for the family comparison.

Usage: python scripts/minhash_drift_probe.py [rounds]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import SparkSession

    from action_pdf_accessibility_paddle_docker_spark.plans.queries import REGISTRY

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .getOrCreate()
    )
    from action_pdf_accessibility_paddle_docker_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    legs = {
        "minhash_md5_historical": lambda: minhash_lsh_candidates(
            docs, hash_family="md5"
        ),
        "minhash_md5mix_default": lambda: minhash_lsh_candidates(
            docs, hash_family="md5mix"
        ),
        "q_simhash_control": lambda: REGISTRY["q_simhash"][0](spark, SF_DIR),
    }
    for fn in legs.values():  # warm (JIT, parquet footer cache)
        fn().write.format("noop").mode("overwrite").save()
    times = {n: [] for n in legs}
    for _ in range(rounds):
        for n, fn in legs.items():  # interleaved: all legs see the same windows
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[n].append(round(time.perf_counter() - t0, 3))
    out = {n: {"rounds": ts, "min": min(ts)} for n, ts in times.items()}
    out["md5_vs_control_min"] = round(
        out["minhash_md5_historical"]["min"] / out["q_simhash_control"]["min"], 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
