"""A/B probe that justified the mapInArrow extraction kernel (round 3).

Compares the production `build_extraction` (mapInArrow: passthrough columns
re-emitted zero-copy, only `text` materialized into Python) against the
round-2 mapInPandas formulation, kept here verbatim as the control. Paired
alternation, min-of-mode, same session — the VM noise protocol from
bench.py. Measured: best 6.69s vs 8.91s on 489k turns at local[32] (1.33×).
Outputs are value-identical row-for-row on every data column; `part_id`
(physical partition lineage) may differ because AQE coalesces the range
shuffle per plan shape.

Run: python scripts/arrow_kernel_probe.py [cpus]
"""

import sys
import time

sys.path.insert(0, ".")

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.config import effective_thresholds
from action_pdf_accessibility_paddle_docker_spark.plans.extraction import (
    OUTPUT_DDL,
    build_extraction,
)

INPUT = "_bench_data/transcripts_v2_t500000"


def make_legacy_pandas_kernel(thresholds=None):
    """The round-2 kernel, unchanged: full arrow->pandas->arrow round trip."""
    th = thresholds if thresholds is not None else effective_thresholds()

    def kernel(batches):
        import gc

        from pyspark import TaskContext

        from action_pdf_accessibility_paddle_docker_spark.operators.detector import (
            get_detector,
        )
        from action_pdf_accessibility_paddle_docker_spark.operators.payload import (
            extract_series,
        )

        if gc.get_threshold()[0] < 100_000:
            gc.set_threshold(200_000, 50, 25)
        detector = get_detector(th, "stub")
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            kinds = [""] * n
            texts = [""] * n
            regions = [[]] * n
            mathml = [[]] * n
            n_regions = [0] * n
            n_artifacts = [0] * n
            n_pages = [0] * n
            errors = [None] * n
            for i, res in enumerate(extract_series(pdf["text"], th, True, True, detector)):
                kinds[i] = res["payload_kind"]
                texts[i] = res["extracted_text"]
                regions[i] = res["regions"]
                mathml[i] = res["mathml"]
                n_regions[i] = len(res["regions"])
                n_artifacts[i] = res["n_artifacts"]
                n_pages[i] = res["n_pages"]
                errors[i] = res.get("error")
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values,
                    "turn_idx": pdf["turn_idx"].values,
                    "role": pdf["role"].values,
                    "tool": pdf["tool"].values,
                    "ts": pdf["ts"].values,
                    "payload_kind": kinds,
                    "extracted_text": texts,
                    "regions": regions,
                    "mathml": mathml,
                    "n_regions": n_regions,
                    "n_artifacts": n_artifacts,
                    "n_pages": n_pages,
                    "error": errors,
                    "part_id": part_id,
                }
            )

    return kernel


def build_legacy(df):
    src = df.select("conv_id", "turn_idx", "role", "tool", "ts", "text")
    src = src.repartitionByRange("conv_id", "turn_idx").sortWithinPartitions(
        "conv_id", "turn_idx"
    )
    return src.mapInPandas(make_legacy_pandas_kernel(), schema=OUTPUT_DDL)


def run(df, variant):
    t0 = time.monotonic()
    if variant == "legacy_pandas":
        n = build_legacy(df).count()
    else:
        n = build_extraction(df).count()
    return n, time.monotonic() - t0


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(INPUT)
    df.sample(0.02).count()  # warm workers

    # correctness: identical output hash on all data columns (part_id is
    # physical lineage and excluded by design)
    data_cols = [c for c in OUTPUT_DDL.split(", ") if not c.startswith("part_id")]
    names = [c.split(" ")[0] for c in data_cols]

    def h(d):
        return (
            d.select(F.md5(F.to_json(F.struct(*names))).alias("h"))
            .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")))
            .collect()[0][0]
        )

    small = spark.read.parquet("_bench_data/transcripts_v2_t50000")
    ha, hb = h(build_legacy(small)), h(build_extraction(small))
    print(f"data-column hash equal: {ha == hb} ({ha} vs {hb})")

    times = {"legacy_pandas": [], "arrow": []}
    for _ in range(3):
        for v in ("legacy_pandas", "arrow"):
            n, dt = run(df, v)
            times[v].append(dt)
            print(f"{v}: {n} rows in {dt:.2f}s  ({n/dt:,.0f} t/s)")
    for v, ts in times.items():
        best = min(ts)
        print(f"BEST {v}: {best:.2f}s  ({489065/best:,.0f} t/s)")


if __name__ == "__main__":
    main()
