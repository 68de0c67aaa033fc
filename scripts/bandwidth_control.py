#!/usr/bin/env python
"""Same-window scaling evidence: the engine's 8->32 efficiency is only
meaningful relative to what THIS box can do for ANY sustained python
workload at 32 cores. This harness measures, back to back in one run:

  1. pure-python multiprocessing of the SAME extraction kernel (no Spark,
     no Arrow, no JVM) at 8 and 32 processes -> the box's ceiling;
  2. the Spark engine at local[8] and local[32] on the same turns.

If engine_eff ~= control_eff, the engine scales as well as the hardware
allows; the gap engine_eff / control_eff is the engine's own overhead.

Usage: python scripts/bandwidth_control.py [n_turns_per_core]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PER_CORE = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000


def _worker(texts: list[str]) -> int:
    import pandas as pd

    from action_pdf_accessibility_paddle_docker_spark.operators.payload import (
        extract_series,
    )

    n = 0
    for _ in extract_series(pd.Series(texts)):
        n += 1
    return n


def control(nproc: int, texts: list[str]) -> float:
    """Pure-python multiprocessing of the kernel; returns wall seconds for
    nproc * PER_CORE turns (constant work per core)."""
    chunk = len(texts) // nproc
    chunks = [texts[i * chunk:(i + 1) * chunk] for i in range(nproc)]
    with mp.Pool(nproc) as pool:
        pool.map(_worker, [c[:200] for c in chunks])  # warm imports
        t0 = time.perf_counter()
        done = pool.map(_worker, chunks)
        dt = time.perf_counter() - t0
    assert sum(done) == chunk * nproc
    return dt


def engine(master: str, path: str) -> float:
    from pyspark.sql import SparkSession

    from action_pdf_accessibility_paddle_docker_spark.plans.extraction import (
        build_extraction,
    )

    spark = (
        SparkSession.builder.master(master).appName(f"ctl-{master}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .getOrCreate()
    )
    try:
        df = spark.read.parquet(path)
        build_extraction(df.sample(0.05, seed=1), order_output=False).write.format(
            "noop").mode("overwrite").save()
        t0 = time.perf_counter()
        build_extraction(df).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    finally:
        spark.stop()


def main() -> None:
    from action_pdf_accessibility_paddle_docker_spark.sources.transcripts import (
        make_row, turns_for_conv,
    )

    # constant work per core: 32 cores' worth of turns for the 32-way runs,
    # 8 cores' worth for the 8-way runs
    def texts_for(n: int) -> list[str]:
        out: list[str] = []
        conv = 0
        while len(out) < n:
            for t in range(turns_for_conv(conv, 1 << 30, 8)):
                out.append(make_row(42, conv, t)["text"])
                if len(out) >= n:
                    break
            conv += 1
        return out

    t32 = texts_for(PER_CORE * 32)
    path = "/root/repo/_bench_data/transcripts_v2_t500000"
    n_spark = int(open(path + "/_DONE").read())

    # interleave engine and control so both see the same noise window
    e32 = engine("local[32]", path)
    c32 = control(32, t32)
    e8 = engine("local[8]", path)
    c8 = control(8, t32[: PER_CORE * 8])

    ctl_rate32 = PER_CORE * 32 / c32 / 32
    ctl_rate8 = PER_CORE * 8 / c8 / 8
    eng_rate32 = n_spark / e32 / 32
    eng_rate8 = n_spark / e8 / 8
    print(json.dumps({
        "control_per_core_tps": {"p8": round(ctl_rate8, 1), "p32": round(ctl_rate32, 1)},
        "control_eff_8_32": round(ctl_rate32 / ctl_rate8, 3),
        "engine_per_core_tps": {"local8": round(eng_rate8, 1), "local32": round(eng_rate32, 1)},
        "engine_eff_8_32": round(eng_rate32 / eng_rate8, 3),
        "engine_vs_control": round((eng_rate32 / eng_rate8) / (ctl_rate32 / ctl_rate8), 3),
        "engine_sec": {"local8": round(e8, 1), "local32": round(e32, 1)},
        "control_sec": {"p8": round(c8, 1), "p32": round(c32, 1)},
    }))


if __name__ == "__main__":
    main()
