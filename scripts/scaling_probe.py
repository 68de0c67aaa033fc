#!/usr/bin/env python
"""Focused 8->32 scaling probe: full ordered extraction (the BASELINE metric)
min-of-N at two masters. Usage: python scripts/scaling_probe.py [reps] [masters...]"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def run(master, path, reps, order=True):
    from pyspark.sql import SparkSession
    from action_pdf_accessibility_paddle_docker_spark.plans.extraction import build_extraction
    spark=(SparkSession.builder.master(master).appName(f"probe-{master}")
        .config("spark.sql.shuffle.partitions","32")
        .config("spark.sql.adaptive.enabled","true")
        .config("spark.sql.session.timeZone","UTC")
        .config("spark.ui.enabled","false")
        .config("spark.driver.memory","48g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", os.environ.get("PROBE_BATCH","4096"))
        .config("spark.sql.files.maxPartitionBytes","8m")
        .getOrCreate())
    try:
        df=spark.read.parquet(path)
        build_extraction(df.sample(0.08,seed=1), order_output=False).write.format("noop").mode("overwrite").save()
        best=float("inf")
        for _ in range(reps):
            t0=time.perf_counter()
            build_extraction(df, order_output=order).write.format("noop").mode("overwrite").save()
            best=min(best,time.perf_counter()-t0)
        return best
    finally:
        spark.stop()

if __name__=="__main__":
    reps=int(sys.argv[1]) if len(sys.argv)>1 else 2
    masters=sys.argv[2:] or ["local[8]","local[32]"]
    path="/root/repo/_bench_data/transcripts_v2_t500000"
    n=int(open(path+"/_DONE").read())
    out={"turns":n}
    for m in masters:
        s=run(m,path,reps)
        out[m]=round(s,2); out[m+"_tps"]=round(n/s,1)
    if "local[8]" in out and "local[32]" in out:
        out["eff_8_32"]=round((out["local[32]_tps"]/out["local[8]_tps"])/4,3)
    print(json.dumps(out))
