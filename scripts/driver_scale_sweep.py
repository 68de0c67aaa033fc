"""Mirror the driver's CORRECTNESS gate at ITS scale: run every
oracle-bearing harness entry on Spark at sf0.01 (the driver compares at
sf0.01; the pytest mimic runs sf0.001) and value-compare against DuckDB.

Run from the repo root:  python scripts/driver_scale_sweep.py [sf_dir]
Prints OK per query and a final FAILS count (nonzero exit on failure).
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return ",".join(map(str, v))
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    fails = []
    for name in sorted(oracles):
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(tuple(_norm(r[c]) for c in scols) for r in sdf.collect())
            rel = con.sql(oracles[name])
            idx = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
            drows = sorted(
                tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()
            )
            if sorted(rel.columns) != scols:
                fails.append((name, "schema", scols, sorted(rel.columns)))
            elif srows != drows:
                diff = [(a, b) for a, b in zip(srows, drows) if a != b][:2]
                fails.append((name, "values", len(srows), len(drows), diff))
            else:
                print("OK", name, flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            fails.append((name, "err", f"{type(e).__name__}: {str(e)[:140]}"))
    print("FAILS:", len(fails))
    for f in fails:
        print("FAIL", f)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
