"""corpus_diff_job: the snapshot-diff CLI's body on the shared session
(the spark-submit surface is exercised by the verify drive)."""

import argparse

import pyarrow as pa
import pyarrow.parquet as pq

from jobs.corpus_diff_job import run_diff


def _ns(**kw):
    base = dict(by="id", id_col="doc_id", text_col="text", output=None)
    base.update(kw)
    return argparse.Namespace(**base)


def _write(path, rows):
    path.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(path / "p.parquet"))


def test_diff_job_both_modes(spark, tmp_path):
    old_d, new_d = tmp_path / "old", tmp_path / "new"
    _write(old_d, [
        dict(doc_id=i, text=f"doc body {i}") for i in range(5)
    ])
    _write(new_d, [
        dict(doc_id=0, text="doc body 0"),          # unchanged
        dict(doc_id=1, text="doc BODY  1"),          # unchanged (normalized)
        dict(doc_id=2, text="rewritten body two"),   # changed
        # 3, 4 removed
        dict(doc_id=9, text="fresh body nine"),      # added
    ])
    res = run_diff(spark, _ns(old=str(old_d), new=str(new_d)))
    assert res["counts"] == {
        "unchanged": 2, "changed": 1, "removed": 2, "added": 1
    }
    # content mode: id-free set view of the same snapshots
    res_c = run_diff(spark, _ns(old=str(old_d), new=str(new_d), by="content"))
    assert res_c["counts"] == {"common": 2, "removed": 3, "added": 2}
    # --output persists the verdict table and the summary reads from it
    out = tmp_path / "verdicts"
    res_o = run_diff(
        spark, _ns(old=str(old_d), new=str(new_d), output=str(out))
    )
    assert res_o["counts"] == res["counts"]
    got = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got[2] == "changed" and got[9] == "added" and got[4] == "removed"
