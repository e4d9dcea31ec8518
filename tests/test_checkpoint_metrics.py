"""Checkpoint resume + per-partition lineage/metrics tests (D9/D10)."""

from __future__ import annotations

import json
import subprocess
import sys

from pyspark.sql import functions as F

from sparklog import checkpoint as CK
from sparklog import metrics as M
from sparklog import synth
from sparklog.udf import parse_df

from conftest import SF_SMOKE


def test_manifest_atomic_roundtrip(tmp_path):
    ck = str(tmp_path / "ckpt")
    assert CK.pending_chunks(ck, 4) == [0, 1, 2, 3]
    CK.write_manifest_entry(ck, {"chunk": 2, "rows_in": 10})
    assert CK.pending_chunks(ck, 4) == [0, 1, 3]
    assert CK.done_chunks(ck)[2]["rows_in"] == 10
    # idempotent rewrite
    CK.write_manifest_entry(ck, {"chunk": 2, "rows_in": 11})
    assert CK.done_chunks(ck)[2]["rows_in"] == 11


def test_partition_metrics_conservation(spark):
    lines = synth.lines_df(spark, SF_SMOKE, corrupt=True).repartition(4)
    tagged = M.tag_partitions(lines)
    parsed = parse_df(tagged)
    mx = M.partition_metrics(parsed).collect()
    assert len(mx) == 4
    total_in = sum(r["rows_in"] for r in mx)
    assert total_in == lines.count()
    for r in mx:
        assert r["rows_in"] == r["rows_ok"] + r["rows_rejected"]
        assert r["bytes_in"] > 0
    assert sum(r["rows_rejected"] for r in mx) > 0


def _run_pipeline(args):
    return subprocess.run(
        [sys.executable, "/root/repo/jobs/run_pipeline.py", *args],
        capture_output=True, text=True, timeout=600,
    )


def test_run_pipeline_resume(tmp_path):
    """Full job in two halves: run chunks partially, then resume; the
    final manifest + sinks must equal a single-shot run's totals."""
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    common = ["--input", SF_SMOKE, "--output", out, "--checkpoint", ck,
              "--chunks", "3", "--parallelism", "4", "--corrupt"]

    # simulate a crashed first run: pre-mark chunk 1 done with fake entry,
    # run, then verify only 0 and 2 were processed
    CK.write_manifest_entry(ck, {"chunk": 1, "rows_in": -1, "rows_ok": -1,
                                 "rows_rejected": -1, "sink_counts": {}})
    r1 = _run_pipeline(common)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "chunks pending: [0, 2]" in r1.stdout

    # now clear chunk 1's fake entry and resume: only chunk 1 runs
    import os
    os.remove(os.path.join(CK.manifest_path(ck), "chunk-00001.json"))
    r2 = _run_pipeline(common)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "chunks pending: [1]" in r2.stdout

    done = CK.done_chunks(ck)
    assert sorted(done) == [0, 1, 2]
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary["rows_in"] == 500  # sf0.001 documents
    assert summary["rows_ok"] + summary["rows_rejected"] == 500
    assert summary["rows_rejected"] > 0


def test_chunking_is_partition_stable(spark):
    """Chunk assignment depends only on doc_id, never on partitioning."""
    lines = synth.lines_df(spark, SF_SMOKE).withColumn("c", CK.chunk_col(8))
    a = {r["doc_id"]: r["c"] for r in lines.repartition(2).collect()}
    b = {r["doc_id"]: r["c"] for r in lines.repartition(16).collect()}
    assert a == b
