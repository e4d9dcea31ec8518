"""Structured Streaming analog + multimodal binary plumbing tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparklog import multimodal as MM
from sparklog import streaming as ST
from sparklog import synth

from conftest import SF_SMOKE


def test_streaming_routes_like_batch(spark, tmp_path):
    """File-stream in, foreachBatch parse+route out — totals match batch."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(in_dir)
    lines = synth.lines_df(spark, SF_SMOKE, corrupt=True)
    # write input as text files; syslog lines may contain no newlines here
    # (documents corpus has none) so text-source framing is safe
    lines.select("line").coalesce(2).write.mode("overwrite").text(in_dir)

    q = ST.start_routed_stream(spark, in_dir, out_dir, ck, once=True)
    q.awaitTermination(300)
    back = spark.read.parquet(out_dir)
    assert back.count() == lines.count()
    sinks = {r["sink"] for r in back.select("sink").distinct().collect()}
    assert "_rejects" in sinks and len(sinks) > 3


def test_streaming_windowed_counts_schema(spark):
    # windowed agg plan compiles against a static frame with same schema
    from sparklog.udf import parse_df

    parsed = parse_df(synth.lines_df(spark, SF_SMOKE))
    win = (
        parsed.filter(F.col("parse_error").isNull())
        .withColumn("event_ts", F.timestamp_seconds(F.col("timestamp")))
        .groupBy(F.window("event_ts", "1 hour"), F.col("severity"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = win.agg(F.sum("n")).collect()[0][0]
    # nil-timestamp rows fall out of the window (null event_ts)
    assert total > 0


def test_multimodal_meta_shapes(spark):
    pages = synth.pages_df(spark, SF_SMOKE)
    meta = MM.extract_meta(pages)
    rows = meta.collect()
    assert len(rows) == pages.count()
    r = {x["doc_id"]: x for x in rows}
    docs = {d["doc_id"]: d for d in
            synth.load_documents(spark, SF_SMOKE).collect()}
    for i, row in r.items():
        assert row["magic"] == "<html>"
        # wrapper adds len("<html><body>") + len("</body></html>") == 26
        assert row["byte_len"] == len(docs[i]["text"].encode()) + 26
        assert 0 <= row["fake_width"] < 1920
        assert 0 <= row["fake_height"] < 1080


def test_multimodal_deterministic_across_partitioning(spark):
    pages = synth.pages_df(spark, SF_SMOKE)
    a = {r["doc_id"]: r["content_hash"]
         for r in MM.extract_meta(pages.repartition(2)).collect()}
    b = {r["doc_id"]: r["content_hash"]
         for r in MM.extract_meta(pages.repartition(7)).collect()}
    assert a == b


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_binary(b"\x89PNG")
