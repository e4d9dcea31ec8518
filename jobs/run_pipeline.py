"""spark-submit entry point: the full checkpoint-resumable pipeline.

Usage:
    spark-submit --py-files sparklog.zip jobs/run_pipeline.py \
        --input /root/testdata/sf0.01 --output /tmp/out \
        --checkpoint /tmp/ckpt [--chunks 8] [--parallelism 32] [--corrupt]

Stages per chunk (SURVEY.md §2D): scan -> synth -> tag lineage -> parse
(vectorized UDF) -> enrich (broadcast joins) -> salted route write
(per-severity sinks + rejects) -> hourly agg -> metrics; then the chunk's
manifest entry is committed atomically. Re-running after a crash skips
completed chunks (anti-join against the manifest).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# running as a plain script puts jobs/ on sys.path; add the repo root so
# `sparklog` imports without --py-files in local runs
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir with documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--corrupt", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparklog import checkpoint as CK
    from sparklog import metrics as M
    from sparklog import pipeline as PL
    from sparklog import synth
    from sparklog.session import build_spark
    from sparklog.udf import parse_df

    master = f"local[{args.parallelism}]" if args.parallelism else None
    spark = build_spark(app="sparklog-pipeline", master=master,
                        shuffle_partitions=args.parallelism)

    pending = CK.pending_chunks(args.checkpoint, args.chunks)
    print(f"chunks pending: {pending}")

    lines_all = synth.lines_df(spark, args.input, corrupt=args.corrupt)
    lines_all = lines_all.withColumn("chunk", CK.chunk_col(args.chunks))

    for chunk in pending:
        t0 = time.perf_counter()
        chunk_lines = lines_all.filter(F.col("chunk") == chunk).drop("chunk")
        tagged = M.tag_partitions(chunk_lines)
        parsed = parse_df(tagged)
        enriched = PL.enrich(parsed, spark, with_lang=False)

        sink_dir = os.path.join(args.output, f"chunk={chunk}")
        counts = PL.route_write(enriched, sink_dir)

        agg = PL.hourly_agg(enriched.filter(F.col("parse_error").isNull()))
        agg.write.mode("overwrite").parquet(
            os.path.join(args.output, f"agg/chunk={chunk}")
        )
        metrics = M.partition_metrics(enriched).collect()
        metrics_rows = [r.asDict() for r in metrics]

        rows_in = sum(r["rows_in"] for r in metrics_rows)
        rows_ok = sum(r["rows_ok"] for r in metrics_rows)
        rows_rej = sum(r["rows_rejected"] for r in metrics_rows)
        # conservation law: every input row lands in exactly one sink
        assert sum(counts.values()) == rows_in, (counts, rows_in)

        CK.write_manifest_entry(args.checkpoint, {
            "chunk": chunk,
            "rows_in": rows_in,
            "rows_ok": rows_ok,
            "rows_rejected": rows_rej,
            "sink_counts": counts,
            "fingerprint": CK.content_fingerprint(parsed),
            "partitions": metrics_rows,
            "wall_sec": round(time.perf_counter() - t0, 3),
        })
        print(f"chunk {chunk}: in={rows_in} ok={rows_ok} rej={rows_rej}")

    done = CK.done_chunks(args.checkpoint)
    summary = {
        "chunks_done": len(done),
        "rows_in": sum(e["rows_in"] for e in done.values()),
        "rows_ok": sum(e["rows_ok"] for e in done.values()),
        "rows_rejected": sum(e["rows_rejected"] for e in done.values()),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
