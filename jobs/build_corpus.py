"""spark-submit entry point: the training-corpus build pipeline.

Usage:
    spark-submit --py-files sparklog.zip jobs/build_corpus.py \
        --input /root/testdata/sf0.01 --output /tmp/corpus \
        [--parallelism 32] [--budget 4096] [--domain-cap 20]

The webtext side of the engine composed into the deliverable a training
run actually consumes:

  1. clean     — textops.clean_corpus_full: PII scrub + quality + lang +
                 repetition gates + exact dedup, ONE scan + ONE shuffle.
  2. balance   — textops.salted_topk caps docs per domain (skew-safe
                 two-phase rank; a hot domain never pins one task).
  3. split     — textops.split_assign: content-keyed train/valid/test
                 (stable under re-crawls; eval never leaks into train).
  4. pack      — textops.pack_assign: token-budget shard ids via the
                 distributed prefix-sum (no global single-task window).
  5. write     — one parquet lake partitioned by (split, pack-bucket):
                 a trainer reads its split with partition pruning and
                 streams shards in pack order.

Every stage is the SAME operator the driver's DuckDB oracle checks
query-by-query; this job only wires them together and writes the lake.
Prints one JSON line of corpus stats (doc counts per stage, token
totals, shard count) — the numbers a data engineer checks before a run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir with documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--budget", type=int, default=4096,
                    help="tokens per pack/shard")
    ap.add_argument("--domain-cap", type=int, default=20)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparklog import synth, textops
    from sparklog.session import build_spark

    master = f"local[{args.parallelism}]" if args.parallelism else None
    spark = build_spark(app="sparklog-build-corpus", master=master,
                        shuffle_partitions=args.parallelism)

    pages = synth.pages_df(spark, args.input)
    docs = pages.select("doc_id", "url", "text")
    n_in = docs.count()

    # 1. clean (the fused five-stage pass keyed on scrubbed text)
    survivors = textops.clean_corpus_full(docs.select("doc_id", "text"))
    scrubbed = textops.pii_scrub(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    clean = survivors.select("doc_id").join(scrubbed, "doc_id").join(
        docs.select("doc_id", "url"), "doc_id"
    )

    # 2. per-domain balance (skew-safe two-phase rank)
    domain = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
    balanced = textops.salted_topk(
        clean.withColumn("domain", domain),
        "domain",
        [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")],
        k=args.domain_cap,
    ).drop("rnk")
    n_balanced = balanced.count()

    # 3. content-keyed split + 4. token-budget packing
    split = textops.split_assign(balanced)
    packed = textops.pack_assign(balanced, budget=args.budget)
    out = (
        balanced.join(split, "doc_id").join(packed, "doc_id")
        # bucket pack ids so partition count stays bounded at any scale
        .withColumn("pack_bucket", F.expr("pack_id div 64"))
    )

    # 5. the lake a trainer reads: prune to split, stream shards in order
    lake = os.path.join(args.output, "corpus")
    (
        out.repartition(F.col("split"), F.col("pack_bucket"))
        .write.mode("overwrite")
        .partitionBy("split", "pack_bucket")
        .parquet(lake)
    )

    back = spark.read.parquet(lake)
    stats = {
        "docs_in": n_in,
        "docs_clean": survivors.count(),
        "docs_balanced": n_balanced,
        "docs_written": back.count(),
        "tokens_total": back.agg(F.sum("n_tokens")).collect()[0][0],
        "shards": back.select("pack_id").distinct().count(),
        "splits": {
            r["split"]: r["n"]
            for r in back.groupBy("split").agg(
                F.count(F.lit(1)).alias("n")).collect()
        },
        "lake": lake,
    }
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
