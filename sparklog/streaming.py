"""Structured Streaming analog of the reference's UDP-server doc example
(lib.rs:18-24: recv -> decode -> parse -> use fields).

The batch operators are reused verbatim inside foreachBatch, so streaming
and batch share one code path (SURVEY.md §3 entry point 3). A file-source
variant is testable hermetically; in production the source would be
Kafka/socket with the same downstream graph plus a watermark on event_ts
for the windowed aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklog import pipeline as PL
from sparklog.udf import parse_df


def read_line_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    """File-based line stream: each text file drop is a micro-batch."""
    return spark.readStream.format("text").load(in_dir).withColumnRenamed(
        "value", "line"
    )


def parse_stream(lines: DataFrame) -> DataFrame:
    """Streaming parse: identical UDF, micro-batch Arrow batches."""
    return parse_df(lines)


def windowed_counts(parsed: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Per-severity/hour counts with late-data handling: watermark on the
    derived event_ts (parsed unix seconds -> TIMESTAMP)."""
    with_ts = parsed.filter(F.col("parse_error").isNull()).withColumn(
        "event_ts", F.timestamp_seconds(F.col("timestamp"))
    )
    return (
        with_ts.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", "1 hour"), F.col("severity"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def start_routed_stream(spark: SparkSession, in_dir: str, out_dir: str,
                        checkpoint_dir: str, once: bool = True):
    """readStream -> foreachBatch(parse -> enrich -> per-severity sinks).

    foreachBatch reuses the exact batch operators; availableNow drains all
    pending input then stops (hermetic for tests; drop once=False to run
    continuously).
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        parsed = parse_df(batch_df)
        enriched = PL.enrich(parsed, spark, with_lang=False)
        sink = F.coalesce(F.col("severity_name"), F.lit("_rejects"))
        (
            enriched.withColumn("sink", sink)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append").partitionBy("sink").parquet(out_dir)
        )

    writer = (
        read_line_stream(spark, in_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
