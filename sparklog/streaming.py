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


SESSION_GAP_SECONDS = 1800

_SESSION_OUT_SCHEMA = (
    "hostname STRING, session_start LONG, session_end LONG, n_events LONG"
)
_SESSION_STATE_SCHEMA = "start_ts LONG, last_ts LONG, n LONG"


def sessionize(parsed: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-hostname
    sessionization with a gap timeout. A session closes when the next
    event for the host arrives more than gap_seconds later; closed
    sessions are emitted, the open session persists in state across
    micro-batches (and across restarts via the checkpoint).
    """

    def fn(key, pdfs, state):
        import pandas as pd

        ts_list = []
        for pdf in pdfs:
            ts_list.extend(int(t) for t in pdf["timestamp"].dropna())
        ts_list.sort()
        if state.exists:
            start_ts, last_ts, n = state.get
        else:
            start_ts = last_ts = None
            n = 0
        out = []
        for t in ts_list:
            if start_ts is None:
                start_ts = last_ts = t
                n = 1
            elif t - last_ts > gap_seconds:
                out.append((key[0], start_ts, last_ts, n))
                start_ts = last_ts = t
                n = 1
            else:
                last_ts = t
                n += 1
        if start_ts is not None:
            state.update((start_ts, last_ts, n))
        if out:
            yield pd.DataFrame(
                out, columns=["hostname", "session_start", "session_end", "n_events"]
            )

    events = parsed.filter(
        F.col("parse_error").isNull()
        & F.col("hostname").isNotNull()
        & F.col("timestamp").isNotNull()
    ).select("hostname", "timestamp")
    return events.groupBy("hostname").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
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
