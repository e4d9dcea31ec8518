"""Pipeline operators: enrich -> route -> aggregate (north-rule stages D4-D8).

Scale posture (SURVEY.md §2D):
  - enrich: broadcast hash joins against 24/8/9-row lookup dims — zero
    shuffle, the build side replicates to every executor.
  - route: ONE pass, shuffle-free fan-out via dynamic-partitioned write on
    severity_name (8 sinks + 1 rejects sink).
  - skew: hostname/lang are Zipf-skewed; the salted repartition spreads hot
    keys over SALT buckets before the write; AQE skew-join handles the rest.
  - aggregate: partial+final hash agg (automatic for count), single shuffle
    on the 3 grouping keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklog.schema import FACILITY_NAMES, LANG_NAMES, SEVERITY_NAMES

SALT_BUCKETS = 16


# --- lookup dims (FIXTURES.md §4; facility.rs:87-114, severity.rs:57-68) ---

def facility_lookup(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(enumerate(FACILITY_NAMES)), "facility INT, facility_name STRING"
    )


def severity_lookup(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(enumerate(SEVERITY_NAMES)), "severity INT, severity_name STRING"
    )


def lang_lookup(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(LANG_NAMES.items()), "lang_code STRING, lang_name STRING"
    )


# --- stages -----------------------------------------------------------------

def split_rejects(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Errors-as-data split (SURVEY.md §1.4): (ok, rejects)."""
    return (
        parsed.filter(F.col("parse_error").isNull()),
        parsed.filter(F.col("parse_error").isNotNull()),
    )


def sd_value(col: str, sd_id: str, param: str) -> F.Column:
    """Null-safe sd[sd_id][param] lookup (StructuredData::find_tuple,
    message.rs:113-128)."""
    return F.col(col).getItem(sd_id).getItem(param)


def sd_element(col: str, sd_id: str) -> F.Column:
    """All params of one SD-ID (StructuredData::find_sdid, message.rs:131-133)."""
    return F.col(col).getItem(sd_id)


def sd_len(col: str = "sd") -> F.Column:
    """Count of distinct SD-IDs (StructuredData::len, message.rs:136-143)."""
    return F.size(F.col(col))


def procid_order() -> list[F.Column]:
    """ORDER BY analog of ProcId::partial_cmp (message.rs:31-39): PIDs
    compare among PIDs, Names among Names; the cross-variant
    incomparability has no SQL analog (documented divergence)."""
    return [F.col("procid_pid"), F.col("procid_name")]


def enrich(parsed: DataFrame, spark: SparkSession,
           with_lang: bool = True) -> DataFrame:
    """Enum-dim enrichment as PURE PROJECTIONS: the facility/severity/
    lang dims are closed 24/8/9-row domains, so name lookup is a literal
    array index / literal CASE — no join operator, no BroadcastExchange
    build per query, nothing for the driver to ship. F.get returns NULL
    for null or out-of-range indexes, exactly the rows the previous
    broadcast LEFT joins left unmatched (schema, column order and rows
    are identical — A/B-verified, incl. out-of-domain keys); parse
    errors / nil SD still flow to the rejects sink."""
    rest = [c for c in parsed.columns if c not in ("facility", "severity")]
    out = parsed.select(
        "severity", "facility", *rest,
        F.get(F.lit(list(FACILITY_NAMES)), F.col("facility"))
        .alias("facility_name"),
        F.get(F.lit(list(SEVERITY_NAMES)), F.col("severity"))
        .alias("severity_name"),
    )
    if with_lang:
        lang_name = F.lit(None).cast("string")
        for code, name in reversed(list(LANG_NAMES.items())):
            lang_name = F.when(
                F.col("lang_code") == code, F.lit(name)
            ).otherwise(lang_name)
        out = out.withColumn("lang_code", sd_value("sd", "meta", "lang"))
        cols = [c for c in out.columns if c != "lang_code"]
        out = out.select("lang_code", *cols, lang_name.alias("lang_name"))
    return out


def with_event_ts(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Derive event_ts TIMESTAMP (µs) alongside the exact unix-seconds +
    nanos columns (SURVEY.md §1.1: Spark TIMESTAMP cannot hold the nanos,
    so the BIGINT/INT pair stays authoritative)."""
    return df.withColumn("event_ts", F.timestamp_seconds(F.col(ts_col)))


def hour_epoch(ts_col: str = "timestamp") -> F.Column:
    """Hour bucket as unix seconds (null timestamp -> null bucket)."""
    c = F.col(ts_col)
    return (c - c % 3600).alias("hour_epoch")


def hourly_agg(enriched: DataFrame) -> DataFrame:
    """per-facility/severity/hour counts — partial+final hash agg."""
    return (
        enriched.groupBy("facility_name", "severity_name", hour_epoch())
        .agg(F.count(F.lit(1)).alias("n"))
    )


def salted(df: DataFrame, key: str, num_partitions: int | None = None,
           salt_col: str = "doc_id") -> DataFrame:
    """Salted repartition for skewed keys (north rule D6): the hot 40%
    hostname spreads over SALT_BUCKETS partitions instead of one."""
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(SALT_BUCKETS))
    if num_partitions:
        return df.repartition(num_partitions, F.col(key), salt)
    return df.repartition(F.col(key), salt)


SESSION_GAP_SECONDS = 1800

_SESSION_SCHEMA = (
    "hostname STRING, session_start LONG, session_end LONG, n_events LONG"
)


def sessionize_batch(parsed: DataFrame,
                     gap_seconds: int = SESSION_GAP_SECONDS,
                     bucket_seconds: int = 86400) -> DataFrame:
    """Batch sessionization as a custom grouped operator (applyInPandas):
    event streams split on gaps > gap_seconds. The streaming twin
    (sparklog/streaming.sessionize) shares the semantics; the DuckDB
    oracle expresses the same thing with window functions, so the driver
    gate cross-checks the Python operator against pure SQL.

    Skew-safe: the pandas kernel runs per (hostname, day-bucket) — the
    Zipf-head host spreads over its active days instead of pinning one
    task — and the shared boundary-merge pass stitches sessions that
    cross bucket edges back together exactly."""

    def fn(pdf):
        import numpy as np
        import pandas as pd

        # vectorized split (same diff/flatnonzero kernel as the streaming
        # twin, streaming.py): break indices where the gap is exceeded
        ts = np.sort(pdf["timestamp"].to_numpy(np.int64))
        brk = np.flatnonzero(np.diff(ts) > gap_seconds) + 1
        bounds = np.concatenate(([0], brk, [ts.size]))
        return pd.DataFrame({
            "hostname": pdf["hostname"].iloc[0],
            "_bkt": int(pdf["_bkt"].iloc[0]),
            "session_start": ts[bounds[:-1]],
            "session_end": ts[bounds[1:] - 1],
            "n_events": np.diff(bounds),
        })

    events = _session_events(parsed).withColumn(
        "_bkt", (F.col("timestamp") / bucket_seconds).cast("long")
    )
    sess1 = events.groupBy("hostname", "_bkt").applyInPandas(
        fn,
        "hostname STRING, _bkt LONG, session_start LONG, session_end LONG,"
        " n_events LONG",
    )
    return _merge_boundary_sessions(sess1, gap_seconds)


def _session_events(parsed: DataFrame) -> DataFrame:
    return parsed.filter(
        F.col("parse_error").isNull()
        & F.col("hostname").isNotNull()
        & F.col("timestamp").isNotNull()
    ).select("hostname", "timestamp")


def _merge_boundary_sessions(sess1: DataFrame,
                             gap_seconds: int) -> DataFrame:
    """Phase 2 shared by both sessionizers: stitch per-bucket sessions
    back together across bucket edges.

    Takes ONLY each bucket's first and last session per host (<= 2 rows
    per host-day, tiny) and re-applies the same gap rule across buckets,
    so sessions spanning bucket edges — including chains across empty
    buckets — merge back exactly. Interior sessions are provably final
    (phase 1 already guarantees > gap to both neighbors inside a bucket)
    and pass through untouched."""
    from pyspark.sql import Window

    wb = Window.partitionBy("hostname", "_bkt")
    sess1 = sess1.withColumn(
        "_edge",
        (F.col("session_start") == F.min("session_start").over(wb))
        | (F.col("session_start") == F.max("session_start").over(wb)),
    )
    interior = sess1.filter(~F.col("_edge")).select(
        "hostname", "session_start", "session_end", "n_events"
    )
    w2 = Window.partitionBy("hostname").orderBy("session_start")
    lag_end = F.lag("session_end").over(w2)
    brk2 = F.when(
        lag_end.isNull() | (F.col("session_start") - lag_end > gap_seconds), 1
    ).otherwise(0)
    merged = (
        sess1.filter(F.col("_edge"))
        .withColumn("_gid", F.sum(brk2).over(
            w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("hostname", "_gid")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_events").alias("n_events"),
        )
        .select("hostname", "session_start", "session_end", "n_events")
    )
    return interior.unionByName(merged)


def sessionize_scaled(parsed: DataFrame,
                      gap_seconds: int = SESSION_GAP_SECONDS,
                      bucket_seconds: int = 86400) -> DataFrame:
    """Skew-safe two-phase sessionization, pure window functions (no
    Python): phase 1 sessionizes within (hostname, time-bucket) — the
    Zipf-head host spreads over as many tasks as it has active days —
    and the shared phase 2 merges bucket-edge sessions back exactly.
    Same semantics (and same DuckDB oracle) as sessionize_batch.
    """
    from pyspark.sql import Window

    events = _session_events(parsed).withColumn(
        "_bkt", (F.col("timestamp") / bucket_seconds).cast("long")
    )
    w1 = Window.partitionBy("hostname", "_bkt").orderBy("timestamp")
    lag_ts = F.lag("timestamp").over(w1)
    brk = F.when(
        lag_ts.isNull() | (F.col("timestamp") - lag_ts > gap_seconds), 1
    ).otherwise(0)
    sess1 = (
        events.withColumn("_sid", F.sum(brk).over(
            w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("hostname", "_bkt", "_sid")
        .agg(
            F.min("timestamp").alias("session_start"),
            F.max("timestamp").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return _merge_boundary_sessions(sess1, gap_seconds)


def sessionize_native(parsed: DataFrame,
                      gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Gap sessionization via Spark's BUILT-IN session_window — the
    idiomatic Catalyst path (zero custom code, one MergingSessionsExec /
    sort-based session aggregation, usable unchanged under Structured
    Streaming with a watermark, where the state store shards per
    (hostname, window)).

    Boundary convention: our semantics (and the DuckDB oracle) MERGE at a
    gap of exactly gap_seconds (`ts - lag > gap` breaks); session_window
    merges only when the next event is strictly inside window_end =
    last_ts + gap. Timestamps are integer seconds, so a gap duration of
    gap_seconds + 1 makes the two conventions exactly equivalent.
    Same oracle as sessionize_batch/sessionize_scaled.
    """
    events = _session_events(parsed).withColumn(
        "_ts", F.timestamp_seconds(F.col("timestamp"))
    )
    return (
        events.groupBy(
            "hostname", F.session_window("_ts", f"{gap_seconds + 1} seconds")
        )
        .agg(
            F.min("timestamp").cast("long").alias("session_start"),
            F.max("timestamp").cast("long").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select("hostname", "session_start", "session_end", "n_events")
    )


def write_bucketed(df: DataFrame, table: str, key: str = "doc_id",
                   buckets: int = 16) -> None:
    """Bucketed table for shuffle-free co-located joins (north rule D6):
    two tables bucketed+sorted on the same key join with zero Exchange —
    at 100 TB this turns the repeated big-big join into a local merge."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def route_write(enriched: DataFrame, out_dir: str) -> dict[str, int]:
    """Fan-out to per-severity sinks in ONE write pass; rejects get their
    own sink. Per-sink row counts come from df.observe() metrics attached
    to the SAME write job — no second scan of the output (at 100 TB a
    read-back count is a full extra pass over everything just written).

    Routed-row equality (BASELINE.md) is asserted by tests/test_pipeline.py
    via anti-joins of each sink against the severity filter.
    """
    from pyspark.sql import Observation

    sink_names = list(SEVERITY_NAMES) + ["_rejects"]
    sink_key = F.coalesce(F.col("severity_name"), F.lit("_rejects"))
    df = enriched.withColumn("sink", sink_key)
    obs = Observation()
    df = df.observe(
        obs,
        *[F.count(F.when(F.col("sink") == s, 1)).alias(s) for s in sink_names],
    )
    # pre-shuffle on (sink, salt): each task writes few files per sink and
    # hot severities still spread across tasks
    df = salted(df, "sink")
    df.write.mode("overwrite").partitionBy("sink").parquet(out_dir)
    return {k: int(v) for k, v in obs.get.items() if v}
