"""Sources and sinks: how raw syslog gets in and the parsed lake gets out.

The reference consumes one RFC 5424 line at a time from a socket/file
(lib.rs:18-24); these connectors are the Spark-shaped equivalents:

  - read_syslog_text: newline-delimited raw syslog files (text source,
    splittable, whole-stage codegen scan) -> (doc_id, line).
  - read_syslog_json / read_syslog_csv: envelope formats where the raw
    line travels in a named field next to transport metadata.
  - write_parsed_lake / read_parsed_lake: the canonical day-partitioned
    parquet layout for parsed output; readers filtering on `day` prune
    partitions at file level, and field predicates push down to the
    parquet scan (both audited in tests/test_io.py).

Scale posture: text/json/csv scans are splittable and parallel; doc_id is
assigned per-line deterministically from (file, offset-in-file) via
monotonically_increasing_id only when the envelope has no id — callers
with a real id column should pass id_col.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklog.udf import parse_df


def read_syslog_text(spark: SparkSession, path: str,
                     id_col: str | None = None) -> DataFrame:
    """Newline-delimited raw RFC 5424 files -> (doc_id, line).

    Without a trusted id column, doc_id = monotonically_increasing_id():
    unique and stable within one read (partition-prefixed), but NOT stable
    across re-reads with different splits — pass id_col (or join lineage
    later by content hash) when idempotent re-processing matters.
    """
    df = spark.read.text(path).withColumnRenamed("value", "line")
    if id_col:
        return df.select(F.col(id_col).alias("doc_id"), "line")
    return df.select(F.monotonically_increasing_id().alias("doc_id"), "line")


def read_syslog_json(spark: SparkSession, path: str, line_field: str = "raw",
                     id_field: str = "id") -> DataFrame:
    """JSON-lines envelope: {"id": ..., "raw": "<134>1 ..."} -> (doc_id, line)."""
    df = spark.read.json(path)
    return df.select(
        F.col(id_field).cast("long").alias("doc_id"),
        F.col(line_field).alias("line"),
    )


def read_syslog_csv(spark: SparkSession, path: str, line_field: str = "raw",
                    id_field: str = "id") -> DataFrame:
    """CSV envelope with a header row -> (doc_id, line)."""
    df = spark.read.option("header", "true").option("quote", '"') \
        .option("escape", '"').csv(path)
    return df.select(
        F.col(id_field).cast("long").alias("doc_id"),
        F.col(line_field).alias("line"),
    )


def parse_source(lines: DataFrame) -> DataFrame:
    """Any (doc_id, line) source -> the canonical parsed schema."""
    return parse_df(lines)


def write_parsed_lake(parsed: DataFrame, out_dir: str,
                      mode: str = "overwrite") -> None:
    """Day-partitioned parquet lake of parsed messages.

    Partition key = utc day of the event timestamp ('_rejects' bucket for
    rows without one) — the layout under which day-range queries prune at
    file level. Null-timestamp OK rows land in day='_undated'.
    """
    day = F.when(
        F.col("parse_error").isNotNull(), F.lit("_rejects")
    ).when(
        F.col("timestamp").isNull(), F.lit("_undated")
    ).otherwise(F.date_format(F.timestamp_seconds(F.col("timestamp")),
                              "yyyy-MM-dd"))
    (
        parsed.withColumn("day", day)
        .repartition(F.col("day"))
        .write.mode(mode).partitionBy("day").parquet(out_dir)
    )


def read_parsed_lake(spark: SparkSession, lake_dir: str) -> DataFrame:
    return spark.read.parquet(lake_dir)
