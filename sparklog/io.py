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

Scale posture: text/json/csv scans are splittable and parallel. Envelope
sources carry a trusted id; raw text gets doc_id = xxhash64(file, line,
occurrence) by default, which is stable across re-reads with any split
layout (see read_syslog_text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklog.udf import parse_df


def read_syslog_text(spark: SparkSession, path: str,
                     stable_ids: bool = True) -> DataFrame:
    """Newline-delimited raw RFC 5424 files -> (doc_id, line).

    stable_ids=True (default): doc_id = xxhash64(file, line, occurrence),
    where occurrence numbers repeats of the same line within a file. The
    resulting (doc_id, line) SET is identical across re-reads regardless
    of split count/order (identical lines are interchangeable, so their
    occurrence order doesn't matter) — idempotent re-processing works.
    Costs one shuffle on (file, line); at scale that key is as
    well-distributed as the content itself.

    stable_ids=False: doc_id = monotonically_increasing_id() — free, but
    only stable within a single read (ids shift when the split layout
    changes); use for one-shot scans. (A previous id_col parameter was
    removed: spark.read.text yields a single value column, so there is
    no envelope id to select — the JSON/CSV readers cover trusted ids.)
    """
    df = spark.read.text(path).select(
        F.input_file_name().alias("_file"), F.col("value").alias("line")
    )
    if not stable_ids:
        return df.select(
            F.monotonically_increasing_id().alias("doc_id"), "line"
        )
    from pyspark.sql import Window

    occ = F.row_number().over(
        Window.partitionBy("_file", "line")
        .orderBy(F.monotonically_increasing_id())
    )
    return df.select(
        F.xxhash64("_file", "line", occ).alias("doc_id"), "line"
    )


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
