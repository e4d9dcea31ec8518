"""Golden corpus through the real Spark pandas UDF (Arrow roundtrip)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparklog import schema as S
from sparklog.udf import parse_df, register_sql

from golden_corpus import GOLDEN
from test_parser_pandas import _check


@pytest.fixture(scope="module")
def parsed_rows(spark):
    df = spark.createDataFrame(
        [(g[0], g[1]) for g in GOLDEN], ["name", "line"]
    )
    out = parse_df(df, "line")
    return {r["name"]: r.asDict() for r in out.collect()}


@pytest.mark.parametrize("name,line,expected", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden_through_spark(parsed_rows, name, line, expected):
    _check(name, expected, parsed_rows[name])


def test_sql_registration(spark):
    register_sql(spark)
    spark.createDataFrame([("<1>1 - - - - - -",)], ["line"]).createOrReplaceTempView(
        "raw_lines"
    )
    row = spark.sql(
        "SELECT parse_syslog(line).severity AS s, parse_syslog(line).facility AS f "
        "FROM raw_lines"
    ).collect()[0]
    assert (row["s"], row["f"]) == (1, 0)


def test_map_key_dedup_last_win(spark):
    """Repeated SD-PARAM keys: last write wins (message.rs:62-67)."""
    df = spark.createDataFrame(
        [('<1>1 - - - - - [foo bar="baz" bar="bing"] m',)], ["line"]
    )
    row = parse_df(df).select(F.col("sd")["foo"]["bar"].alias("v")).collect()[0]
    assert row["v"] == "bing"
