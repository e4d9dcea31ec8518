"""Event-stream analytics beyond plain rollups.

rate_anomalies: per-(event_type, hour) volume z-scores — the alerting
primitive of a log pipeline ("this hour's error rate is 4 sigma above
this type's normal"). Everything that feeds the float math is an EXACT
integer aggregate (counts, sum, sum of squares), so mean/variance/z are
single deterministic IEEE expressions that a DuckDB oracle reproduces
bit-for-bit — no order-dependent float summation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rates(events: DataFrame) -> DataFrame:
    """(event_type, hour, n) — the exact integer base series."""
    return events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def rate_anomalies(events: DataFrame, z_threshold: float = 3.0) -> DataFrame:
    """Volume-anomaly flags per (event_type, hour).

    Two exact aggregations (hour rollup, then per-type k/sum/sum-of-
    squares — both partial+final hash aggs), one BROADCAST join of the
    tiny per-type stats back onto the hourly series. Population variance
    via E[x^2] - E[x]^2 over exact BIGINT sums; z is NULL when the type's
    variance is 0 (constant series has no anomalies). At 100 TB the
    hourly series is already ~10^6x smaller than the input — the stats
    join is trivially broadcastable.
    """
    hourly = hourly_rates(events)
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("_k"),
        F.sum("n").cast("long").alias("_s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("_s2"),
    )
    j = hourly.join(F.broadcast(stats), "event_type")
    mean = F.col("_s1").cast("double") / F.col("_k")
    # clamp at 0: E[x^2]-E[x]^2 can go slightly negative under
    # catastrophic cancellation (huge near-constant counts, true variance
    # below ~n^2*2^-52) — sqrt of that is NaN, and Spark orders NaN above
    # every number, so an unclamped sd "passes" the sd>0 guard and flags
    # every hour. The oracle SQL applies the identical greatest(...,0).
    var = F.greatest(
        F.col("_s2").cast("double") / F.col("_k") - mean * mean, F.lit(0.0)
    )
    sd = F.sqrt(var)
    zscore = F.when(sd > 0, (F.col("n").cast("double") - mean) / sd)
    return j.select(
        "event_type", "hour", "n",
        zscore.alias("zscore"),
        F.when(F.abs(F.coalesce(zscore, F.lit(0.0))) > z_threshold, 1)
        .otherwise(0).alias("is_anomaly"),
    )
