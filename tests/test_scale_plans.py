"""Plan-shape audits for the scale paths: bucketed co-located joins and
AQE skew-join splitting (north rule D6 'partitioning / shuffle / skew
handled explicitly')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparklog import pipeline as PL
from sparklog import synth

from conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on doc_id join with ZERO Exchange."""
    # tables land in the session's default warehouse dir (gitignored);
    # warehouse.dir is a static conf that cannot be changed at runtime
    docs = synth.load_documents(spark, SF_SMOKE)
    PL.write_bucketed(docs.select("doc_id", "lang"), "b_lang", buckets=8)
    PL.write_bucketed(docs.select("doc_id", "n_chars"), "b_chars", buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lang").join(spark.table("b_chars"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must be shuffle-free"
        assert "SortMergeJoin" in plan
        assert joined.count() == docs.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lang")
        spark.sql("DROP TABLE IF EXISTS b_chars")


def test_aqe_splits_skewed_join(spark):
    """With AQE skew-join thresholds scaled to the data, a join on a
    skewed key splits the hot partition (skew=true in the final plan)
    instead of funnelling 80% of rows through one task.

    Note the incompressible payload: skew detection reads COMPRESSED map
    output sizes, so constant padding (which RLEs away) hides real row
    skew — a genuine production gotcha worth encoding in a test."""
    pad = F.concat(
        *[
            F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(i))), 256)
            for i in range(4)
        ]
    )
    left = (
        spark.range(0, 400_000)
        .withColumn(
            "k",
            F.when(F.col("id") % 5 < 4, 0).otherwise(
                F.pmod(F.col("id"), F.lit(1000))
            ),
        )
        .withColumn("pad", pad)
    )
    right = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 2
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2MB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = left.join(right, "k")
        # AQE finalizes the physical plan only on execution of THIS frame
        assert len(j.collect()) == 400_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
