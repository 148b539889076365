"""Co-located bucketed join: the plan must contain NO shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a_val")
    )
    b = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("b_val")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    write_bucketed(a, "bkt_a", "k", buckets=4)
    write_bucketed(b, "bkt_b", "k", buckets=4)

    # Force the SMJ path so the assertion is about bucketing, not about
    # the small side getting broadcast at test scale.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bkt_a", "bkt_b", "k")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"

        got = joined.agg(
            F.count("*").alias("n"), F.sum("b_val").alias("s")
        ).collect()[0]
        assert got["n"] == 5_000
        assert got["s"] == sum(i + 1 for i in range(0, 10_000, 2))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
