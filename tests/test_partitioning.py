"""Partitioned lake tables: layout, pruning, spec inheritance."""

from __future__ import annotations

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.tables import LakeTable


def test_partitioned_overwrite_prunes(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "p"))
    df = spark.createDataFrame(
        [(i, ["paid", "shipped", "created"][i % 3]) for i in range(30)],
        "id int, status string",
    )
    t.overwrite(df, partition_by=["status"])

    filtered = t.read().filter(F.col("status") == "paid")
    assert filtered.count() == 10
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # partition filter reaches the scan: pruning, not a data filter
    assert "PartitionFilters" in plan and "paid" in plan

    # appends inherit the partition spec
    t.append(spark.createDataFrame([(100, "paid")], "id int, status string"))
    assert t.read().filter(F.col("status") == "paid").count() == 11
    # merge/compact keep the spec (overwrite inherits from manifest)
    t.compact(1)
    assert t._manifest(t.current_version())["partition_by"] == ["status"]
    assert t.read().filter(F.col("status") == "paid").count() == 11
