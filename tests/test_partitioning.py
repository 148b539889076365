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


def test_scoped_merge_exclusion_prunes_at_planning(spark, tmp_path):
    """The exclusion predicate a partition-scoped merge records on prior
    dirs must reach the scan as a PartitionFilter (superseded partition
    directories pruned at planning — never scanned-and-dropped)."""
    t = LakeTable(spark, str(tmp_path / "p_excl"))
    t.overwrite(
        spark.createDataFrame(
            [(i, i % 4, f"v{i}") for i in range(16)],
            "id int, bucket int, s string",
        ),
        partition_by=["bucket"],
    )
    src = spark.createDataFrame([(0, 0, "updated")], "id int, bucket int, s string")
    t.merge(src, keys=["id"], partition_filter="bucket IN (0)")

    df = t.read()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the prior dir's scan carries the bucket exclusion as a partition
    # filter (NOT (bucket IN (0))) — not a post-scan data filter
    import re

    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any(
        re.search(r"PartitionFilters.*bucket", ln) and "0" in ln for ln in pf_lines
    ), plan
    # correctness unchanged
    got = {r["id"]: r["s"] for r in df.collect()}
    assert got[0] == "updated" and got[1] == "v1" and len(got) == 16
