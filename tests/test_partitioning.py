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


def test_partition_evolution(spark, tmp_path):
    """Iceberg-style partition evolution: the spec change is a metadata
    commit; old dirs keep their layout, new appends land under the new
    spec, reads union both transparently, and compact() unifies
    physically under the current spec."""
    import glob

    import pytest

    from privacy_cdc_lakehouse_spark.tables import LakeTable

    t = LakeTable(spark, str(tmp_path / "pevo"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id int, k string, v int"
        ),
        partition_by=["k"],
    )
    assert t.detail()["partition_by"] == ["k"]
    v_before = t.current_version()

    with pytest.raises(ValueError, match="not in table"):
        t.set_partitioning(["nope"])
    t.set_partitioning(["v"])
    assert t.detail()["partition_by"] == ["v"]
    # metadata-only: no new data dir
    t.append(spark.createDataFrame([(3, "c", 30)], "id int, k string, v int"))
    # new dir is hive-laid-out on v, old on k
    layouts = {
        seg.split("=")[0]
        for p in glob.glob(str(tmp_path / "pevo" / "data" / "*" / "*=*"))
        for seg in [p.rsplit("/", 1)[1]]
    }
    assert layouts == {"k", "v"}
    # reads union both specs
    rows = sorted(tuple(r) for r in t.read().select("id", "k", "v").collect())
    assert rows == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # time travel: the old spec still reads
    assert t.read(version=v_before).count() == 2
    # compact unifies under the CURRENT spec
    t.compact(target_partitions=1)
    layouts_after = {
        seg.split("=")[0]
        for p in glob.glob(str(tmp_path / "pevo" / "data" / "*" / "*=*"))
        for seg in [p.rsplit("/", 1)[1]]
        if p.rsplit("/", 2)[1] in {e["path"].split("/")[-1] for e in t._snapshot(t.current_version())["files"]}
    }
    assert "v" in layouts_after
    rows2 = sorted(tuple(r) for r in t.read().select("id", "k", "v").collect())
    assert rows2 == rows


def test_partition_evolution_sql_verb(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    t = LakeTable(spark, str(tmp_path / "pevo_sql"))
    t.overwrite(
        spark.createDataFrame([(1, "a")], "id int, k string"),
        partition_by=["k"],
    )
    sql_dml(spark, "ALTER TABLE tgt SET PARTITIONED BY (id)", {"tgt": t})
    assert t.detail()["partition_by"] == ["id"]
    sql_dml(spark, "ALTER TABLE tgt SET PARTITIONED BY ()", {"tgt": t})
    assert t.detail()["partition_by"] == []
    assert t.read().count() == 1
