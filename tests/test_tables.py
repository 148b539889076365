"""Lake table layer: snapshot commits, append/overwrite, 3-clause MERGE."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.tables import LakeTable, MergeError


def _rows(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_append_overwrite_versions(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t1"))
    assert not t.exists()
    t.append(spark.createDataFrame([(1, "a")], "id int, s string"))
    t.append(spark.createDataFrame([(2, "b")], "id int, s string"))
    assert _rows(t) == [(1, "a"), (2, "b")]
    assert t.current_version() == 2

    t.overwrite(spark.createDataFrame([(9, "z")], "id int, s string"))
    assert _rows(t) == [(9, "z")]
    # old snapshot still readable (time travel)
    assert sorted(tuple(r) for r in t.read(version=2).collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_merge_three_clauses(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t2"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "keep"), (2, "update_me"), (3, "delete_me")], "id int, s string"
        )
    )
    source = spark.createDataFrame(
        [(2, "updated", "u"), (3, None, "d"), (4, "inserted", "c"), (5, None, "d")],
        "id int, s string, op string",
    )
    t.merge(
        source,
        keys=["id"],
        matched_delete=F.col("s.op") == "d",
        insert_condition=F.col("s.op") != "d",
    )
    assert _rows(t) == [(1, "keep"), (2, "updated"), (4, "inserted")]


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t3"))
    t.overwrite(spark.createDataFrame([(1, "x")], "id int, s string"))
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "id int, s string")
    with pytest.raises(MergeError):
        t.merge(dup, keys=["id"])
