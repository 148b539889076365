"""Change Data Feed: write_change_data on merge/delete/update +
LakeTable.read_changes — the Delta CDF surface a CDC lakehouse exports
downstream (the reference consumes Debezium's feed; this is the same
contract on the way OUT of the lakehouse)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.tables import (
    CHANGE_TYPE_COL,
    COMMIT_TS_COL,
    COMMIT_VERSION_COL,
    LakeTable,
)


def _changes(t, start, end=None, cols=("id", "s")):
    df = t.read_changes(start, end)
    return sorted(
        tuple(r)
        for r in df.select(
            CHANGE_TYPE_COL, COMMIT_VERSION_COL, *cols
        ).collect()
    )


def _seeded(spark, path):
    t = LakeTable(spark, path)
    t.overwrite(
        spark.createDataFrame(
            [(1, "keep"), (2, "update_me"), (3, "delete_me")],
            "id int, s string",
        )
    )
    return t


def test_merge_change_feed(spark, tmp_path):
    t = _seeded(spark, str(tmp_path / "t"))
    source = spark.createDataFrame(
        [(2, "updated", "u"), (3, None, "d"), (4, "inserted", "c"), (5, None, "d")],
        "id int, s string, op string",
    )
    v = t.merge(
        source,
        keys=["id"],
        matched_delete=F.col("s.op") == "d",
        insert_condition=F.col("s.op") != "d",
        write_change_data=True,
    )
    assert _changes(t, v, v) == [
        ("delete", v, 3, "delete_me"),
        ("insert", v, 4, "inserted"),
        ("update_postimage", v, 2, "updated"),
        ("update_preimage", v, 2, "update_me"),
    ]
    # commit timestamp rides every row
    assert (
        t.read_changes(v, v).filter(F.col(COMMIT_TS_COL).isNull()).count()
        == 0
    )


def test_merge_update_condition_limits_cdf_to_fired_rows(spark, tmp_path):
    """A matched row that fires NEITHER clause (SQL MERGE fall-through)
    must not appear in the feed at all."""
    t = _seeded(spark, str(tmp_path / "t"))
    source = spark.createDataFrame(
        [(1, "skipped", "skip"), (2, "updated", "u")],
        "id int, s string, op string",
    )
    v = t.merge(
        source,
        keys=["id"],
        matched_update_condition=F.col("s.op") == "u",
        write_change_data=True,
    )
    assert _changes(t, v, v) == [
        ("update_postimage", v, 2, "updated"),
        ("update_preimage", v, 2, "update_me"),
    ]


def test_delete_update_change_feed(spark, tmp_path):
    t = _seeded(spark, str(tmp_path / "t"))
    dv = t.delete_where(F.col("id") == 3, write_change_data=True)
    uv = t.update_where(
        F.col("id") == 2,
        {"s": F.upper(F.col("s"))},
        write_change_data=True,
    )
    assert _changes(t, dv, uv) == [
        ("delete", dv, 3, "delete_me"),
        ("update_postimage", uv, 2, "UPDATE_ME"),
        ("update_preimage", uv, 2, "update_me"),
    ]


def test_append_overwrite_truncate_synthesized(spark, tmp_path):
    """Appends/overwrites/truncates need no change files — the feed is
    synthesized from the commit's file diff / adjacent snapshots."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], "id int, s string"))  # v1
    t.append(spark.createDataFrame([(2, "b")], "id int, s string"))  # v2
    t.truncate()  # v3
    t.overwrite(spark.createDataFrame([(9, "z")], "id int, s string"))  # v4
    assert _changes(t, 1, 2) == [("insert", 1, 1, "a"), ("insert", 2, 2, "b")]
    assert _changes(t, 3, 3) == [
        ("delete", 3, 1, "a"),
        ("delete", 3, 2, "b"),
    ]
    # overwrite of an empty (truncated) snapshot: inserts only
    assert _changes(t, 4, 4) == [("insert", 4, 9, "z")]


def test_overwrite_emits_delete_plus_insert(spark, tmp_path):
    t = _seeded(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(7, "new")], "id int, s string"))
    assert _changes(t, 2, 2) == [
        ("delete", 2, 1, "keep"),
        ("delete", 2, 2, "update_me"),
        ("delete", 2, 3, "delete_me"),
        ("insert", 2, 7, "new"),
    ]


def test_compact_contributes_nothing(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], "id int, s string"))
    t.append(spark.createDataFrame([(2, "b")], "id int, s string"))
    t.compact(target_partitions=1)  # v3: dataChange=false
    assert _changes(t, 3, 3) == []
    # and the empty result still has the CDF schema
    df = t.read_changes(3, 3)
    assert CHANGE_TYPE_COL in df.columns and COMMIT_VERSION_COL in df.columns


def test_unrecorded_dml_commit_raises(spark, tmp_path):
    t = _seeded(spark, str(tmp_path / "t"))
    v = t.delete_where(F.col("id") == 3)  # no write_change_data
    with pytest.raises(ValueError, match="change data"):
        t.read_changes(v, v)


def test_partition_scoped_merge_cdf(spark, tmp_path):
    """CDF from a partition-scoped copy-on-write merge records only the
    batch's row effects, not the rewritten partition."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(1, 0, "a"), (2, 0, "b"), (3, 1, "c")],
            "id int, bucket int, s string",
        ),
        partition_by=["bucket"],
    )
    source = spark.createDataFrame(
        [(2, 0, "b2"), (4, 0, "d")], "id int, bucket int, s string"
    )
    v = t.merge(
        source, keys=["id"], partition_filter="bucket = 0",
        write_change_data=True,
    )
    assert _changes(t, v, v) == [
        ("insert", v, 4, "d"),
        ("update_postimage", v, 2, "b2"),
        ("update_preimage", v, 2, "b"),
    ]


def test_vacuum_reclaims_change_dirs_past_horizon(spark, tmp_path):
    t = _seeded(spark, str(tmp_path / "t"))
    t.delete_where(F.col("id") == 3, write_change_data=True)  # v2
    t.update_where(
        F.col("id") == 2, {"s": F.lit("x")}, write_change_data=True
    )  # v3
    change_root = os.path.join(str(tmp_path / "t"), "_change_data")
    assert len(os.listdir(change_root)) == 2
    removed = t.vacuum(retain_last=1, min_age_seconds=0)
    # v2's change dir is past the horizon; v3's stays readable
    assert any(r.startswith("_change_data/") for r in removed)
    assert len(os.listdir(change_root)) == 1
    assert _changes(t, 3, 3) == [
        ("update_postimage", 3, 2, "x"),
        ("update_preimage", 3, 2, "update_me"),
    ]


def test_cdf_across_schema_evolution(spark, tmp_path):
    """A feed range spanning a schema change reconciles by name —
    pre-evolution change rows carry NULL for the new column."""
    t = _seeded(spark, str(tmp_path / "t"))
    t.delete_where(F.col("id") == 3, write_change_data=True)  # v2
    t.append(
        spark.createDataFrame([(5, "e", 1.5)], "id int, s string, score double"),
        merge_schema=True,
    )  # v3
    rows = sorted(
        tuple(r)
        for r in t.read_changes(2, 3)
        .select(CHANGE_TYPE_COL, "id", "s", "score")
        .collect()
    )
    assert rows == [("delete", 3, "delete_me", None), ("insert", 5, "e", 1.5)]


def test_bad_range_raises(spark, tmp_path):
    t = _seeded(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="bad change range"):
        t.read_changes(2, 3)
    with pytest.raises(ValueError, match="bad change range"):
        t.read_changes(0)
