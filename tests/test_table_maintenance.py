"""Table maintenance (compact/vacuum/schema evolution) + salted join."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators.skew import salted_join
from privacy_cdc_lakehouse_spark.tables import LakeTable


def test_compact_preserves_data(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "c"))
    for i in range(4):
        t.append(spark.range(i * 10, (i + 1) * 10).withColumnRenamed("id", "x"))
    before = sorted(r["x"] for r in t.read().collect())
    t.compact(target_partitions=1)
    after = sorted(r["x"] for r in t.read().collect())
    assert before == after
    assert len(t._snapshot(t.current_version())["files"]) == 1


def test_vacuum_removes_unreferenced(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "v"))
    t.overwrite(spark.range(5).withColumnRenamed("id", "x"))
    t.overwrite(spark.range(5, 10).withColumnRenamed("id", "x"))
    data_root = os.path.join(t.path, "data")
    assert len(os.listdir(data_root)) == 2
    removed = t.vacuum(retain_last=1, min_age_seconds=0)
    assert len(removed) == 1
    assert len(os.listdir(data_root)) == 1
    assert sorted(r["x"] for r in t.read().collect()) == [5, 6, 7, 8, 9]


def test_schema_evolution_append(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "s"))
    t.overwrite(spark.createDataFrame([(1, "a")], "id int, s string"))
    # incoming batch misses `s` and adds `extra`
    t.append(
        spark.createDataFrame([(2, 9.5)], "id int, extra double"),
        merge_schema=True,
    )
    got = {r["id"]: r for r in t.read().collect()}
    assert got[1]["s"] == "a"
    assert got[2]["s"] is None
    assert got[2]["extra"] == 9.5
    assert got[1]["extra"] is None


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for k in ("hot", "cold") for i in range(50 if k == "hot" else 2)],
        "k string, i int",
    )
    right = spark.createDataFrame([("hot", 1.0), ("cold", 2.0)], "k string, w double")
    plain = sorted(tuple(r) for r in left.join(right, "k").collect())
    salted = sorted(tuple(r) for r in salted_join(left, right, "k", salt=4).collect())
    assert plain == salted


def test_partition_scoped_optimize(spark, tmp_path):
    """OPTIMIZE ... WHERE (Delta parity): only the matching slice is
    rewritten; rows and totals are unchanged; CDF treats it as
    dataChange=false; the SQL verb routes the predicate through."""
    import os

    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    t = LakeTable(spark, str(tmp_path / "opt_where"))
    t.overwrite(
        spark.createDataFrame(
            [(i, "A" if i % 2 else "B") for i in range(20)],
            "id int, part string",
        ),
        partition_by=["part"],
    )
    # fragment partition A with small appends
    for i in range(100, 103):
        t.append(
            spark.createDataFrame([(i, "A")], "id int, part string")
        )
    before = sorted(
        tuple(r) for r in t.read().select("id", "part").collect()
    )
    v_before = t.current_version()
    sql_dml(spark, "OPTIMIZE tgt WHERE part = 'A'", {"tgt": t})
    after = sorted(tuple(r) for r in t.read().select("id", "part").collect())
    assert after == before
    assert t.history()[0]["op"] == "compact"
    # CDF: the scoped compact contributes no row changes
    assert t.read_changes(v_before + 1, v_before + 1).count() == 0


def test_generated_columns_computed_and_validated(spark, tmp_path):
    """Delta GENERATED ALWAYS AS parity: omitted -> computed; supplied
    -> validated NULL-safely; mismatch refused before commit."""
    from privacy_cdc_lakehouse_spark.tables import (
        ConstraintViolationError,
        LakeTable,
    )

    t = LakeTable(spark, str(tmp_path / "gen"))
    t.add_generated_column("order_date", "CAST(ts AS DATE)")
    t.append(
        spark.createDataFrame(
            [(1, "2024-01-05 10:00:00")], "id int, ts string"
        ).selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts")
    )
    row = t.read().collect()[0]
    import datetime

    assert row["order_date"] == datetime.date(2024, 1, 5)

    # supplying a CONSISTENT value passes
    t.append(
        spark.createDataFrame(
            [(2, "2024-02-01 00:00:00", "2024-02-01")],
            "id int, ts string, order_date string",
        ).selectExpr(
            "id",
            "CAST(ts AS TIMESTAMP) AS ts",
            "CAST(order_date AS DATE) AS order_date",
        )
    )
    # supplying an INCONSISTENT value is refused, nothing lands
    v = t.current_version()
    with pytest.raises(ConstraintViolationError, match="order_date"):
        t.append(
            spark.createDataFrame(
                [(3, "2024-03-01 00:00:00", "1999-01-01")],
                "id int, ts string, order_date string",
            ).selectExpr(
                "id",
                "CAST(ts AS TIMESTAMP) AS ts",
                "CAST(order_date AS DATE) AS order_date",
            )
        )
    assert t.current_version() == v
    assert t.generated_columns() == {"order_date": "CAST(ts AS DATE)"}
    t.drop_generated_column("order_date")
    assert t.generated_columns() == {}


def test_fsck_reports_missing_and_orphans(spark, tmp_path):
    import os
    import shutil

    from privacy_cdc_lakehouse_spark.tables import LakeTable

    t = LakeTable(spark, str(tmp_path / "fsck"))
    t.overwrite(spark.createDataFrame([(1,)], "id int"))
    t.append(spark.createDataFrame([(2,)], "id int"))
    assert t.fsck()["ok"] is True
    assert t.fsck()["orphan_dirs"] == []

    # orphan: a dir no manifest references (crashed writer shape)
    os.makedirs(tmp_path / "fsck" / "data" / "deadbeef")
    rep = t.fsck()
    assert rep["ok"] is True and rep["orphan_dirs"] == ["data/deadbeef"]

    # missing: nuke a referenced dir behind the log's back
    ref = t._snapshot_files(t.current_version())[0]["path"]
    shutil.rmtree(tmp_path / "fsck" / ref)
    rep = t.fsck()
    assert rep["ok"] is False and rep["missing_dirs"] == [ref]
