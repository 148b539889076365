"""Catalog/DDL surface: namespaces, snapshot views, standing privacy view."""

from __future__ import annotations

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.catalog import (
    create_namespaces,
    register_lakehouse,
    register_table,
    show_schemas,
    show_tables,
)
from privacy_cdc_lakehouse_spark.cdc.jobs import Lakehouse, ingest_bronze, merge_silver
from privacy_cdc_lakehouse_spark.sources.debezium import cdc_events
from privacy_cdc_lakehouse_spark.tables import LakeTable

SF = "/root/testdata/sf0.001"


def _lake(spark, tmp_path) -> Lakehouse:
    lake = Lakehouse(spark, str(tmp_path / "wh"))
    ingest_bronze(lake, cdc_events(spark, SF))
    merge_silver(lake)
    return lake


def test_show_schemas_and_tables(spark, tmp_path):
    register_lakehouse(spark, _lake(spark, tmp_path))
    assert [r.schema_name for r in show_schemas(spark).collect()] == [
        "bronze",
        "monitoring",
        "silver",
    ]
    assert [(r.schema_name, r.table_name) for r in show_tables(spark).collect()] == [
        ("bronze", "orders_cdc_raw"),
        ("monitoring", "cdc_checkpoints"),
        ("silver", "orders_current"),
        ("silver", "orders_current_priv"),
    ]


def test_catalog_view_matches_laketable_read(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    register_lakehouse(spark, lake)
    via_catalog = spark.table("silver.orders_current")
    direct = lake.silver.read()
    assert via_catalog.count() == direct.count()
    assert set(via_catalog.columns) == set(direct.columns)


def test_privacy_view_is_standing_catalog_object(spark, tmp_path):
    """The privacy view survives across unrelated queries in the session
    (it is a catalog object, not a per-query temp view)."""
    register_lakehouse(spark, _lake(spark, tmp_path))
    n1 = spark.table("silver.orders_current_priv").count()
    spark.sql("SELECT 1").collect()  # unrelated work
    again = spark.table("silver.orders_current_priv")
    assert again.count() == n1
    assert "user_key" in again.columns
    # pseudonymized: no raw user_id exposed
    assert "user_id" not in again.columns


def test_snapshot_view_with_partition_merge_excludes(spark, tmp_path):
    """snapshot_sql reproduces partition-scoped-merge exclusion filters."""
    t = LakeTable(spark, str(tmp_path / "pt"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "A", "a1"), (2, "B", "b1")], "id int, part string, s string"
        ),
        partition_by=["part"],
    )
    t.merge(
        spark.createDataFrame([(1, "A", "a1-upd")], "id int, part string, s string"),
        keys=["id"],
        partition_filter="part = 'A'",
    )
    create_namespaces(spark)
    register_table(spark, "silver.pt_view", t)
    got = sorted(
        tuple(r)
        for r in spark.table("silver.pt_view").select("id", "part", "s").collect()
    )
    assert got == [(1, "A", "a1-upd"), (2, "B", "b1")]


def test_reregister_advances_snapshot(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    register_lakehouse(spark, lake)
    before = spark.table("silver.orders_current").count()
    lake.silver.append(
        lake.silver.read().limit(1).withColumn("order_id", F.lit(-12345))
    )
    register_lakehouse(spark, lake)  # re-publish → view sees the new commit
    assert spark.table("silver.orders_current").count() == before + 1


def test_register_truncated_table_serves_empty_view(spark, tmp_path):
    """A TRUNCATE'd table must stay registrable as a catalog view (the
    table layer serves it as a 0-row typed DataFrame; the view emits a
    typed empty SELECT instead of unparseable zero-arm SQL)."""
    from privacy_cdc_lakehouse_spark.catalog import register_table
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    t = LakeTable(spark, str(tmp_path / "trunc_cat"))
    t.overwrite(spark.createDataFrame([(1, "a")], "id int, s string"))
    t.truncate()
    spark.sql("CREATE DATABASE IF NOT EXISTS trunc_db")
    register_table(spark, "trunc_db.empty_view", t)
    out = spark.table("trunc_db.empty_view")
    assert out.columns == ["id", "s"] and out.count() == 0
