"""Custom stateful streaming operator + DQ metrics job."""

from __future__ import annotations

from privacy_cdc_lakehouse_spark.cdc.jobs import (
    Lakehouse,
    compute_dq_metrics,
    ingest_bronze,
    rebuild_silver,
)
from privacy_cdc_lakehouse_spark.sources.debezium import cdc_events
from privacy_cdc_lakehouse_spark.streaming.stateful import order_lifecycle_tracker
from privacy_cdc_lakehouse_spark.tables import LakeTable


def test_order_lifecycle_tracker_state(spark, tmp_path):
    src = str(tmp_path / "changes")
    spark.createDataFrame(
        [
            (1, "created", 1000, 1),
            (1, "paid", 2000, 2),
            (2, "shipped", 1000, 3),
            (2, "created", 2000, 4),  # regression: shipped -> created
        ],
        "order_id int, status string, ts_ms long, offset long",
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "order_id int, status string, ts_ms long, offset long"
    ).parquet(src)
    q = (
        order_lifecycle_tracker(stream)
        .writeStream.format("memory")
        .queryName("lifecycle_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["order_id"]: r for r in spark.sql("SELECT * FROM lifecycle_out").collect()
    }
    assert got[1]["n_changes"] == 2
    assert got[1]["last_status"] == "paid"
    assert not got[1]["regressed"]
    assert got[2]["regressed"]
    assert got[2]["last_status"] == "created"


def test_dq_metrics_job(spark, sf_dir, tmp_path):
    lake = Lakehouse(spark, str(tmp_path / "dq"))
    ingest_bronze(lake, cdc_events(spark, sf_dir))
    rebuild_silver(lake)
    compute_dq_metrics(lake)
    compute_dq_metrics(lake)  # second snapshot appends
    t = LakeTable(spark, f"{lake.root}/monitoring/dq_metrics")
    rows = t.read().collect()
    assert len(rows) == 2
    assert rows[0]["duplicate_keys"] == 0
    assert rows[0]["null_user_ids"] == 0
    assert rows[0]["n_rows"] > 0


def test_order_lifecycle_tracker_tws(spark, tmp_path):
    """Same state machine on Spark 4's transformWithStateInPandas
    (RocksDB state store required by the TWS backend)."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="TWS runtime needs protobuf, absent in this container",
    )
    from privacy_cdc_lakehouse_spark.streaming.stateful import (
        order_lifecycle_tracker_tws,
    )

    src = str(tmp_path / "tws_changes")
    spark.createDataFrame(
        [
            (1, "created", 1000, 1),
            (1, "paid", 2000, 2),
            (2, "shipped", 1000, 3),
            (2, "created", 2000, 4),
        ],
        "order_id int, status string, ts_ms long, offset long",
    ).coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(
            "order_id int, status string, ts_ms long, offset long"
        ).parquet(src)
        q = (
            order_lifecycle_tracker_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "tws_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["order_id"]: r for r in spark.sql("SELECT * FROM tws_out").collect()
        }
        assert got[1]["n_changes"] == 2 and got[1]["last_status"] == "paid"
        assert got[2]["regressed"] and got[2]["last_status"] == "created"
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
