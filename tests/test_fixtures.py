"""Fixture loader: ns-timestamp parquet adapter semantics."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from privacy_cdc_lakehouse_spark.sources.fixtures import load_table


def test_ns_timestamps_floor_to_micros_including_pre_epoch(spark, tmp_path):
    """Regression (round-2 advisory): `div 1000` truncates toward zero,
    rounding pre-epoch (negative) nanos UP by 1µs; the loader must floor
    like pyarrow/DuckDB do. 1969-12-31T23:59:59.999999999 floors to
    ...999999µs-worth (-1ns -> -1µs, not 0)."""
    ns_values = [
        -1,  # 1ns before epoch -> floors to -1µs
        -999,  # still within the µs before epoch -> -1µs
        -1000,  # exactly -1µs
        1,  # 1ns after epoch -> floors to 0µs
        1999,  # -> 1µs
        1_700_000_000_123_456_789,  # post-epoch sanity
    ]
    tbl = pa.table({"ts": pa.array(ns_values, pa.timestamp("ns"))})
    # loader expects a single {sf_dir}/{name}.parquet file (the driver's
    # testdata layout)
    pq.write_table(tbl, str(tmp_path / "events_ns.parquet"))
    df = load_table(spark, str(tmp_path), "events_ns")

    got_us = [
        int(r[0])
        for r in df.selectExpr("unix_micros(ts) AS us").orderBy("us").collect()
    ]
    want_us = sorted(v // 1000 for v in ns_values)  # python // floors
    assert got_us == want_us
