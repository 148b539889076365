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


def test_reap_stale_bronze_caches_exact_shape(tmp_path):
    """The reaper must only remove same-tag siblings whose name matches
    the exact {prefix}_{10-hex-digest} shape — a longer tag extending
    this one (sf1 vs sf1_big) is ANOTHER dataset's valid cache and must
    survive (round-6 advisory)."""
    import os

    from privacy_cdc_lakehouse_spark.sources.debezium import (
        _reap_stale_bronze_caches,
    )

    ver = "v3"
    current = tmp_path / f"pcl_bronze_{ver}_sf1_aaaaaaaaaa"
    stale = tmp_path / f"pcl_bronze_{ver}_sf1_bbbbbbbbbb"
    legacy = tmp_path / f"pcl_bronze_{ver}_sf1"
    other_tag = tmp_path / f"pcl_bronze_{ver}_sf1_big_cccccccccc"
    building = tmp_path / f"pcl_bronze_{ver}_sf1_dddddddddd.build-123"
    for d in (current, stale, legacy, other_tag, building):
        d.mkdir()
        (d / "part.parquet").touch()

    _reap_stale_bronze_caches(str(current))

    assert current.exists()  # never reaps itself
    assert not stale.exists()  # same tag, different digest -> reaped
    assert not legacy.exists()  # pre-digest legacy name -> reaped
    assert other_tag.exists()  # different dataset -> preserved
    assert building.exists()  # in-flight staging dir -> preserved


def test_reap_dead_corrupt_roots(tmp_path):
    """Corrupt-root siblings moved aside by a dead process are reaped;
    one held by a live pid (ours) survives, as do unrelated names."""
    import os

    from privacy_cdc_lakehouse_spark.queries.cdc import _reap_dead_corrupt_roots

    root = tmp_path / "pcl_lake_v3_p2_sf1_aaaaaaaaaa"
    dead = tmp_path / f"{root.name}.corrupt-999999999"
    alive = tmp_path / f"{root.name}.corrupt-{os.getpid()}"
    junk = tmp_path / f"{root.name}.corrupt-notapid"
    other = tmp_path / "pcl_lake_v3_p2_sf2_bbbbbbbbbb.corrupt-999999999"
    for d in (dead, alive, junk, other):
        d.mkdir()

    _reap_dead_corrupt_roots(str(root))

    assert not dead.exists()
    assert alive.exists()
    assert junk.exists()  # unparseable pid: leave it alone
    assert other.exists()  # different root: untouched


def test_bench_headline_queries_registered():
    """Registry consolidations must never orphan a bench headline (the
    driver's BENCH comparisons key on these names)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from privacy_cdc_lakehouse_spark.queries import all_oracles, all_queries

    q, o = all_queries(), all_oracles()
    # every headline must resolve — in the registry or via bench's
    # retired-headline direct calls (round-7 consolidations keep
    # original names timeable for round-over-round comparability)
    assert set(bench.HEADLINE) <= set(bench.headline_queries())
    assert len(q) == 50 and set(o) <= set(q)
