"""Kafka Connect Decimal codec (precise-mode Debezium backfill,
/root/reference/README.md:167-172).

The encode side is cross-checked against Python's own signed
minimal-length big-endian two's complement (`int.to_bytes`), i.e. the
exact byte layout Kafka Connect's `Decimal.fromLogical` produces; the
decode side must invert it bit-for-bit.
"""

from __future__ import annotations

import base64

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.functions.scalars import (
    connect_decimal,
    connect_decimal_bytes,
    connect_decimal_unscaled,
)

VECTORS = [0, 1, -1, 127, 128, 255, 256, -128, -129, -256, 129950,
           -129950, 2**31 - 1, -(2**31), 2**63 - 1, -(2**63)]


def _py_connect_bytes(unscaled: int) -> str:
    n = max(1, (unscaled.bit_length() + 8) // 8)  # +8: room for sign bit
    raw = unscaled.to_bytes(n, "big", signed=True)
    # to_bytes with the computed n may keep a redundant leading byte;
    # strip to minimal like Connect does.
    while len(raw) > 1 and (
        (raw[0] == 0x00 and raw[1] < 0x80) or (raw[0] == 0xFF and raw[1] >= 0x80)
    ):
        raw = raw[1:]
    return base64.b64encode(raw).decode()


def test_encode_matches_connect_layout(spark):
    df = spark.createDataFrame([(v,) for v in VECTORS], "unscaled long")
    got = {
        r["unscaled"]: r["b64"]
        for r in df.select(
            "unscaled", connect_decimal_bytes(F.col("unscaled")).alias("b64")
        ).collect()
    }
    for v in VECTORS:
        assert got[v] == _py_connect_bytes(v), f"encode mismatch for {v}"


def test_decode_round_trip_and_scale(spark):
    df = spark.createDataFrame([(v,) for v in VECTORS], "unscaled long")
    out = df.select(
        "unscaled",
        connect_decimal_unscaled(
            connect_decimal_bytes(F.col("unscaled"))
        ).alias("back"),
        connect_decimal(
            connect_decimal_bytes(F.col("unscaled")), 2
        ).alias("amount"),
    ).collect()
    for r in out:
        assert r["back"] == r["unscaled"]
        assert float(r["amount"]) == r["unscaled"] / 100


def test_decode_foreign_encodings(spark):
    # Non-minimal (sign-extended) payloads a real producer may emit
    # must decode to the same value.
    cases = [
        (base64.b64encode(v.to_bytes(8, "big", signed=True)).decode(), v)
        for v in VECTORS
    ]
    df = spark.createDataFrame(cases, "b64 string, expect long")
    out = df.select(
        "expect", connect_decimal_unscaled(F.col("b64")).alias("got")
    ).collect()
    for r in out:
        assert r["got"] == r["expect"]


def test_round_trip_property(spark):
    from hypothesis import given, settings, strategies as st

    # Collect a random batch driver-side, then round-trip in ONE Spark
    # job (per-example Spark jobs would be minutes, not seconds).
    values = []

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def accumulate(v):
        values.append(v)

    accumulate()
    df = spark.createDataFrame([(v,) for v in set(values)], "unscaled long")
    out = df.select(
        "unscaled",
        connect_decimal_unscaled(
            connect_decimal_bytes(F.col("unscaled"))
        ).alias("back"),
    ).collect()
    bad = [(r["unscaled"], r["back"]) for r in out if r["back"] != r["unscaled"]]
    assert not bad, f"round-trip mismatches: {bad[:5]}"
