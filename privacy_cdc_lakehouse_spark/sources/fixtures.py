"""Fixture table loaders.

``spark.read.parquet`` everywhere, with one adapter: the driver's
``events`` table is written with ``timestamp[ns]`` (nanosecond) columns,
which Spark 4's vectorized parquet reader rejects at *task* time
(PARQUET_TYPE_ILLEGAL — analysis passes, so a try/except around the
read does not catch it). The footer is inspected up front (pyarrow
``read_schema`` — metadata only, no data I/O); when ns columns are
present the read runs distributed under
``spark.sql.legacy.parquet.nanosAsLong`` and the long nanos are cast to
µs timestamps executor-side (integer ``div`` — doubles lose precision
above 2^53, which e18-scale nanos exceed). This keeps a 100 TB events
table fully distributed: no driver materialization, pushdown and
pruning intact on the non-ns columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ns_timestamp_cols(path: str) -> list[str]:
    """Names of timestamp[ns] columns in the footer. (Just names — the
    µs cast below always interprets the long as a UTC instant; carrying
    the footer tz here would wrongly imply it is honored.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    ns_cols = _ns_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    # Deliberately SESSION-WIDE (matches the session.py builder): with
    # it on, any ns-timestamp parquet read in this session surfaces as
    # BIGINT nanos needing an explicit cast — this loader is the
    # sanctioned path that applies that cast. The alternative (default
    # off) fails the read outright, so there is no silent middle
    # ground; we choose the recoverable mode and own the cast here.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # Floor-division entirely in 64-bit integer math: `div` alone
        # truncates toward zero (pre-epoch negative nanos would round UP
        # by 1µs, diverging from pyarrow/DuckDB floor semantics), and
        # floor(c / 1000.0) would route through a double (exact only to
        # 2^53 — e18-scale nanos exceed it). Subtracting pmod(c, 1000)
        # makes the numerator an exact multiple of 1000 rounded toward
        # -inf, so div is then exact floor. timestamp_micros interprets
        # the long as a UTC instant.
        df = df.withColumn(
            c, F.expr(f"timestamp_micros((`{c}` - pmod(`{c}`, 1000)) div 1000)")
        )
    return df
