"""Fixture table loaders.

``spark.read.parquet`` everywhere, with one adapter: the driver's
``events`` table is written with ``timestamp[ns]`` (nanosecond) columns,
which Spark 4's vectorized parquet reader rejects
(PARQUET_TYPE_ILLEGAL). The fallback reads via pyarrow, casts ns → µs
(Spark's native precision), and ships through Arrow
``createDataFrame`` — acceptable for fixtures; a production 100 TB
source would be written with µs timestamps in the first place (or read
with ``spark.sql.legacy.parquet.nanosAsLong`` + an explicit cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
        df.schema  # force analysis so illegal types surface here
        return df
    except Exception:
        return _load_via_arrow(spark, path)


def _load_via_arrow(spark: SparkSession, path: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(path)
    fields = []
    for f in table.schema:
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            fields.append(pa.field(f.name, pa.timestamp("us", tz=f.type.tz)))
        else:
            fields.append(f)
    # safe=False truncates sub-microsecond nanos — the same flooring
    # DuckDB applies when it reads ns parquet into its µs timestamps.
    casted = table.cast(pa.schema(fields), safe=False)
    return spark.createDataFrame(casted.to_pandas())
