"""Bucketed (co-located) joins: shuffle-free fact⋈fact.

At 100 TB the dominant join cost is the shuffle of both fact tables
onto the join key. Spark's managed-table bucketing pre-hash-partitions
the DATA AT REST: two tables bucketed by the same key into the same
bucket count join with ZERO Exchange — each task reads matching
buckets from both sides (`SortMergeJoin` directly over the scans).
This is the persistent analogue of `repartition()`: pay the shuffle
once at write time, amortize it over every subsequent join.

The reference's Iceberg tables get the equivalent from Iceberg's
bucket partition transform (`bucket(N, col)`); this module uses the
Spark-native `DataFrameWriter.bucketBy`, which the Spark catalog
tracks and the planner exploits.

Rules the planner needs (and tests assert):
- same bucket count on both sides (or a divisor — Spark 4 can coalesce
  mismatched counts when `spark.sql.bucketing.coalesceBucketsInJoin` on);
- join keys == bucket keys;
- `sortBy` within buckets removes even the per-task Sort for SMJ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sorted_within: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed table bucketed (and optionally
    sorted) by ``key`` — one write-time shuffle buys every future join
    on ``key`` a shuffle-free plan."""
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sorted_within:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With
    matching bucket specs the physical plan contains no Exchange on
    either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key, how=how)
