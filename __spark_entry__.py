"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``privacy_cdc_lakehouse_spark/``; this module
is a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full privacy-CDC medallion pipeline at sf0.001 —
    Debezium-envelope event log → parse → latest-state dedup →
    pseudonymized projection (reference parity:
    jobs/build_orders_silver.py + jobs/build_privacy_table.py)."""
    from privacy_cdc_lakehouse_spark.queries.cdc import q_orders_current_priv

    return q_orders_current_priv(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from privacy_cdc_lakehouse_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omissions → rows-only check)."""
    from privacy_cdc_lakehouse_spark.queries import all_oracles

    return all_oracles()
