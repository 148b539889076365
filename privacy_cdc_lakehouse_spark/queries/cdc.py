"""CDC pipeline queries + DuckDB oracles.

The Spark side runs the REAL pipeline — Debezium-shaped JSON envelopes
built from `orders`, then parse → window-dedup → tombstone filter →
clean-cast (``cdc/silver.py``). The oracle side computes the same final
state relationally from the shared event-log CTE
(``sources/debezium.py:ORACLE_EVENTS_CTE``) — proving the JSON
round-trip + dedup algorithm equals the declarative latest-state spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.cdc.privacy import pseudonymize_orders
from privacy_cdc_lakehouse_spark.cdc.silver import silver_from_bronze
from privacy_cdc_lakehouse_spark.functions.scalars import DEFAULT_TEST_SALT
from privacy_cdc_lakehouse_spark.session import pin_utc
from privacy_cdc_lakehouse_spark.sources.debezium import ORACLE_EVENTS_CTE, cdc_events

_LATEST_CTE = f"""
WITH {ORACLE_EVENTS_CTE},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY order_id ORDER BY change_ts DESC, off DESC) AS rn
    FROM cdc_ev
),
current_state AS (
    SELECT order_id, user_id, amount_eur, status, change_ts AS last_change_ts
    FROM ranked WHERE rn = 1 AND op <> 'd'
)
"""


def q_orders_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full CDC pipeline → silver latest-state."""
    pin_utc(spark)
    return silver_from_bronze(cdc_events(spark, sf_dir))


def q_orders_current_priv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver → salted-SHA256 pseudonymized projection."""
    pin_utc(spark)
    return pseudonymize_orders(
        silver_from_bronze(cdc_events(spark, sf_dir)), salt=DEFAULT_TEST_SALT
    )


def q_bronze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze verification: count + max offset (README.md:83,202 parity)."""
    pin_utc(spark)
    return cdc_events(spark, sf_dir).agg(
        F.count("*").alias("n_events"),
        F.max("offset").alias("max_offset"),
        F.countDistinct("k").alias("n_keys"),
    )


def q_cdc_dq_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality metrics row over silver (reference roadmap
    ``README.md:227``): null keys, negative amounts, duplicate keys."""
    pin_utc(spark)
    silver = silver_from_bronze(cdc_events(spark, sf_dir))
    return silver.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("null_user_ids"),
        F.sum(F.when(F.col("amount_eur") < 0, 1).otherwise(0)).alias("negative_amounts"),
        (F.count("*") - F.countDistinct("order_id")).alias("duplicate_keys"),
    )


def q_cdc_op_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-op distribution over the raw event log (monitoring)."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.cdc.silver import parse_cdc_envelope

    return (
        parse_cdc_envelope(cdc_events(spark, sf_dir))
        .groupBy("op")
        .agg(F.count("*").alias("n"))
        .orderBy("op")
    )


QUERIES = {
    "cdc_orders_current": q_orders_current,
    "cdc_orders_current_priv": q_orders_current_priv,
    "cdc_bronze_stats": q_bronze_stats,
    "cdc_dq_metrics": q_cdc_dq_metrics,
    "cdc_op_histogram": q_cdc_op_histogram,
}

ORACLES = {
    "cdc_orders_current": _LATEST_CTE
    + "SELECT order_id, user_id, amount_eur, status, last_change_ts FROM current_state",
    "cdc_orders_current_priv": _LATEST_CTE
    + f"""
    SELECT order_id,
           sha256(CAST(user_id AS VARCHAR) || '::' || '{DEFAULT_TEST_SALT}') AS user_key,
           amount_eur, status, last_change_ts
    FROM current_state
    """,
    "cdc_bronze_stats": f"""
    WITH {ORACLE_EVENTS_CTE}
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(off) AS BIGINT) AS max_offset,
           CAST(count(DISTINCT order_id) AS BIGINT) AS n_keys
    FROM cdc_ev
    """,
    "cdc_dq_metrics": _LATEST_CTE
    + """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_ids,
           CAST(sum(CASE WHEN amount_eur < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_amounts,
           CAST(count(*) - count(DISTINCT order_id) AS BIGINT) AS duplicate_keys
    FROM current_state
    """,
    "cdc_op_histogram": f"""
    WITH {ORACLE_EVENTS_CTE}
    SELECT op, CAST(count(*) AS BIGINT) AS n FROM cdc_ev GROUP BY op ORDER BY op
    """,
}
