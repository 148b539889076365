"""Privacy projection: salted SHA-256 pseudonymization of user keys.

Mirrors ``/root/reference/jobs/build_privacy_table.py:24-37`` (Spark
table build) and the Trino view variant
(``/root/reference/README.md:106-117``): drop the raw ``user_id``,
publish ``user_key = sha2(user_id || '::' || salt, 256)``. Salt comes
from the environment — never hardcoded
(``/root/reference/jobs/build_privacy_table.py:6-8``).

Scale note: pure narrow projection — no shuffle; codegen'd sha2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.functions.scalars import pii_salt, pseudonym


def pseudonymize_orders(silver: DataFrame, salt: str | None = None) -> DataFrame:
    """orders_current → orders_current_priv."""
    s = salt if salt is not None else pii_salt()
    return silver.select(
        "order_id",
        pseudonym(F.col("user_id"), s).alias("user_key"),
        "amount_eur",
        "status",
        "last_change_ts",
    )
