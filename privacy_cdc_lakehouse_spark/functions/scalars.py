"""Scalar expression helpers (all JVM-side built-ins — no UDFs).

Parity targets in the reference:
- amount cleaning: ``regexp_replace(col, r'["\\s]', '')`` then DOUBLE cast
  (``/root/reference/jobs/build_orders_silver.py:81,89``) — the documented
  Debezium DECIMAL-as-string workaround (``/root/reference/README.md:167-172``).
- pseudonymization: ``sha2(concat_ws('::', user_id, salt), 256)``
  (``/root/reference/jobs/build_privacy_table.py:30``).
- epoch millis → timestamp: ``from_unixtime(ts_ms / 1000)``
  (``/root/reference/jobs/build_orders_silver.py:91``) — integer-second
  precision by design.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_TEST_SALT = "SALT123"


def pii_salt() -> str:
    """Salt from env (reference policy: never hardcode in prod jobs,
    ``/root/reference/jobs/build_privacy_table.py:6-8``); deterministic
    test default so oracle comparisons are reproducible."""
    return os.environ.get("PII_SALT", DEFAULT_TEST_SALT)


def clean_numeric_string(col: Column) -> Column:
    """Strip quotes/whitespace from a stringly-typed numeric, cast DOUBLE."""
    return F.regexp_replace(col, r'["\s]', "").cast("double")


def pseudonym(user_id: Column, salt: str) -> Column:
    """Salted SHA-256 pseudonym (lowercase hex), `user_id::salt`."""
    return F.sha2(F.concat_ws("::", user_id.cast("string"), F.lit(salt)), 256)


def epoch_millis_to_ts(ts_ms: Column) -> Column:
    """Debezium epoch-millis → TimestampType at whole-second precision."""
    return F.from_unixtime((ts_ms / 1000).cast("long")).cast("timestamp")
