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


# ------------------- Kafka Connect Decimal (precise mode) -------------------
#
# With Debezium `decimal.handling.mode=precise` (the default), NUMERIC
# columns arrive as Kafka Connect `Decimal`: base64 of the unscaled
# integer's minimal-length big-endian two's-complement bytes, scale in
# the schema. The reference hit exactly this (amount_eur missing,
# /root/reference/README.md:167-172) and names two fixes: switch to
# double mode (our main pipeline's semantics) OR "decode base64 bytes
# in Spark for backfills" — these functions are that backfill path,
# all JVM-side built-ins (unbase64/hex/conv), no UDFs, so the decode
# stays inside whole-stage codegen at 100 TB.

_TWO_POW_64 = "18446744073709551616"
_HIGH_NIBBLES = list("89ABCDEF")


def connect_decimal_bytes(unscaled: Column) -> Column:
    """Encode a BIGINT unscaled value as a Kafka Connect Decimal payload:
    base64(minimal-length big-endian two's-complement bytes).

    Inverse of :func:`connect_decimal_unscaled`; used to simulate
    precise-mode Debezium envelopes deterministically so the decode
    path has an exact oracle."""
    hx16 = F.lpad(F.hex(unscaled.cast("long")), 16, "0")
    # Minimal two's complement: drop leading 0x00 bytes while the next
    # nibble keeps the sign bit clear, or leading 0xFF bytes while the
    # next nibble keeps it set (regex backtracks to the shortest valid
    # encoding). All-zero input strips to '' → single 0x00 byte.
    minimal = F.regexp_replace(
        hx16, "^(?:00)+(?![89A-F])|^(?:FF)+(?=[89A-F])", ""
    )
    minimal = F.when(F.length(minimal) == 0, F.lit("00")).otherwise(minimal)
    return F.base64(F.unhex(minimal))


def connect_decimal_unscaled(b64: Column) -> Column:
    """Decode a Kafka Connect Decimal payload to its BIGINT unscaled
    value. Payloads wider than 8 bytes (beyond NUMERIC range the
    reference uses) raise via assert_true rather than decoding wrong."""
    hx = F.hex(F.unbase64(b64))
    neg = F.substring(hx, 1, 1).isin(*_HIGH_NIBBLES)
    padded = F.when(neg, F.lpad(hx, 16, "F")).otherwise(F.lpad(hx, 16, "0"))
    unsigned = F.conv(padded, 16, 10).cast("decimal(20,0)")
    signed = F.when(
        neg, unsigned - F.lit(_TWO_POW_64).cast("decimal(21,0)")
    ).otherwise(unsigned)
    fits = F.assert_true(
        F.length(hx) <= 16, F.lit("Connect Decimal wider than 64 bits")
    )
    return F.when(fits.isNull(), signed.cast("long")).otherwise(F.lit(None))


def connect_decimal(b64: Column, scale: int) -> Column:
    """Decode a Kafka Connect Decimal payload to DECIMAL(38, scale)."""
    unscaled = connect_decimal_unscaled(b64).cast("decimal(38,0)")
    return (unscaled / F.lit(10**scale)).cast(f"decimal(38,{scale})")
