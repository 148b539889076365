"""Silver latest-state transform: CDC envelope → current rows per key.

Re-implements the reference's two silver paths with one deterministic
algorithm (the reference itself migrated the full rebuild's
order-dependent ``orderBy + dropDuplicates``
(``/root/reference/jobs/build_orders_silver.py:73-78``) to the windowed
top-1 used by the merge job
(``/root/reference/jobs/merge_orders_silver.py:111-118``) — we use the
window everywhere):

1. envelope-or-bare dispatch: ``when(payload is not null, payload)
   otherwise(v)`` (``build_orders_silver.py:27-28``)
2. ``from_json`` with the declared StructType (``:30-48``), per-field
   ``get_json_object`` fallback (``:49-51,66``)
3. ``coalesce(after.x, before.x)`` — deletes carry only ``before``
   (``:63-66``)
4. not-null key filter (``:85``)
5. window top-1 per key ordered ``(ts_ms DESC, offset DESC)``
6. tombstone drop ``op != 'd'`` (``:85``)
7. amount clean + DOUBLE cast (``:81,89``); epoch-millis → timestamp
   with ``current_timestamp()`` fallback (``merge_orders_silver.py:124-127``)

Scale notes: the only shuffle is the window partition on the key — at
100 TB that is the unavoidable hash exchange on ``order_id``; AQE
handles skew. All expressions are built-ins inside whole-stage codegen
(no UDFs). ``max_by``-style alternatives were considered; the window
keeps the multi-column deterministic tie-break explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.functions.scalars import (
    clean_numeric_string,
    epoch_millis_to_ts,
)
from pyspark.sql import types as T

from privacy_cdc_lakehouse_spark.sources.debezium import CDC_PAYLOAD_SCHEMA

# Bump on ANY change to parse/dedup/merge/partitioning logic: it is
# folded into /tmp lake-cache keys (queries/cdc.py::_materialized_lake)
# so stale snapshots built by older pipeline code are never served.
PIPELINE_VERSION = 4

# Parse-side column pruning: silver never reads `created_at`, so the
# parse schema omits it from before/after (from_json skips unknown
# JSON keys — fewer struct fields is measurably less Jackson work on
# the hot path). The full envelope schema stays the generator's
# contract.
_PARSE_ROW = T.StructType(
    [f for f in CDC_PAYLOAD_SCHEMA["after"].dataType.fields if f.name != "created_at"]
)
_PARSE_PAYLOAD = T.StructType(
    [
        T.StructField("before", _PARSE_ROW),
        T.StructField("after", _PARSE_ROW),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

# Envelope-or-bare in ONE parse: the payload struct AND the bare
# payload fields side by side at the top level. Enveloped rows fill
# `payload`, bare rows fill the top-level fields — from_json ignores
# whichever keys are absent. The previous two-step
# (get_json_object('$.payload') then from_json) parsed every row's
# JSON twice; this halves the flagship's dominant scan cost.
_DISPATCH_SCHEMA = T.StructType(
    [T.StructField("payload", _PARSE_PAYLOAD), *_PARSE_PAYLOAD.fields]
)


def parse_cdc_envelope(bronze: DataFrame) -> DataFrame:
    """Bronze rows (offset, v, ...) → typed change rows.

    Output: order_id int, user_id int, amount_str string, status string,
    op string, ts_ms long, offset long.
    """
    # Empty/whitespace-only input makes from_json return NULL (not a
    # null-fielded row), and Spark 4.1's generated code NPEs when the
    # struct fallback below then reads fields off the null parser
    # result (reproduced in test_malformed_json_rows_are_dropped_not_
    # fatal). Feed those rows '{}' so the parse always yields a row —
    # all-null fields, dropped by the key filter like any bad record.
    # The blank test must be rlike ANY-whitespace: F.trim strips only
    # space characters, so v='\t' or '\n' would slip past a trim==''
    # guard and still NPE (round-5 review finding, reproduced).
    v_safe = F.when(
        F.col("v").rlike(r"^\s*$"), F.lit("{}")
    ).otherwise(F.col("v"))
    j = F.from_json(v_safe, _DISPATCH_SCHEMA)
    # Two-step projection: from_json evaluated once into plain `after`/
    # `before` struct attributes, then cheap GetStructField extraction.
    # Keeping the expensive JsonToStructs out of conditional (coalesce)
    # branches lets whole-stage codegen's subexpression elimination
    # evaluate it once per row.
    cdc = F.coalesce(
        j["payload"],
        F.struct(
            j["before"].alias("before"),
            j["after"].alias("after"),
            j["op"].alias("op"),
            j["ts_ms"].alias("ts_ms"),
        ),
    )
    parsed = bronze.withColumn("cdc", cdc).select(
        F.col("offset"),
        F.col("v"),
        F.col("cdc.before").alias("before"),
        F.col("cdc.after").alias("after"),
        F.col("cdc.op").alias("op"),
        F.col("cdc.ts_ms").alias("ts_ms"),
    )

    def field(name: str) -> F.Column:
        # after-wins coalesce; deletes carry only `before`.
        return F.coalesce(F.col(f"after.{name}"), F.col(f"before.{name}"))

    # Raw-JSON fallback kept for the one field the reference defends
    # (amount: build_orders_silver.py:49-51,66 — schema-drift path). A
    # fallback per field would double the expression tree and with it
    # Catalyst analysis + Janino codegen time for every downstream plan.
    amount = F.coalesce(
        field("amount_eur"), F.get_json_object("v", "$.payload.after.amount_eur")
    )

    return parsed.select(
        field("order_id").cast("int").alias("order_id"),
        field("user_id").cast("int").alias("user_id"),
        amount.alias("amount_str"),
        field("status").alias("status"),
        F.col("op"),
        F.col("ts_ms").cast("long").alias("ts_ms"),
        F.col("offset").cast("long").alias("offset"),
    ).filter(F.col("order_id").isNotNull())


def latest_state(
    changes: DataFrame, drop_tombstones: bool = True, keep_op: bool = False
) -> DataFrame:
    """Deterministic top-1 per key; optionally drop rows whose latest op is delete.

    Output: order_id, user_id, amount_eur double, status, last_change_ts
    (+ op when ``keep_op`` — the incremental MERGE needs the latest op to
    route rows to its DELETE/UPDATE/INSERT clauses).
    """
    # max_by over the (ts_ms, offset) struct == the reference's
    # row_number window ordered (ts_ms DESC NULLS LAST, offset DESC):
    # struct ordering ranks NULL smallest, so a null-ts row loses to
    # any timestamped one (test_null_ts_falls_back_and_loses), and the
    # unique offset makes the ordering total (deterministic). Unlike
    # the window, this is an AGGREGATE with partial (map-side) combine:
    # the shuffle carries ~one row per (input partition, key) instead
    # of every event — the property that matters at 100 TB. Physically
    # Spark plans SortAggregate (struct values have no mutable hash-agg
    # buffer), so each side of the exchange sorts locally on the key —
    # the partial side over its own events, the final side over the
    # ~|keys| combined rows. A window has the same local sorting but
    # must first SHUFFLE every event; here the exchange moves only the
    # combined rows.
    payload = [c for c in changes.columns if c != "order_id"]
    latest = (
        changes.groupBy("order_id")
        .agg(
            F.max_by(
                F.struct(*payload), F.struct(F.col("ts_ms"), F.col("offset"))
            ).alias("_r")
        )
        .select("order_id", "_r.*")
    )
    if drop_tombstones:
        latest = latest.filter(F.col("op") != "d")
    cols = [
        F.col("order_id"),
        F.col("user_id"),
        clean_numeric_string(F.col("amount_str")).alias("amount_eur"),
        F.col("status"),
        F.coalesce(epoch_millis_to_ts(F.col("ts_ms")), F.current_timestamp()).alias(
            "last_change_ts"
        ),
    ]
    if keep_op:
        cols.append(F.col("op"))
    return latest.select(*cols)


def silver_from_bronze(bronze: DataFrame) -> DataFrame:
    """Full-rebuild silver: parse + latest-state in one plan."""
    return latest_state(parse_cdc_envelope(bronze))
