"""SCD Type 2 history build from the CDC change log.

The reference serves only the LATEST state per key
(``/root/reference/jobs/merge_orders_silver.py`` — the silver
``orders_current`` table); the canonical companion consumption pattern
for the same Debezium feed is the slowly-changing-dimension type-2
history table: one row per VERSION of each key, ``valid_from`` /
``valid_to`` interval columns, ``is_current`` flag. This module builds
it two ways with one algorithm:

- ``scd2_history``: full rebuild from a parsed change log.
- ``scd2_apply``: incremental — close the open versions the batch
  supersedes, append the batch's versions with continued numbering.
  ``apply(history(first), second) == history(all)`` exactly (pytest +
  the ``cdc_changes_feed`` driver arm pin this against the relational
  full-rebuild oracle).

Semantics (per key, events totally ordered by ``(ts_ms, offset)`` — the
silver layer's deterministic tie-break):

- every non-delete event OPENS a version carrying its row image;
- the version's ``valid_to`` is the NEXT event's timestamp (any op —
  a delete closes the interval without opening a new one);
- ``is_current`` ⇔ no next event (so a key whose last event is a
  delete has no current row — matching the latest-state tombstone
  drop);
- ``version`` numbers the key's non-delete events 1..n in event order;
- equal-timestamp ties produce zero-length intervals (both versions
  kept; ``version``/``offset`` order disambiguates) — the standard
  SCD2 treatment of intra-grain updates.

Precondition: ``ts_ms`` non-null (the generator always stamps it; a
null would order nondeterministically across engines). ``scd2_apply``
additionally assumes the batch's events are at-or-after the existing
history per key — the CDC log-ordering contract the incremental MERGE
path already relies on (``cdc/jobs.py``).

Scale: ONE hash exchange on the key per input (the two window passes
share partitioning and ordering, so Catalyst plans a single
sort+exchange); the incremental path touches the batch (lead window at
batch size) plus two key-equi joins against the existing history —
batch-key-sized aggregates on the build side, AQE free to broadcast
them. Nothing is corpus-windowed, nothing cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.functions.scalars import (
    clean_numeric_string,
    epoch_millis_to_ts,
)

def scd2_history(changes: DataFrame) -> DataFrame:
    """Parsed change rows (``parse_cdc_envelope`` output) → full SCD2
    history: (order_id, version, user_id, amount_eur, status,
    valid_from, valid_to, is_current)."""
    w = Window.partitionBy("order_id").orderBy("ts_ms", "offset")
    # lead() must see ALL events (a delete closes its predecessor);
    # version numbering counts only the non-delete (row-image) events.
    h = changes.withColumn("_next_ms", F.lead("ts_ms").over(w))
    return (
        h.filter(F.col("op") != "d")
        .withColumn("version", F.row_number().over(w))
        .select(
            "order_id",
            F.col("version").cast("int").alias("version"),
            "user_id",
            clean_numeric_string(F.col("amount_str")).alias("amount_eur"),
            "status",
            epoch_millis_to_ts(F.col("ts_ms")).alias("valid_from"),
            epoch_millis_to_ts(F.col("_next_ms")).alias("valid_to"),
            F.col("_next_ms").isNull().alias("is_current"),
        )
    )


def scd2_apply(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """Incrementally fold a parsed change batch into an existing SCD2
    history; returns the updated history (==
    ``scd2_history(all events)`` when the batch is the log's suffix).

    O(churn): the window runs at batch size; the existing history is
    touched by two key-equi joins whose build sides are batch-key-sized
    aggregates (un-hinted — AQE broadcasts them when small, degrades to
    shuffle on a huge batch instead of OOMing the driver)."""
    # The batch's first event per key closes that key's open version —
    # in the full rebuild, lead() would see this event as the next one.
    firsts = batch.groupBy("order_id").agg(F.min("ts_ms").alias("_close_ms"))
    closing = F.col("is_current") & F.col("_close_ms").isNotNull()
    closed = (
        existing.join(firsts, "order_id", "left")
        .withColumn(
            "valid_to",
            F.when(closing, epoch_millis_to_ts(F.col("_close_ms"))).otherwise(
                F.col("valid_to")
            ),
        )
        .withColumn("is_current", F.col("is_current") & F.col("_close_ms").isNull())
        .drop("_close_ms")
    )
    base = existing.groupBy("order_id").agg(F.max("version").alias("_base_v"))
    appended = (
        scd2_history(batch)
        .join(base, "order_id", "left")
        .withColumn(
            "version",
            (F.col("version") + F.coalesce(F.col("_base_v"), F.lit(0))).cast("int"),
        )
        .drop("_base_v")
    )
    return closed.unionByName(appended)
