"""Structured Streaming upgrade of the CDC pipeline.

The reference reads Kafka in *batch* mode and hand-rolls offset
checkpointing (``/root/reference/jobs/merge_orders_silver.py:41-60,
149-165``; roadmap admits "exactly-once-ish", ``README.md:225``). The
streaming-native rebuild (SURVEY.md §2.9):

- ``readStream`` on the bronze envelope source with a Spark-managed
  ``checkpointLocation`` — actual exactly-once into idempotent sinks;
- the latest-state MERGE runs inside ``foreachBatch`` (MERGE is not a
  direct streaming sink), reproducing the merge job per micro-batch;
- the manual checkpoint table survives as *monitoring* (the reference
  roadmap's metrics table), advanced by the same merge job;
- watermark + ``dropDuplicatesWithinWatermark`` gives the
  streaming-native version of the W1 window dedup for at-least-once
  sources.

Scale notes: at 100 TB/day the micro-batch MERGE is the standard
Delta/Iceberg CDC pattern; state for watermarked dedup is bounded by
(keys within watermark), and the foreachBatch merge itself is
stateless across batches (state lives in the table). A real Kafka
source swaps in with two lines — the envelope schema is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from privacy_cdc_lakehouse_spark.cdc.jobs import (
    Lakehouse,
    ingest_bronze_idempotent,
    merge_silver,
)

# Bronze envelope schema (= ingest_orders_raw.py:24-34 landing table).
BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("kafka_ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.StringType()),
        T.StructField("ingested_at", T.TimestampType()),
    ]
)


def run_stream_to_silver(
    spark: SparkSession,
    source_dir: str,
    lake: Lakehouse,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    write_change_data: bool = False,
) -> None:
    """Drive the medallion pipeline from a file stream to completion.

    Each micro-batch: append raw records to bronze, then run the
    incremental checkpointed MERGE into silver. Idempotent under replay
    at BOTH layers: foreachBatch is at-least-once (a crash between the
    bronze append and the stream-checkpoint commit re-delivers the
    batch), so bronze ingest itself filters offsets at or below the
    bronze high watermark (``ingest_bronze_idempotent``), and the merge
    consumes only offsets above the monitoring checkpoint.
    """
    reader = spark.readStream.schema(BRONZE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_bronze_idempotent(lake, batch_df)
        merge_silver(lake, write_change_data=write_change_data)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_scd2_stream(
    spark: SparkSession,
    source_dir: str,
    history,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Maintain an SCD2 history table from the bronze envelope stream:
    per micro-batch, parse the envelope and fold it into ``history``
    (a ``LakeTable``) via the O(churn) incremental path.

    ``scd2_apply(assume_ordered=True)`` is sound HERE and only here
    because this runner supplies the PER-KEY ordering end-to-end — the
    only ordering ``_scd2_apply_ordered`` needs: the checkpointed
    availableNow file source replays batches in committed order, and
    upstream CDC offsets are monotone per key (Debezium per-key
    ordering; this repo's generator stamps ``offset = key*4 + seq``),
    so each batch's events for a key come after that key's history —
    the per-batch late-detection job the default path pays is provably
    redundant (the round-10 verdict's ``scd2_apply`` trim).

    Replay safety is EXACT-MEMBERSHIP dedup, the same discipline as
    ``ingest_bronze_idempotent`` (``cdc/jobs.py``) and for the same
    reason: offsets are per-key monotone, NOT globally time-ordered, so
    a batch whose offsets dip below the history's global max coordinate
    is not necessarily a replay — key interleaving puts a low key's
    genuinely-new events below a high key's recorded ones, and a
    global max-offset filter would silently DROP them (data loss, not
    dedup). Instead: when the batch's offset range overlaps the
    history at all, anti-join it against the exact offset set of the
    overlapping history slice — a replayed event's trace is an opening
    coordinate (``offset``) or, for a delete, a closing coordinate
    (``end_offset``) — which footer-stats data skipping prunes to the
    few files that can hold it. The no-overlap common case (strictly
    new data) stays METADATA-ONLY: one manifest-stats high-watermark
    read, no history scan, no anti-join. A replayed dangling delete
    (no trace either way) folds in as zero rows by construction —
    ``scd2_apply`` closes nothing for an already-closed key and
    appends nothing for a delete. The ``LakeTable`` overwrite is an
    atomic snapshot swap, so a crash mid-write leaves the previous
    version readable.
    """
    from privacy_cdc_lakehouse_spark.cdc.scd2 import scd2_apply, scd2_history
    from privacy_cdc_lakehouse_spark.cdc.silver import parse_cdc_envelope

    reader = spark.readStream.schema(BRONZE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = parse_cdc_envelope(batch_df)
        if not history.exists():
            history.overwrite(scd2_history(batch))
            return
        existing = history.read()
        bounds = batch.agg(
            F.min("offset").alias("lo"), F.max("offset").alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            return  # empty batch: nothing to fold, nothing to commit
        lo, hi = int(bounds["lo"]), int(bounds["hi"])
        # No-overlap fast path: global high watermark (max over opening
        # AND closing coordinates — a trailing delete's only trace is a
        # closing coordinate) from manifest footer stats when EXACT
        # (this runner only overwrites, so they always are: a
        # metadata-only read, no per-batch history scan); aggregate
        # scan fallback for inexact/missing stats
        # (tables.py::column_minmax_from_stats documents why excludes
        # make stats an outer envelope only).
        o = history.column_minmax_from_stats("offset")
        e = history.column_minmax_from_stats("end_offset")
        if o is not None and e is not None and o[2] and e[2]:
            vals = [x for x in (o[1], e[1]) if x is not None]
            hwm = max(vals) if vals else None
        else:
            hwm = existing.agg(
                F.max(
                    F.greatest(
                        F.col("offset"),
                        F.coalesce(F.col("end_offset"), F.col("offset")),
                    )
                )
            ).collect()[0][0]
        if hwm is not None and lo <= int(hwm):
            # Straddling batch: NOT necessarily a replay (offsets are
            # per-key monotone only — see docstring). Dedup on exact
            # offset membership against just the overlapping history
            # slice; data skipping prunes the probe to the files whose
            # stats admit [lo, hi].
            seen_open = history.read(
                where=[("offset", ">=", lo), ("offset", "<=", hi)]
            ).select("offset")
            seen_close = history.read(
                where=[("end_offset", ">=", lo), ("end_offset", "<=", hi)]
            ).select(F.col("end_offset").alias("offset"))
            batch = batch.join(
                seen_open.unionByName(seen_close), "offset", "left_anti"
            )
        history.overwrite(scd2_apply(existing, batch, assume_ordered=True))

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def watermarked_dedup(
    stream: DataFrame,
    event_time: str = "kafka_ts",
    keys: list[str] | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming-native W1: event-time dedup with bounded state.

    Defaults to the *delivery identity* ``(k, offset)`` — dedup by key
    alone would swallow genuine successive updates/deletes for the same
    order inside the watermark (one CDC key legitimately emits several
    events within seconds), not just at-least-once redeliveries.
    Pass ``keys=["k"]`` explicitly for true last-wins key dedup.
    """
    return stream.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(
        keys if keys is not None else ["k", "offset"]
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension
    (the standard pattern for joining CDC events to a slowly-changing
    lookup table — Spark re-plans the static side each micro-batch, so a
    LakeTable dimension is re-read at its LATEST snapshot each batch).

    The static side is broadcast (dimensions are small by definition
    here); the stream side never shuffles, preserving source
    parallelism. For a dimension too big to broadcast you'd pre-bucket
    both sides instead.
    """
    d = dim.select(on, *(dim_cols or [c for c in dim.columns if c != on]))
    return stream.join(F.broadcast(d), on, how)


def streaming_window_counts(
    stream: DataFrame,
    event_time: str = "ts",
    window: str = "5 minutes",
    delay: str = "10 minutes",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time window aggregate with late-data handling —
    the streaming twin of queries/analytics.py::q_events_5min_windows.
    Every column is a parameter (a hardcoded sum column would crash any
    stream without a literal 'value' field)."""
    return (
        stream.withWatermark(event_time, delay)
        .groupBy(F.window(event_time, window).alias("w"), group_col)
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), group_col, "n", "total_value")
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    left_delay: str = "10 minutes",
    right_delay: str = "10 minutes",
    within: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join — the §2.9 surface the
    stream-static enrich can't cover: BOTH sides arrive continuously
    (the canonical ad-impression ⋈ click shape; here CDC order events
    ⋈ their follow-up events). The equality key plus the time-range
    condition ``left_time <= right_time <= left_time + within`` is
    what BOUNDS THE STATE STORE: each side buffers only rows newer
    than its watermark minus the interval — without the range
    condition Spark must keep every row forever (unbounded state, the
    classic production OOM). Outer flavors emit the unmatched row only
    once the watermark passes its join window (late-arriving matches
    can no longer change the answer) — the test advances the watermark
    with a later batch to flush them, which is exactly how production
    streams behave.

    Column hygiene: the right side's key and time columns are
    join-condition inputs; all OTHER right columns must not collide
    with left's (enforced here, loudly, instead of Spark's silent
    ambiguous-reference failure at action time)."""
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"left/right column collision {sorted(overlap)} — rename "
            "before joining (only the key may be shared)"
        )
    lw = left.withWatermark(left_time, left_delay).alias("l")
    rw = right.withWatermark(right_time, right_delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}"))
        & (
            F.col(f"r.{right_time}")
            <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {within}")
        )
    )
    joined = lw.join(rw, cond, how)
    # surface ONE key column (outer joins null the inner side's copy)
    keep = [F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key)]
    keep += [F.col(f"l.{c}") for c in left.columns if c != key]
    keep += [F.col(f"r.{c}") for c in right.columns if c != key]
    return joined.select(*keep)


def streaming_session_counts(
    stream: DataFrame,
    event_time: str = "ts",
    gap: str = "30 minutes",
    delay: str = "10 minutes",
    group_col: str = "user_id",
) -> DataFrame:
    """Native session-window aggregation (``F.session_window`` — the
    streaming twin of the batch lag-based sessionization in
    queries/analytics.py::q_events_sessionize): per key, events closer
    than ``gap`` merge into one session whose window GROWS with each
    event; the watermark closes a session once no in-gap event can
    still arrive, so state per key is one open session, not an event
    buffer. Works identically on batch frames (the pytest pins
    stream == batch on the same input)."""
    return (
        stream.withWatermark(event_time, delay)
        .groupBy(
            F.session_window(F.col(event_time), gap).alias("w"), group_col
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            group_col,
            "n_events",
        )
    )
