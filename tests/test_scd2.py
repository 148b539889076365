"""SCD Type 2 history: version intervals, delete closure, tie handling,
incremental-apply == full-rebuild equality, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.cdc.scd2 import scd2_apply, scd2_history
from privacy_cdc_lakehouse_spark.cdc.silver import parse_cdc_envelope
from privacy_cdc_lakehouse_spark.sources.debezium import cdc_events

_CHANGE_SCHEMA = (
    "order_id int, user_id int, amount_str string, status string,"
    "op string, ts_ms long, offset long"
)


def _changes(spark, rows):
    """rows: (order_id, user_id, amount_str, status, op, ts_ms, offset)."""
    return spark.createDataFrame(rows, _CHANGE_SCHEMA)


def _by_key_version(df):
    return {
        (r["order_id"], r["version"]): r
        for r in df.collect()
    }


def test_scd2_versions_intervals_and_delete_closure(spark):
    ch = _changes(
        spark,
        [
            (1, 10, "5.0", "created", "c", 1_000_000, 1),
            (1, 10, "5.5", "paid", "u", 2_000_000, 2),
            (1, 10, None, None, "d", 3_000_000, 3),
            (2, 20, "7.0", "created", "c", 1_000_000, 4),
        ],
    )
    got = _by_key_version(scd2_history(ch))
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    v1, v2 = got[(1, 1)], got[(1, 2)]
    assert v1["amount_eur"] == 5.0 and not v1["is_current"]
    assert v1["valid_to"] == v2["valid_from"]  # contiguous intervals
    # the delete CLOSES v2 without opening a version
    assert v2["valid_to"] is not None and not v2["is_current"]
    assert got[(2, 1)]["is_current"] and got[(2, 1)]["valid_to"] is None


def test_scd2_equal_ts_tie_zero_length_interval(spark):
    ch = _changes(
        spark,
        [
            (7, 1, "1", "paid", "u", 5_000_000, 10),
            (7, 1, "1", "shipped", "u", 5_000_000, 11),
        ],
    )
    got = _by_key_version(scd2_history(ch))
    assert got[(7, 1)]["status"] == "paid"  # offset breaks the tie
    assert got[(7, 1)]["valid_from"] == got[(7, 1)]["valid_to"]  # zero-length
    assert got[(7, 2)]["status"] == "shipped" and got[(7, 2)]["is_current"]


def test_scd2_apply_equals_full_rebuild(spark, sf_dir):
    parsed = parse_cdc_envelope(cdc_events(spark, sf_dir))
    lo, hi = parsed.agg(F.min("offset"), F.max("offset")).first()
    # two split points: the even mid plus an uneven one that lands
    # mid-key for many keys (offsets are k*4+seq)
    for frac in (0.5, 0.3):
        mid = lo + (hi - lo) * frac
        full = scd2_history(parsed)
        inc = scd2_apply(
            scd2_history(parsed.filter(F.col("offset") <= mid)),
            parsed.filter(F.col("offset") > mid),
        )
        key = ["order_id", "version"]
        assert full.count() == inc.count()
        assert (
            full.alias("f")
            .join(inc.alias("i"), key)
            .filter(
                ~(
                    (F.col("f.user_id") == F.col("i.user_id"))
                    & (F.col("f.amount_eur") == F.col("i.amount_eur"))
                    & (F.col("f.status") == F.col("i.status"))
                    & (F.col("f.valid_from") == F.col("i.valid_from"))
                    & (
                        F.col("f.valid_to").eqNullSafe(F.col("i.valid_to"))
                    )
                    & (F.col("f.is_current") == F.col("i.is_current"))
                )
            )
            .count()
            == 0
        )


def test_scd2_apply_new_key_and_delete_only_batch(spark):
    seed = scd2_history(
        _changes(spark, [(1, 10, "5.0", "created", "c", 1_000_000, 1)])
    )
    batch = _changes(
        spark,
        [
            (1, 10, None, None, "d", 2_000_000, 2),  # delete-only for key 1
            (9, 90, "3.0", "created", "c", 2_000_000, 3),  # brand-new key
        ],
    )
    got = _by_key_version(scd2_apply(seed, batch))
    assert set(got) == {(1, 1), (9, 1)}
    assert not got[(1, 1)]["is_current"] and got[(1, 1)]["valid_to"] is not None
    assert got[(9, 1)]["is_current"] and got[(9, 1)]["version"] == 1


def test_scd2_history_plan_single_exchange_no_join(spark):
    ch = _changes(spark, [(1, 10, "5.0", "created", "c", 1_000_000, 1)])
    plan = scd2_history(ch)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    # the lead + row_number windows share partitioning/ordering: ONE
    # hash exchange on the key, no second shuffle
    # formatted mode prints each node once in the tree ("Exchange (2)")
    # and once in the detail section ("(2) Exchange") — count tree nodes
    assert plan.count("Exchange (") == 1


def test_scd2_apply_detects_late_events_and_errors(spark):
    import pytest

    from privacy_cdc_lakehouse_spark.cdc.scd2 import LateEventsError

    seed = scd2_history(
        _changes(spark, [(1, 10, "5.0", "created", "c", 2_000_000, 5)])
    )
    late = _changes(spark, [(1, 10, "4.0", "created", "c", 1_000_000, 1)])
    with pytest.raises(LateEventsError):
        scd2_apply(seed, late)
    with pytest.raises(ValueError):
        scd2_apply(seed, late, on_late="rebuild")  # needs late_source


def test_scd2_apply_rebuild_handles_any_interleaving(spark, sf_dir):
    """apply == rebuild under ARBITRARY delivery order: batches split
    pseudo-randomly per event (not by offset suffix), so many keys see
    genuinely late events; the rebuild path must restore exact
    equality while untouched keys ride the fast path."""
    parsed = parse_cdc_envelope(cdc_events(spark, sf_dir)).filter(
        F.col("order_id") <= 400  # keep the rebuild test quick
    )
    # pseudo-random 70/30 event split INDEPENDENT of per-key order
    first = parsed.filter(F.crc32(F.col("offset").cast("string")) % 10 < 7)
    second = parsed.subtract(first)
    full = scd2_history(parsed)
    inc = scd2_apply(
        scd2_history(first), second, on_late="rebuild", late_source=parsed
    )
    key = ["order_id", "version"]
    assert full.count() == inc.count()
    mismatches = (
        full.alias("f")
        .join(inc.alias("i"), key)
        .filter(
            ~(
                (F.col("f.status") == F.col("i.status"))
                & (F.col("f.amount_eur") == F.col("i.amount_eur"))
                & (F.col("f.valid_from") == F.col("i.valid_from"))
                & F.col("f.valid_to").eqNullSafe(F.col("i.valid_to"))
                & (F.col("f.is_current") == F.col("i.is_current"))
                & (F.col("f.offset") == F.col("i.offset"))
            )
        )
        .count()
    )
    assert mismatches == 0


def test_scd2_apply_equal_ts_lower_offset_is_late(spark):
    """An equal-timestamp event with a LOWER offset than the newest
    history row is out of order (the offset tie-break would have
    sorted it earlier) — must be flagged."""
    import pytest

    from privacy_cdc_lakehouse_spark.cdc.scd2 import LateEventsError

    seed = scd2_history(
        _changes(spark, [(1, 10, "5.0", "paid", "u", 1_000_000, 8)])
    )
    tie_lower = _changes(spark, [(1, 10, "6.0", "shipped", "u", 1_000_000, 3)])
    with pytest.raises(LateEventsError):
        scd2_apply(seed, tie_lower)


def test_scd2_rebuild_catches_consecutive_dangling_deletes(spark):
    """A key whose newest logged event is a SECOND dangling delete
    (closes nothing) leaves no trace in the history; a batch landing
    between the closed tail and that delete must still be rebuilt."""
    log = _changes(
        spark,
        [
            (1, 10, "1.0", "created", "c", 1_000_000, 1),
            (1, 10, None, None, "d", 3_000_000, 3),
            (1, 10, None, None, "d", 4_000_000, 4),  # dangling
            (1, 10, "2.0", "paid", "u", 3_500_000, 9),  # late mid event
        ],
    )
    seed_slice = log.filter(F.col("offset").isin(1, 3, 4))
    batch = log.filter(F.col("offset") == 9)
    got = _by_key_version(
        scd2_apply(
            scd2_history(seed_slice), batch, on_late="rebuild", late_source=log
        )
    )
    full = _by_key_version(scd2_history(log))
    assert set(got) == set(full)
    for k in full:
        assert got[k]["valid_to"] == full[k]["valid_to"]
        assert got[k]["is_current"] == full[k]["is_current"]
    # the late mid event's version is CLOSED by the dangling delete
    assert not got[(1, 2)]["is_current"]


def test_scd2_apply_assume_ordered_matches_default(spark):
    """assume_ordered skips the late-detection job but must produce
    the identical history for an in-order batch; for a LATE batch it
    documents the bypass (no error — the caller owns the contract)."""
    from privacy_cdc_lakehouse_spark.cdc.scd2 import (
        LateEventsError,
        scd2_apply,
        scd2_history,
    )

    first = _changes(
        spark,
        [
            (1, 10, "5.0", "created", "c", 1000, 1),
            (1, 10, "6.0", "paid", "u", 2000, 2),
            (2, 20, "9.0", "created", "c", 1500, 3),
        ],
    )
    second = _changes(
        spark,
        [
            (1, 10, "7.0", "shipped", "u", 3000, 4),
            (2, 20, None, None, "d", 3500, 5),
            (3, 30, "1.0", "created", "c", 4000, 6),
        ],
    )
    seed = scd2_history(first)
    default = _by_key_version(scd2_apply(seed, second))
    fast = _by_key_version(scd2_apply(seed, second, assume_ordered=True))
    assert fast == default == _by_key_version(
        scd2_history(first.unionByName(second))
    )
    # a late batch: default detects, assume_ordered silently proceeds
    late = _changes(spark, [(1, 10, "9.9", "late", "u", 1500, 99)])
    import pytest

    with pytest.raises(LateEventsError):
        scd2_apply(seed, late)
    scd2_apply(seed, late, assume_ordered=True).collect()  # no error


def test_scd2_apply_assume_ordered_rejects_conflicting_args(spark):
    import pytest

    from privacy_cdc_lakehouse_spark.cdc.scd2 import scd2_apply, scd2_history

    seed = scd2_history(
        _changes(spark, [(1, 10, "5.0", "created", "c", 1000, 1)])
    )
    batch = _changes(spark, [(1, 10, "6.0", "paid", "u", 2000, 2)])
    with pytest.raises(ValueError, match="assume_ordered"):
        scd2_apply(seed, batch, on_late="rebuild", late_source=batch,
                   assume_ordered=True)
