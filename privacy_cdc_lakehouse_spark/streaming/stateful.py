"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful streaming at all (SURVEY.md §2.9); this
supplies the building block Spark offers for operators the built-in
window/dedup set can't express: arbitrary per-key state machines.

``order_lifecycle_tracker`` tracks, per order key, a running state
machine over CDC ops — how many changes each order has seen, its
current status, and whether it regressed (e.g. 'shipped' → 'created'),
emitting one row per key per micro-batch. This is the shape of real
CDC quality monitors (out-of-order detection, SLA timers).

Scale notes: state is per-key and O(1) (a counter + last status), the
canonical bounded-state design; keys are hash-partitioned by the
``groupBy``; state store lives with the stream checkpoint. Timeouts
(``GroupStateTimeout``) would evict idle keys in a production monitor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "order_id int, n_changes long, last_status string, regressed boolean"
)
STATE_SCHEMA = "n_changes long, last_status string, regressed boolean"

_STATUS_ORDER = {"created": 0, "paid": 1, "shipped": 2, "cancelled": 2}


def _advance(
    state_tuple: tuple, pdfs: Iterator[pd.DataFrame]
) -> tuple[int, str | None, bool]:
    """ONE shared state-machine step used by BOTH operator variants —
    a single definition so the applyInPandasWithState and TWS twins
    cannot drift. Event order mirrors the silver pipeline's
    ``max_by(struct(ts_ms, offset))`` ranking, where a NULL ts_ms ranks
    SMALLEST (oldest): na_position='first' — pandas' default 'last'
    would treat null-ts events as newest, diverging from the table
    state this monitor mirrors (round-5 review finding)."""
    n_changes, last_status, regressed = state_tuple
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts_ms", "offset"], na_position="first")
    for status in rows["status"]:
        if status is None:
            continue
        if (
            last_status is not None
            and _STATUS_ORDER.get(status, 0) < _STATUS_ORDER.get(last_status, 0)
        ):
            regressed = True
        last_status = status
    return n_changes + len(rows), last_status, regressed


def _emit(key: tuple, n_changes: int, last_status, regressed) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "order_id": [key[0]],
            "n_changes": [n_changes],
            "last_status": [last_status],
            "regressed": [regressed],
        }
    )


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    current = state.get if state.exists else (0, None, False)
    n_changes, last_status, regressed = _advance(current, pdfs)
    state.update((n_changes, last_status, regressed))
    yield _emit(key, n_changes, last_status, regressed)


def order_lifecycle_tracker(changes: DataFrame) -> DataFrame:
    """Apply the per-order state machine to a stream of parsed CDC
    change rows (order_id, status, ts_ms, offset)."""
    return changes.groupBy("order_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------- transformWithStateInPandas variant (Spark 4 API) ----------
#
# Spark 4's successor to applyInPandasWithState: a StatefulProcessor
# class with named, typed state variables (ValueState/ListState/
# MapState), per-variable TTL, and timers — the API new operators
# should target; the applyInPandasWithState version above remains as
# the widely-deployed form. Same state machine, same outputs.
#
# Environment gate: the TWS runtime speaks protobuf to the JVM
# (pyspark.sql.streaming.proto) and needs the `protobuf` package,
# which this container lacks — the operator is fully implemented and
# its test auto-skips when the dependency is absent.


def _make_lifecycle_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LifecycleProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("lifecycle", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            current = (
                self._state.get() if self._state.exists() else (0, None, False)
            )
            n_changes, last_status, regressed = _advance(current, rows)
            self._state.update((n_changes, last_status, regressed))
            yield _emit(key, n_changes, last_status, regressed)

        def close(self) -> None:
            pass

    return LifecycleProcessor()


def order_lifecycle_tracker_tws(changes: DataFrame) -> DataFrame:
    """The same per-order state machine on transformWithStateInPandas.
    Requires the RocksDB state store provider (the TWS backend)."""
    return changes.groupBy("order_id").transformWithStateInPandas(
        statefulProcessor=_make_lifecycle_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
