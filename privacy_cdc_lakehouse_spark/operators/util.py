"""Shared operator plumbing."""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

# (session-object-id, slot) -> (session, persisted df). Guarded by
# _PERSIST_LOCK; entries from stopped sessions are purged on every
# call so a torn-down session's plan is never pinned past the next
# slot_persist anywhere in the process.
_PERSIST_SLOTS: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}
_PERSIST_LOCK = threading.Lock()


def _session_stopped(sess) -> bool:
    try:
        return sess._sc._jsc is None  # SparkContext.stop() nulls _jsc
    except Exception:
        return True


def slot_persist(df: DataFrame, slot: str) -> DataFrame:
    """``persist()`` with a bounded lifetime for lazy-return query
    shapes: the cached subplan is part of the RETURNED plan, so the
    call site cannot ``unpersist()`` before the caller's action — but
    a long-lived session invoking the query repeatedly (bench reps,
    the oracle harness) would otherwise accumulate cached blocks until
    LRU eviction. Each call unpersists the PREVIOUS occupant of
    ``slot`` (across ALL sessions — the bound is per call site, not
    per session) plus any entry whose session has been stopped,
    holding at most one cached subplan per site regardless of
    invocation count (unpersisting a block mid-consumption is safe in
    Spark — consumers recompute from lineage).

    SINGLE-IN-FLIGHT ASSUMPTION: because eviction happens at CALL time
    while the persist pays off at ACTION time, building the same
    slot-keyed query twice before executing the first silently drops
    the first build's persist (its action recomputes the subtree from
    lineage — correct, just unaccelerated). Call sites
    (``curate_corpus(persist_intermediate=True)``,
    ``q_dedup_duplicate_spans``) are invoke-then-consume, which is the
    supported pattern."""
    sess = df.sparkSession
    persisted = df.persist()
    with _PERSIST_LOCK:
        for key in list(_PERSIST_SLOTS):
            prev_sess, prev = _PERSIST_SLOTS[key]
            if key[1] == slot or _session_stopped(prev_sess):
                del _PERSIST_SLOTS[key]
                try:
                    prev.unpersist()
                except Exception:
                    pass  # session torn down between invocations
        _PERSIST_SLOTS[(id(sess), slot)] = (sess, persisted)
    return df


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread CPU-heavy per-row compute across the cluster when the
    input arrives under-split.

    Hash-heavy operator stages (one md5 per shingle, T×b hyperplane
    dots per vector) are bound by the SCAN's split count, and a small
    corpus often arrives as a single parquet row group — unsplittable
    by byte range, so the whole stage pins to one core of a 32-core
    box (measured: the sf0.1 documents fixture is one 594 KB row
    group). A 100 TB corpus arrives as thousands of splits and takes
    the no-op path — the repartition only fires when input partitions
    < cluster parallelism, so the shuffle it adds is by construction
    small (the data fit in fewer splits than cores)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Partition count straight from the JVM physical plan: df.rdd would
    # additionally build the InternalRow->Row conversion plan on the
    # Python side just to ask a number — pure driver overhead at high
    # call rates. NOTE: under AQE, materializing executedPlan().execute()
    # can run jobs for upstream shuffle-stage materialization — the same
    # as the old df.rdd path did; the claim here is parity with df.rdd
    # minus the Python-side conversion plan, NOT "no job ever runs".
    # Keep this out of per-row hot paths; it is called once per operator.
    try:
        n = df._jdf.queryExecution().executedPlan().execute().getNumPartitions()
    except Exception:  # non-classic backends: fall back to the RDD path
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df
