"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


_PERSIST_SLOTS: dict[str, DataFrame] = {}


def slot_persist(df: DataFrame, slot: str) -> DataFrame:
    """``persist()`` with a bounded lifetime for lazy-return query
    shapes: the cached subplan is part of the RETURNED plan, so the
    call site cannot ``unpersist()`` before the caller's action — but
    a long-lived session invoking the query repeatedly (bench reps,
    the oracle harness) would otherwise accumulate cached blocks until
    LRU eviction. Each call unpersists the PREVIOUS occupant of
    ``slot``, holding at most one cached subplan per site regardless
    of invocation count (unpersisting a block mid-consumption is safe
    in Spark — consumers recompute from lineage)."""
    prev = _PERSIST_SLOTS.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session torn down between invocations
    _PERSIST_SLOTS[slot] = df.persist()
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
