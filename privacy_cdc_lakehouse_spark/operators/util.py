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


def checkpoint_parallel(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` + guaranteed ``defaultParallelism``
    partitions — the loop-spine materialization for iterative
    operators.

    Replaces the ``ensure_parallelism(df).localCheckpoint(eager=False)``
    pair (round-15 finding): the old partition probe EXECUTED the
    frame's AQE stages once just to count partitions, discarded the
    result, and the lazy checkpoint then re-executed the same lineage
    at first action — two executions of every loop spine, the second
    hidden at plan-build time (tpch_join_panel paid ~17 s of build
    running its graph edge joins it would run again at collect).
    Eager checkpoint is the single materialization the loop needs
    anyway; the materialized RDD's partition count is then free, and
    the under-split case repartitions CHECKPOINTED blocks (small by
    construction when that branch fires — big data always arrives
    pre-split) and re-checkpoints so every round reads the spread
    copy without replaying the shuffle."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    ck = df.localCheckpoint(eager=True)
    try:
        n = (
            ck._jdf.queryExecution().executedPlan().execute().getNumPartitions()
        )
    except Exception:  # non-classic backends
        n = ck.rdd.getNumPartitions()
    if n < target:
        return ck.repartition(target).localCheckpoint(eager=True)
    return ck


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread CPU-heavy per-row compute across the cluster when the
    input arrives under-split.

    Hash-heavy operator stages (one md5 per shingle, T×b hyperplane
    dots per vector) are bound by the SCAN's split count, and a small
    corpus often arrives as a single parquet row group — unsplittable
    by byte range, so the whole stage pins to one core of a 32-core
    box (measured: the sf0.1 documents fixture is one 594 KB row
    group). A 100 TB corpus arrives as thousands of splits and takes
    the no-op path.

    The probe must not RUN anything (round-15 finding: the previous
    ``executedPlan().execute()`` probe materialized AQE shuffle stages
    at plan-BUILD time — tpch_join_panel paid 17 s executing its graph
    edge joins once for the probe and again for the real action):

    - exchange-free plan (the raw-scan case the function exists for):
      exact partition count from the non-adaptive ``sparkPlan`` —
      building that RDD schedules nothing;
    - plan with exchanges: decide from optimizer STATS. The output of
      a shuffle is AQE-coalesced by SIZE anyway, so the question "will
      downstream per-row work be under-split" is exactly "is the data
      small"; join-stats over-estimates err toward skipping the
      repartition, which is the safe direction at scale (never add a
      shuffle to big data for parallelism it already has)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        qe = df._jdf.queryExecution()
        plan = qe.sparkPlan()
        if "Exchange" not in plan.toString():
            n = plan.execute().getNumPartitions()
            return df.repartition(target) if n < target else df
        size = int(qe.optimizedPlan().stats().sizeInBytes().toString())
        max_pb = int(
            df.sparkSession._jsparkSession.sessionState()
            .conf()
            .filesMaxPartitionBytes()
        )
        if size < target * max_pb:
            return df.repartition(target)
        return df
    except Exception:  # non-classic backends: fall back to the RDD path
        n = df.rdd.getNumPartitions()
        return df.repartition(target) if n < target else df
