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
    """True only when the session is POSITIVELY known stopped. A
    backend without the classic ``_sc._jsc`` internals (Spark Connect)
    must answer "alive", not "stopped" — answering "stopped" there
    made every lookup purge the whole memo, silently disabling it
    (round-16 advisor item)."""
    sc = getattr(sess, "_sc", None)
    if sc is not None:
        try:
            return sc._jsc is None  # SparkContext.stop() nulls _jsc
        except Exception:
            return False
    stopped = getattr(sess, "is_stopped", None)  # Connect exposes this
    return bool(stopped) if isinstance(stopped, bool) else False


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


def checkpoint_df(df: DataFrame, eager: bool = True) -> DataFrame:
    """The engine's single "materialize this intermediate" primitive.

    Default: ``localCheckpoint`` — blocks live on executors with
    lineage truncated, the right trade locally and the cheapest one
    anywhere. At cluster scale executor loss (spot nodes, dynamic
    deallocation) makes a local checkpoint unrecoverable, so the
    posture is CONFIG-GATED (round-15 verdict item): set
    ``spark.graft.reliableIntermediates=true`` (plus
    ``sparkContext.setCheckpointDir`` — required by Spark for reliable
    checkpoints) and every intermediate materialization in the engine
    (loop spines, dedup candidate frames, shared panel sub-results)
    switches to a reliable ``checkpoint()`` that survives executor
    loss. Values are identical either way — only the storage home of
    the one materialization changes."""
    try:
        reliable = (
            df.sparkSession.conf.get(
                "spark.graft.reliableIntermediates", "false"
            ).lower()
            == "true"
        )
    except Exception:
        reliable = False
    if reliable:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


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
    ck = checkpoint_df(df, eager=True)
    try:
        n = (
            ck._jdf.queryExecution().executedPlan().execute().getNumPartitions()
        )
    except Exception:  # non-classic backends
        n = ck.rdd.getNumPartitions()
    if n < target:
        spread = checkpoint_df(ck.repartition(target), eager=True)
        # The spread copy is materialized; the first checkpoint's
        # blocks are now dead weight — release them instead of pinning
        # until driver GC (round-16 advisor item). Block loss after
        # this point is no worse than before: a localCheckpoint is
        # already lineage-free, so only `spread`'s own blocks matter.
        try:
            ck._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass  # non-classic backends / plan shape without .rdd()
        return spread
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
        if not _plan_has_exchange(plan):
            n = plan.execute().getNumPartitions()
            return df.repartition(target) if n < target else df
        # Exchange-bearing plan: decide from optimizer stats against
        # AQE's own coalesce target. AQE coalesces shuffle output to
        # ~advisoryPartitionSizeInBytes per partition, so "will this
        # frame arrive under-split at the downstream per-row work" is
        # exactly "is estimated size < target * advisory" — data past
        # that bound already yields >= target post-AQE partitions and
        # must NEVER gain an extra full shuffle (round-16: the old
        # target * maxPartitionBytes bound, ~4 GB at 32 cores, could
        # repartition multi-GB frames AQE had already split wide).
        # Join-stats over-estimates err toward skipping — safe at scale.
        # py4j may hand sizeInBytes back as a Python int (java
        # BigInteger auto-conversion) or as a JavaObject depending on
        # version — the old `.toString()`-only form raised on int and
        # silently fell into the except-path `df.rdd` probe, which
        # EXECUTES AQE stages at build time (round-16 finding).
        raw = qe.optimizedPlan().stats().sizeInBytes()
        size = raw if isinstance(raw, int) else int(raw.toString())
        if size < target * _advisory_partition_bytes(df.sparkSession):
            return df.repartition(target)
        return df
    except Exception:  # non-classic backends: fall back to the RDD path
        n = df.rdd.getNumPartitions()
        return df.repartition(target) if n < target else df


def _plan_has_exchange(plan) -> bool:
    """Structural Exchange detection over a py4j physical-plan tree.
    Substring-matching ``plan.toString()`` misfires when a column or
    relation name contains "Exchange" (round-16 advisor item); node
    class names cannot."""
    stack = [plan]
    while stack:
        node = stack.pop()
        if "Exchange" in node.getClass().getSimpleName():
            return True
        kids = node.children()
        for i in range(kids.length()):
            stack.append(kids.apply(i))
    return False


def _advisory_partition_bytes(spark: SparkSession) -> int:
    raw = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
    )
    try:
        return int(
            spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
                raw
            )
        )
    except Exception:
        return 64 * 1024 * 1024
