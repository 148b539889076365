"""CDC pipeline queries + DuckDB oracles.

The Spark side runs the REAL pipeline — Debezium-shaped JSON envelopes
built from `orders`, then parse → window-dedup → tombstone filter →
clean-cast (``cdc/silver.py``). The oracle side computes the same final
state relationally from the shared event-log CTE
(``sources/debezium.py:ORACLE_EVENTS_CTE``) — proving the JSON
round-trip + dedup algorithm equals the declarative latest-state spec.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.cdc.privacy import pseudonymize_orders
from privacy_cdc_lakehouse_spark.cdc.silver import silver_from_bronze
from privacy_cdc_lakehouse_spark.functions.scalars import DEFAULT_TEST_SALT
from privacy_cdc_lakehouse_spark.session import pin_utc
from privacy_cdc_lakehouse_spark.sources.debezium import ORACLE_EVENTS_CTE, cdc_events

_LATEST_CTE = f"""
WITH {ORACLE_EVENTS_CTE},
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY order_id ORDER BY change_ts DESC, off DESC) AS rn
    FROM cdc_ev
),
current_state AS (
    SELECT order_id, user_id, amount_eur, status, change_ts AS last_change_ts
    FROM ranked WHERE rn = 1 AND op <> 'd'
)
"""


def q_orders_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full CDC pipeline → silver latest-state."""
    pin_utc(spark)
    return silver_from_bronze(cdc_events(spark, sf_dir))


def q_orders_current_priv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver → salted-SHA256 pseudonymized projection."""
    pin_utc(spark)
    return pseudonymize_orders(
        silver_from_bronze(cdc_events(spark, sf_dir)), salt=DEFAULT_TEST_SALT
    )


def q_bronze_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze verification counters (README.md:83,202 parity), the
    silver data-quality metrics row (reference roadmap ``README.md:227``:
    null keys, negative amounts, duplicate keys), AND the newest-record
    peek (O3/F11 parity, README.md:207 ``substr(v,1,500) ... ORDER BY
    ... DESC LIMIT 1``, recency keyed on offset — ingested_at is
    nondeterministic) as ONE monitoring row. Merged in rounds 3/5 to
    fit the driver's correctness window; all three arms are single-row,
    so the cross joins are 1×1×1."""
    pin_utc(spark)
    ev = cdc_events(spark, sf_dir)
    bronze = ev.agg(
        F.count("*").alias("n_events"),
        F.max("offset").alias("max_offset"),
        F.countDistinct("k").alias("n_keys"),
    )
    silver = silver_from_bronze(ev).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("null_user_ids"),
        F.sum(F.when(F.col("amount_eur") < 0, 1).otherwise(0)).alias("negative_amounts"),
        (F.count("*") - F.countDistinct("order_id")).alias("duplicate_keys"),
    )
    peek = (
        ev.orderBy(F.desc("offset"))
        .limit(1)
        .select(
            F.col("offset").alias("peek_offset"),
            F.substring("k", 1, 500).alias("key_peek"),
        )
    )
    return bronze.crossJoin(silver).crossJoin(peek)


def q_cdc_op_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-op distribution over the raw event log (monitoring)."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.cdc.silver import parse_cdc_envelope

    return (
        parse_cdc_envelope(cdc_events(spark, sf_dir))
        .groupBy("op")
        .agg(F.count("*").alias("n"))
        .orderBy("op")
    )


def q_bronze_dq_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC monitoring surface as one tagged long-format row set
    (round-7 consolidation; both original plans run unchanged via the
    original callables): the bronze/silver/peek DQ counters of
    ``q_bronze_dq`` stack-unpivoted as ``dq`` rows, plus the change-op
    histogram as ``op`` rows. Values ride one string column — every
    source value is an exact integer or a string, so the cast is
    lossless and engine-identical. Freed the ``cdc_op_histogram`` slot
    for ``dedup_semantic``."""
    pin_utc(spark)
    dq = q_bronze_dq(spark, sf_dir).selectExpr(
        "stack(9, "
        "'n_events', CAST(n_events AS STRING), "
        "'max_offset', CAST(max_offset AS STRING), "
        "'n_keys', CAST(n_keys AS STRING), "
        "'n_rows', CAST(n_rows AS STRING), "
        "'null_user_ids', CAST(null_user_ids AS STRING), "
        "'negative_amounts', CAST(negative_amounts AS STRING), "
        "'duplicate_keys', CAST(duplicate_keys AS STRING), "
        "'peek_offset', CAST(peek_offset AS STRING), "
        "'key_peek', key_peek) AS (k, v)"
    ).select(F.lit("dq").alias("kind"), "k", "v")
    ops = q_cdc_op_histogram(spark, sf_dir).select(
        F.lit("op").alias("kind"),
        F.col("op").alias("k"),
        F.col("n").cast("string").alias("v"),
    )
    # round 10: expectations arm (operators/expectations.py) — the
    # generalized DQ layer the reference's roadmap names, run over the
    # REAL silver table: schema/key/domain/range/FK rules (all exact
    # counts; the range rule genuinely fails on high-value orders so a
    # nonzero count is verified too) plus the quarantine split sizes.
    from privacy_cdc_lakehouse_spark.operators import expectations as ex
    from privacy_cdc_lakehouse_spark.sources.fixtures import load_table

    silver = silver_from_bronze(cdc_events(spark, sf_dir))
    cust = load_table(spark, sf_dir, "customer")
    rules = [
        ex.expect_not_null("order_id"),
        ex.expect_not_null("status"),
        ex.expect_in_set("status", ["created", "paid", "shipped"]),
        ex.expect_in_range("amount_eur", 0.0, 300000.0),
        ex.expect_unique("order_id"),
        ex.expect_referential("user_id", cust, "c_custkey"),
    ]
    expect_rows = ex.validate(silver, rules).select(
        F.lit("expect").alias("kind"),
        F.col("rule").alias("k"),
        F.col("n_violations").cast("string").alias("v"),
    )
    valid, invalid = ex.quarantine(
        silver, [r for r in rules if r.kind == "row"]
    )
    quarantine_rows = (
        valid.agg(F.count(F.lit(1)).alias("nv"))
        .crossJoin(invalid.agg(F.count(F.lit(1)).alias("ni")))
        .selectExpr(
            "stack(2, 'quarantine_valid', CAST(nv AS STRING), "
            "'quarantine_invalid', CAST(ni AS STRING)) AS (k, v)"
        )
        .select(F.lit("expect").alias("kind"), "k", "v")
    )
    return (
        dq.unionByName(ops)
        .unionByName(expect_rows)
        .unionByName(quarantine_rows)
        .orderBy("kind", "k")
    )


def q_decimal_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precise-mode Debezium Decimal backfill (``README.md:167-172``):
    amounts encoded as Kafka Connect base64 two's-complement payloads
    (scale 2), decoded back JVM-side, aggregated. Keys % 13 carry a
    negated amount so the negative-bytes sign-extension path is
    exercised; the oracle recomputes the sums relationally from
    `orders`, so any codec bit-error breaks the hash."""
    from privacy_cdc_lakehouse_spark.functions.scalars import (
        connect_decimal,
        connect_decimal_bytes,
        connect_decimal_unscaled,
    )

    pin_utc(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = (
        F.when(F.col("o_orderkey") % 13 == 0, -1).otherwise(1)
        * F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )
    encoded = orders.select(
        F.col("o_orderkey").alias("k"),
        connect_decimal_bytes(cents).alias("payload"),
    )
    decoded = encoded.select(
        "k",
        connect_decimal_unscaled(F.col("payload")).alias("cents"),
        connect_decimal(F.col("payload"), 2).alias("amount"),
    )
    return (
        decoded.groupBy((F.col("k") % 4).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.round(F.sum("amount").cast("double"), 2).alias("sum_eur"),
        )
        .orderBy("bucket")
    )


_DECIMAL_BACKFILL_SQL = """
WITH c AS (
    SELECT o_orderkey AS k,
           CASE WHEN o_orderkey % 13 = 0 THEN -1 ELSE 1 END
             * CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
)
SELECT CAST(k % 4 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       ROUND(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS sum_eur
FROM c GROUP BY 1 ORDER BY 1
"""


def _pid_alive(pid: int) -> bool:
    """True when ``pid`` is a live process (signal-0 probe; EPERM means
    alive-but-not-ours, which still counts as alive)."""
    import errno
    import os

    try:
        os.kill(pid, 0)
    except OSError as e:
        return e.errno == errno.EPERM
    return True


def _reap_dead_corrupt_roots(root: str) -> None:
    """Remove ``<root>.corrupt-<pid>`` siblings whose mover process is
    gone. They exist only so a still-running reader doesn't lose its
    files mid-read; once that process exits they are pure /tmp leakage
    (round-6 advisory)."""
    import os
    import shutil

    parent, base = os.path.split(root)
    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        if not name.startswith(f"{base}.corrupt-"):
            continue
        pid_s = name.rsplit("-", 1)[-1]
        if not pid_s.isdigit() or _pid_alive(int(pid_s)):
            continue
        shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def _process_scratch(prefix: str, sf_dir: str, extra: str = "") -> str:
    """Deterministic-per-process scratch dir for query-built tables:
    reruns in one driver REUSE it (wiped on entry) instead of leaking a
    mkdtemp per run; the pid scope keeps concurrent drivers from
    clobbering each other and removes the fixed-/tmp-name symlink
    surface; an atexit hook reclaims it at process exit (safe — the
    returned lazy DataFrames are always collected within the process),
    so repeated driver/bench processes don't accumulate dirs in /tmp."""
    import atexit
    import os
    import shutil
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(), f"{prefix}_{tag}{extra}_p{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def q_sql_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text MERGE INTO parity (J1 textual form): the reference's
    exact 3-clause statement (``merge_orders_silver.py:135-147``,
    CATALOG=demo) parsed and executed over a LakeTable. The event log is
    split at the median offset; the first half seeds silver, the second
    half becomes the ``staging_orders`` temp view consumed by the SQL
    MERGE — the final table must equal the declarative latest-state over
    ALL events (same oracle as the flagship)."""
    from privacy_cdc_lakehouse_spark.cdc.silver import (
        PIPELINE_VERSION,
        latest_state,
        parse_cdc_envelope,
        silver_from_bronze,
    )
    from privacy_cdc_lakehouse_spark.sql_merge import sql_merge
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    pin_utc(spark)
    events = cdc_events(spark, sf_dir)
    # Split at the (min+max)/2 offset: offsets are a dense append log,
    # so this equals the median split — but it's ONE partial+final agg
    # (scale-safe at any log size), where approxQuantile with
    # relativeError=0 forces an exact-quantile pass that degrades
    # badly at 100 TB.
    lo_hi = events.agg(
        F.min("offset").alias("lo"), F.max("offset").alias("hi")
    ).collect()[0]
    mid = (lo_hi["lo"] + lo_hi["hi"]) / 2
    first = events.filter(F.col("offset") <= mid)
    second = events.filter(F.col("offset") > mid)

    from privacy_cdc_lakehouse_spark.cdc.jobs import _with_bucket

    scratch = _process_scratch(
        "pcl_sqlmerge", sf_dir, extra=f"_v{PIPELINE_VERSION}"
    )
    # Bucket-partitioned scratch silver + a touched-bucket
    # partition_filter — the SAME partition-scoped copy-on-write the
    # production `merge_silver` path runs (cdc/jobs.py::_merge_staged):
    # the MERGE rewrites only the buckets this batch touches, so the
    # bench headline measures the plan you'd actually run at 100 TB,
    # not a whole-table rewrite. The statement is the reference's
    # 3-clause shape with ONE addition: `order_bucket` rides the INSERT
    # list (unlisted insert columns land NULL, which would break both
    # partition pruning and the filter's coverage of inserted rows).
    silver = LakeTable(spark, scratch)
    staged = _with_bucket(
        latest_state(parse_cdc_envelope(second), drop_tombstones=False, keep_op=True)
    ).persist()  # feeds the touched-bucket collect + the MERGE's joins
    try:
        staged.createOrReplaceTempView("staging_orders")

        # Round-15 profile (DESIGN.md): the row is four sequential job
        # barriers of ~1.2-1.6 s each, latency- not compute-bound. The
        # seed write and the staging materialization are INDEPENDENT
        # (both read the shared bronze cache; the MERGE needs both),
        # so submit them as concurrent Spark jobs — the standard
        # multi-action driver pattern; semantics unchanged, one
        # barrier's latency hidden behind the other.
        from concurrent.futures import ThreadPoolExecutor

        def _seed() -> None:
            # Seed layout: one file per bucket (repartition on the
            # partition column before the partitioned write) — the
            # compact bootstrap layout a real table starts from, not
            # |tasks|×|buckets| fragments.
            silver.overwrite(
                _with_bucket(silver_from_bronze(first)).repartition(
                    "order_bucket"
                ),
                partition_by=["order_bucket"],
            )

        def _touched() -> list:
            return sorted(
                r["order_bucket"]
                for r in staged.select("order_bucket").distinct().collect()
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            seed_f = pool.submit(_seed)
            touched_f = pool.submit(_touched)
            seed_f.result()
            touched = touched_f.result()
        pf = f"order_bucket IN ({', '.join(str(b) for b in touched)})"
        sql_merge(
            spark,
            """
            MERGE INTO demo.silver.orders_current t
            USING staging_orders s
            ON t.order_id = s.order_id
            WHEN MATCHED AND s.op = 'd' THEN DELETE
            WHEN MATCHED AND s.op <> 'd' THEN UPDATE SET
              user_id = s.user_id,
              amount_eur = s.amount_eur,
              status = s.status,
              last_change_ts = s.last_change_ts
            WHEN NOT MATCHED AND s.op <> 'd' THEN INSERT (order_id, user_id, amount_eur, status, last_change_ts, order_bucket)
            VALUES (s.order_id, s.user_id, s.amount_eur, s.status, s.last_change_ts, s.order_bucket)
            """,
            {"silver.orders_current": silver},
            partition_filter=pf if touched else None,
        )
    finally:
        staged.unpersist()
    return silver.read().select(
        "order_id", "user_id", "amount_eur", "status", "last_change_ts"
    )


def q_cdc_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed (Delta CDF parity, ``LakeTable.read_changes``)
    as a driver-verified row: seed silver from the first half of the
    event log, MERGE the second half with ``write_change_data=True``,
    and return the merge commit's row-level feed — delete preimages,
    update preimage/postimage pairs, inserts. The oracle recomputes the
    identical classification relationally (batch keys joined against
    the seed state), so every feed row's values AND change-type tag are
    hash-checked. This is the read side of a CDC lakehouse: the same
    contract the pipeline consumes from Debezium, exported downstream.

    Round-10 widening — ``scd2`` arm: the OTHER canonical consumption
    of the same feed, the slowly-changing-dimension type-2 history
    (``cdc/scd2.py``), run through the INCREMENTAL path over the same
    split (seed history from the first half, ``scd2_apply`` the second
    half) — so the arm pins ``apply == rebuild`` against an oracle
    that rebuilds the full history relationally: every version's row
    image, ``valid_from``/``valid_to`` interval, continued version
    number, and ``is_current`` flag is hash-checked."""
    from privacy_cdc_lakehouse_spark.cdc.silver import (
        PIPELINE_VERSION,
        latest_state,
        parse_cdc_envelope,
        silver_from_bronze,
    )
    from privacy_cdc_lakehouse_spark.tables import CHANGE_TYPE_COL, LakeTable

    pin_utc(spark)
    events = cdc_events(spark, sf_dir)
    lo_hi = events.agg(
        F.min("offset").alias("lo"), F.max("offset").alias("hi")
    ).collect()[0]
    mid = (lo_hi["lo"] + lo_hi["hi"]) / 2
    first = events.filter(F.col("offset") <= mid)
    second = events.filter(F.col("offset") > mid)

    scratch = _process_scratch("pcl_cdf", sf_dir, extra=f"_v{PIPELINE_VERSION}")
    silver = LakeTable(spark, scratch)
    silver.overwrite(silver_from_bronze(first))
    staged = latest_state(
        parse_cdc_envelope(second), drop_tombstones=False, keep_op=True
    )
    v = silver.merge(
        staged,
        keys=["order_id"],
        matched_delete=F.col("s.op") == "d",
        insert_condition=F.col("s.op") != "d",
        write_change_data=True,
    )
    feed_rows = silver.read_changes(v, v).select(
        F.lit("feed").alias("kind"),
        F.col(CHANGE_TYPE_COL).alias("change_type"),
        "order_id",
        "user_id",
        "amount_eur",
        "status",
        F.col("last_change_ts").alias("ts"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(None).cast("int").alias("is_current"),
        F.lit(None).cast("int").alias("version"),
    )

    from privacy_cdc_lakehouse_spark.cdc.scd2 import scd2_apply, scd2_history

    hist = scd2_apply(
        scd2_history(parse_cdc_envelope(first)), parse_cdc_envelope(second)
    )
    scd2_rows = hist.select(
        F.lit("scd2").alias("kind"),
        F.lit(None).cast("string").alias("change_type"),
        "order_id",
        "user_id",
        "amount_eur",
        "status",
        F.col("valid_from").alias("ts"),
        "valid_to",
        F.col("is_current").cast("int").alias("is_current"),
        "version",
    )
    return feed_rows.unionByName(scd2_rows).orderBy(
        "kind", "order_id", "version", "change_type"
    )


_CHANGES_FEED_SQL = f"""
WITH {ORACLE_EVENTS_CTE},
bounds AS (SELECT (min(off) + max(off)) / 2.0 AS mid FROM cdc_ev),
seed AS (
    SELECT order_id, user_id, amount_eur, status, change_ts AS last_change_ts
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY order_id ORDER BY change_ts DESC, off DESC) AS rn
        FROM cdc_ev WHERE off <= (SELECT mid FROM bounds)
    ) WHERE rn = 1 AND op <> 'd'
),
batch AS (
    SELECT order_id, user_id, amount_eur, status,
           change_ts AS last_change_ts, op
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY order_id ORDER BY change_ts DESC, off DESC) AS rn
        FROM cdc_ev WHERE off > (SELECT mid FROM bounds)
    ) WHERE rn = 1
),
-- SCD2 full rebuild: the incremental apply the Spark side runs must
-- land on exactly this history
scd2_lead AS (
    SELECT *, lead(change_ts) OVER (
        PARTITION BY order_id ORDER BY change_ts, off) AS next_ts
    FROM cdc_ev
),
scd2_hist AS (
    SELECT order_id, user_id, amount_eur, status, change_ts, next_ts,
           CAST(row_number() OVER (
               PARTITION BY order_id ORDER BY change_ts, off) AS INT)
             AS version
    FROM scd2_lead WHERE op <> 'd'
)
SELECT 'feed' AS kind, 'delete' AS change_type, s.order_id, s.user_id,
       s.amount_eur, s.status, s.last_change_ts AS ts,
       CAST(NULL AS TIMESTAMP) AS valid_to, CAST(NULL AS INT) AS is_current,
       CAST(NULL AS INT) AS version
FROM batch b JOIN seed s USING (order_id) WHERE b.op = 'd'
UNION ALL
SELECT 'feed', 'update_preimage', s.order_id, s.user_id, s.amount_eur,
       s.status, s.last_change_ts,
       CAST(NULL AS TIMESTAMP), CAST(NULL AS INT), CAST(NULL AS INT)
FROM batch b JOIN seed s USING (order_id) WHERE b.op <> 'd'
UNION ALL
SELECT 'feed', 'update_postimage', b.order_id, b.user_id, b.amount_eur,
       b.status, b.last_change_ts,
       CAST(NULL AS TIMESTAMP), CAST(NULL AS INT), CAST(NULL AS INT)
FROM batch b JOIN seed s USING (order_id) WHERE b.op <> 'd'
UNION ALL
SELECT 'feed', 'insert', b.order_id, b.user_id, b.amount_eur,
       b.status, b.last_change_ts,
       CAST(NULL AS TIMESTAMP), CAST(NULL AS INT), CAST(NULL AS INT)
FROM batch b LEFT JOIN seed s USING (order_id)
WHERE s.order_id IS NULL AND b.op <> 'd'
UNION ALL
SELECT 'scd2', CAST(NULL AS VARCHAR), order_id, user_id, amount_eur,
       status, change_ts, next_ts,
       CAST(CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS INT), version
FROM scd2_hist
ORDER BY kind, order_id, version, change_type
"""


def q_cdc_stream_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 as a driver-verified row: the foreachBatch micro-batch
    pipeline (file stream → idempotent bronze append → checkpointed
    incremental MERGE, ``streaming/pipeline.py::run_stream_to_silver``)
    run to completion with ``availableNow`` over the event fixture —
    final silver must equal the declarative latest-state over ALL
    events (same oracle as the flagship ``cdc_orders_current``; the
    stream==batch parity the pytest suite asserts, surfaced to the
    correctness gate).

    Fixture mechanics: the log is range-split by offset into three
    files with strictly increasing mtimes so FileStreamSource (which
    orders batches by modification time) delivers offset-ordered
    micro-batches — the Kafka per-partition ordering contract the
    checkpointed merge consumes. Bronze itself no longer needs arrival
    order (exact-offset dedup handles stragglers)."""
    import glob
    import os
    import shutil
    import time

    from privacy_cdc_lakehouse_spark.cdc.jobs import Lakehouse
    from privacy_cdc_lakehouse_spark.cdc.silver import PIPELINE_VERSION
    from privacy_cdc_lakehouse_spark.streaming.pipeline import (
        run_stream_to_silver,
    )

    pin_utc(spark)
    scratch = _process_scratch(
        "pcl_stream", sf_dir, extra=f"_v{PIPELINE_VERSION}"
    )
    raw = os.path.join(scratch, "raw")
    cdc_events(spark, sf_dir).repartitionByRange(3, "offset").write.parquet(raw)
    src = os.path.join(scratch, "source")
    os.makedirs(src)
    t0 = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(raw, "part-*.parquet")))):
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    lake = Lakehouse(spark, os.path.join(scratch, "lake"))
    run_stream_to_silver(
        spark,
        src,
        lake,
        os.path.join(scratch, "ckpt"),
        max_files_per_trigger=1,
    )
    return lake.silver.read().select(
        "order_id", "user_id", "amount_eur", "status", "last_change_ts"
    )


def q_scd2_stream_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 snapshot-overwrite streaming runner
    (``streaming/pipeline.py::run_scd2_stream``) at gate sizing
    (round-11 verdict task: ``cdc_stream_silver`` prices the
    merge-based streaming path and ``cdc_changes_feed`` the batch
    SCD2, but the overwrite-per-batch runner had no at-scale price).
    The CDC feed is range-split by offset into 4 files with strictly
    increasing mtimes — globally offset-ordered delivery, the Kafka
    single-partition shape — so every batch after the first takes the
    runner's NO-OVERLAP fast path: ONE metadata-only manifest-stats
    high-watermark read, no history scan, no membership anti-join.
    Returns a 1-row summary of the final history PLUS
    ``wm_stats_exact``: whether both watermark columns' footer stats
    are present and exact on the final table — the runner's
    metadata-path precondition, which on this overwrite-only table
    holds for every intermediate version too (each overwrite records
    fresh stats), so True == the fast path was available to (and
    taken by) every batch. The gate value-asserts it alongside
    versions/current counts. NOT a registry row (foreachBatch output
    is not DuckDB-expressible; stream == full-rebuild parity is
    pytest-pinned under a key-interleaved split, the adversarial
    shape)."""
    import glob
    import os
    import shutil
    import time

    from privacy_cdc_lakehouse_spark.streaming.pipeline import run_scd2_stream
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    pin_utc(spark)
    scratch = _process_scratch("pcl_scd2stream", sf_dir)
    raw = os.path.join(scratch, "raw")
    cdc_events(spark, sf_dir).repartitionByRange(4, "offset").write.parquet(raw)
    src = os.path.join(scratch, "source")
    os.makedirs(src)
    t0 = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(raw, "part-*.parquet")))):
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    hist = LakeTable(spark, os.path.join(scratch, "hist"))
    run_scd2_stream(
        spark, src, hist, os.path.join(scratch, "ckpt"),
        max_files_per_trigger=1,
    )
    o = hist.column_minmax_from_stats("offset")
    e = hist.column_minmax_from_stats("end_offset")
    wm_exact = (
        o is not None and e is not None and bool(o[2]) and bool(e[2])
    )
    return hist.read().agg(
        F.count(F.lit(1)).alias("versions"),
        F.sum(F.col("is_current").cast("long")).alias("current_rows"),
        F.countDistinct("order_id").alias("keys"),
        F.lit(wm_exact).alias("wm_stats_exact"),
    )


def q_sql_dml_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text DML front (``sql_merge.py::sql_dml``) end-to-end on
    a LakeTable: seed from `customer`, ``INSERT INTO ... SELECT``
    (append with target-schema coercion), ``UPDATE ... SET ... WHERE``
    (copy-on-write), ``DELETE FROM ... WHERE`` (copy-on-write), read
    back. The oracle replays the identical mutations relationally —
    with the engine's NULL-safe DELETE keep rule spelled out as
    ``NOT coalesce(pred, false)`` so the replay stays faithful even on
    data with NULLs (this fixture has none; the NULL path itself is
    pytest-verified in ``test_delete_where_right_to_be_forgotten``).
    (TRUNCATE is exercised in pytest; a truncated table has no rows to
    hash.) The UPDATE doubles
    the balance instead of scaling by 1.1 deliberately: two-decimal
    doubles double exactly, so no cross-engine float-rounding slack."""
    from privacy_cdc_lakehouse_spark.sources.fixtures import load_table
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    pin_utc(spark)
    cust = load_table(spark, sf_dir, "customer")
    seed = cust.filter(F.col("c_custkey") <= 300).select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        "c_mktsegment",
    )
    cust.createOrReplaceTempView("v_customer_dml")

    scratch = _process_scratch("pcl_dml", sf_dir)
    t = LakeTable(spark, scratch)
    t.overwrite(seed)
    tables = {"scratch.cust": t}
    sql_dml(
        spark,
        """INSERT INTO demo.scratch.cust
           SELECT c_custkey + 100000 AS c_custkey, c_name,
                  CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
           FROM v_customer_dml WHERE c_custkey <= 50""",
        tables,
    )
    sql_dml(
        spark,
        "UPDATE scratch.cust SET c_acctbal = c_acctbal * 2 "
        "WHERE c_mktsegment = 'BUILDING'",
        tables,
    )
    sql_dml(spark, "DELETE FROM scratch.cust WHERE c_acctbal < 0", tables)
    return t.read().orderBy("c_custkey")


_SQL_DML_LIFECYCLE_SQL = """
WITH seed AS (
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           c_mktsegment
    FROM customer WHERE c_custkey <= 300
),
ins AS (
    SELECT c_custkey + 100000 AS c_custkey, c_name,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey <= 50
),
allr AS (SELECT * FROM seed UNION ALL SELECT * FROM ins),
upd AS (
    SELECT c_custkey, c_name,
           CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal * 2
                ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM allr
)
SELECT c_custkey, c_name, c_acctbal, c_mktsegment
FROM upd WHERE NOT coalesce(c_acctbal < 0, false)
ORDER BY c_custkey
"""


# ----------------------------- catalog / DDL surface ------------------------


def _materialized_lake(spark: SparkSession, sf_dir: str):
    """Medallion lakehouse built once per sf_dir into a /tmp cache —
    the real pipeline (bronze append → silver rebuild → checkpoint),
    persisted as LakeTables so the catalog layer has real snapshots to
    publish."""
    import os
    import tempfile

    from privacy_cdc_lakehouse_spark.cdc.jobs import (
        Lakehouse,
        ingest_bronze,
        merge_silver,
    )
    from privacy_cdc_lakehouse_spark.cdc.silver import PIPELINE_VERSION
    from privacy_cdc_lakehouse_spark.sources.debezium import (
        _GENERATOR_VERSION,
        source_digest,
    )

    # Cache key = generator version + PIPELINE version + sf tag + the
    # SOURCE identity digest: silver logic changes bump
    # PIPELINE_VERSION so stale caches built by older code are never
    # served (round-2 advisory), and the digest keeps an in-place
    # orders.parquet regeneration or a same-basename dataset from
    # serving a lake built over the old data (round-5 review — the
    # bronze cache had this fix, the derived lake cache did not).
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(
        tempfile.gettempdir(),
        f"pcl_lake_{_GENERATOR_VERSION}_p{PIPELINE_VERSION}_{tag}_"
        f"{source_digest(sf_dir)}",
    )
    lake = Lakehouse(spark, root)
    # pid staging is atomic across PROCESSES; same-process driver
    # THREADS share the pid and would co-write one staging dir
    # (round-16: independent queries now build from thread pools), so
    # the one-off build is additionally serialized per process. Warm
    # path: one exists() probe, no contention.
    with _LAKE_BUILD_LOCK:
        _ensure_lake(spark, sf_dir, lake, root)
    return lake


_LAKE_BUILD_LOCK = threading.Lock()


def _ensure_lake(spark: SparkSession, sf_dir: str, lake, root: str) -> None:
    from privacy_cdc_lakehouse_spark.cdc.jobs import (
        Lakehouse,
        ingest_bronze,
        merge_silver,
    )

    if not lake.silver.exists():
        # Build into a process-unique staging root, then PUBLISH with an
        # atomic rename. The old in-place recovery (rmtree the shared
        # root, rebuild into it) raced concurrent drivers: B could
        # delete A's half-built lake mid-ingest and both would then
        # write into one directory (round-5 review). With rename
        # publication, a half-built lake never exists at the shared
        # path; a racing loser just discards its staging copy and
        # serves the winner's. A corrupt legacy root (bronze present,
        # silver missing — a pre-fix crash) is moved aside, not
        # deleted, in case another process is still reading it.
        import shutil

        if os.path.exists(root):
            # Guarded: two drivers can pass the exists() check together
            # and race the rename — the loser must treat OSError as
            # "someone else moved it" and continue, not crash.
            try:
                os.rename(root, f"{root}.corrupt-{os.getpid()}")
            except OSError:
                pass
        _reap_dead_corrupt_roots(root)
        staging = f"{root}.build-{os.getpid()}"
        shutil.rmtree(staging, ignore_errors=True)
        build = Lakehouse(spark, staging)
        ingest_bronze(build, cdc_events(spark, sf_dir))
        merge_silver(build)
        try:
            os.rename(staging, root)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)  # lost the race


def q_catalog_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 verification surface: SHOW SCHEMAS + SHOW TABLES across the
    medallion namespaces after DDL registration (``README.md:200-201``
    parity), as one tagged listing (round-3 window consolidation)."""
    from privacy_cdc_lakehouse_spark.catalog import (
        register_lakehouse,
        show_schemas,
        show_tables,
    )

    pin_utc(spark)
    register_lakehouse(spark, _materialized_lake(spark, sf_dir))
    schemas = show_schemas(spark).select(
        F.lit("schema").alias("kind"),
        "schema_name",
        F.lit(None).cast("string").alias("table_name"),
    )
    tables = show_tables(spark).select(
        F.lit("table").alias("kind"), "schema_name", "table_name"
    )
    return schemas.unionByName(tables).orderBy("kind", "schema_name", "table_name")


def q_catalog_orders_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read silver back through the catalog (``spark.table`` ≙
    ``merge_orders_silver.py:25-47``): proves the published view equals
    the pipeline output — LakeTable parquet round-trip included."""
    from privacy_cdc_lakehouse_spark.catalog import register_lakehouse

    pin_utc(spark)
    register_lakehouse(spark, _materialized_lake(spark, sf_dir))
    return spark.table("silver.orders_current").select(
        "order_id", "user_id", "amount_eur", "status", "last_change_ts"
    )


def q_catalog_priv_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STANDING privacy view (catalog object, not a temp view) read
    via spark.table — reference privacy layer parity
    (``README.md:106-117``)."""
    from privacy_cdc_lakehouse_spark.catalog import register_lakehouse

    pin_utc(spark)
    # Explicit test salt: the oracle hashes with DEFAULT_TEST_SALT, and
    # register_lakehouse now defaults to the env-aware pii_salt().
    register_lakehouse(
        spark, _materialized_lake(spark, sf_dir), salt=DEFAULT_TEST_SALT
    )
    return spark.table("silver.orders_current_priv").select(
        "order_id", "user_key", "amount_eur", "status", "last_change_ts"
    )


def q_catalog_silver_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both catalog read paths in one tagged union (round-6
    consolidation: ``catalog_orders_current`` + ``catalog_priv_view`` —
    the ORIGINAL spark.table plans over the silver table and the
    STANDING privacy view run unchanged via the callables above, tagged
    by ``kind``; freed a registry slot for ``curation_mixture_sample``).
    user_id is stringified so both arms share one schema."""
    pin_utc(spark)
    cur_rows = q_catalog_orders_current(spark, sf_dir).select(
        F.lit("current").alias("kind"),
        "order_id",
        F.col("user_id").cast("string").alias("user_id"),
        F.lit(None).cast("string").alias("user_key"),
        "amount_eur",
        "status",
        "last_change_ts",
    )
    priv_rows = q_catalog_priv_view(spark, sf_dir).select(
        F.lit("priv").alias("kind"),
        "order_id",
        F.lit(None).cast("string").alias("user_id"),
        "user_key",
        "amount_eur",
        "status",
        "last_change_ts",
    )
    return cur_rows.unionByName(priv_rows).orderBy("kind", "order_id")


def q_lake_point_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping read path: a narrow key-range scan of the silver
    LakeTable via ``read(where=)`` — files whose footer min/max exclude
    the range are pruned before planning; the residual filter keeps the
    result exact (equals the relational oracle over the same range)."""
    pin_utc(spark)
    lake = _materialized_lake(spark, sf_dir)
    return (
        lake.silver.read(
            where=[("order_id", ">=", 1000), ("order_id", "<", 1200)]
        )
        .select("order_id", "user_id", "amount_eur", "status", "last_change_ts")
        .orderBy("order_id")
    )


_LAKE_POINT_RANGE_SQL = (
    _LATEST_CTE
    + """
SELECT order_id, user_id, amount_eur, status, last_change_ts
FROM current_state
WHERE order_id >= 1000 AND order_id < 1200
ORDER BY order_id
"""
)


_CATALOG_SURFACE_SQL = """
SELECT * FROM (VALUES
    ('schema', 'bronze', CAST(NULL AS VARCHAR)),
    ('schema', 'monitoring', CAST(NULL AS VARCHAR)),
    ('schema', 'silver', CAST(NULL AS VARCHAR)),
    ('table', 'bronze', 'orders_cdc_raw'),
    ('table', 'monitoring', 'cdc_checkpoints'),
    ('table', 'silver', 'orders_current'),
    ('table', 'silver', 'orders_current_priv')
) AS t(kind, schema_name, table_name)
ORDER BY kind, schema_name, table_name
"""


QUERIES = {
    "cdc_orders_current": q_orders_current,
    "cdc_orders_current_priv": q_orders_current_priv,
    # round 7: cdc_op_histogram folded in as 'op' rows (both original
    # plans unchanged) — freed the slot for llmops.py::dedup_semantic
    "cdc_bronze_dq": q_bronze_dq_panel,
    "cdc_decimal_backfill": q_decimal_backfill,
    "sql_merge_orders": q_sql_merge_orders,
    # round 6: Change Data Feed surfaced as a hash-checked row (slot
    # freed by folding pivot_status_by_priority into
    # analytics.py::grouping_analytics)
    "cdc_changes_feed": q_cdc_changes_feed,
    # round 6: the streaming path's stream==batch parity, surfaced from
    # pytest to a driver-verified row (slot freed by folding
    # q10_returned_item_revenue + q18_large_volume_customers into
    # analytics.py::tpch_customer_revenue)
    "cdc_stream_silver": q_cdc_stream_silver,
    "sql_dml_lifecycle": q_sql_dml_lifecycle,
    "catalog_show_surface": q_catalog_surface,
    # round 6 (cont.): catalog_orders_current + catalog_priv_view →
    # catalog_silver_reads (both spark.table plans run unchanged; freed
    # the slot for curation_mixture_sample)
    "catalog_silver_reads": q_catalog_silver_reads,
    "lake_point_range": q_lake_point_range,
}

ORACLES = {
    "cdc_orders_current": _LATEST_CTE
    + "SELECT order_id, user_id, amount_eur, status, last_change_ts FROM current_state",
    # the streaming pipeline must converge to the SAME latest state
    "cdc_stream_silver": _LATEST_CTE
    + "SELECT order_id, user_id, amount_eur, status, last_change_ts FROM current_state",
    "cdc_orders_current_priv": _LATEST_CTE
    + f"""
    SELECT order_id,
           sha256(CAST(user_id AS VARCHAR) || '::' || '{DEFAULT_TEST_SALT}') AS user_key,
           amount_eur, status, last_change_ts
    FROM current_state
    """,
    "cdc_bronze_dq": _LATEST_CTE
    + """
    , dqrow AS (
    SELECT * FROM (
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(off) AS BIGINT) AS max_offset,
               CAST(count(DISTINCT order_id) AS BIGINT) AS n_keys
        FROM cdc_ev
    ) b CROSS JOIN (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_ids,
               CAST(sum(CASE WHEN amount_eur < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_amounts,
               CAST(count(*) - count(DISTINCT order_id) AS BIGINT) AS duplicate_keys
        FROM current_state
    ) s CROSS JOIN (
        SELECT CAST(off AS BIGINT) AS peek_offset,
               substr('{"order_id":' || CAST(order_id AS VARCHAR) || '}', 1, 500) AS key_peek
        FROM cdc_ev ORDER BY off DESC LIMIT 1
    ) p
    )
    SELECT kind, k, v FROM (
        SELECT 'dq' AS kind, m AS k, v FROM (
            SELECT unnest(ARRAY['n_events', 'max_offset', 'n_keys', 'n_rows',
                                'null_user_ids', 'negative_amounts',
                                'duplicate_keys', 'peek_offset', 'key_peek']) AS m,
                   unnest(ARRAY[CAST(n_events AS VARCHAR), CAST(max_offset AS VARCHAR),
                                CAST(n_keys AS VARCHAR), CAST(n_rows AS VARCHAR),
                                CAST(null_user_ids AS VARCHAR),
                                CAST(negative_amounts AS VARCHAR),
                                CAST(duplicate_keys AS VARCHAR),
                                CAST(peek_offset AS VARCHAR), key_peek]) AS v
            FROM dqrow
        )
        UNION ALL
        SELECT 'op', op, CAST(count(*) AS VARCHAR) FROM cdc_ev GROUP BY op
        UNION ALL
        -- expectations replay over the same latest state: FALSE-or-NULL
        -- row predicates, sum(n-1) duplicate mass, NOT EXISTS FK
        SELECT 'expect', k, CAST(v AS VARCHAR) FROM (
            SELECT unnest(ARRAY['not_null_order_id', 'not_null_status',
                                'in_set_status', 'in_range_amount_eur',
                                'quarantine_valid', 'quarantine_invalid']) AS k,
                   unnest(ARRAY[
                       sum(CASE WHEN order_id IS NULL THEN 1 ELSE 0 END),
                       sum(CASE WHEN status IS NULL THEN 1 ELSE 0 END),
                       sum(CASE WHEN NOT coalesce(
                           status IN ('created', 'paid', 'shipped'), false)
                           THEN 1 ELSE 0 END),
                       sum(CASE WHEN NOT coalesce(
                           amount_eur >= 0 AND amount_eur <= 300000, false)
                           THEN 1 ELSE 0 END),
                       sum(CASE WHEN order_id IS NOT NULL
                                 AND status IS NOT NULL
                                 AND coalesce(status IN
                                     ('created', 'paid', 'shipped'), false)
                                 AND coalesce(amount_eur >= 0
                                     AND amount_eur <= 300000, false)
                           THEN 1 ELSE 0 END),
                       sum(CASE WHEN order_id IS NULL OR status IS NULL
                                 OR NOT coalesce(status IN
                                     ('created', 'paid', 'shipped'), false)
                                 OR NOT coalesce(amount_eur >= 0
                                     AND amount_eur <= 300000, false)
                           THEN 1 ELSE 0 END)]) AS v
            FROM current_state
        )
        UNION ALL
        SELECT 'expect', 'unique_order_id',
               CAST((SELECT coalesce(sum(n - 1), 0) FROM (
                   SELECT count(*) AS n FROM current_state GROUP BY order_id
               ) WHERE n > 1) AS VARCHAR)
        UNION ALL
        SELECT 'expect', 'fk_user_id',
               CAST((SELECT count(*) FROM current_state s
                     WHERE s.user_id IS NOT NULL AND NOT EXISTS (
                         SELECT 1 FROM customer c
                         WHERE c.c_custkey = s.user_id)) AS VARCHAR)
    )
    ORDER BY kind, k
    """,
    "cdc_decimal_backfill": _DECIMAL_BACKFILL_SQL,
    # SQL-text MERGE must land on the SAME final state as the flagship.
    "sql_merge_orders": _LATEST_CTE
    + "SELECT order_id, user_id, amount_eur, status, last_change_ts FROM current_state",
    "cdc_changes_feed": _CHANGES_FEED_SQL,
    "sql_dml_lifecycle": _SQL_DML_LIFECYCLE_SQL,
    "catalog_show_surface": _CATALOG_SURFACE_SQL,
    "catalog_silver_reads": _LATEST_CTE
    + f"""
    SELECT 'current' AS kind, order_id,
           CAST(user_id AS VARCHAR) AS user_id,
           CAST(NULL AS VARCHAR) AS user_key,
           amount_eur, status, last_change_ts
    FROM current_state
    UNION ALL
    SELECT 'priv', order_id, CAST(NULL AS VARCHAR),
           sha256(CAST(user_id AS VARCHAR) || '::' || '{DEFAULT_TEST_SALT}'),
           amount_eur, status, last_change_ts
    FROM current_state
    ORDER BY kind, order_id
    """,
    "lake_point_range": _LAKE_POINT_RANGE_SQL,
}
