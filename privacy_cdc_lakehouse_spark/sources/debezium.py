"""Debezium-shaped CDC event source, simulated deterministically.

The reference's upstream is Postgres WAL → Debezium → Kafka topic
``pg.public.orders`` (``/root/reference/connectors/debezium-postgres.json:4-24``),
consumed as rows ``(topic, partition, offset, kafka_ts, k, v, ingested_at)``
with ``v`` a Debezium JSON envelope
``{"payload": {before, after, op, ts_ms}}``
(``/root/reference/jobs/ingest_orders_raw.py:24-34``,
``/root/reference/jobs/build_orders_silver.py:26-44``).

Here the event log is derived *deterministically from the driver's
``orders`` table*, so every downstream pipeline stage has an exact
relational DuckDB oracle (``ORACLE_EVENTS_CTE``). Per order key K with
order date D (truncated to seconds) and total price P:

=====  ==========================  =========  ==========================  ======
event  emitted when                op/status  amount                      ts
=====  ==========================  =========  ==========================  ======
e0     always                      c/created  P                           D
e1     K % 3 != 0                  u/paid     P * 1.1                     D+60s
e2     K % 7 == 0                  u/shipped  P*1.1 if K%3!=0 else P      D+60s if K even else D+120s
e3     K % 10 == 0                 d          (before only)               D+180s
=====  ==========================  =========  ==========================  ======

``offset`` = K*4 + seq (strictly increasing per key). Even keys divisible
by 7 (and not 3) produce e1/e2 with EQUAL ts — exercising the
deterministic ``(ts_ms, offset)`` tie-break the reference adopted
(``/root/reference/jobs/merge_orders_silver.py:111-118``). Amounts are
embedded in the JSON as *polluted strings* (quoted when K%5==0,
space-padded when K%5==1) exercising the cleaning cast
(``/root/reference/jobs/build_orders_silver.py:81``); records with
K%11==0 are emitted WITHOUT the ``payload`` wrapper, exercising the
envelope-or-bare dispatch (``/root/reference/jobs/build_orders_silver.py:27-28``).

Scale note: the generator is a narrow projection + union over the orders
scan — no shuffle, no UDFs; at 100 TB it parallelizes per input split.
"""

from __future__ import annotations

import os
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPIC = "pg.public.orders"

# Bump when generator logic changes — invalidates the /tmp bronze cache.
_GENERATOR_VERSION = "v3"  # v3: cache laid out at cluster parallelism

# Parse schema for the envelope payload — mirrors the reference's
# hand-declared StructType (/root/reference/jobs/build_orders_silver.py:30-44);
# amount_eur deliberately STRING (Debezium decimal workaround).
ORDER_ROW_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.IntegerType()),
        T.StructField("user_id", T.IntegerType()),
        T.StructField("amount_eur", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("created_at", T.StringType()),
    ]
)

CDC_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("before", ORDER_ROW_SCHEMA),
        T.StructField("after", ORDER_ROW_SCHEMA),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

CDC_ENVELOPE_SCHEMA = T.StructType([T.StructField("payload", CDC_PAYLOAD_SCHEMA)])


def _order_base(orders: DataFrame) -> DataFrame:
    return orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderkey").cast("int").alias("order_id"),
        F.col("o_custkey").cast("int").alias("user_id"),
        F.col("o_totalprice").alias("base_amount"),
        (F.unix_timestamp("o_orderdate") * 1000).alias("base_ts_ms"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("created_at"),
    )


def _amount_str(amount: F.Column, key: F.Column) -> F.Column:
    """Stringify + deterministically pollute (quotes / spaces) an amount."""
    s = amount.cast("string")
    return (
        F.when(key % 5 == 0, F.concat(F.lit('"'), s, F.lit('"')))
        .when(key % 5 == 1, F.concat(F.lit(" "), s, F.lit(" ")))
        .otherwise(s)
    )


def source_digest(sf_dir: str) -> str:
    """Digest of the source parquet's identity (absolute path, mtime,
    size) — the cache-key component that keeps two datasets sharing a
    basename, or an in-place regeneration, from serving each other's
    derived caches. Shared by the bronze event-log cache here and the
    materialized-lake cache in queries/cdc.py."""
    import hashlib

    src = os.path.join(sf_dir, "orders.parquet")
    try:
        st = os.stat(src)
        ident = f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        ident = os.path.abspath(src)
    return hashlib.md5(ident.encode()).hexdigest()[:10]


def _bronze_cache_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(
        tempfile.gettempdir(),
        f"pcl_bronze_{_GENERATOR_VERSION}_{tag}_{source_digest(sf_dir)}",
    )


def _reap_stale_bronze_caches(current: str) -> None:
    """Remove SIBLING caches for the same tag with a different digest
    (the source changed — they can never be served again) and the
    pre-digest legacy name. Without this every in-place regeneration
    leaks a full event-log copy in /tmp.

    Only the EXACT shape ``{prefix}_{10-hex-digest}`` is reaped: a bare
    ``startswith(prefix + '_')`` would also match a longer tag that
    extends this one (tag ``sf1`` reaping ``..._sf1_big_{digest}``) —
    another dataset's perfectly valid cache, possibly mid-read by a
    concurrent driver."""
    import re
    import shutil

    parent = os.path.dirname(current)
    base = os.path.basename(current)
    prefix = base.rsplit("_", 1)[0]  # pcl_bronze_{ver}_{tag}
    stale_re = re.compile(rf"^{re.escape(prefix)}_[0-9a-f]{{10}}$")
    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        if name == base or ".build-" in name:
            continue
        if name == prefix or stale_re.match(name):
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def _ensure_bronze_cache(spark: SparkSession, sf_dir: str, cache: str) -> None:
    """Build the bronze parquet cache if absent. Build into a
    pid-unique staging dir and PUBLISH with an atomic rename: two
    concurrent drivers racing an in-place overwrite could delete each
    other's in-flight output or commit doubled part files under one
    _SUCCESS (round-5 review; same protocol as
    queries/cdc._materialized_lake). Same-process thread races are the
    caller's lock's job."""
    if os.path.exists(os.path.join(cache, "_SUCCESS")):
        return
    import shutil

    _reap_stale_bronze_caches(cache)
    staging = f"{cache}.build-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    # Lay the cache out at cluster parallelism: the generator inherits
    # orders.parquet's 4 input splits, and a 4-file bronze pins the
    # CPU-heavy downstream JSON parse to 4 tasks on a 32-core box
    # (measured: the flagship's parse stage ran 4/32 cores). A real
    # 100 TB bronze has thousands of files — the cache should look
    # like one.
    cdc_events(spark, sf_dir, materialize=False).repartition(
        spark.sparkContext.defaultParallelism
    ).write.mode("overwrite").parquet(staging)
    try:
        os.rename(staging, cache)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)  # lost the race


_BRONZE_BUILD_LOCK = threading.Lock()


def cdc_events(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """Bronze-shaped Kafka record rows derived from `orders` (see module doc).

    Columns: topic string, partition int, offset long, kafka_ts timestamp,
    k string, v string, ingested_at timestamp — matching
    ``/root/reference/jobs/ingest_orders_raw.py:24-34``.

    ``materialize=True`` writes the generated log once to a /tmp parquet
    cache and reads it back — bronze is a *table* in the real
    architecture, and keeping the generator's expression tree out of
    downstream plans keeps Catalyst analysis + codegen time flat
    (measured 5-10x plan-overhead reduction locally).
    """
    if materialize:
        cache = _bronze_cache_path(sf_dir)
        # The staging protocol below is keyed by PID — atomic across
        # processes but not across driver THREADS, which share a pid
        # and would write one staging dir together (round-16: the
        # engine now builds independent queries from thread pools).
        # One process-wide lock serializes only the one-off cache
        # build; the warm path stays lock-free-ish and instant.
        with _BRONZE_BUILD_LOCK:
            _ensure_bronze_cache(spark, sf_dir, cache)
        return spark.read.parquet(cache)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    b = _order_base(orders)
    key = F.col("k")

    # amount after e1's update (what e2 inherits / e3's before carries)
    amt_upd = F.when(key % 3 != 0, F.col("base_amount") * 1.1).otherwise(
        F.col("base_amount")
    )
    # status prior to delete
    prior_status = (
        F.when(key % 7 == 0, F.lit("shipped"))
        .when(key % 3 != 0, F.lit("paid"))
        .otherwise(F.lit("created"))
    )

    def row_struct(amount, status):
        return F.struct(
            F.col("order_id"),
            F.col("user_id"),
            _amount_str(amount, key).alias("amount_eur"),
            status.alias("status"),
            F.col("created_at"),
        )

    null_row = F.lit(None).cast(ORDER_ROW_SCHEMA)
    base_ts = F.col("base_ts_ms")

    def event(seq, op, before, after, ts_ms, valid):
        return F.struct(
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
            before.alias("before"),
            after.alias("after"),
            ts_ms.cast("long").alias("ts_ms"),
            valid.alias("valid"),
        )

    e2_ts = F.when(key % 2 == 0, base_ts + 60_000).otherwise(base_ts + 120_000)
    per_order = F.array(
        event(
            0, "c", null_row,
            row_struct(F.col("base_amount"), F.lit("created")),
            base_ts, F.lit(True),
        ),
        event(
            1, "u",
            row_struct(F.col("base_amount"), F.lit("created")),
            row_struct(F.col("base_amount") * 1.1, F.lit("paid")),
            base_ts + 60_000, key % 3 != 0,
        ),
        event(
            2, "u",
            row_struct(amt_upd, F.when(key % 3 != 0, F.lit("paid")).otherwise(F.lit("created"))),
            row_struct(amt_upd, F.lit("shipped")),
            e2_ts, key % 7 == 0,
        ),
        event(
            3, "d",
            row_struct(amt_upd, prior_status),
            null_row,
            base_ts + 180_000, key % 10 == 0,
        ),
    )

    # Single pass over orders: one scan, one codegen stage (vs a 4-way
    # union of branch scans — measured ~3x faster end to end).
    exploded = b.select(
        "k", "order_id",
        F.explode(F.filter(per_order, lambda e: e["valid"])).alias("e"),
    )
    payload = F.struct(
        F.col("e.before").alias("before"),
        F.col("e.after").alias("after"),
        F.col("e.op").alias("op"),
        F.col("e.ts_ms").alias("ts_ms"),
    )
    v = F.when(key % 11 == 0, F.to_json(payload)).otherwise(
        F.to_json(F.struct(payload.alias("payload")))
    )
    return exploded.select(
        F.lit(TOPIC).alias("topic"),
        F.lit(0).alias("partition"),
        (key * 4 + F.col("e.seq")).cast("long").alias("offset"),
        (F.col("e.ts_ms") / 1000).cast("timestamp").alias("kafka_ts"),
        F.to_json(F.struct(F.col("order_id"))).alias("k"),
        v.alias("v"),
        F.current_timestamp().alias("ingested_at"),
    )


# DuckDB oracle: the same event log, relational (no JSON round-trip).
# `{orders}` is the registered view name. Columns: order_id, user_id,
# amount_eur (DOUBLE), status, op, off, change_ts.
ORACLE_EVENTS_CTE = """
cdc_ev AS (
    SELECT CAST(o_orderkey AS INTEGER) AS order_id,
           CAST(o_custkey AS INTEGER) AS user_id,
           o_totalprice AS amount_eur,
           'created' AS status, 'c' AS op,
           o_orderkey * 4 AS off,
           date_trunc('second', o_orderdate) AS change_ts
    FROM orders
    UNION ALL
    SELECT CAST(o_orderkey AS INTEGER), CAST(o_custkey AS INTEGER),
           o_totalprice * CAST(1.1 AS DOUBLE),
           'paid', 'u', o_orderkey * 4 + 1,
           date_trunc('second', o_orderdate) + INTERVAL 60 SECOND
    FROM orders WHERE o_orderkey % 3 <> 0
    UNION ALL
    SELECT CAST(o_orderkey AS INTEGER), CAST(o_custkey AS INTEGER),
           CASE WHEN o_orderkey % 3 <> 0 THEN o_totalprice * CAST(1.1 AS DOUBLE)
                ELSE o_totalprice END,
           'shipped', 'u', o_orderkey * 4 + 2,
           date_trunc('second', o_orderdate)
             + CASE WHEN o_orderkey % 2 = 0 THEN INTERVAL 60 SECOND
                    ELSE INTERVAL 120 SECOND END
    FROM orders WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT CAST(o_orderkey AS INTEGER), CAST(o_custkey AS INTEGER),
           NULL, NULL, 'd', o_orderkey * 4 + 3,
           date_trunc('second', o_orderdate) + INTERVAL 180 SECOND
    FROM orders WHERE o_orderkey % 10 = 0
)
"""
