"""Analytic operator surface over the TPC-H-ish fixture tables.

The reference documents its query surface as Trino SQL over the lake
(``/root/reference/README.md:68,93,106-122,200-207``) — counts, ordered
selects, top-1 peeks — and leaves the classic warehouse operators (§2.3
hash/broadcast/semi/anti joins, §2.4 group aggregation, grouping sets,
§2.5 window frames, §2.7 set ops) to the engines. This module fills
that surface with idiomatic DataFrame plans, one named query per
operator family, each with an exact DuckDB oracle.

Scale notes per query are inline; global principles:
- dimension joins (region/nation/customer-sized) are broadcast — no
  shuffle of the fact table;
- aggregations rely on Catalyst partial+final (map-side combine);
- window top-k partitions by the group key — the shuffle is on the
  grouping column, never a global sort;
- no UDFs anywhere — every expression is codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.session import pin_utc


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from privacy_cdc_lakehouse_spark.sources.fixtures import load_table

    return load_table(spark, sf_dir, name)


# --- TPC-H Q1-style pricing summary (grouped agg, 8 aggregates) -------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side-combinable grouped agg over the fact table; the scan
    reads only the 7 referenced columns (column pruning)."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       avg(l_discount) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Star-schema join + agg + top-k (TPC-H Q3 shape) ------------------------

def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem; the two fact-side joins shuffle on
    the join key, customer is broadcast (dim ≪ fact). Top-10 via sort +
    limit — Spark executes as TakeOrdered (no global sort)."""
    pin_utc(spark)
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Multi-dim snowflake join (TPC-H Q5 shape) ------------------------------

def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way join; all dimension hops (supplier/customer/nation/region)
    broadcast, so the only shuffles are the fact-side equi-joins and the
    final 25-group agg."""
    pin_utc(spark)
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q5_SQL = """
SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- Semi / anti joins ------------------------------------------------------

def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS). Broadcast-ability depends on side
    sizes; here orders' distinct keys shuffle — at 100 TB pre-project
    the key column only (done below) so the shuffle is one slim column."""
    pin_utc(spark)
    cust = _t(spark, sf_dir, "customer")
    big_orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select("o_custkey")
    )
    return (
        cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
ORDER BY c_custkey
"""


def q_parts_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) + grouped count by brand."""
    pin_utc(spark)
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_brand")
    )


_SEMI_SQL = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
ORDER BY p_brand
"""


# --- Window functions: ranking, frames, lag ---------------------------------

def q_top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: window row_number over (segment, price desc).
    Shuffle on the segment key only; no global sort."""
    pin_utc(spark)
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == cust.c_custkey,
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.withColumn("rank_in_segment", F.row_number().over(w))
        .filter(F.col("rank_in_segment") <= 3)
        .select("c_mktsegment", "rank_in_segment", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rank_in_segment")
    )


_TOP3_SQL = """
SELECT c_mktsegment, rank_in_segment, o_orderkey, o_totalprice
FROM (
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY o_totalprice DESC, o_orderkey ASC)
             AS rank_in_segment
    FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rank_in_segment <= 3
ORDER BY c_mktsegment, rank_in_segment
"""


def q_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame: running sum + lag over each customer's orders
    (rowsBetween unbounded-preceding → current). Limited to a key slice
    to keep the checked output small while exercising the frame."""
    pin_utc(spark)
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum("o_totalprice")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running_spend"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.row_number().over(w).alias("order_seq"),
    ).orderBy("o_custkey", "order_seq")


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       sum(o_totalprice) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS running_spend,
       lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev_price,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
WHERE o_custkey % 100 = 0
ORDER BY o_custkey, order_seq
"""


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of BOTH window-function workloads (round-4 registry
    consolidation — the driver correctness window is capped at 50
    entries): ``top3`` rows are the per-segment top-k (row_number over
    (segment, price desc)); ``running`` rows are the per-customer
    running-sum + lag frame. Every column of the two originals is
    preserved; rows are distinguished by ``kind``."""
    top3 = q_top3_orders_per_segment(spark, sf_dir).select(
        F.lit("top3").alias("kind"),
        F.col("c_mktsegment").alias("part_key"),
        F.col("rank_in_segment").cast("long").alias("seq"),
        "o_orderkey",
        "o_totalprice",
        F.lit(None).cast("double").alias("running_spend"),
        F.lit(None).cast("double").alias("prev_price"),
    )
    running = q_customer_running_spend(spark, sf_dir).select(
        F.lit("running").alias("kind"),
        F.col("o_custkey").cast("string").alias("part_key"),
        F.col("order_seq").cast("long").alias("seq"),
        "o_orderkey",
        "o_totalprice",
        "running_spend",
        "prev_price",
    )
    return top3.unionByName(running).orderBy("kind", "part_key", "seq")


_WINDOW_ANALYTICS_SQL = f"""
WITH top3 AS ({_TOP3_SQL}), running AS ({_RUNNING_SQL})
SELECT 'top3' AS kind, c_mktsegment AS part_key,
       CAST(rank_in_segment AS BIGINT) AS seq, o_orderkey, o_totalprice,
       CAST(NULL AS DOUBLE) AS running_spend, CAST(NULL AS DOUBLE) AS prev_price
FROM top3
UNION ALL
SELECT 'running', CAST(o_custkey AS VARCHAR), CAST(order_seq AS BIGINT),
       o_orderkey, o_totalprice, running_spend, prev_price
FROM running
ORDER BY kind, part_key, seq
"""


# --- Grouping sets / rollup / cube ------------------------------------------

def q_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (partial + grand totals); Catalyst expands to grouping-set
    aggregation in a single shuffle."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus")
        )
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def q_cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims."""
    pin_utc(spark)
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.sum("o_totalprice").alias("total"), F.count("*").alias("n"))
        .orderBy(
            F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority")
        )
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       sum(o_totalprice) AS total, CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# --- Set operations ---------------------------------------------------------

def q_setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT cohorts: big spenders vs urgent-order
    customers, tagged and counted. Distinct set ops shuffle on the full
    row — keys are pre-projected to one slim column."""
    pin_utc(spark)
    orders = _t(spark, sf_dir, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    cohorts = (
        big.intersect(urgent).withColumn("cohort", F.lit("both"))
        .unionByName(big.exceptAll(urgent).withColumn("cohort", F.lit("big_only")))
        .unionByName(
            urgent.exceptAll(big).withColumn("cohort", F.lit("urgent_only"))
        )
        .groupBy("cohort")
        .agg(F.count("*").alias("n_customers"))
    )
    # round 6: distinct_counts folded in (freed the slot for
    # curation_pack_sequences) — the ORIGINAL exact+HLL aggregate plan
    # runs unchanged via q_distinct_counts, then unpivots into the
    # tagged shape (booleans as 0/1).
    d = q_distinct_counts(spark, sf_dir)
    distinct_rows = d.selectExpr(
        "stack(5, 'distinct:n_parts', n_parts, 'distinct:n_supps', n_supps, "
        "'distinct:n_orders', n_orders, "
        "'distinct:approx_parts_ok', CAST(approx_parts_ok AS BIGINT), "
        "'distinct:approx_orders_ok', CAST(approx_orders_ok AS BIGINT)) "
        "as (cohort, n_customers)"
    )
    # round 10: HLL sketch-store arm (operators/sketch.py) — the
    # mergeable distinct-count maintenance story: per-priority sketch
    # stores built on the two orderkey halves (two ingest batches),
    # union-merged, estimates checked against the exact distinct
    # custkey counts. The oracle pins the 5%-tolerance bit at literally
    # 1 — an estimator drifting past it fails the driver row; the
    # merge == full-build register equality is pytest-pinned.
    from privacy_cdc_lakehouse_spark.operators import sketch as sk

    mid2 = orders.agg(
        ((F.min("o_orderkey") + F.max("o_orderkey")) / 2).alias("m")
    )
    o2 = orders.crossJoin(F.broadcast(mid2))
    store = sk.hll_store_merge(
        sk.hll_store_build(
            o2.filter(F.col("o_orderkey") <= F.col("m")),
            ["o_orderpriority"],
            "o_custkey",
        ),
        sk.hll_store_build(
            o2.filter(F.col("o_orderkey") > F.col("m")),
            ["o_orderpriority"],
            "o_custkey",
        ),
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n")
    )
    hll = exact.join(sk.hll_store_estimate(store), "o_orderpriority")
    hll_rows = hll.select(
        F.concat(F.lit("hll_exact:"), F.col("o_orderpriority")).alias("cohort"),
        F.col("n").cast("long").alias("n_customers"),
    ).unionByName(
        hll.select(
            F.concat(F.lit("hll_ok:"), F.col("o_orderpriority")).alias(
                "cohort"
            ),
            (
                F.abs(
                    F.col("n_distinct_est").cast("double") / F.col("n") - 1.0
                )
                <= 0.05
            )
            .cast("long")
            .alias("n_customers"),
        )
    )
    # round 12: Bloom-filter arm (operators/sketch.py::bloom_*) — the
    # membership screen beside the hll distinct store: a filter over
    # the big-spender cohort built as two half-filters (custkey
    # parity) and union-merged, probed with the urgent cohort. No
    # false negative is possible, so maybe >= |big ∩ urgent| and the
    # FALSE-POSITIVE count (maybe − true) is an exact deterministic
    # number — all four values hash-checked (bit positions are
    # portable md5 arithmetic replayed in the oracle).
    bl = sk.bloom_merge(
        sk.bloom_build(
            big.filter(F.col("o_custkey") % 2 == 0), "o_custkey", 4096, 4
        ),
        sk.bloom_build(
            big.filter(F.col("o_custkey") % 2 == 1), "o_custkey", 4096, 4
        ),
    )
    probed = sk.bloom_might_contain(bl, urgent, "o_custkey", 4096, 4)
    bloom_rows = (
        probed.agg(F.sum(F.col("might_contain").cast("long")).alias("maybe"))
        .crossJoin(
            F.broadcast(big.intersect(urgent).agg(F.count(F.lit(1)).alias("tr")))
        )
        .crossJoin(F.broadcast(bl.agg(F.count(F.lit(1)).alias("bits"))))
        .selectExpr(
            "stack(4, "
            "'bloom:maybe', CAST(maybe AS BIGINT), "
            "'bloom:true', CAST(tr AS BIGINT), "
            "'bloom:fp', CAST(maybe - tr AS BIGINT), "
            "'bloom:bits', CAST(bits AS BIGINT)) AS (cohort, n_customers)"
        )
    )
    # round 12 (cont.): KMV/theta-sketch arm (operators/sketch.py::
    # kmv_*) — the distinct sketch that can INTERSECT (the one set
    # operation the HLL store can't answer without inclusion-exclusion
    # error blow-up): big-spender sketch built as two parity
    # half-sketches and union-merged (mergeability in the driver row),
    # urgent built whole; union + intersection estimates reported
    # beside the exact intersection. Every value is deterministic md5
    # arithmetic, replayed exactly in the oracle (4dp estimates scaled
    # 1e4 into the long column).
    kb = sk.kmv_merge(
        sk.kmv_build(big.filter(F.col("o_custkey") % 2 == 0), "o_custkey", 64),
        sk.kmv_build(big.filter(F.col("o_custkey") % 2 == 1), "o_custkey", 64),
        k=64,
    )
    ku = sk.kmv_build(urgent, "o_custkey", 64)
    kun = sk.kmv_merge(kb, ku, k=64)
    kmv_rows = (
        sk.kmv_distinct_estimate(kb, 64)
        .select(F.col("n_est").alias("big_est"))
        .crossJoin(
            F.broadcast(
                sk.kmv_distinct_estimate(ku, 64).select(
                    F.col("n_est").alias("urg_est")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                sk.kmv_distinct_estimate(kun, 64).select(
                    F.col("n_est").alias("uni_est")
                )
            )
        )
        .crossJoin(F.broadcast(sk.kmv_intersect_estimate(kb, ku, 64)))
        .crossJoin(
            F.broadcast(
                big.intersect(urgent).agg(F.count(F.lit(1)).alias("int_exact"))
            )
        )
        .selectExpr(
            "stack(5, "
            "'kmv:big_est', CAST(round(big_est * 10000, 0) AS BIGINT), "
            "'kmv:urgent_est', CAST(round(urg_est * 10000, 0) AS BIGINT), "
            "'kmv:union_est', CAST(round(uni_est * 10000, 0) AS BIGINT), "
            "'kmv:inter_est', CAST(round(n_est * 10000, 0) AS BIGINT), "
            "'kmv:inter_exact', CAST(int_exact AS BIGINT)) "
            "AS (cohort, n_customers)"
        )
    )
    return (
        cohorts.unionByName(distinct_rows)
        .unionByName(hll_rows)
        .unionByName(bloom_rows)
        .unionByName(kmv_rows)
        .orderBy("cohort")
    )


def _hex13_mod(m: int) -> str:
    """SQL for int(md5-hex[:13], 16) % m over a column ``h`` — the
    portable md5 nibble arithmetic (same contract as llmops'
    ``_duck_hexn``, local to avoid a module cycle)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {1 + j}, 1)) - 1)"
        f" * {16 ** (12 - j)}"
        for j in range(13)
    )
    return f"(({terms}) % {m})"


_SETOPS_SQL = f"""
WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000),
     urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
     tagged AS (
       SELECT o_custkey, 'both' AS cohort FROM big INTERSECT SELECT o_custkey, 'both' FROM urgent
       UNION ALL
       SELECT o_custkey, 'big_only' FROM (SELECT * FROM big EXCEPT SELECT * FROM urgent)
       UNION ALL
       SELECT o_custkey, 'urgent_only' FROM (SELECT * FROM urgent EXCEPT SELECT * FROM big)
     )
SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
FROM tagged GROUP BY cohort
UNION ALL
SELECT u.cohort, u.n_customers
FROM (
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
) d CROSS JOIN LATERAL (VALUES
    ('distinct:n_parts', d.n_parts),
    ('distinct:n_supps', d.n_supps),
    ('distinct:n_orders', d.n_orders),
    ('distinct:approx_parts_ok', CAST(1 AS BIGINT)),
    ('distinct:approx_orders_ok', CAST(1 AS BIGINT))
) AS u(cohort, n_customers)
UNION ALL
SELECT 'hll_exact:' || o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT)
FROM orders GROUP BY o_orderpriority
UNION ALL
-- the tolerance bit is pinned at 1: Spark's merged-HLL estimate must
-- land within 5% of exact or the row hash-fails
SELECT 'hll_ok:' || o_orderpriority, CAST(1 AS BIGINT)
FROM (SELECT DISTINCT o_orderpriority FROM orders)
UNION ALL
-- Bloom-filter replay (round 12): same md5 bit positions (13-nibble
-- arithmetic, 4 hashes mod 4096), filter = distinct set bits over
-- big, probe = urgent needs ALL 4 positions set; maybe/true/fp/bits
SELECT b.cohort, b.n_customers FROM (
    WITH bl_bits AS (
        SELECT DISTINCT CAST({_hex13_mod(4096)} AS INT) AS pos
        FROM (
            SELECT md5('bloom' || CAST(i AS VARCHAR) || '|'
                       || CAST(o_custkey AS VARCHAR)) AS h
            FROM big CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
        )
    ),
    bl_probe AS (
        SELECT o_custkey,
               count(*) = sum(CASE WHEN b2.pos IS NOT NULL
                                   THEN 1 ELSE 0 END) AS mc
        FROM (
            SELECT o_custkey, CAST({_hex13_mod(4096)} AS INT) AS pos
            FROM (
                SELECT o_custkey,
                       md5('bloom' || CAST(i AS VARCHAR) || '|'
                           || CAST(o_custkey AS VARCHAR)) AS h
                FROM urgent CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
            )
        ) p LEFT JOIN bl_bits b2 USING (pos)
        GROUP BY o_custkey
    ),
    bl_sum AS (
        SELECT (SELECT sum(CASE WHEN mc THEN 1 ELSE 0 END)
                FROM bl_probe) AS maybe,
               (SELECT count(*) FROM (SELECT o_custkey FROM big
                    INTERSECT SELECT o_custkey FROM urgent)) AS tr,
               (SELECT count(*) FROM bl_bits) AS bits
    )
    SELECT 'bloom:maybe' AS cohort, CAST(maybe AS BIGINT) AS n_customers
    FROM bl_sum
    UNION ALL SELECT 'bloom:true', CAST(tr AS BIGINT) FROM bl_sum
    UNION ALL SELECT 'bloom:fp', CAST(maybe - tr AS BIGINT) FROM bl_sum
    UNION ALL SELECT 'bloom:bits', CAST(bits AS BIGINT) FROM bl_sum
) b
UNION ALL
-- KMV/theta replay (round 12): hv = full 13-nibble md5 value (mod
-- 16^13 is the identity — reuses the shared nibble arithmetic);
-- sketches = 64 smallest distinct hv; saturated estimator
-- (k-1)*SPACE/kth, exact count when unsaturated; theta intersection
SELECT m.cohort, m.n_customers FROM (
    WITH kmv_big AS (
        -- DISTINCT mirrors kmv_urg and the Spark kmv_build().distinct()
        -- contract (round-12 advice: parity held only because big is
        -- pre-distincted on o_custkey — don't rely on that upstream)
        SELECT DISTINCT CAST({_hex13_mod(16 ** 13)} AS BIGINT) AS hv
        FROM (SELECT md5('kmv|' || CAST(o_custkey AS VARCHAR)) AS h FROM big)
        ORDER BY hv LIMIT 64
    ),
    kmv_urg AS (
        SELECT DISTINCT CAST({_hex13_mod(16 ** 13)} AS BIGINT) AS hv
        FROM (SELECT md5('kmv|' || CAST(o_custkey AS VARCHAR)) AS h FROM urgent)
        ORDER BY hv LIMIT 64
    ),
    kmv_uni AS (
        SELECT hv FROM (SELECT hv FROM kmv_big UNION SELECT hv FROM kmv_urg)
        ORDER BY hv LIMIT 64
    ),
    kmv_theta AS (
        SELECT CASE WHEN (SELECT count(*) FROM kmv_big) >= 64
                    THEN (SELECT max(hv) FROM kmv_big)
                    ELSE 4503599627370496 END AS ta,
               CASE WHEN (SELECT count(*) FROM kmv_urg) >= 64
                    THEN (SELECT max(hv) FROM kmv_urg)
                    ELSE 4503599627370496 END AS tb
    ),
    kmv_est AS (
        SELECT
          (SELECT round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                 ELSE CAST(63 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) / max(hv) END, 4)
           FROM kmv_big) AS big_est,
          (SELECT round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                 ELSE CAST(63 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) / max(hv) END, 4)
           FROM kmv_urg) AS urg_est,
          (SELECT round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                 ELSE CAST(63 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) / max(hv) END, 4)
           FROM kmv_uni) AS uni_est,
          (SELECT count(*) FROM kmv_big JOIN kmv_urg USING (hv)
           CROSS JOIN kmv_theta WHERE hv < least(ta, tb)) AS n_common,
          (SELECT least(ta, tb) FROM kmv_theta) AS theta,
          (SELECT count(*) FROM (SELECT o_custkey FROM big
               INTERSECT SELECT o_custkey FROM urgent)) AS int_exact
    )
    SELECT 'kmv:big_est' AS cohort,
           CAST(round(big_est * 10000, 0) AS BIGINT) AS n_customers
    FROM kmv_est
    UNION ALL SELECT 'kmv:urgent_est', CAST(round(urg_est * 10000, 0) AS BIGINT)
    FROM kmv_est
    UNION ALL SELECT 'kmv:union_est', CAST(round(uni_est * 10000, 0) AS BIGINT)
    FROM kmv_est
    UNION ALL SELECT 'kmv:inter_est',
        CAST(round(round(CAST(n_common AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
                         / CAST(theta AS DOUBLE), 4) * 10000, 0) AS BIGINT)
    FROM kmv_est
    UNION ALL SELECT 'kmv:inter_exact', CAST(int_exact AS BIGINT) FROM kmv_est
) m
ORDER BY cohort
"""


# --- Distinct counting ------------------------------------------------------

def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (shuffles distinct keys; Catalyst expands to
    two-phase) PLUS the HyperLogLog++ approximate path — the 100 TB
    variant with no exact-distinct shuffle — checked against the exact
    counts via its error bound. HLL estimates are engine-specific, so
    the oracle-portable claim is the TOLERANCE boolean (|approx-exact|
    / exact ≤ 5% at rsd 0.01), not the estimate itself; this replaces
    the old rows-only ``approx_distinct_counts`` with a fully
    hash-checked row (round-3 consolidation)."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    ok = lambda a, e: (  # noqa: E731
        (F.abs(F.col(a) - F.col(e)) / F.col(e)) <= 0.05
    )
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.approx_count_distinct("l_partkey", 0.01).alias("_approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("_approx_orders"),
    ).select(
        "n_parts",
        "n_supps",
        "n_orders",
        ok("_approx_parts", "n_parts").alias("approx_parts_ok"),
        ok("_approx_orders", "n_orders").alias("approx_orders_ok"),
    )


_DISTINCT_SQL = """
SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       true AS approx_parts_ok,
       true AS approx_orders_ok
FROM lineitem
"""


# --- Events: time-window aggregation + JSON extraction ----------------------

def q_events_5min_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute event-time windows (batch form of the streaming
    windowed agg; same F.window op used in streaming/pipeline.py)."""
    pin_utc(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


_EVENTS_WIN_SQL = """
SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
       event_type, CAST(count(*) AS BIGINT) AS n, sum(value) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the props column (F1 parity:
    get_json_object) + grouped stats on the extracted value."""
    pin_utc(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("kval", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg("kval").alias("avg_k"),
            F.max("kval").alias("max_k"),
        )
        .orderBy("event_type")
    )


_EVENTS_JSON_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       avg(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_events_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring (``operators/drift.py``): the event
    log split at its mid-timestamp into reference/current windows, then
    the full panel — binned PSI and KS over ``value`` (one shared
    100-bin pass, PSI re-bucketed to 10), per-side moments, categorical
    PSI over ``event_type``. The split compares exact epoch MICROSECOND
    integers (``unix_micros`` / DuckDB ``epoch_us`` — the fixture has
    sub-second event times, so second-truncating comparisons would
    classify boundary rows differently across engines)."""
    pin_utc(spark)
    ev = _t(spark, sf_dir, "events")
    ts_d = F.unix_micros(F.col("ts").cast("timestamp"))
    mid = ev.agg(((F.min(ts_d) + F.max(ts_d)) / 2).alias("_mid"))
    tagged = ev.crossJoin(F.broadcast(mid))
    from privacy_cdc_lakehouse_spark.operators.drift import drift_report

    return drift_report(
        tagged.filter(ts_d <= F.col("_mid")),
        tagged.filter(ts_d > F.col("_mid")),
        "value",
        n_bins=10,
        ks_bins=100,
        categorical_col="event_type",
    )


def q_record_linkage_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage at gate sizing with a DELIBERATELY hot blocking
    key (round-11 verdict task: the registry link arm's (nation,
    segment) blocks are uniform, so nothing priced the skew path).
    Master = customer; dirty = every 37th customer, name-perturbed —
    37 is coprime with 10 so the dirty sample's ``ck % 10`` residues
    are uniform and ~30% of DIRTY rows land in the hot block too (a
    ``% 100`` sample would nest entirely inside ``% 10 < 3``, leaving
    the cold path zero candidate pairs — the round-11 advice finding).
    Blocking deliberately models the zipfian reality: the block key is
    the nation for 70% of records but a single shared "HOT" value for
    30% of BOTH sides — one block holding 30% of the corpus, the
    classic straggler. ``hot_block_threshold`` pre-splits it onto the
    salted path (``operators/linkage.py::blocked_candidates``); cold
    blocks join plain. Scoring/resolution run the full recipe; the
    return is the match summary (bounded). NOT a registry row (the
    registry arm already hash-checks the algebra at uniform blocks;
    this row exists to price the skew machinery) — consumed by
    tools/bench_scale.py with plan assertions."""
    from privacy_cdc_lakehouse_spark.operators import linkage as lk

    pin_utc(spark)
    cust = _t(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    block = F.when(
        ck % 10 < 3, F.lit("HOT")
    ).otherwise(F.col("c_nationkey").cast("string"))
    master = cust.select(
        ck.alias("lid"),
        F.col("c_name").alias("name"),
        block.alias("blk"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    dirty = cust.filter(ck % 37 == 0).select(
        (ck + 10_000_000).alias("rid"),
        F.when(ck % 3 == 0, F.regexp_replace("c_name", r".$", "X"))
        .otherwise(F.col("c_name"))
        .alias("name"),
        block.alias("blk"),
        (F.col("c_acctbal").cast("double") + 1.0).alias("bal"),
    )
    cands = lk.blocked_candidates(
        master, dirty, [("blk", "blk")], "lid", "rid",
        hot_block_threshold=10_000, salt=16,
    )
    feats = [
        lk.Feature("name", "name", "name", "edit", 0.7),
        lk.Feature("bal", "bal", "bal", "numeric", 0.3, scale=1000.0),
    ]
    scored = lk.score_candidates(
        cands, master, dirty, feats, "lid", "rid", threshold=0.9
    )
    rk = F.col("id_r") - 10_000_000
    return (
        lk.resolve_best_matches(scored)
        .agg(
            F.count(F.lit(1)).alias("resolved"),
            F.sum(F.col("is_match").cast("long")).alias("matches"),
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.sum((rk == F.col("id_l")).cast("long")).alias("true_key_wins"),
            # per-path resolution counts: the dirty row's block residue
            # (hot ⇔ ck%10<3) tells which join path carried its pairs —
            # the gate asserts BOTH are nonzero, so a silently-empty
            # hot or cold candidate set can't pass on plan shape alone
            F.sum(((rk % 10) < 3).cast("long")).alias("hot_resolved"),
            F.sum(((rk % 10) >= 3).cast("long")).alias("cold_resolved"),
        )
    )


def q_drift_monitor_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING face of ``q_events_drift`` at gate sizing
    (round-11 verdict task): the event log's first half is the fixed
    reference window; the second half is written as an 8-file parquet
    source and driven through ``streaming/monitor.py::
    run_drift_monitor`` in 4 micro-batches (maxFilesPerTrigger=2),
    each scored with the full PSI/KS/moments panel and landed
    idempotently in the metrics table. Returns the metrics table read
    back — the captured plan is the monitoring-table scan (the
    foreachBatch jobs already ran), same contract shape as
    ``cdc_stream_silver``; the gate prices end-to-end monitor
    wall-clock next to it. NOT a registry row (foreachBatch output is
    not DuckDB-expressible; batch parity is pytest-pinned)."""
    import os
    import shutil
    import tempfile

    from privacy_cdc_lakehouse_spark.streaming.monitor import (
        read_drift_metrics,
        run_drift_monitor,
    )

    pin_utc(spark)
    ev = _t(spark, sf_dir, "events")
    ts_d = F.unix_micros(F.col("ts").cast("timestamp"))
    mid = ev.agg(((F.min(ts_d) + F.max(ts_d)) / 2).alias("_mid"))
    tagged = ev.crossJoin(F.broadcast(mid))
    reference = tagged.filter(ts_d <= F.col("_mid")).select(
        "event_type", "value"
    )
    current = tagged.filter(ts_d > F.col("_mid")).select(
        "event_type", "value"
    )
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"pcl_driftmon_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    src = f"{scratch}/src"
    current.repartition(8).write.parquet(src)
    run_drift_monitor(
        spark,
        src,
        current.schema,
        reference,
        "value",
        f"{scratch}/metrics",
        f"{scratch}/ckpt",
        n_bins=10,
        ks_bins=100,
        categorical_col="event_type",
        max_files_per_trigger=2,
    )
    return read_drift_metrics(spark, f"{scratch}/metrics").orderBy(
        "batch_id", "metric"
    )


def _ordered_stream_source(df: DataFrame, scratch: str, name: str, ts_col: str) -> str:
    """Write ``df`` as 4 range-partitioned parquet files with strictly
    increasing mtimes — the scd2_stream_production delivery shape: the
    file source (maxFilesPerTrigger=1) then replays them oldest-first,
    so event time advances across micro-batches and watermarks move."""
    import glob
    import os
    import shutil
    import time

    raw = os.path.join(scratch, f"{name}_raw")
    df.repartitionByRange(4, ts_col).write.parquet(raw)
    src = os.path.join(scratch, name)
    os.makedirs(src)
    t0 = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(raw, "part-*.parquet")))):
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    return src


def _stream_metrics(query) -> tuple[int, int]:
    """(peak stateOperators.numRowsTotal, total numInputRows) across a
    finished streaming query's progress events — the state-store
    footprint and input volume the gate value-asserts on. Input rows
    ride the query's OWN metrics (round-13 verdict task #7: the gate
    rows previously ran eager ``.count()`` pre-actions — extra
    full-scan jobs inside a priced row). Progress entries are plain
    dicts in some PySpark versions and StreamingQueryProgress objects
    (with a .json payload) in others — normalize both.

    ``recentProgress`` retains only the last
    ``spark.sql.streaming.numRecentProgressUpdates`` entries (default
    100), so a longer run would silently under-report BOTH metrics —
    fail loudly instead (round-13 advice): the gate rows run 4-5
    micro-batches by construction, far under the cap. The raise is
    DELIBERATELY conservative (round-14 advice): a run that emitted
    exactly cap batches trips it even though nothing was dropped —
    len == cap is a possible-truncation signal, not proof. A run that
    legitimately needs >= cap batches should raise
    numRecentProgressUpdates or switch to a StreamingQueryListener
    (retention-independent totals) rather than weaken this guard."""
    import json

    progress = list(query.recentProgress or [])
    active = SparkSession.getActiveSession()
    cap = int(
        active.conf.get("spark.sql.streaming.numRecentProgressUpdates", "100")
        if active is not None
        else "100"
    )
    if len(progress) >= cap:
        raise RuntimeError(
            f"{len(progress)} progress events >= retention cap {cap}: "
            "peak state / input rows would be under-reported — raise "
            "numRecentProgressUpdates or attach a listener"
        )
    state_vals, input_rows = [0], 0
    for p in progress:
        if not isinstance(p, dict):
            j = getattr(p, "json", None)
            p = json.loads(j if isinstance(j, str) else p.json())
        input_rows += int(p.get("numInputRows") or 0)
        for so in p.get("stateOperators") or []:
            state_vals.append(int(so.get("numRowsTotal", 0)))
    return max(state_vals), input_rows


def q_stream_stream_join_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked STREAM-STREAM JOIN (``streaming/pipeline.py::
    stream_stream_join``) at gate sizing — round-12 verdict task #7:
    the operator had stream==batch pytests but no at-scale price or
    state-store evidence. Left = the full event log as views
    (k=user_id); right = every 3rd event shifted +7 minutes as
    follow-ups — inside the 15-minute join window by construction, so
    the join moves real data. Both sides stream as 4 time-ordered
    files (maxFilesPerTrigger=1 ⇒ 4 micro-batches), so watermarks
    advance between batches and the range condition EVICTS buffered
    state — the unbounded-state failure mode this operator exists to
    prevent. Returns a 1-row summary of the sink read-back (the
    cdc_stream_silver plan-contract shape) carrying
    ``state_rows_max`` (peak stateOperators.numRowsTotal) and
    ``input_rows``; the gate value-asserts joined>0 AND
    state_rows_max in (0, input_rows) — retained-everything (no
    eviction) or stateless (not actually stream-stream) both fail.
    NOT a registry row (foreachBatch/sink output is not
    DuckDB-expressible; inner==batch parity is pytest-pinned)."""
    import os
    import shutil
    import tempfile

    from privacy_cdc_lakehouse_spark.streaming.pipeline import stream_stream_join

    pin_utc(spark)
    ev = _t(spark, sf_dir, "events")
    left = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").cast("timestamp").alias("lts"),
        F.col("event_id").alias("l_eid"),
    )
    right = ev.filter(F.col("event_id") % 3 == 0).select(
        F.col("user_id").alias("k"),
        (F.col("ts").cast("timestamp") + F.expr("INTERVAL 7 MINUTES")).alias(
            "rts"
        ),
        (F.col("event_id") + 1_000_000_000).alias("r_eid"),
    )
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"pcl_ssjoin_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    lsrc = _ordered_stream_source(left, scratch, "left", "lts")
    rsrc = _ordered_stream_source(right, scratch, "right", "rts")
    ls = (
        spark.readStream.schema(left.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(lsrc)
    )
    rs = (
        spark.readStream.schema(right.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rsrc)
    )
    joined = stream_stream_join(ls, rs, "k", "lts", "rts", within="15 minutes")
    out, ck = os.path.join(scratch, "out"), os.path.join(scratch, "ck")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_max, input_rows = _stream_metrics(q)
    return (
        spark.read.parquet(out)
        .agg(
            F.count(F.lit(1)).alias("joined_rows"),
            F.countDistinct("k").alias("keys"),
        )
        .select(
            "joined_rows",
            "keys",
            F.lit(state_max).cast("long").alias("state_rows_max"),
            F.lit(input_rows).cast("long").alias("input_rows"),
        )
    )


def q_streaming_session_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` aggregation (``streaming/pipeline.py::
    streaming_session_counts``) at gate sizing — the second round-12
    verdict task-#7 surface: per-user sessions with a 30-minute gap
    over the full event log, streamed as 4 time-ordered files so the
    watermark CLOSES sessions between micro-batches (append mode
    emits only closed sessions — exactly the production shape; the
    state per key is one open session, which is what the
    state_rows_max summary evidences vs the event count). Returns a
    1-row summary of the sink read-back; the gate value-asserts
    sessions>0, flushed events>0 and 0 < state_rows_max <
    input_rows. NOT a registry row (sink output is not
    DuckDB-expressible; stream==batch parity is pytest-pinned)."""
    import os
    import shutil
    import tempfile

    from privacy_cdc_lakehouse_spark.streaming.pipeline import (
        streaming_session_counts,
    )

    pin_utc(spark)
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"pcl_sessprod_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    src = _ordered_stream_source(ev, scratch, "events", "ts")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sess = streaming_session_counts(
        stream, event_time="ts", gap="30 minutes", delay="10 minutes",
        group_col="user_id",
    )
    out, ck = os.path.join(scratch, "out"), os.path.join(scratch, "ck")
    q = (
        sess.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_max, input_rows = _stream_metrics(q)
    return (
        spark.read.parquet(out)
        .agg(
            F.count(F.lit(1)).alias("sessions"),
            F.countDistinct("user_id").alias("users"),
            F.sum("n_events").alias("events_flushed"),
            F.max("n_events").alias("max_session_len"),
        )
        .select(
            "sessions",
            "users",
            "events_flushed",
            "max_session_len",
            F.lit(state_max).cast("long").alias("state_rows_max"),
            F.lit(input_rows).cast("long").alias("input_rows"),
        )
    )


def q_events_rollups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of BOTH grouped event aggregates (round-4 registry
    consolidation): ``window`` rows are the tumbling 5-minute
    event-time windows; ``json_props`` rows are the
    get_json_object-extracted per-type stats. All columns of the two
    originals preserved, distinguished by ``kind``. Round 10 adds the
    ``drift`` arm: the PSI/KS/moments monitoring panel of
    ``q_events_drift`` riding the same tagged shape (metric name in
    ``event_type``, value in ``total_value``)."""
    win = q_events_5min_windows(spark, sf_dir).select(
        F.lit("window").alias("kind"),
        "window_start",
        "event_type",
        "n",
        "total_value",
        F.lit(None).cast("double").alias("avg_k"),
        F.lit(None).cast("int").alias("max_k"),
    )
    jp = q_events_json_props(spark, sf_dir).select(
        F.lit("json_props").alias("kind"),
        F.lit(None).cast("timestamp").alias("window_start"),
        "event_type",
        "n",
        F.lit(None).cast("double").alias("total_value"),
        "avg_k",
        "max_k",
    )
    # round 6 (cont.): events_funnel folded in as the 'funnel' arm (the
    # ORIGINAL funnel plan runs unchanged, stack-unpivoted into the
    # tagged shape); freed the registry slot for dedup_duplicate_spans.
    fun = (
        q_events_funnel(spark, sf_dir)
        .selectExpr(
            "stack(3, 'n_signup_users', CAST(n_signup_users AS DOUBLE), "
            "'n_converted', CAST(n_converted AS DOUBLE), "
            "'conversion_rate', conversion_rate) AS (metric, val)"
        )
        .select(
            F.lit("funnel").alias("kind"),
            F.lit(None).cast("timestamp").alias("window_start"),
            F.col("metric").alias("event_type"),
            F.lit(None).cast("long").alias("n"),
            F.col("val").alias("total_value"),
            F.lit(None).cast("double").alias("avg_k"),
            F.lit(None).cast("int").alias("max_k"),
        )
    )
    dr = q_events_drift(spark, sf_dir).select(
        F.lit("drift").alias("kind"),
        F.lit(None).cast("timestamp").alias("window_start"),
        F.col("metric").alias("event_type"),
        F.lit(None).cast("long").alias("n"),
        F.col("value").alias("total_value"),
        F.lit(None).cast("double").alias("avg_k"),
        F.lit(None).cast("int").alias("max_k"),
    )
    return (
        win.unionByName(jp)
        .unionByName(fun)
        .unionByName(dr)
        .orderBy("kind", "window_start", "event_type")
    )


# Drift-panel replay: mid-ts split (epoch() doubles — micros/1e6 in
# both engines), reference-anchored 100-bin histogram (PSI re-bucketed
# to 10 exactly like drift_report), cumulative-diff KS, moments,
# categorical PSI over event_type. greatest(p, 1e-6) is the PSI
# smoothing floor.
_EVENTS_DRIFT_SQL = """
WITH drift_mid AS (
    SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) / 2.0 AS mid FROM events
),
drift_ev AS (
    SELECT value, event_type,
           CASE WHEN epoch_us(ts) <= (SELECT mid FROM drift_mid)
                THEN 1 ELSE 0 END AS is_ref
    FROM events
),
drift_bounds AS (
    SELECT min(value) AS lo, max(value) AS hi FROM drift_ev WHERE is_ref = 1
),
drift_counts AS (
    SELECT CAST(greatest(0, least(99,
               floor((value - lo) / ((hi - lo) / 100.0)))) AS INT) AS bin,
           sum(is_ref) AS n_ref, sum(1 - is_ref) AS n_cur
    FROM drift_ev, drift_bounds
    WHERE value IS NOT NULL
    GROUP BY 1
),
drift_shares AS (
    SELECT bin,
           CAST(n_ref AS DOUBLE) / sum(n_ref) OVER () AS p_ref,
           CAST(n_cur AS DOUBLE) / sum(n_cur) OVER () AS p_cur
    FROM drift_counts
),
drift_coarse AS (
    SELECT CAST(floor(bin / 10) AS INT) AS cbin,
           sum(p_ref) AS p_ref, sum(p_cur) AS p_cur
    FROM drift_shares GROUP BY 1
),
drift_cat AS (
    SELECT CAST(event_type AS VARCHAR) AS category,
           sum(is_ref) AS n_ref, sum(1 - is_ref) AS n_cur
    FROM drift_ev GROUP BY 1
),
drift_cat_shares AS (
    SELECT CAST(n_ref AS DOUBLE) / sum(n_ref) OVER () AS p_ref,
           CAST(n_cur AS DOUBLE) / sum(n_cur) OVER () AS p_cur
    FROM drift_cat
),
drift_moments AS (
    SELECT CASE WHEN is_ref = 1 THEN 'ref' ELSE 'cur' END AS s,
           CAST(count(*) AS DOUBLE) AS n,
           round(avg(value), 6) AS mean,
           round(stddev_samp(value), 6) AS std
    FROM drift_ev WHERE value IS NOT NULL GROUP BY 1
)
SELECT 'psi' AS metric,
       round(sum((greatest(p_cur, 1e-6) - greatest(p_ref, 1e-6))
                 * ln(greatest(p_cur, 1e-6) / greatest(p_ref, 1e-6))), 6)
         AS value
FROM drift_coarse
UNION ALL
-- round-11 divergences, same coarse histogram + epsilon floor as PSI
SELECT 'js', round(
       0.5 * sum(greatest(p_ref, 1e-6) * ln(greatest(p_ref, 1e-6)
             / ((greatest(p_ref, 1e-6) + greatest(p_cur, 1e-6)) / 2)))
     + 0.5 * sum(greatest(p_cur, 1e-6) * ln(greatest(p_cur, 1e-6)
             / ((greatest(p_ref, 1e-6) + greatest(p_cur, 1e-6)) / 2))), 6)
FROM drift_coarse
UNION ALL
SELECT 'chi2', round(sum(pow(greatest(p_cur, 1e-6) - greatest(p_ref, 1e-6), 2)
                         / greatest(p_ref, 1e-6)), 6)
FROM drift_coarse
UNION ALL
SELECT 'tv', round(0.5 * sum(abs(coalesce(p_cur, 0) - coalesce(p_ref, 0))), 6)
FROM drift_coarse
UNION ALL
SELECT 'ks', round(max(abs(d)), 6) FROM (
    SELECT sum(p_ref) OVER (ORDER BY bin)
         - sum(p_cur) OVER (ORDER BY bin) AS d
    FROM drift_shares
)
UNION ALL
-- round-12: Wasserstein-1 from the SAME cumulative diffs as KS,
-- domain-normalized; sparse bins gap-weighted (exact grid EMD)
SELECT 'w1', round(sum(abs(d) * gap) / 100.0, 6) FROM (
    SELECT d, coalesce(lead(bin) OVER (ORDER BY bin), 100) - bin AS gap
    FROM (
        SELECT bin,
               sum(p_ref) OVER (ORDER BY bin)
             - sum(p_cur) OVER (ORDER BY bin) AS d
        FROM drift_shares
    )
)
UNION ALL
-- asymptotic TWO-SIDED two-sample KS p-value from the ROUNDED D
-- (matching the Spark expression term for term): leading Kolmogorov
-- term 2*exp(-2 lambda^2), clamped to 1
SELECT 'ks_pvalue',
       round(least(1.0, 2.0 * exp(-2.0 * d * d * (nr * nc / (nr + nc)))), 6)
FROM (
    SELECT (SELECT round(max(abs(d)), 6) FROM (
                SELECT sum(p_ref) OVER (ORDER BY bin)
                     - sum(p_cur) OVER (ORDER BY bin) AS d
                FROM drift_shares)) AS d,
           (SELECT CAST(sum(is_ref) AS DOUBLE) FROM drift_ev
             WHERE value IS NOT NULL) AS nr,
           (SELECT CAST(sum(1 - is_ref) AS DOUBLE) FROM drift_ev
             WHERE value IS NOT NULL) AS nc
)
UNION ALL
SELECT 'psi_categorical',
       round(sum((greatest(p_cur, 1e-6) - greatest(p_ref, 1e-6))
                 * ln(greatest(p_cur, 1e-6) / greatest(p_ref, 1e-6))), 6)
FROM drift_cat_shares
UNION ALL
SELECT 'n_' || s, n FROM drift_moments
UNION ALL
SELECT 'mean_' || s, mean FROM drift_moments
UNION ALL
SELECT 'std_' || s, std FROM drift_moments
"""


def _events_rollups_sql() -> str:
    return f"""
WITH win AS ({_EVENTS_WIN_SQL}), jp AS ({_EVENTS_JSON_SQL})
SELECT 'window' AS kind, window_start, event_type, n, total_value,
       CAST(NULL AS DOUBLE) AS avg_k, CAST(NULL AS INTEGER) AS max_k
FROM win
UNION ALL
SELECT 'json_props', CAST(NULL AS TIMESTAMP), event_type, n,
       CAST(NULL AS DOUBLE), avg_k, max_k
FROM jp
UNION ALL
SELECT 'funnel', CAST(NULL AS TIMESTAMP), m, CAST(NULL AS BIGINT), v,
       CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER)
FROM ({_FUNNEL_SQL}) f CROSS JOIN LATERAL (VALUES
    ('n_signup_users', CAST(n_signup_users AS DOUBLE)),
    ('n_converted', CAST(n_converted AS DOUBLE)),
    ('conversion_rate', conversion_rate)
) AS u(m, v)
UNION ALL
SELECT 'drift', CAST(NULL AS TIMESTAMP), metric, CAST(NULL AS BIGINT),
       value, CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER)
FROM ({_EVENTS_DRIFT_SQL}) d
ORDER BY kind, window_start, event_type
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap cumsum (30-min inactivity): the
    batch analogue of session_window. Per-user shuffle only."""
    pin_utc(spark)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800)
            ).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


_SESSIONIZE_SQL = """
WITH g AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
    FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


# --- Pivot ------------------------------------------------------------------

def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orders: rows=priority, cols=status, values=count."""
    pin_utc(spark)
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"O": "n_open", "F": "n_filled", "P": "n_partial"})
        .na.fill(0, ["n_open", "n_filled", "n_partial"])
        .orderBy("o_orderpriority")
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_partial
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- SQL API surface: correlated subquery, grouping sets, views -------------

def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape via spark.sql: correlated EXISTS (Catalyst rewrites
    to a left-semi join on the correlation key)."""
    pin_utc(spark)
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM v_orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM v_lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q17_avg_quantity_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: scalar aggregate subquery per group — expressed
    as a broadcast join against the pre-aggregated per-part averages
    (the plan Catalyst's DecorrelateInnerQuery produces anyway, stated
    explicitly so the shuffle is one slim (partkey, avg) exchange)."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # Left-semi against the broadcast brand parts FIRST: the per-partkey
    # average only ever feeds rows for Brand#1 partkeys, so aggregating
    # the full fact table would shuffle ~1000x more groups than needed
    # at scale. Per-partkey avg is invariant under restricting to a
    # partkey subset, so results are identical.
    li_brand = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    avg_q = li_brand.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li_brand.join(avg_q, li_brand.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg((F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


_Q17_SQL = """
SELECT sum(l1.l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem l1
JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#1'
  AND l1.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                       FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via spark.sql (beyond rollup/cube)."""
    pin_utc(spark)
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               sum(o_totalprice) AS total, count(*) AS n
        FROM v_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       sum(o_totalprice) AS total, CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q_privacy_view_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 parity: the privacy layer as a SQL VIEW over silver (the
    Trino `orders_current_priv` view, README.md:106-117) — temp view +
    masking expressions in pure spark.sql (`view` arm; user_key is a
    bijective sha2 pseudonym of user_id, so the oracle's distinct
    count over user_id is exact parity).

    Round 10 widens the row into the release-side privacy surface
    (``operators/privacy.py``), every arm hash-checked:
    - `kanon`: suppression-model k-anonymity over customer with the
      quasi-identifier (nation, segment, $2000 balance GENERALIZATION
      band) — every surviving row's full class assignment + size;
    - `kaud`: per-class audit (n, is_suppressed) at k=12 over the
      (nation, segment) classes;
    - `ldiv`: distinct l-diversity audit — per segment, how many
      distinct nations (the homogeneity-attack check) at l=10;
    - `dp` (round 10 cont.): ε-differential-privacy noisy release —
      `dp_count` per segment at ε=0.5 and `dp_sum` of the clipped
      balance in CENTS (clip [0, 1e6]¢ → $10k sensitivity) at ε=0.5.
      Cents make the clipped sum an order-independent exact integer;
      the released noisy values ride as micro-scaled BIGINT strings
      (float→string formatting is engine-divergent, micro ints are
      not), so every release value is hash-checked against the
      oracle's seeded-Laplace replay."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.cdc.silver import silver_from_bronze
    from privacy_cdc_lakehouse_spark.functions.scalars import DEFAULT_TEST_SALT
    from privacy_cdc_lakehouse_spark.operators import privacy as pv
    from privacy_cdc_lakehouse_spark.sources.debezium import cdc_events

    silver_from_bronze(cdc_events(spark, sf_dir)).createOrReplaceTempView(
        "v_orders_current"
    )
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY VIEW v_orders_current_priv AS
        SELECT order_id,
               sha2(concat_ws('::', cast(user_id AS string), '{DEFAULT_TEST_SALT}'), 256)
                 AS user_key,
               amount_eur, status, last_change_ts
        FROM v_orders_current
        """
    )
    view = spark.sql(
        "SELECT 'view' AS kind, status AS k, "
        "concat_ws(':', cast(count(*) AS string), "
        "cast(count(DISTINCT user_key) AS string)) AS v "
        "FROM v_orders_current_priv GROUP BY status"
    )
    cust = _t(spark, sf_dir, "customer")
    g = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        pv.generalize_numeric(F.col("c_acctbal"), 2000).alias("bal_band"),
    )
    kanon = pv.k_anonymize(
        g, ["c_nationkey", "c_mktsegment", "bal_band"], k=2
    ).select(
        F.lit("kanon").alias("kind"),
        F.col("c_custkey").cast("string").alias("k"),
        F.concat_ws(
            ":",
            F.col("c_nationkey").cast("string"),
            "c_mktsegment",
            "bal_band",
            F.col("class_size").cast("string"),
        ).alias("v"),
    )
    kaud = pv.k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment"], k=12
    ).select(
        F.lit("kaud").alias("kind"),
        F.concat_ws(
            ":", F.col("c_nationkey").cast("string"), "c_mktsegment"
        ).alias("k"),
        F.concat_ws(
            ":",
            F.col("n").cast("string"),
            F.col("is_suppressed").cast("int").cast("string"),
        ).alias("v"),
    )
    ldiv = pv.l_diversity_audit(
        cust, ["c_mktsegment"], "c_nationkey", l_threshold=10
    ).select(
        F.lit("ldiv").alias("kind"),
        F.col("c_mktsegment").alias("k"),
        F.concat_ws(
            ":",
            F.col("n").cast("string"),
            F.col("n_sensitive").cast("string"),
            F.col("is_l_diverse").cast("int").cast("string"),
        ).alias("v"),
    )
    def _micro(c):
        return F.round(c * 1_000_000).cast("long").cast("string")

    dpc = pv.dp_count(cust, ["c_mktsegment"], epsilon=0.5).select(
        F.lit("dp").alias("kind"),
        F.concat(F.lit("count:"), F.col("c_mktsegment")).alias("k"),
        F.concat_ws(
            ":", F.col("n").cast("string"), _micro(F.col("dp_n"))
        ).alias("v"),
    )
    cents = cust.withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    dps = pv.dp_sum(
        cents, ["c_mktsegment"], "bal_cents", 0.0, 1_000_000.0, epsilon=0.5
    ).select(
        F.lit("dp").alias("kind"),
        F.concat(F.lit("sum:"), F.col("c_mktsegment")).alias("k"),
        F.concat_ws(
            ":",
            F.col("clipped_sum").cast("long").cast("string"),
            _micro(F.col("dp_sum")),
        ).alias("v"),
    )
    # round 12 (cont.): dpq arm — ε-DP QUANTILES via the noisy-
    # histogram mechanism (operators/privacy.py::dp_quantile): p25/50/
    # 90 of the account balance on the caller-fixed [-1000, 10000)
    # 110-bin grid at ε=0.5, per-BIN seeded Laplace (parallel
    # composition), empty bins released too. Every released edge and
    # the noisy total are hash-checked against the oracle's full
    # replay (micro-scaled ints, the dp arm's formatting contract).
    dpq = pv.dp_quantile(
        cust, "c_acctbal", [0.25, 0.5, 0.9], -1000.0, 10000.0,
        n_bins=110, epsilon=0.5,
    ).select(
        F.lit("dpq").alias("kind"),
        F.col("q").cast("string").alias("k"),
        F.concat_ws(
            ":", _micro(F.col("value")), _micro(F.col("dp_total"))
        ).alias("v"),
    )
    return (
        view.unionByName(kanon)
        .unionByName(kaud)
        .unionByName(ldiv)
        .unionByName(dpc)
        .unionByName(dps)
        .unionByName(dpq)
        .orderBy("kind", "k")
    )


# --- As-of join and range join ----------------------------------------------

def q_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark lacks a native one): for each purchase event,
    the most recent PRIOR error event of the same user — composed as
    last_value(ignore nulls) over a per-user event-time window, i.e. a
    single shuffle on the join key instead of a range join. At 100 TB
    this is the standard union+window as-of pattern: O(n log n) per
    key, no cross product."""
    pin_utc(spark)
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    err_ts = F.when(F.col("event_type") == "error", F.col("ts"))
    return (
        ev.withColumn("last_error_ts", F.last(err_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_error_ts")
        .orderBy("event_id")
    )


_ASOF_SQL = """
WITH marked AS (
    SELECT event_id, user_id, ts, event_type,
           last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS last_error_ts
    FROM events
)
SELECT event_id, user_id, ts, last_error_ts
FROM marked WHERE event_type = 'purchase' ORDER BY event_id
"""


def q_range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: events bucketed into value bands. The band
    table is tiny → broadcast nested-loop is optimal; for two large
    sides the scale path is bucketizing the range key into an equi-join
    (same result, one shuffle)."""
    pin_utc(spark)
    bands = spark.createDataFrame(
        [(0, 0.0, 5.0), (1, 5.0, 10.0), (2, 10.0, 15.0), (3, 15.0, 1e9)],
        "band_id int, lo double, hi double",
    )
    ev = _t(spark, sf_dir, "events")
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("band_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .orderBy("band_id")
    )


_RANGE_JOIN_SQL = """
WITH bands(band_id, lo, hi) AS (
    VALUES (0, 0.0, 5.0), (1, 5.0, 10.0), (2, 10.0, 15.0), (3, 15.0, 1e9)
)
SELECT band_id, CAST(count(*) AS BIGINT) AS n, sum(value) AS total_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band_id ORDER BY band_id
"""


def q_join_asof_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of + range non-equi joins in one tagged union (round-6
    consolidation: ``join_asof_last_error`` + ``join_range_value_bands``
    — both ORIGINAL plans run unchanged via the callables above, tagged
    by ``kind``; freed a registry slot for ``tpch_join_panel``)."""
    pin_utc(spark)
    asof = q_asof_last_error(spark, sf_dir).select(
        F.lit("asof").alias("kind"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        "last_error_ts",
        F.lit(None).cast("long").alias("band_id"),
        F.lit(None).cast("double").alias("total_value"),
        F.lit(None).cast("long").alias("n"),
    )
    rng = q_range_join_value_bands(spark, sf_dir).select(
        F.lit("range").alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("timestamp").alias("last_error_ts"),
        F.col("band_id").cast("long").alias("band_id"),
        "total_value",
        F.col("n").cast("long").alias("n"),
    )
    return asof.unionByName(rng).orderBy(
        "kind", F.asc_nulls_first("event_id"), F.asc_nulls_first("band_id")
    )


_ASOF_RANGE_SQL = """
WITH marked AS (
    SELECT event_id, user_id, ts, event_type,
           last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS last_error_ts
    FROM events
),
bands(band_id, lo, hi) AS (
    VALUES (0, 0.0, 5.0), (1, 5.0, 10.0), (2, 10.0, 15.0), (3, 15.0, 1e9)
)
SELECT 'asof' AS kind, event_id, CAST(user_id AS BIGINT) AS user_id,
       ts, last_error_ts,
       CAST(NULL AS BIGINT) AS band_id,
       CAST(NULL AS DOUBLE) AS total_value,
       CAST(NULL AS BIGINT) AS n
FROM marked WHERE event_type = 'purchase'
UNION ALL
SELECT 'range', NULL, NULL, NULL, NULL,
       CAST(band_id AS BIGINT), total_value, CAST(n AS BIGINT)
FROM (
    SELECT band_id, CAST(count(*) AS BIGINT) AS n, sum(value) AS total_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band_id
)
ORDER BY kind, event_id ASC NULLS FIRST, band_id ASC NULLS FIRST
"""


def q_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag (`percentile` is
    exact+sorted — the approximate scale path is percentile_approx /
    t-digest, exposed rows-only via approx_distinct_counts' family)."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


# rounded to 4dp: interpolation fp rounding may differ by ulps across engines
_PERCENTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
       round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# bronze_latest_peek retired as a standalone entry (round 5): the peek
# arm now rides inside queries/cdc.py::q_bronze_dq's monitoring row.


# --- TPC-H join panel (Q7 / Q13 / Q22 shapes) -------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (bidirectional nation-pair shipping volume,
    adapted to the fixture's column set): both nation hops broadcast,
    the pair predicate is applied post-join as a codegen'd filter, and
    the only shuffles are the two fact-side equi-joins + the final
    tiny agg. The year comes off l_shipdate in the scan projection."""
    pin_utc(spark)
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(1996, 1997)
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join so zero-order customers stay in
    the distribution, then a second (tiny-key) aggregation. Two
    shuffles — custkey, then c_count — both map-side combinable."""
    pin_utc(spark)
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: nationkey bands replace phone
    prefixes): scalar AVG subquery over positive balances broadcast as
    a 1-row cross join, then a left-anti join against orders — the
    classic NOT EXISTS decorrelation. Customer side shuffles once on
    custkey for the anti join; the final agg has ≤7 groups."""
    pin_utc(spark)
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7)
    )
    avg_bal = (
        _t(spark, sf_dir, "customer")
        .filter((F.col("c_acctbal") > 0.0) & F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7))
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): a 6-way join where only
    the lineitem↔orders hop shuffles — part, customer, supplier, both
    nation copies, and region all broadcast — then a conditional-sum
    ratio per year. The share expression is a single grouped aggregate
    (sum(when)/sum), never two scans."""
    pin_utc(spark)
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.count("*").alias("n"),
        )
        .orderBy("o_year")
    )


def _relation_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H relation graph for PageRank: customer --buys-->
    supplier (distinct orders⋈lineitem pairs; suppliers offset +10M),
    supplier --located-in--> nation (+20M), nation --home-of-->
    customer. Offsets keep the three node layers id-disjoint, and the
    3-layer cycle means the power iteration moves real mass."""
    ordk = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lik = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    suppk = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    e1 = (
        ordk.join(lik, ordk.o_orderkey == lik.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey") + 10_000_000).cast("long").alias("dst"),
        )
        .distinct()
    )
    e2 = suppk.select(
        (F.col("s_suppkey") + 10_000_000).cast("long").alias("src"),
        (F.col("s_nationkey") + 20_000_000).cast("long").alias("dst"),
    ).distinct()
    e3 = cust.select(
        (F.col("c_nationkey") + 20_000_000).cast("long").alias("src"),
        F.col("c_custkey").cast("long").alias("dst"),
    ).distinct()
    return e1.unionByName(e2).unionByName(e3)


def _relation_graph_edges_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted variant of the relation graph: cust→supp carries the
    LINEITEM MULTIPLICITY between the pair (purchase volume — the
    natural edge strength), the structural supp→nation / nation→cust
    edges weight 1. Weights are INTEGRAL by construction — the
    cross-engine exactness contract of the weighted PageRank oracle
    replay (integer-valued doubles sum exactly in any order, so the
    out-weight totals are bit-identical in Spark and DuckDB)."""
    ordk = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lik = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    suppk = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    e1 = (
        ordk.join(lik, ordk.o_orderkey == lik.l_orderkey)
        .groupBy(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey") + 10_000_000).cast("long").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    e2 = (
        suppk.select(
            (F.col("s_suppkey") + 10_000_000).cast("long").alias("src"),
            (F.col("s_nationkey") + 20_000_000).cast("long").alias("dst"),
        )
        .distinct()
        .withColumn("w", F.lit(1).cast("long"))
    )
    e3 = (
        cust.select(
            (F.col("c_nationkey") + 20_000_000).cast("long").alias("src"),
            F.col("c_custkey").cast("long").alias("dst"),
        )
        .distinct()
        .withColumn("w", F.lit(1).cast("long"))
    )
    return e1.unionByName(e2).unionByName(e3)


def q_pagerank_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-only PageRank at production sizing (the registry's ``pr``
    arm rides tpch_join_panel; this row prices the graph operator
    alone at the gate fixture's scale): 5 power iterations with
    checkpoint_every=2 (lineage bounded mid-loop — the bpe_train
    discipline, exercised at scale here) over the full relation graph
    (~|distinct cust-supp pairs| edges at sf1). Returns the top-20
    nodes plus a summary row (node = |V|, rank = Σ rank, pos = 0) so
    the gate can VALUE-assert mass conservation — a wrong dangling
    redistribution or a dropped contribution join shows up as
    Σ rank != 1 long before it shows in plan shape."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.operators import graph as gr

    ranks = gr.pagerank(
        _relation_graph_edges(spark, sf_dir), iterations=5, checkpoint_every=2
    )
    top = gr.top_ranked(ranks, 20).select(
        F.col("node").cast("long").alias("node"),
        F.col("rank").cast("double").alias("rank"),
        F.col("pos").cast("long").alias("pos"),
    )
    total = ranks.agg(
        F.count(F.lit(1)).cast("long").alias("node"),
        F.sum("rank").alias("rank"),
    ).select("node", "rank", F.lit(0).cast("long").alias("pos"))
    return top.unionByName(total)


def q_triangles_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-only triangle counting at production sizing (the
    registry's ``tri`` arm rides tpch_join_panel; this row prices the
    DEGREE-ORIENTED wedge join alone at the gate fixture's graph —
    round-12 verdict task #4: the unoriented node-iterator's Σ deg²
    intermediate is a scale-killer on power-law graphs, and this row
    is the standing evidence the oriented path holds at 10x). Returns
    the top-20 nodes (pos 1..20) plus a summary row (node = |V|,
    n_triangles = total corner credits, pos = 0); corner credits are
    3x the triangle count by construction, so the gate value-asserts
    total % 3 == 0 AND > 0 — a wrong orientation (missed or
    double-counted triangles) breaks one or the other.

    Round 15 (verdict task #7): the row runs through
    ``clustering_coefficient`` — the lcc composes these exact
    triangle counts with a degree aggregate and ONE IEEE division, so
    its at-scale evidence rides this row for free: top rows carry
    (deg, lcc6) and the gate value-asserts lcc6 ∈ (0, 1] plus the
    division's arithmetic consistency (lcc6 == 2T/(deg·(deg−1)) at
    the 6dp grain) per top node."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.operators import graph as gr

    cc = gr.clustering_coefficient(_relation_graph_edges(spark, sf_dir))
    top = gr.top_ranked(cc, 20, rank_col="n_triangles").select(
        F.col("node").cast("long").alias("node"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.col("deg").cast("long").alias("deg"),
        F.col("lcc6").cast("double").alias("lcc6"),
        F.col("pos").cast("long").alias("pos"),
    )
    total = cc.agg(
        F.count(F.lit(1)).cast("long").alias("node"),
        F.sum("n_triangles").cast("long").alias("n_triangles"),
        F.lit(None).cast("long").alias("deg"),
        F.lit(None).cast("double").alias("lcc6"),
    ).select(
        "node", "n_triangles", "deg", "lcc6",
        F.lit(0).cast("long").alias("pos"),
    )
    return top.unionByName(total)


def q_kcore_fixpoint_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-only k-core FIXPOINT at production sizing (round-13
    verdict task #4: the registry's kcore arm runs 4 PINNED peels —
    oracle-replayable but never the convergence driver loop; this row
    prices the real algorithm: peels × (one |E|-shuffle + ONE 1-row
    convergence scalar + lazy localCheckpoint) until no node drops).
    Returns a 1-row summary; the gate VALUE-asserts survivors > 0 AND
    min_core_deg >= k — the fixpoint property itself, which a pinned
    (possibly unconverged) run cannot guarantee and a broken peel
    loop cannot fake."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.operators import graph as gr

    kc = gr.k_core(_relation_graph_edges(spark, sf_dir), k=8)
    return kc.agg(
        F.count(F.lit(1)).cast("long").alias("survivors"),
        F.min("core_deg").cast("long").alias("min_core_deg"),
        F.sum("core_deg").cast("long").alias("sum_core_deg"),
    )


def q_core_number_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-only core-NUMBER decomposition at production sizing (the
    round-14 operator priced at scale, the kcore_fixpoint precedent):
    fixpoint peeling per level, levels capped at k_max=16 (survivors
    report core 16, meaning >= 16) — the multi-level driver loop
    (levels x peels x 1-row convergence scalars, localCheckpoint per
    peel) the registry's pinned cn arm deliberately avoids. Returns a
    1-row summary; the gate value-asserts coverage (every node got a
    core number in [1, k_max]), multiple populated levels, and
    max_core >= 8 — consistency with the k=8 kcore row having
    survivors, which {core >= 8} == k_core(8) is pytest-pinned to."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.operators import graph as gr

    cn = gr.core_number(_relation_graph_edges(spark, sf_dir), k_max=16)
    return cn.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.countDistinct("core").cast("long").alias("levels"),
        F.min("core").cast("long").alias("min_core"),
        F.max("core").cast("long").alias("max_core"),
        F.sum("core").cast("long").alias("sum_core"),
    )


def q_adamic_adar_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-only Adamic-Adar at production sizing (round-13 verdict
    task #4: the aa arm hash-checks sf0.01; this row prices the
    hub-capped wedge expansion at 10x — max_degree=64 excludes hub
    middles, the Σ deg² mitigation the 100 TB claim rests on).
    Returns the top-20 pairs (pos 1..20) plus a summary row (pos 0,
    x = total pairs, n = total common-neighbor credits); the gate
    value-asserts pairs > 0, positions 1..20 and a non-increasing
    top-20 score sequence.

    Round 15 (verdict task #7): the resource-allocation index rides
    the row for free — ``adamic_adar`` already emits ``ra6`` from the
    SAME capped wedge pass (zero extra shuffles), so top rows carry it
    and the gate value-asserts 0 < ra6 <= aa6 per top pair (every
    wedge middle has deg >= 2, where ln(deg) < deg so 1/deg <
    1/ln(deg) termwise) and a positive corpus-wide ra total in the
    summary row."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.operators import graph as gr

    aa = gr.adamic_adar(_relation_graph_edges(spark, sf_dir), max_degree=64)
    top = (
        aa.orderBy(F.desc("aa6"), "x", "y")
        .limit(20)
        .withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.desc("aa6"), F.asc("x"), F.asc("y"))
            ),
        )
        .select(
            F.col("x").cast("long").alias("x"),
            F.col("y").cast("long").alias("y"),
            F.col("aa6").cast("double").alias("aa6"),
            F.col("ra6").cast("double").alias("ra6"),
            F.col("common_neighbors").cast("long").alias("n"),
            F.col("pos").cast("long").alias("pos"),
        )
    )
    total = aa.agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.lit(0).cast("long").alias("y"),
        F.lit(None).cast("double").alias("aa6"),
        F.round(F.sum("ra6"), 6).cast("double").alias("ra6"),
        F.sum("common_neighbors").cast("long").alias("n"),
        F.lit(0).cast("long").alias("pos"),
    )
    return top.unionByName(total)


def q_hits_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-only HITS at production sizing (round-13 verdict task #5:
    two |E|-shuffles per iteration — the most expensive graph
    recurrence without a gate row; the hits arm hash-checks 3
    iterations at sf0.01). 5 iterations over the relation graph.
    Returns top-10 authorities + top-10 hubs plus two summary rows
    carrying |V| and the L2 norm-squared of each score vector; the
    gate VALUE-asserts both norms == 1 within the 9dp-rounding
    tolerance — a dropped contribution join or broken normalization
    cannot fake a unit norm."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.operators import graph as gr

    ht = gr.hits(_relation_graph_edges(spark, sf_dir), iterations=5)

    def rows(score_col: str, kind: str) -> DataFrame:
        return gr.top_ranked(ht, 10, rank_col=score_col).select(
            F.lit(kind).alias("kind"),
            F.col("node").cast("long").alias("node"),
            F.col(score_col).cast("double").alias("score"),
            F.col("pos").cast("long").alias("pos"),
        )

    def norm(score_col: str, kind: str) -> DataFrame:
        return ht.agg(
            F.count(F.lit(1)).cast("long").alias("node"),
            F.sum(F.col(score_col) * F.col(score_col)).alias("score"),
        ).select(
            F.lit(kind).alias("kind"),
            "node",
            "score",
            F.lit(0).cast("long").alias("pos"),
        )

    return (
        rows("authority", "auth")
        .unionByName(rows("hub", "hub"))
        .unionByName(norm("authority", "norm:auth"))
        .unionByName(norm("hub", "norm:hub"))
    )


def q_lp_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-only label propagation at production sizing (round-13
    verdict task #5): 3 synchronous nation-seeded majority rounds over
    the relation graph. Returns a 1-row summary; the gate
    VALUE-asserts label conservation — every seed keeps its own label
    (seeds_intact == seed_count: seeds are immutable by contract),
    every assigned label IS a seed label (invalid_labels == 0: labels
    only propagate, never appear), and propagation reached beyond the
    seeds (labeled > seed_count)."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.operators import graph as gr

    seeds = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 20_000_000).cast("long").alias("node"),
        F.col("n_nationkey").cast("long").alias("label"),
    )
    lab = gr.label_propagation(
        _relation_graph_edges(spark, sf_dir), seeds, iterations=3
    )
    stats = lab.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.count("label").cast("long").alias("labeled"),
        F.countDistinct("label").cast("long").alias("labels_distinct"),
    )
    intact = (
        lab.join(
            seeds.select("node", F.col("label").alias("_seed")), "node"
        )
        .agg(
            F.sum(
                (F.col("label") == F.col("_seed")).cast("long")
            ).alias("seeds_intact")
        )
    )
    seed_n = seeds.agg(F.count(F.lit(1)).cast("long").alias("seed_count"))
    invalid = (
        lab.filter(F.col("label").isNotNull())
        .select("label")
        .distinct()
        .join(seeds.select("label").distinct(), "label", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("invalid_labels"))
    )
    return (
        stats.crossJoin(intact)
        .crossJoin(seed_n)
        .crossJoin(invalid)
        .select(
            "n_nodes", "labeled", "labels_distinct", "seeds_intact",
            "seed_count", "invalid_labels",
        )
    )


def q_ktruss_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-only k-truss FIXPOINT at production sizing (round 15; the
    registry's kt arm runs 2 PINNED peels at sf0.01 — this row prices
    the real convergence driver loop: support passes × (one wedge
    join over the SHRINKING survivor graph + one edge-keyed aggregate
    + ONE 1-row convergence scalar, lazy localCheckpoint per round)
    until no edge drops, k=3 over the relation graph). 1-row summary;
    the gate VALUE-asserts edges > 0, min_support >= k-2 — the truss
    fixpoint property itself, which a broken peel cannot fake — and
    sum_support % 3 == 0 (every surviving triangle credits exactly
    its three edges)."""
    pin_utc(spark)
    from privacy_cdc_lakehouse_spark.operators import graph as gr

    kt = gr.k_truss(_relation_graph_edges(spark, sf_dir), k=3)
    return kt.agg(
        F.count(F.lit(1)).cast("long").alias("edges"),
        F.min("support").cast("long").alias("min_support"),
        F.sum("support").cast("long").alias("sum_support"),
    )


def q_cc_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-only connected-components min-label closure at production
    sizing (round-14 verdict task #3: the last iterative operator
    without a priced row — the hits 4^R lesson says unpriced driver
    loops hide plan-growth bugs; ``operators/dedup.py::
    connected_components`` also backs dedup_clusters, dedup_semantic's
    keeper closure and leakage_safe_split).

    Graph built to make both the LOOP and the ASSERTS meaningful:
    each order's lineitems form a CHAIN in per-order line-RANK order
    (node = l_orderkey*32 + rank; ranks are dense 1..17 in the
    fixture whatever the raw linenumbers are — the synthetic data has
    linenumber gaps, which the first cut of this row learned from its
    own conservation assert), plus one order-head → customer edge
    (customer node = -(custkey+1): negative ids cannot collide with
    any replica-shifted order key space). Chains mean the min label
    must WALK — customer hub → heads → down each chain one hop per
    round — so the row prices real multi-round propagation, not a
    2-round star; and components == customers-with-orders EXACTLY,
    giving the gate a conservation assert against a second
    independently-computed value (``n_components == n_customers``)
    instead of a loose > 0. The gate additionally value-asserts the
    min-label FIXPOINT itself: zero edges with differently-labeled
    endpoints (one join over the edge list), zero components whose
    label is not a self-labeled member (root property), zero labels
    above their node id (min-label direction)."""
    pin_utc(spark)
    from pyspark.sql import Window

    from privacy_cdc_lakehouse_spark.operators import dedup as dd

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    ranked = li.withColumn("_rk", F.row_number().over(w))
    node = (F.col("l_orderkey") * 32 + F.col("_rk")).cast("long")
    a = ranked.select(
        node.alias("id_a"),
        F.col("l_orderkey").alias("_ok"),
        (F.col("_rk") + 1).alias("_nxt"),
    )
    b = ranked.select(
        F.col("l_orderkey").alias("_ok"),
        F.col("_rk").alias("_nxt"),
        node.alias("id_b"),
    )
    chain = a.join(b, ["_ok", "_nxt"]).select("id_a", "id_b")
    head = ords.select(
        (F.col("o_orderkey") * 32 + 1).cast("long").alias("id_a"),
        (-(F.col("o_custkey") + 1)).cast("long").alias("id_b"),
    )
    # edges consumed twice (the CC loop seeds from them AND the
    # fixpoint-violation join re-reads them) — materialize once
    pairs = chain.unionByName(head).localCheckpoint(eager=False)
    comp = dd.connected_components(pairs).localCheckpoint(eager=False)
    viol = (
        pairs.join(
            comp.select(
                F.col("id").alias("id_a"), F.col("component").alias("_ca")
            ),
            "id_a",
        )
        .join(
            comp.select(
                F.col("id").alias("id_b"), F.col("component").alias("_cb")
            ),
            "id_b",
        )
        .filter(F.col("_ca") != F.col("_cb"))
        .agg(F.count(F.lit(1)).cast("long").alias("viol_edges"))
    )
    stats = comp.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.countDistinct("component").cast("long").alias("n_components"),
        F.sum(
            F.when(F.col("component") > F.col("id"), 1).otherwise(0)
        ).cast("long").alias("label_gt_id"),
    )
    max_sz = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .agg(F.max("_sz").cast("long").alias("max_component_size"))
    )
    roots = (
        comp.select("component")
        .distinct()
        .join(
            comp.filter(F.col("id") == F.col("component")).select(
                "component"
            ),
            "component",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("bad_roots"))
    )
    ncust = ords.agg(
        F.countDistinct("o_custkey").cast("long").alias("n_customers")
    )
    return (
        stats.crossJoin(max_sz)
        .crossJoin(viol)
        .crossJoin(roots)
        .crossJoin(ncust)
        .select(
            "n_nodes", "n_components", "n_customers", "max_component_size",
            "viol_edges", "bad_roots", "label_gt_id",
        )
    )


def q_tpch_join_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 + Q13 + Q22 + Q8 + (round 10) Q9 + Q11 + Q15 + Q16 + Q20 +
    Q21 in one tagged union — each ORIGINAL plan above runs unchanged,
    tagged by ``query``. Widens the §2.3/§2.6 analytic-join surface
    the reference leaves to its engines (README.md:200-207); with the
    round-10 supplier-side arms (global-scalar HAVING, view-max
    lookup, distinct-count + NOT-IN exclusion, nested-IN semi-joins,
    double-correlated EXISTS/NOT-EXISTS), every one of the 22 TPC-H
    query SHAPES now has an implementation + oracle in this module
    (fixture adaptations noted per shape function)."""
    pin_utc(spark)

    def pad(df: DataFrame, query: str, d1, d2, k, measure, n) -> DataFrame:
        return df.select(
            F.lit(query).alias("query"),
            (d1 if d1 is not None else F.lit(None).cast("string")).alias("d1"),
            (d2 if d2 is not None else F.lit(None).cast("string")).alias("d2"),
            (k if k is not None else F.lit(None).cast("long")).cast("long").alias("k"),
            (measure if measure is not None else F.lit(None).cast("double"))
            .cast("double")
            .alias("measure"),
            (n if n is not None else F.lit(None).cast("long")).cast("long").alias("n"),
        )

    # measure rounded to 4dp: double-sum reduction order differs across
    # engines by ulps (same policy as quantity_percentiles).
    q7 = pad(
        q7_volume_shipping(spark, sf_dir), "q7",
        F.col("supp_nation"), F.col("cust_nation"), F.col("l_year"),
        F.round("revenue", 4), F.col("n"),
    )
    q13 = pad(
        q13_customer_distribution(spark, sf_dir), "q13",
        None, None, F.col("c_count"), None, F.col("custdist"),
    )
    q22 = pad(
        q22_global_sales_opportunity(spark, sf_dir), "q22",
        F.col("c_nationkey").cast("string"), None, None,
        F.round("totacctbal", 4), F.col("numcust"),
    )
    q8 = pad(
        q8_market_share(spark, sf_dir), "q8",
        F.lit("NATION_3"), None, F.col("o_year"),
        F.col("mkt_share"), F.col("n"),
    )
    q9 = pad(
        q9_product_type_profit(spark, sf_dir), "q9",
        F.col("n_name"), None, F.col("o_year"), F.col("profit"), F.col("n"),
    )
    q11 = pad(
        q11_important_stock(spark, sf_dir), "q11",
        None, None, F.col("l_partkey"), F.col("value"), None,
    )
    q15 = pad(
        q15_top_supplier(spark, sf_dir), "q15",
        F.col("s_name"), None, F.col("s_suppkey"), F.col("total_revenue"), None,
    )
    q16 = pad(
        q16_parts_supplier_count(spark, sf_dir), "q16",
        F.col("p_brand"), F.col("p_type"), F.col("p_size"),
        None, F.col("supplier_cnt"),
    )
    q20 = pad(
        q20_potential_promotion(spark, sf_dir), "q20",
        F.col("s_name"), None, None, None, None,
    )
    q21 = pad(
        q21_suppliers_kept_waiting(spark, sf_dir), "q21",
        F.col("s_name"), None, None, None, F.col("numwait"),
    )
    # round 10 (cont.): record-linkage arm (operators/linkage.py) — the
    # structured-record ER recipe: master = customer; dirty = customer
    # re-keyed +10M with deterministic perturbations (every 3rd name's
    # last char X'd → edit distance 1, every 3rd+1 uppercased, every
    # 2nd balance +5); blocking on (nation, segment); edit/numeric/exact
    # field scoring (weights .6/.3/.1, threshold .9); best match per
    # dirty record. Every resolved pair's winner, 6dp score, truth key
    # and match flag are hash-checked against the oracle's full replay.
    from privacy_cdc_lakehouse_spark.operators import linkage as lk

    cust = _t(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    master = cust.select(
        ck.alias("lid"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    dirty = cust.select(
        (ck + 10_000_000).alias("rid"),
        F.when(ck % 3 == 0, F.regexp_replace("c_name", r".$", "X"))
        .when(ck % 3 == 1, F.upper(F.col("c_name")))
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("seg"),
        (
            F.col("c_acctbal").cast("double")
            + F.when(ck % 2 == 0, F.lit(5.0)).otherwise(F.lit(0.0))
        ).alias("bal"),
    )
    cands = lk.blocked_candidates(
        master, dirty, [("nationkey", "nationkey"), ("seg", "seg")], "lid", "rid"
    )
    feats = [
        lk.Feature("name", "name", "name", "edit", 0.6),
        lk.Feature("bal", "bal", "bal", "numeric", 0.3, scale=1000.0),
        lk.Feature("seg", "seg", "seg", "exact", 0.1),
    ]
    scored = lk.score_candidates(
        cands, master, dirty, feats, "lid", "rid", threshold=0.9
    )
    link = lk.resolve_best_matches(scored).select(
        F.lit("link").alias("query"),
        F.col("id_l").cast("string").alias("d1"),
        F.col("id_r").cast("string").alias("d2"),
        (F.col("id_r") - 10_000_000).cast("long").alias("k"),
        F.col("score").alias("measure"),
        F.col("is_match").cast("long").alias("n"),
    )
    # round 11: Fellegi-Sunter weight-estimation arm
    # (operators/linkage.py::fellegi_sunter_weights) — m/u agreement
    # probabilities and log-odds weights learned from the SAME scored
    # candidates labeled by the construction truth (dirty id = master
    # id + 10M). measure = w_agree (6dp), n = w_disagree scaled 1e6;
    # every estimated weight hash-checked against the oracle's replay.
    fsw = lk.fellegi_sunter_weights(
        scored.withColumn(
            "_truth", (F.col("id_r") - 10_000_000) == F.col("id_l")
        ),
        ["name", "bal", "seg"],
        "_truth",
    )
    fs = fsw.select(
        F.lit("fs").alias("query"),
        F.col("feature").alias("d1"),
        F.lit(None).cast("string").alias("d2"),
        F.col("n_match").cast("long").alias("k"),
        F.col("w_agree6").alias("measure"),
        F.round(F.col("w_disagree6") * 1e6, 0).cast("long").alias("n"),
    )
    # round 12: resolution under the LEARNED weights — the fs arm's
    # weight frame plugs straight into score_candidates(fs_weights=)
    # (the classic FS log-odds sum; Feature.weight ignored) and
    # through resolve_best_matches; every dirty record's winner, FS
    # score (6dp) and the threshold-0 decision are hash-checked
    # against the oracle's replay of the same staged weights. This
    # closes the round-11 verdict's "learned weights not wired into
    # resolution" gap end-to-end.
    fs_scored = lk.score_candidates(
        cands, master, dirty, feats, "lid", "rid",
        threshold=0.0, fs_weights=fsw,
    )
    fslink = lk.resolve_best_matches(fs_scored).select(
        F.lit("fslink").alias("query"),
        F.col("id_l").cast("string").alias("d1"),
        F.col("id_r").cast("string").alias("d2"),
        (F.col("id_r") - 10_000_000).cast("long").alias("k"),
        F.col("score").alias("measure"),
        F.col("is_match").cast("long").alias("n"),
    )

    # round 12 (cont.): PageRank arm (operators/graph.py::pagerank) —
    # power iteration over the TPC-H relation graph: customer --buys-->
    # supplier (distinct orders⋈lineitem pairs; suppliers offset +10M),
    # supplier --located-in--> nation (+20M), nation --home-of-->
    # customer, so the graph cycles and 5 iterations move real mass
    # (including through the suppliers' dangling-free path). The top-20
    # nodes' 6dp ranks AND positions are hash-checked against the
    # oracle's chained-CTE replay of the SAME pinned semantics —
    # per-iteration 9dp rounding makes cross-engine contribution sums
    # bit-identical (see graph.py's determinism contract).
    from privacy_cdc_lakehouse_spark.operators import graph as gr
    from privacy_cdc_lakehouse_spark.operators.util import checkpoint_parallel

    # Round-15: the panel's nine graph arms each rebuilt + re-executed
    # the SAME relation-graph edge join (profiled: 10 builds, the
    # orders⋈lineitem distinct materialized once per arm). ONE
    # checkpointed frame shared within this query build — results
    # identical (same rows; each operator re-canonicalizes/checkpoints
    # as before), one materialization instead of ~9.
    rel_edges = checkpoint_parallel(_relation_graph_edges(spark, sf_dir))

    ranks = gr.pagerank(rel_edges, iterations=5)
    pr = gr.top_ranked(ranks, 20).select(
        F.lit("pr").alias("query"),
        F.when(F.col("node") >= 20_000_000, F.lit("nation"))
        .when(F.col("node") >= 10_000_000, F.lit("supplier"))
        .otherwise(F.lit("customer"))
        .alias("d1"),
        F.lit(None).cast("string").alias("d2"),
        F.col("node").cast("long").alias("k"),
        F.round("rank", 6).alias("measure"),
        F.col("pos").cast("long").alias("n"),
    )

    # round 12 (cont. 2): HITS arm (operators/graph.py::hits) — hubs &
    # authorities on the SAME relation graph, 3 iterations (HITS
    # converges fast and each iteration is two |E|-shuffles): top-10
    # authorities (who is bought-from/located-in) and top-10 hubs.
    # Scores AND positions hash-checked against the replay generated
    # by hits_oracle_ctes over the shared pr_e edge CTE.
    ht = gr.hits(rel_edges, iterations=3)

    def hits_rows(score_col: str, tag: str) -> DataFrame:
        return gr.top_ranked(ht, 10, rank_col=score_col).select(
            F.lit("hits").alias("query"),
            F.lit(tag).alias("d1"),
            F.lit(None).cast("string").alias("d2"),
            F.col("node").cast("long").alias("k"),
            F.round(score_col, 6).alias("measure"),
            F.col("pos").cast("long").alias("n"),
        )

    hits_arm = hits_rows("authority", "auth").unionByName(hits_rows("hub", "hub"))

    # round 12 (cont. 3): label-propagation arm (operators/graph.py::
    # label_propagation) — semi-supervised hard-label LP: nations seed
    # their own nationkey, labels flow nation→customer→supplier along
    # the relation edges in 3 synchronous rounds (majority vote,
    # count-desc/label-asc tie-break — all-integer, exact parity). The
    # per-(layer, label) assignment counts are hash-checked against
    # the generator-built replay.
    seeds = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 20_000_000).cast("long").alias("node"),
        F.col("n_nationkey").cast("long").alias("label"),
    )
    lp_labels = gr.label_propagation(
        rel_edges, seeds, iterations=3
    )
    lp_arm = (
        lp_labels.groupBy(
            F.when(F.col("node") >= 20_000_000, F.lit("nation"))
            .when(F.col("node") >= 10_000_000, F.lit("supplier"))
            .otherwise(F.lit("customer"))
            .alias("d1"),
            "label",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("lp").alias("query"),
            "d1",
            F.lit(None).cast("string").alias("d2"),
            F.col("label").cast("long").alias("k"),
            F.lit(None).cast("double").alias("measure"),
            F.col("n").cast("long").alias("n"),
        )
    )

    # round 13: weighted-PageRank arm — same graph, cust→supp edges
    # weighted by lineitem multiplicity (Mihalcea & Tarau eq. 2 via
    # pagerank(weight=)); top-10 nodes' 6dp ranks AND positions
    # hash-checked against the SHARED generator's weighted replay
    # (integral weights ⇒ bit-identical out-weight totals — see
    # _relation_graph_edges_weighted).
    _layer = (
        F.when(F.col("node") >= 20_000_000, F.lit("nation"))
        .when(F.col("node") >= 10_000_000, F.lit("supplier"))
        .otherwise(F.lit("customer"))
    )
    ranks_w = gr.pagerank(
        _relation_graph_edges_weighted(spark, sf_dir), iterations=5, weight="w"
    )
    prw = gr.top_ranked(ranks_w, 10).select(
        F.lit("prw").alias("query"),
        _layer.alias("d1"),
        F.lit(None).cast("string").alias("d2"),
        F.col("node").cast("long").alias("k"),
        F.round("rank", 6).alias("measure"),
        F.col("pos").cast("long").alias("n"),
    )
    # round 13 (cont.): personalized-PageRank arm — teleport AND
    # dangling mass target the 25 nation seeds uniformly (proximity TO
    # the nations); top-10 hash-checked against the shared generator's
    # personalize_cte replay. 1/25 is exactly representable, and the
    # in-plan assert_true seed guard is live on this path.
    ranks_p = gr.pagerank(
        rel_edges,
        iterations=5,
        personalize=seeds.select("node"),
    )
    prp = gr.top_ranked(ranks_p, 10).select(
        F.lit("prp").alias("query"),
        _layer.alias("d1"),
        F.lit(None).cast("string").alias("d2"),
        F.col("node").cast("long").alias("k"),
        F.round("rank", 6).alias("measure"),
        F.col("pos").cast("long").alias("n"),
    )
    # round 13 (cont. 2): triangle-counting arm — degree-oriented
    # wedge join (operators/graph.py::triangles, the Σ outdeg² ≤
    # |E|^1.5 production path); all-integer so the hash needs no
    # rounding contract. Top-20 nodes by (count, node) with positions
    # in d2, plus per-layer totals (nodes-in-triangles in k, corner
    # count in n) — the oracle replays the canonical a<b<c join,
    # which must produce the identical triangle set.
    tr_counts = gr.triangles(rel_edges)
    tri_top = gr.top_ranked(tr_counts, 20, rank_col="n_triangles").select(
        F.lit("tri").alias("query"),
        _layer.alias("d1"),
        F.col("pos").cast("string").alias("d2"),
        F.col("node").cast("long").alias("k"),
        F.lit(None).cast("double").alias("measure"),
        F.col("n_triangles").cast("long").alias("n"),
    )
    tri_tot = (
        tr_counts.groupBy(_layer.alias("layer"))
        .agg(
            F.sum((F.col("n_triangles") > 0).cast("long")).alias("nz"),
            F.sum("n_triangles").alias("tot"),
        )
        .select(
            F.lit("tri").alias("query"),
            F.concat(F.lit("total:"), F.col("layer")).alias("d1"),
            F.lit(None).cast("string").alias("d2"),
            F.col("nz").cast("long").alias("k"),
            F.lit(None).cast("double").alias("measure"),
            F.col("tot").cast("long").alias("n"),
        )
    )

    # round 13 (cont. 3): Adamic-Adar link-prediction arm
    # (operators/graph.py::adamic_adar) — common-neighbor-weighted
    # pair similarity with the production degree cap (max_degree=64
    # excludes hub middles, which generate the quadratic wedge blowup
    # while contributing the smallest 1/ln(deg) weights). Top-20
    # pairs' 6dp scores, positions AND common-neighbor counts
    # hash-checked against the oracle's replay over the same
    # canonical undirected edge set the tri arm defines.
    aa_pairs = gr.adamic_adar(
        rel_edges, max_degree=64
    )
    aa_top = (
        aa_pairs.orderBy(F.desc("aa6"), "x", "y")
        .limit(20)
        .withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.desc("aa6"), F.asc("x"), F.asc("y"))
            ),
        )
        .select(
            F.lit("aa").alias("query"),
            F.col("x").cast("string").alias("d1"),
            F.col("y").cast("string").alias("d2"),
            F.col("pos").cast("long").alias("k"),
            F.col("aa6").alias("measure"),
            F.col("common_neighbors").cast("long").alias("n"),
        )
    )

    # round 14: resource-allocation arm (Zhou-Lü-Zhang index — the
    # ra6 column of the SAME capped wedge pass): top-20 pairs by
    # (ra6, x, y), scores/positions/counts hash-checked like aa.
    ra_top = (
        aa_pairs.orderBy(F.desc("ra6"), "x", "y")
        .limit(20)
        .withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.desc("ra6"), F.asc("x"), F.asc("y"))
            ),
        )
        .select(
            F.lit("ra").alias("query"),
            F.col("x").cast("string").alias("d1"),
            F.col("y").cast("string").alias("d2"),
            F.col("pos").cast("long").alias("k"),
            F.col("ra6").alias("measure"),
            F.col("common_neighbors").cast("long").alias("n"),
        )
    )

    # round 14 (cont.): local clustering coefficient arm
    # (operators/graph.py::clustering_coefficient — Watts-Strogatz
    # lcc over the degree-oriented triangle counts): top-20 nodes by
    # (lcc6, node) with degree in n, plus per-layer closed (lcc==1)
    # and positive (lcc>0) node counts — lcc is ONE division of exact
    # integers rounded 6dp, so parity carries no rounding-boundary
    # residual.
    lcc = gr.clustering_coefficient(rel_edges)
    lcc_top = (
        lcc.orderBy(F.desc("lcc6"), "node")
        .limit(20)
        .withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.desc("lcc6"), F.asc("node"))
            ),
        )
        .select(
            F.lit("lcc").alias("query"),
            _layer.alias("d1"),
            F.col("pos").cast("string").alias("d2"),
            F.col("node").cast("long").alias("k"),
            F.col("lcc6").alias("measure"),
            F.col("deg").cast("long").alias("n"),
        )
    )
    lcc_tot = (
        lcc.groupBy(_layer.alias("layer"))
        .agg(
            F.sum((F.col("lcc6") == 1.0).cast("long")).alias("closed"),
            F.sum((F.col("lcc6") > 0.0).cast("long")).alias("pos_n"),
        )
        .select(
            F.lit("lcc").alias("query"),
            F.concat(F.lit("total:"), F.col("layer")).alias("d1"),
            F.lit(None).cast("string").alias("d2"),
            F.col("closed").cast("long").alias("k"),
            F.lit(None).cast("double").alias("measure"),
            F.col("pos_n").cast("long").alias("n"),
        )
    )

    # round 13 (cont. 4): k-core arm (operators/graph.py::k_core) —
    # 4 PINNED synchronous peels at k=8 (the oracle-replayable form;
    # the fixpoint driver loop is pytest-pinned against it): top-10
    # survivors by in-core degree plus per-layer survivor/degree
    # totals, all-integer so parity is exact.
    kc = gr.k_core(rel_edges, k=8, rounds=4)
    kc_top = gr.top_ranked(kc, 10, rank_col="core_deg").select(
        F.lit("kcore").alias("query"),
        _layer.alias("d1"),
        F.col("pos").cast("string").alias("d2"),
        F.col("node").cast("long").alias("k"),
        F.lit(None).cast("double").alias("measure"),
        F.col("core_deg").cast("long").alias("n"),
    )
    kc_tot = (
        kc.groupBy(_layer.alias("layer"))
        .agg(
            F.count(F.lit(1)).alias("nn"),
            F.sum("core_deg").alias("sd"),
        )
        .select(
            F.lit("kcore").alias("query"),
            F.concat(F.lit("total:"), F.col("layer")).alias("d1"),
            F.lit(None).cast("string").alias("d2"),
            F.col("nn").cast("long").alias("k"),
            F.lit(None).cast("double").alias("measure"),
            F.col("sd").cast("long").alias("n"),
        )
    )

    # round 14: core-NUMBER arm (operators/graph.py::core_number) —
    # the Batagelj-Zaveršnik decomposition in its PINNED form (levels
    # 2..8, 2 synchronous peels per level — zero driver reads; the
    # fixpoint driver loop is pytest-pinned against it): per-(layer,
    # core) node counts, all-integer so parity is exact.
    cn = gr.core_number(
        rel_edges, k_max=8, rounds_per_k=2
    )
    cn_arm = (
        cn.groupBy(_layer.alias("d1"), "core")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("cn").alias("query"),
            "d1",
            F.lit(None).cast("string").alias("d2"),
            F.col("core").cast("long").alias("k"),
            F.lit(None).cast("double").alias("measure"),
            F.col("n").cast("long").alias("n"),
        )
    )

    # round 15: k-truss arm (operators/graph.py::k_truss, Cohen 2008)
    # — PINNED 2 synchronous support peels at k=3 (the oracle-
    # replayable form; the fixpoint driver loop is pytest-pinned
    # against it): per-(layer-pair, support) edge counts over the
    # surviving truss, all-integer so parity is exact. Edges span two
    # node layers, so the dimension is the canonical a:b layer pair.
    def _layer_of(c: str):
        return (
            F.when(F.col(c) >= 20_000_000, F.lit("nation"))
            .when(F.col(c) >= 10_000_000, F.lit("supplier"))
            .otherwise(F.lit("customer"))
        )

    kt = gr.k_truss(
        rel_edges, k=3, rounds=2,
        orient="canonical",
    )
    kt_arm = (
        kt.groupBy(
            F.concat_ws(":", _layer_of("a"), _layer_of("b")).alias("d1"),
            "support",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("kt").alias("query"),
            "d1",
            F.lit(None).cast("string").alias("d2"),
            F.col("support").cast("long").alias("k"),
            F.lit(None).cast("double").alias("measure"),
            F.col("n").cast("long").alias("n"),
        )
    )

    out = q7
    for arm in (
        q13, q22, q8, q9, q11, q15, q16, q20, q21, link, fs, fslink, pr,
        hits_arm, lp_arm, prw, prp, tri_top, tri_tot, aa_top, ra_top,
        lcc_top, lcc_tot, kc_top, kc_tot, cn_arm, kt_arm,
    ):
        out = out.unionByName(arm)
    return out.orderBy(
        "query",
        F.asc_nulls_first("d1"),
        F.asc_nulls_first("d2"),
        F.asc_nulls_first("k"),
    )


def _pagerank_ctes(iterations: int = 5) -> str:
    """Relation-graph edges CTE + the SHARED pinned-semantics replay
    (operators/graph.py::pagerank_oracle_ctes — one definition for
    every PageRank oracle in the repo) + the top-20 select."""
    from privacy_cdc_lakehouse_spark.operators.graph import pagerank_oracle_ctes

    edges = """pr_e AS MATERIALIZED (
    SELECT o_custkey AS src, l_suppkey + 10000000 AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    UNION
    SELECT s_suppkey + 10000000, s_nationkey + 20000000 FROM supplier
    UNION
    SELECT c_nationkey + 20000000, c_custkey FROM customer
)"""
    top = f"""pr_top AS (
    SELECT node, rank,
           row_number() OVER (ORDER BY rank DESC, node) AS pos
    FROM pr_r{iterations} ORDER BY rank DESC, node LIMIT 20
)"""
    from privacy_cdc_lakehouse_spark.operators.graph import (
        hits_oracle_ctes,
        label_propagation_oracle_ctes,
    )

    lp = """lp_seeds AS MATERIALIZED (
    SELECT n_nationkey + 20000000 AS node,
           CAST(n_nationkey AS BIGINT) AS label
    FROM nation
)"""
    lp_sum = """lp_sum AS (
    SELECT CASE WHEN node >= 20000000 THEN 'nation'
                WHEN node >= 10000000 THEN 'supplier'
                ELSE 'customer' END AS layer,
           label, CAST(count(*) AS BIGINT) AS n
    FROM lp_l3 GROUP BY 1, 2
)"""

    hits_tops = """ht_atop AS (
    SELECT node, authority,
           row_number() OVER (ORDER BY authority DESC, node) AS pos
    FROM ht_s3 ORDER BY authority DESC, node LIMIT 10
),
ht_htop AS (
    SELECT node, hub,
           row_number() OVER (ORDER BY hub DESC, node) AS pos
    FROM ht_s3 ORDER BY hub DESC, node LIMIT 10
)"""
    # round 13: weighted edges (cust→supp = lineitem multiplicity,
    # integral by construction) + weighted/personalized replays from
    # the SAME shared generator, + the canonical triangle replay
    prw_edges = """prw_e AS MATERIALIZED (
    SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
        SELECT o_custkey AS src, l_suppkey + 10000000 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ) GROUP BY 1, 2
    UNION ALL
    SELECT s_suppkey + 10000000, s_nationkey + 20000000, 1 FROM supplier
    UNION ALL
    SELECT c_nationkey + 20000000, c_custkey, 1 FROM customer
)"""
    prw_top = f"""prw_top AS (
    SELECT node, rank,
           row_number() OVER (ORDER BY rank DESC, node) AS pos
    FROM prw_r{iterations} ORDER BY rank DESC, node LIMIT 10
)"""
    prp_top = f"""prp_top AS (
    SELECT node, rank,
           row_number() OVER (ORDER BY rank DESC, node) AS pos
    FROM prp_r{iterations} ORDER BY rank DESC, node LIMIT 10
)"""
    tri = """tri_und AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM pr_e WHERE src <> dst
),
tri_t AS MATERIALIZED (
    SELECT e1.a AS a, e1.b AS b, e2.b AS c
    FROM tri_und e1
    JOIN tri_und e2 ON e2.a = e1.b
    JOIN tri_und e3 ON e3.a = e1.a AND e3.b = e2.b
),
tri_all AS MATERIALIZED (
    SELECT n.node, coalesce(c.n_tri, 0) AS n_tri
    FROM (SELECT a AS node FROM tri_und UNION SELECT b FROM tri_und) n
    LEFT JOIN (
        SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
            SELECT a AS node FROM tri_t
            UNION ALL SELECT b FROM tri_t
            UNION ALL SELECT c FROM tri_t
        ) GROUP BY node
    ) c USING (node)
),
tri_top AS (
    SELECT node, n_tri,
           row_number() OVER (ORDER BY n_tri DESC, node) AS pos
    FROM tri_all ORDER BY n_tri DESC, node LIMIT 20
),
tri_tot AS (
    SELECT CASE WHEN node >= 20000000 THEN 'nation'
                WHEN node >= 10000000 THEN 'supplier'
                ELSE 'customer' END AS layer,
           CAST(sum(CASE WHEN n_tri > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nz,
           CAST(sum(n_tri) AS BIGINT) AS tot
    FROM tri_all GROUP BY 1
),
aa_nbrs AS MATERIALIZED (
    SELECT a AS z, b AS n FROM tri_und UNION ALL SELECT b, a FROM tri_und
),
aa_deg AS MATERIALIZED (
    SELECT z, CAST(count(*) AS BIGINT) AS deg FROM aa_nbrs GROUP BY z
),
aa_mid AS MATERIALIZED (
    SELECT nb.z, nb.n, d.deg FROM aa_nbrs nb JOIN aa_deg d USING (z)
    WHERE d.deg <= 64
),
aa_sc AS MATERIALIZED (
    SELECT w1.n AS x, w2.n AS y, CAST(count(*) AS BIGINT) AS cn,
           round(sum(1.0 / ln(w1.deg)), 6) AS aa6,
           round(sum(1.0 / w1.deg), 6) AS ra6
    FROM aa_mid w1 JOIN aa_mid w2 ON w1.z = w2.z AND w1.n < w2.n
    GROUP BY 1, 2
),
aa_top AS (
    SELECT x, y, cn, aa6,
           row_number() OVER (ORDER BY aa6 DESC, x, y) AS pos
    FROM aa_sc ORDER BY aa6 DESC, x, y LIMIT 20
),
ra_top AS (
    SELECT x, y, cn, ra6,
           row_number() OVER (ORDER BY ra6 DESC, x, y) AS pos
    FROM aa_sc ORDER BY ra6 DESC, x, y LIMIT 20
),
lcc_all AS MATERIALIZED (
    SELECT t.node, d.deg, t.n_tri,
           CASE WHEN d.deg >= 2
                THEN round(2.0 * t.n_tri / (d.deg * (d.deg - 1)), 6)
                ELSE 0.0 END AS lcc6
    FROM tri_all t JOIN aa_deg d ON d.z = t.node
),
lcc_top AS (
    SELECT node, deg, lcc6,
           row_number() OVER (ORDER BY lcc6 DESC, node) AS pos
    FROM lcc_all ORDER BY lcc6 DESC, node LIMIT 20
),
lcc_tot AS (
    SELECT CASE WHEN node >= 20000000 THEN 'nation'
                WHEN node >= 10000000 THEN 'supplier'
                ELSE 'customer' END AS layer,
           CAST(sum(CASE WHEN lcc6 = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS closed,
           CAST(sum(CASE WHEN lcc6 > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS pos_n
    FROM lcc_all GROUP BY 1
)"""
    from privacy_cdc_lakehouse_spark.operators.graph import (
        core_number_oracle_ctes,
        k_core_oracle_ctes,
        k_truss_oracle_ctes,
    )

    # round 14: core-number replay (pinned levels 2..8, 2 peels each)
    # + the per-(layer, core) summary the cn arm hashes
    cn = (
        core_number_oracle_ctes("tri_und", 8, 2, "cn")
        + """,
cn_sum AS (
    SELECT CASE WHEN node >= 20000000 THEN 'nation'
                WHEN node >= 10000000 THEN 'supplier'
                ELSE 'customer' END AS layer,
           core, CAST(count(*) AS BIGINT) AS n
    FROM cn_out GROUP BY 1, 2
)"""
    )
    kt = (
        k_truss_oracle_ctes("tri_und", 3, 2, "kt")
        + """,
kt_sum AS (
    SELECT (CASE WHEN a >= 20000000 THEN 'nation'
                 WHEN a >= 10000000 THEN 'supplier'
                 ELSE 'customer' END) || ':' ||
           (CASE WHEN b >= 20000000 THEN 'nation'
                 WHEN b >= 10000000 THEN 'supplier'
                 ELSE 'customer' END) AS lp,
           support, CAST(count(*) AS BIGINT) AS n
    FROM kt_out GROUP BY 1, 2
)"""
    )
    kcore = (
        k_core_oracle_ctes("tri_und", 8, "kc", 4)
        + """,
kc_topc AS (
    SELECT node, core_deg,
           row_number() OVER (ORDER BY core_deg DESC, node) AS pos
    FROM kc_out ORDER BY core_deg DESC, node LIMIT 10
),
kc_tot AS (
    SELECT CASE WHEN node >= 20000000 THEN 'nation'
                WHEN node >= 10000000 THEN 'supplier'
                ELSE 'customer' END AS layer,
           CAST(count(*) AS BIGINT) AS nn,
           CAST(sum(core_deg) AS BIGINT) AS sd
    FROM kc_out GROUP BY 1
)"""
    )
    return ",\n".join(
        [
            edges,
            pagerank_oracle_ctes("pr_e", "pr", iterations),
            top,
            hits_oracle_ctes("pr_e", "ht", 3),
            hits_tops,
            lp,
            label_propagation_oracle_ctes("pr_e", "lp_seeds", "lp", 3),
            lp_sum,
            prw_edges,
            pagerank_oracle_ctes("prw_e", "prw", iterations, weight="w"),
            prw_top,
            pagerank_oracle_ctes(
                "pr_e", "prp", iterations, personalize_cte="lp_seeds"
            ),
            prp_top,
            tri,
            kcore,
            cn,
            kt,
        ]
    )


_PR_CTES = _pagerank_ctes()

_TPCH_JOIN_PANEL_SQL = f"""
WITH q7 AS (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE EXTRACT(year FROM l_shipdate) IN (1996, 1997)
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
),
q13 AS (
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                         AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
),
q22 AS (
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           sum(c_acctbal) AS totacctbal
    FROM customer c
    WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
      AND c_acctbal > (
          SELECT avg(c_acctbal) FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
      )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
    GROUP BY c_nationkey
),
q8 AS (
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           round(
               sum(CASE WHEN n1.n_name = 'NATION_3'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END)
               / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region   ON n2.n_regionkey = r_regionkey
    WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
      AND EXTRACT(year FROM o_orderdate) IN (1996, 1997)
    GROUP BY 1
)
, q9 AS (
    SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS profit,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
),
q11v AS (
    SELECT l_partkey, sum(l_extendedprice) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    GROUP BY 1
),
q11 AS (
    SELECT l_partkey, round(value, 4) AS value
    FROM q11v WHERE value > 0.001 * (SELECT sum(value) FROM q11v)
),
q15rev AS (
    SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1
),
q15 AS (
    SELECT s_suppkey, s_name, round(total_revenue, 4) AS total_revenue
    FROM q15rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM q15rev)
),
q16 AS (
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#2' AND p_type NOT LIKE 'ECONOMY%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
),
q20 AS (
    SELECT s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2' AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey HAVING sum(l_quantity) > 150
    )
),
q21 AS (
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders ON l1.l_orderkey = o_orderkey
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_0'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
),
-- round 12: shared replay of the blocked candidate sims (the same
-- construction the link/fs arms inline) for the learned-weight
-- resolution arm
lk_sims AS (
    SELECT m.c_custkey AS id_l, d.rid AS id_r,
           1.0 - CAST(levenshtein(m.c_name, d.name) AS DOUBLE)
               / greatest(length(m.c_name), length(d.name), 1) AS s_name,
           greatest(0.0, 1.0 - abs(CAST(m.c_acctbal AS DOUBLE) - d.bal)
                              / 1000.0) AS s_bal,
           CASE WHEN m.c_mktsegment = d.seg THEN 1.0 ELSE 0.0 END AS s_seg
    FROM customer m
    JOIN (
        SELECT c_custkey + 10000000 AS rid,
               CASE WHEN c_custkey % 3 = 0
                    THEN regexp_replace(c_name, '.$', 'X')
                    WHEN c_custkey % 3 = 1 THEN upper(c_name)
                    ELSE c_name END AS name,
               c_nationkey, c_mktsegment AS seg,
               CAST(c_acctbal AS DOUBLE)
                 + CASE WHEN c_custkey % 2 = 0 THEN 5.0 ELSE 0.0 END AS bal
        FROM customer
    ) d ON m.c_nationkey = d.c_nationkey AND m.c_mktsegment = d.seg
),
-- the learned weights, 1 wide row (identical m/u estimation as the
-- fs arm: agreement at >= 0.9, truth = construction key, exact-count
-- IEEE divisions clamped to [1e-6, 1-1e-6], log-odds rounded 6dp —
-- the SAME rounded values Spark's score_candidates(fs_weights=) uses)
lk_w AS (
    SELECT round(ln(m_name / u_name), 6) AS wa_name,
           round(ln((1.0 - m_name) / (1.0 - u_name)), 6) AS wd_name,
           round(ln(m_bal / u_bal), 6) AS wa_bal,
           round(ln((1.0 - m_bal) / (1.0 - u_bal)), 6) AS wd_bal,
           round(ln(m_seg / u_seg), 6) AS wa_seg,
           round(ln((1.0 - m_seg) / (1.0 - u_seg)), 6) AS wd_seg
    FROM (
        SELECT
          greatest(1e-6, least(1.0 - 1e-6, am_name / CAST(nm AS DOUBLE))) AS m_name,
          greatest(1e-6, least(1.0 - 1e-6, au_name / CAST(nu AS DOUBLE))) AS u_name,
          greatest(1e-6, least(1.0 - 1e-6, am_bal / CAST(nm AS DOUBLE))) AS m_bal,
          greatest(1e-6, least(1.0 - 1e-6, au_bal / CAST(nu AS DOUBLE))) AS u_bal,
          greatest(1e-6, least(1.0 - 1e-6, am_seg / CAST(nm AS DOUBLE))) AS m_seg,
          greatest(1e-6, least(1.0 - 1e-6, au_seg / CAST(nu AS DOUBLE))) AS u_seg
        FROM (
            SELECT
              sum(CASE WHEN truth THEN 1 ELSE 0 END) AS nm,
              sum(CASE WHEN truth THEN 0 ELSE 1 END) AS nu,
              sum(CASE WHEN s_name >= 0.9 AND truth THEN 1 ELSE 0 END) AS am_name,
              sum(CASE WHEN s_name >= 0.9 AND NOT truth THEN 1 ELSE 0 END) AS au_name,
              sum(CASE WHEN s_bal >= 0.9 AND truth THEN 1 ELSE 0 END) AS am_bal,
              sum(CASE WHEN s_bal >= 0.9 AND NOT truth THEN 1 ELSE 0 END) AS au_bal,
              sum(CASE WHEN s_seg >= 0.9 AND truth THEN 1 ELSE 0 END) AS am_seg,
              sum(CASE WHEN s_seg >= 0.9 AND NOT truth THEN 1 ELSE 0 END) AS au_seg
            FROM (SELECT *, (id_r - 10000000) = id_l AS truth FROM lk_sims)
        )
    )
),
-- resolution under the learned rule: FS log-odds sum per pair (term
-- order matching Spark's feature fold: name, bal, seg), best per
-- dirty record by (score DESC, master id), match at log-odds 0
lk_fslink AS (
    SELECT id_l, id_r, score,
           row_number() OVER (
               PARTITION BY id_r ORDER BY score DESC, id_l) AS rn
    FROM (
        SELECT id_l, id_r,
               round(0.0
                 + (CASE WHEN s_name >= 0.9 THEN wa_name ELSE wd_name END)
                 + (CASE WHEN s_bal >= 0.9 THEN wa_bal ELSE wd_bal END)
                 + (CASE WHEN s_seg >= 0.9 THEN wa_seg ELSE wd_seg END),
                 6) AS score
        FROM lk_sims CROSS JOIN lk_w
    )
),
{_PR_CTES}
SELECT 'q7' AS query, supp_nation AS d1, cust_nation AS d2,
       CAST(l_year AS BIGINT) AS k, round(revenue, 4) AS measure, n
FROM q7
UNION ALL
SELECT 'q13', NULL, NULL, CAST(c_count AS BIGINT),
       CAST(NULL AS DOUBLE), custdist
FROM q13
UNION ALL
SELECT 'q22', CAST(c_nationkey AS VARCHAR), NULL, CAST(NULL AS BIGINT),
       round(totacctbal, 4), numcust
FROM q22
UNION ALL
SELECT 'q8', 'NATION_3', NULL, CAST(o_year AS BIGINT), mkt_share, n
FROM q8
UNION ALL
SELECT 'q9', n_name, NULL, CAST(o_year AS BIGINT), profit, n FROM q9
UNION ALL
SELECT 'q11', NULL, NULL, l_partkey, value, NULL FROM q11
UNION ALL
SELECT 'q15', s_name, NULL, s_suppkey, total_revenue, NULL FROM q15
UNION ALL
SELECT 'q16', p_brand, p_type, CAST(p_size AS BIGINT), NULL, supplier_cnt FROM q16
UNION ALL
SELECT 'q20', s_name, NULL, NULL, NULL, NULL FROM q20
UNION ALL
SELECT 'q21', s_name, NULL, NULL, NULL, numwait FROM q21
UNION ALL
-- record-linkage replay: blocked (nation, segment) candidates over the
-- deterministically perturbed dirty copy, edit/numeric/exact weighted
-- score (6dp, term order matching the Spark fold), best match per
-- dirty record by (score DESC, master id)
SELECT 'link', CAST(id_l AS VARCHAR), CAST(id_r AS VARCHAR),
       CAST(id_r - 10000000 AS BIGINT), score,
       CAST(CAST(score >= 0.9 AS INT) AS BIGINT)
FROM (
    SELECT id_l, id_r, score,
           row_number() OVER (
               PARTITION BY id_r ORDER BY score DESC, id_l) AS rn
    FROM (
        SELECT m.c_custkey AS id_l, d.rid AS id_r,
               round(0.0
                   + (1.0 - CAST(levenshtein(m.c_name, d.name) AS DOUBLE)
                          / greatest(length(m.c_name), length(d.name), 1))
                     * 0.6
                   + greatest(0.0, 1.0 - abs(CAST(m.c_acctbal AS DOUBLE)
                                             - d.bal) / 1000.0) * 0.3
                   + (CASE WHEN m.c_mktsegment = d.seg
                           THEN 1.0 ELSE 0.0 END) * 0.1, 6) AS score
        FROM customer m
        JOIN (
            SELECT c_custkey + 10000000 AS rid,
                   CASE WHEN c_custkey % 3 = 0
                        THEN regexp_replace(c_name, '.$', 'X')
                        WHEN c_custkey % 3 = 1 THEN upper(c_name)
                        ELSE c_name END AS name,
                   c_nationkey, c_mktsegment AS seg,
                   CAST(c_acctbal AS DOUBLE)
                     + CASE WHEN c_custkey % 2 = 0 THEN 5.0 ELSE 0.0 END AS bal
            FROM customer
        ) d ON m.c_nationkey = d.c_nationkey AND m.c_mktsegment = d.seg
    )
) WHERE rn = 1
UNION ALL
-- Fellegi-Sunter replay (round 11): per-feature sims over the SAME
-- blocked candidates, agreement at >= 0.9, truth = construction key,
-- m/u as exact-count IEEE divisions clamped to [1e-6, 1-1e-6],
-- log-odds weights 6dp (w_disagree scaled 1e6 into the long slot)
SELECT 'fs', feature, CAST(NULL AS VARCHAR), n_match,
       round(ln(m_c / u_c), 6),
       CAST(round(round(ln((1.0 - m_c) / (1.0 - u_c)), 6) * 1e6) AS BIGINT)
FROM (
    SELECT feature, n_match,
           greatest(1e-6, least(1.0 - 1e-6, am / CAST(nm AS DOUBLE))) AS m_c,
           greatest(1e-6, least(1.0 - 1e-6, au / CAST(nu AS DOUBLE))) AS u_c
    FROM (
        SELECT unnest(ARRAY['bal', 'name', 'seg']) AS feature,
               unnest(ARRAY[am_bal, am_name, am_seg]) AS am,
               unnest(ARRAY[au_bal, au_name, au_seg]) AS au,
               nm AS n_match, nm, nu
        FROM (
            SELECT sum(CASE WHEN truth THEN 1 ELSE 0 END) AS nm,
                   sum(CASE WHEN truth THEN 0 ELSE 1 END) AS nu,
                   sum(CASE WHEN s_name >= 0.9 AND truth THEN 1 ELSE 0 END) AS am_name,
                   sum(CASE WHEN s_name >= 0.9 AND NOT truth THEN 1 ELSE 0 END) AS au_name,
                   sum(CASE WHEN s_bal >= 0.9 AND truth THEN 1 ELSE 0 END) AS am_bal,
                   sum(CASE WHEN s_bal >= 0.9 AND NOT truth THEN 1 ELSE 0 END) AS au_bal,
                   sum(CASE WHEN s_seg >= 0.9 AND truth THEN 1 ELSE 0 END) AS am_seg,
                   sum(CASE WHEN s_seg >= 0.9 AND NOT truth THEN 1 ELSE 0 END) AS au_seg
            FROM (
                SELECT (d.rid - 10000000) = m.c_custkey AS truth,
                       1.0 - CAST(levenshtein(m.c_name, d.name) AS DOUBLE)
                           / greatest(length(m.c_name), length(d.name), 1)
                         AS s_name,
                       greatest(0.0, 1.0 - abs(CAST(m.c_acctbal AS DOUBLE)
                                               - d.bal) / 1000.0) AS s_bal,
                       CASE WHEN m.c_mktsegment = d.seg
                            THEN 1.0 ELSE 0.0 END AS s_seg
                FROM customer m
                JOIN (
                    SELECT c_custkey + 10000000 AS rid,
                           CASE WHEN c_custkey % 3 = 0
                                THEN regexp_replace(c_name, '.$', 'X')
                                WHEN c_custkey % 3 = 1 THEN upper(c_name)
                                ELSE c_name END AS name,
                           c_nationkey, c_mktsegment AS seg,
                           CAST(c_acctbal AS DOUBLE)
                             + CASE WHEN c_custkey % 2 = 0
                                    THEN 5.0 ELSE 0.0 END AS bal
                    FROM customer
                ) d ON m.c_nationkey = d.c_nationkey
                   AND m.c_mktsegment = d.seg
            )
        )
    )
)
UNION ALL
-- learned-weight resolution (round 12): winner per dirty record under
-- the Fellegi-Sunter rule the fs arm estimated
SELECT 'fslink', CAST(id_l AS VARCHAR), CAST(id_r AS VARCHAR),
       CAST(id_r - 10000000 AS BIGINT), score,
       CAST(CAST(score >= 0.0 AS INT) AS BIGINT)
FROM lk_fslink WHERE rn = 1
UNION ALL
-- PageRank arm (round 12): top-20 nodes of the relation graph under
-- the pinned power iteration (per-iteration 9dp rounding)
SELECT 'pr',
       CASE WHEN node >= 20000000 THEN 'nation'
            WHEN node >= 10000000 THEN 'supplier'
            ELSE 'customer' END,
       NULL, CAST(node AS BIGINT), round(rank, 6), CAST(pos AS BIGINT)
FROM pr_top
UNION ALL
-- HITS arm (round 12): top-10 authorities and hubs of the same graph
SELECT 'hits', 'auth', NULL, CAST(node AS BIGINT),
       round(authority, 6), CAST(pos AS BIGINT)
FROM ht_atop
UNION ALL
SELECT 'hits', 'hub', NULL, CAST(node AS BIGINT),
       round(hub, 6), CAST(pos AS BIGINT)
FROM ht_htop
UNION ALL
-- label-propagation arm (round 12): per-(layer, label) counts after
-- 3 rounds of nation-seeded majority propagation
SELECT 'lp', layer, NULL, label, CAST(NULL AS DOUBLE), n FROM lp_sum
UNION ALL
-- weighted-PageRank arm (round 13): lineitem-multiplicity edge
-- weights, replayed by the shared generator's weighted form
SELECT 'prw',
       CASE WHEN node >= 20000000 THEN 'nation'
            WHEN node >= 10000000 THEN 'supplier'
            ELSE 'customer' END,
       NULL, CAST(node AS BIGINT), round(rank, 6), CAST(pos AS BIGINT)
FROM prw_top
UNION ALL
-- personalized-PageRank arm (round 13): nation-seeded teleport +
-- dangling redistribution, shared generator's personalize_cte form
SELECT 'prp',
       CASE WHEN node >= 20000000 THEN 'nation'
            WHEN node >= 10000000 THEN 'supplier'
            ELSE 'customer' END,
       NULL, CAST(node AS BIGINT), round(rank, 6), CAST(pos AS BIGINT)
FROM prp_top
UNION ALL
-- triangle arm (round 13): top-20 nodes by (count, node) with pos in
-- d2, replayed by the canonical a<b<c join (same triangle set the
-- degree-oriented Spark path must produce)
SELECT 'tri',
       CASE WHEN node >= 20000000 THEN 'nation'
            WHEN node >= 10000000 THEN 'supplier'
            ELSE 'customer' END,
       CAST(pos AS VARCHAR), CAST(node AS BIGINT), CAST(NULL AS DOUBLE),
       n_tri
FROM tri_top
UNION ALL
-- triangle per-layer totals: nodes-on-a-triangle in k, corner count in n
SELECT 'tri', 'total:' || layer, NULL, nz, CAST(NULL AS DOUBLE), tot
FROM tri_tot
UNION ALL
-- Adamic-Adar arm (round 13): top-20 degree-capped common-neighbor
-- pairs — 6dp score, position and raw common-neighbor count
SELECT 'aa', CAST(x AS VARCHAR), CAST(y AS VARCHAR), CAST(pos AS BIGINT),
       aa6, cn
FROM aa_top
UNION ALL
-- resource-allocation arm (round 14): the same capped wedge pass's
-- ra6 column (Zhou-Lü-Zhang 1/deg weighting), top-20 by (ra6, x, y)
SELECT 'ra', CAST(x AS VARCHAR), CAST(y AS VARCHAR), CAST(pos AS BIGINT),
       ra6, cn
FROM ra_top
UNION ALL
-- local clustering coefficient arm (round 14): Watts-Strogatz lcc
-- over the triangle counts — top-20 by (lcc6, node) with degree in
-- n, plus per-layer closed/positive node counts
SELECT 'lcc',
       CASE WHEN node >= 20000000 THEN 'nation'
            WHEN node >= 10000000 THEN 'supplier'
            ELSE 'customer' END,
       CAST(pos AS VARCHAR), CAST(node AS BIGINT), lcc6, deg
FROM lcc_top
UNION ALL
SELECT 'lcc', 'total:' || layer, NULL, closed, CAST(NULL AS DOUBLE), pos_n
FROM lcc_tot
UNION ALL
-- k-core arm (round 13): 4 pinned peels at k=8 — top-10 survivors by
-- in-core degree (pos in d2) + per-layer survivor/degree totals
SELECT 'kcore',
       CASE WHEN node >= 20000000 THEN 'nation'
            WHEN node >= 10000000 THEN 'supplier'
            ELSE 'customer' END,
       CAST(pos AS VARCHAR), CAST(node AS BIGINT), CAST(NULL AS DOUBLE),
       core_deg
FROM kc_topc
UNION ALL
SELECT 'kcore', 'total:' || layer, NULL, nn, CAST(NULL AS DOUBLE), sd
FROM kc_tot
UNION ALL
-- core-number arm (round 14): per-(layer, core) node counts under the
-- pinned Batagelj-Zaveršnik schedule (levels 2..8, 2 peels per level)
SELECT 'cn', layer, NULL, core, CAST(NULL AS DOUBLE), n
FROM cn_sum
UNION ALL
-- k-truss arm (round 15): per-(layer-pair, support) edge counts under
-- the pinned schedule (k=3, 2 support peels)
SELECT 'kt', lp, NULL, support, CAST(NULL AS DOUBLE), n
FROM kt_sum
ORDER BY query, d1 ASC NULLS FIRST, d2 ASC NULLS FIRST, k ASC NULLS FIRST
"""


# --- TPC-H supplier panel (Q9 / Q11 / Q15 / Q16 / Q20 / Q21 shapes) ---------
# Round 10: the six remaining classic TPC-H shapes, adapted to the
# fixture's column set (no partsupp table, no l_receiptdate/commitdate
# or comment columns — adaptations noted per query). With these, every
# one of the 22 TPC-H query SHAPES has an implementation + oracle in
# this module.

def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year;
    adapted: the fixture has no partsupp, so profit omits the
    ps_supplycost term). The shape is intact: a 5-way join where
    part (name-pattern filtered), supplier and nation broadcast, the
    one fact-fact shuffle is lineitem⋈orders, and the year comes off
    o_orderdate in the agg projection."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part_f = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("profit"),
            F.count("*").alias("n"),
        )
        .orderBy("n_name", "o_year")
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification; adapted:
    partsupp value becomes per-part lineitem revenue from one
    nation's suppliers). The defining shape survives: a grouped
    aggregate HAVING-filtered against a GLOBAL scalar aggregate of
    the same frame — the scalar rides a broadcast 1-row cross join
    (Q22's decorrelation pattern), so the per-part frame is scanned
    once per side and never shuffled against itself."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    value = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    total = value.agg(F.sum("value").alias("total"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.001 * F.col("total"))
        .select("l_partkey", F.round("value", 4).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier via the revenue view): per-supplier
    revenue over a 3-month ship window, then suppliers whose revenue
    equals the global max — the max is a broadcast 1-row scalar, so
    the view is computed once and reused for both sides (Catalyst
    collapses the shared subplan under AQE reuse)."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 4).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship; adapted: the
    supplier-complaint exclusion keys on s_acctbal < 0 since the
    fixture has no comment column, and partsupp is played by the
    lineitem part-supplier pairs). Shape intact: attribute-grouped
    COUNT(DISTINCT supplier) with a NOT-IN supplier exclusion — the
    exclusion is a broadcast anti-join, the distinct rides the
    grouped aggregate."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").like("ECONOMY%"))
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            li.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion; adapted: the
    availqty condition becomes a shipped-quantity threshold over the
    name-matched parts in one year). Shape intact: a two-level nested
    IN — suppliers semi-joined to an aggregate-HAVING subquery that is
    itself part-name filtered — all as semi-joins, never materializing
    the subquery per outer row."""
    pin_utc(spark)
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qualified = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting; adapted:
    "late" is l_shipdate > o_orderdate + 60 days since the fixture has
    no receipt/commit dates). The hardest subquery shape in the suite
    and it survives adaptation intact: a correlated EXISTS (another
    supplier contributed to the order) AND a correlated NOT EXISTS
    (no OTHER supplier was late on it) against the same fact table —
    expressed as one left-semi and one left-anti self-join on the
    orderkey with a suppkey-inequality residual, so the fact table is
    shuffled on orderkey (co-partitionable at scale), never
    re-executed per outer row."""
    pin_utc(spark)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter((F.col("o_orderstatus") == "F") & late)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").alias("sk"),
            "s_name",
        )
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late)
        .select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    )
    return (
        l1.join(
            l2,
            (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --- Pandas UDF surface (Arrow-vectorized grouped map) ----------------------

def q_pandas_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map: per-market-segment z-scores of order
    totals, returning >3σ outliers. This is the Arrow slow-path done
    right — one vectorized pandas batch per group, no per-row Python.
    (Expressible with window functions too — the point here is the
    grouped-map operator surface; the oracle uses the SQL form.)"""
    pin_utc(spark)
    import pandas as pd

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)
        pdf = pdf.assign(zscore=(pdf["o_totalprice"] - mu) / sd)
        # top-5 |z| per group, deterministic tie-break on key
        pdf = pdf.reindex(
            pdf.assign(a=pdf["zscore"].abs())
            .sort_values(["a", "o_orderkey"], ascending=[False, True])
            .index[:5]
        )
        return pdf

    out = joined.groupBy("c_mktsegment").applyInPandas(
        zscore,
        "c_mktsegment string, o_orderkey long, o_totalprice double, zscore double",
    )
    return out.select(
        "c_mktsegment", "o_orderkey", "o_totalprice", F.round("zscore", 6).alias("zscore_r")
    ).orderBy("c_mktsegment", "o_orderkey")


_ZSCORE_SQL = """
WITH scored AS (
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           (o_totalprice - avg(o_totalprice) OVER w) / stddev_samp(o_totalprice) OVER w
             AS z
    FROM orders JOIN customer ON o_custkey = c_custkey
    WINDOW w AS (PARTITION BY c_mktsegment)
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                 ORDER BY abs(z) DESC, o_orderkey) AS rn
    FROM scored
)
SELECT c_mktsegment, o_orderkey, o_totalprice, round(z, 6) AS zscore_r
FROM ranked WHERE rn <= 5
ORDER BY c_mktsegment, o_orderkey
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across a join — Catalyst extracts the
    common `l_partkey = p_partkey` conjunct so the join stays equi
    (hash/broadcast), with the disjunction evaluated post-join and the
    per-side IsNotNull/range conjuncts pushed to both scans."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_size") >= 5) & (F.col("p_size") <= 10) & (F.col("l_discount") < 0.02))
    )
    return joined.filter(cond).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


_Q19_SQL = """
SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30)
   OR (p_size BETWEEN 5 AND 10 AND l_discount < 0.02)
"""


def q_min_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-min subquery in WHERE (TPC-H Q2's shape,
    adapted to available tables): each customer's cheapest order.
    Catalyst decorrelates into an aggregate + join on the correlation
    key — one slim (custkey, min) exchange."""
    pin_utc(spark)
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM v_orders o
        WHERE o_totalprice = (SELECT min(o2.o_totalprice) FROM v_orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_custkey, o_orderkey
        """
    )


_MIN_ORDER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice = (SELECT min(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_custkey, o_orderkey
"""


def q_correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape) + correlated scalar-min
    subquery (Q2 shape) in one tagged union — round-5 registry
    consolidation; both original plans run unchanged (the union calls
    the original functions verbatim)."""
    pin_utc(spark)
    ex = q4_order_priority_exists(spark, sf_dir).select(
        F.lit("exists").alias("kind"),
        F.col("o_orderpriority").alias("k"),
        F.col("order_count").cast("double").alias("val"),
    )
    mn = q_min_order_per_customer(spark, sf_dir).select(
        F.lit("scalar_min").alias("kind"),
        F.concat_ws(":", F.col("o_custkey"), F.col("o_orderkey")).alias("k"),
        F.col("o_totalprice").cast("double").alias("val"),
    )
    return ex.unionByName(mn).orderBy("kind", "k")


_CORRELATED_SQL = f"""
WITH ex AS ({_Q4_SQL}), mn AS ({_MIN_ORDER_SQL})
SELECT 'exists' AS kind, o_orderpriority AS k, CAST(order_count AS DOUBLE) AS val
FROM ex
UNION ALL
SELECT 'scalar_min',
       CAST(o_custkey AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR),
       CAST(o_totalprice AS DOUBLE)
FROM mn
ORDER BY kind, k
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight range filters + single global sum. All
    three predicates push to the parquet scan (PushedFilters) and only
    4 columns are read — at 100 TB this is an I/O-bound scan with a
    two-level (partial/final) agg, no shuffle of data rows."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


_Q6_SQL = """
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag, per fixture columns):
    fact-fact join orders⋈lineitem on the order key + conditional
    counts. Both sides are large at scale, so this is the one join in
    the surface that SHOULD sort-merge on the shuffled key — broadcast
    would OOM; AQE picks the strategy by observed size."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share. part is the broadcast dim; the
    CASE lives inside the same partial agg as the denominator — one
    pass, one broadcast join, no second scan."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc)
            ).alias("promo_revenue_pct")
        )
    )


_Q14_SQL = """
SELECT CAST(100.0 AS DOUBLE)
       * sum(CASE WHEN p_type = 'PROMO'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
       / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold,
    joined back to customer. The HAVING aggregate runs FIRST on
    lineitem alone (partial+final on l_orderkey), and only the tiny
    qualifying key set joins onward — orders/customer join a
    few-hundred-row side, not 6B lineitems."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
    )


_Q18_SQL = """
WITH big AS (
    SELECT l_orderkey, sum(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
)
SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
"""


def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.
    lineitem is pre-filtered to 'R' AND pre-aggregated per order key
    BEFORE joining — the join input is |orders-with-returns|, not
    |lineitems|; customer broadcasts; TakeOrdered caps the result
    without a global sort."""
    pin_utc(spark)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(per_order, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(F.sum("rev").alias("revenue"), F.count("*").alias("n_orders"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.round("revenue", 2).alias("revenue_r"),
            "n_orders",
        )
    )


_Q10_SQL = """
WITH per_order AS (
    SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS rev
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
)
SELECT c_custkey, c_name, c_mktsegment,
       round(sum(rev), 2) AS revenue_r,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN per_order ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name, c_mktsegment
ORDER BY sum(rev) DESC, c_custkey LIMIT 20
"""


def q_tpch_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item revenue top-20) + Q18 (large-volume
    customers) in one tagged union — round-6 registry consolidation
    (freed the slot for cdc_stream_silver); both original plans run
    unchanged (the union calls the original functions verbatim)."""
    pin_utc(spark)
    a = q10_returned_item_revenue(spark, sf_dir).select(
        F.lit("q10_returns").alias("kind"),
        F.col("c_custkey").cast("long").alias("custkey"),
        F.col("c_name").alias("k"),
        F.col("revenue_r").cast("double").alias("money"),
        F.col("n_orders").cast("double").alias("qty"),
    )
    b = q18_large_volume_customers(spark, sf_dir).select(
        F.lit("q18_volume").alias("kind"),
        F.col("c_custkey").cast("long").alias("custkey"),
        F.concat_ws(":", F.col("c_name"), F.col("o_orderkey")).alias("k"),
        F.col("o_totalprice").cast("double").alias("money"),
        F.col("total_qty").cast("double").alias("qty"),
    )
    return a.unionByName(b).orderBy("kind", "custkey", "k")


_TPCH_CUSTOMER_REVENUE_SQL = f"""
WITH a AS ({_Q10_SQL}), b AS ({_Q18_SQL})
SELECT 'q10_returns' AS kind, CAST(c_custkey AS BIGINT) AS custkey,
       c_name AS k, CAST(revenue_r AS DOUBLE) AS money,
       CAST(n_orders AS DOUBLE) AS qty
FROM a
UNION ALL
SELECT 'q18_volume', CAST(c_custkey AS BIGINT),
       c_name || ':' || CAST(o_orderkey AS VARCHAR),
       CAST(o_totalprice AS DOUBLE), CAST(total_qty AS DOUBLE)
FROM b
ORDER BY kind, custkey, k
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: users whose first 'signup' is followed by a
    'purchase' within 7 days. Both stages aggregate to one row per
    user BEFORE the join — the temporal condition joins |users|-sized
    sides (broadcast-able), never the raw event stream against
    itself."""
    pin_utc(spark)
    ev = _t(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.collect_list("ts").alias("purchase_ts"))
    )
    joined = signup.join(purchase, "user_id", "left").select(
        "user_id",
        "signup_ts",
        F.exists(
            F.coalesce("purchase_ts", F.array()),
            lambda t: (t >= F.col("signup_ts"))
            & (t <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")),
        ).alias("converted"),
    )
    return joined.agg(
        F.count("*").alias("n_signup_users"),
        F.sum(F.col("converted").cast("bigint")).alias("n_converted"),
        F.round(
            F.sum(F.col("converted").cast("double")) / F.count("*"), 6
        ).alias("conversion_rate"),
    )


_FUNNEL_SQL = """
WITH s AS (
    SELECT user_id, min(ts) AS signup_ts FROM events
    WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
    SELECT s.user_id,
           CASE WHEN EXISTS (
               SELECT 1 FROM events p
               WHERE p.event_type = 'purchase' AND p.user_id = s.user_id
                 AND p.ts >= s.signup_ts
                 AND p.ts <= s.signup_ts + INTERVAL 7 DAY
           ) THEN 1 ELSE 0 END AS converted
    FROM s
)
SELECT CAST(count(*) AS BIGINT) AS n_signup_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS conversion_rate
FROM conv
"""


# --- Round-3 registry consolidations ----------------------------------------
# The driver's correctness window records ~50 rows in registry order;
# near-duplicate entries are merged into tagged unions so EVERY operator
# keeps a driver-verified row. Each union branch keeps its own physical
# plan (Spark plans union children independently), so no plan shape is
# lost — only registry slots.


def q_tpch_scalar_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H aggregates as one tagged union: Q6 (pushdown range scan),
    Q14 (broadcast dim + conditional agg), Q17 (decorrelated scalar
    subquery), Q19 (OR-of-ANDs equi join), and — round 5 — Q12's
    fact-fact SMJ conditional counts unpivoted per returnflag. Each
    branch is the unchanged original query — same plan, same
    arithmetic, one registry slot."""
    pin_utc(spark)

    # round(4): the single-row sums are summation-order dependent
    # across engines (last-ulp drift, e.g. q14 …61 vs …63 under exact
    # comparison) — every other float-bearing query already rounds for
    # the same reason; diffs live at 1e-8 relative, far below 4 dp.
    def tag(name: str, df: DataFrame, col: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("query"),
            F.round(F.col(col).cast("double"), 4).alias("value"),
        )

    q19 = q19_disjunctive_predicates(spark, sf_dir)
    q12 = q12_priority_by_returnflag(spark, sf_dir)
    q12_rows = q12.select(
        F.concat(F.lit("q12_high_"), F.col("l_returnflag")).alias("query"),
        F.round(F.col("high_line_count").cast("double"), 4).alias("value"),
    ).unionByName(
        q12.select(
            F.concat(F.lit("q12_low_"), F.col("l_returnflag")).alias("query"),
            F.round(F.col("low_line_count").cast("double"), 4).alias("value"),
        )
    )
    return (
        tag("q14_promo_pct", q14_promo_revenue(spark, sf_dir), "promo_revenue_pct")
        .unionByName(tag("q17_avg_yearly", q17_avg_quantity_subquery(spark, sf_dir), "avg_yearly"))
        .unionByName(tag("q19_n_lines", q19, "n_lines"))
        .unionByName(tag("q19_revenue", q19, "revenue"))
        .unionByName(tag("q6_revenue", q6_forecast_revenue(spark, sf_dir), "revenue"))
        .unionByName(q12_rows)
        .orderBy("query")
    )


_SCALAR_AGG_SQL = f"""
WITH q6 AS ({_Q6_SQL}), q14 AS ({_Q14_SQL}), q17 AS ({_Q17_SQL}), q19 AS ({_Q19_SQL}),
q12 AS ({_Q12_SQL})
SELECT 'q14_promo_pct' AS query, round(CAST(promo_revenue_pct AS DOUBLE), 4) AS value FROM q14
UNION ALL SELECT 'q17_avg_yearly', round(CAST(avg_yearly AS DOUBLE), 4) FROM q17
UNION ALL SELECT 'q19_n_lines', round(CAST(n_lines AS DOUBLE), 4) FROM q19
UNION ALL SELECT 'q19_revenue', round(CAST(revenue AS DOUBLE), 4) FROM q19
UNION ALL SELECT 'q6_revenue', round(CAST(revenue AS DOUBLE), 4) FROM q6
UNION ALL SELECT 'q12_high_' || l_returnflag, round(CAST(high_line_count AS DOUBLE), 4) FROM q12
UNION ALL SELECT 'q12_low_' || l_returnflag, round(CAST(low_line_count AS DOUBLE), 4) FROM q12
ORDER BY query
"""


def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS) and LEFT SEMI (EXISTS) joins in one
    tagged union — both original plans preserved."""
    pin_utc(spark)
    anti = q_customers_without_orders(spark, sf_dir).select(
        F.lit("anti").alias("kind"),
        F.col("c_custkey").cast("string").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("val"),
    )
    semi = q_parts_with_lineitems(spark, sf_dir).select(
        F.lit("semi").alias("kind"),
        F.col("p_brand").alias("k"),
        F.lit(None).cast("string").alias("name"),
        F.col("n_parts").cast("double").alias("val"),
    )
    return anti.unionByName(semi).orderBy("kind", "k")


_SEMI_ANTI_SQL = """
SELECT 'anti' AS kind, CAST(c_custkey AS VARCHAR) AS k, c_name AS name,
       CAST(c_acctbal AS DOUBLE) AS val
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
UNION ALL
SELECT 'semi', p_brand, CAST(NULL AS VARCHAR), CAST(count(*) AS DOUBLE)
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
ORDER BY kind, k
"""


def q_grouping_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE + explicit GROUPING SETS + PIVOT in one tagged
    union — all three grouping-set expansions plus the pivot exercised,
    each in its own single-shuffle aggregate. The pivot arm (round-6
    consolidation: ``pivot_status_by_priority`` folded in to free a
    registry slot for ``cdc_changes_feed``) runs the ORIGINAL pivot
    plan unchanged, then stacks the pivoted count columns back into
    the tagged shape."""
    pin_utc(spark)

    def shape(src: str, df: DataFrame, d1: str, d2: str, measure: str) -> DataFrame:
        return df.select(
            F.lit(src).alias("src"),
            F.col(d1).alias("d1"),
            F.col(d2).alias("d2"),
            F.col(measure).cast("double").alias("measure"),
            F.col("n").cast("long").alias("n"),
        )

    pivot_rows = (
        q_pivot_status_by_priority(spark, sf_dir)
        .selectExpr(
            "'pivot' as src",
            "o_orderpriority as d1",
            "stack(3, 'n_open', n_open, 'n_filled', n_filled, "
            "'n_partial', n_partial) as (d2, cnt)",
        )
        .select(
            "src",
            "d1",
            "d2",
            F.col("cnt").cast("double").alias("measure"),
            F.col("cnt").cast("long").alias("n"),
        )
    )
    # round 6 (cont.): quantity_percentiles folded in as the 'pct' arm
    # (the ORIGINAL exact-percentile plan runs unchanged, then stack()
    # unpivots); freed the registry slot for text_chunk_stats.
    pct_rows = (
        q_quantity_percentiles(spark, sf_dir)
        .selectExpr(
            "'pct' as src",
            "l_returnflag as d1",
            "stack(3, 'p50_qty', p50_qty, 'p90_qty', p90_qty, "
            "'p99_price', p99_price) as (d2, m)",
        )
        .select(
            "src",
            "d1",
            "d2",
            F.col("m").cast("double").alias("measure"),
            F.lit(None).cast("long").alias("n"),
        )
    )
    return (
        shape("cube", q_cube_order_status(spark, sf_dir), "o_orderstatus", "o_orderpriority", "total")
        .unionByName(shape("gsets", q_grouping_sets(spark, sf_dir), "o_orderstatus", "o_orderpriority", "total"))
        .unionByName(shape("rollup", q_rollup_returnflag(spark, sf_dir), "l_returnflag", "l_linestatus", "sum_qty"))
        .unionByName(pivot_rows)
        .unionByName(pct_rows)
        .orderBy("src", F.asc_nulls_first("d1"), F.asc_nulls_first("d2"))
    )


_GROUPING_ANALYTICS_SQL = """
SELECT 'cube' AS src, o_orderstatus AS d1, o_orderpriority AS d2,
       CAST(sum(o_totalprice) AS DOUBLE) AS measure,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'gsets', o_orderstatus, o_orderpriority,
       CAST(sum(o_totalprice) AS DOUBLE), CAST(count(*) AS BIGINT)
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
UNION ALL
SELECT 'rollup', l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS DOUBLE), CAST(count(*) AS BIGINT)
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'pivot', o_orderpriority, lbl, CAST(cnt AS DOUBLE), CAST(cnt AS BIGINT)
FROM (
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
    FROM orders GROUP BY o_orderpriority
) p CROSS JOIN LATERAL (VALUES
    ('n_open', n_open), ('n_filled', n_filled), ('n_partial', n_partial)
) AS u(lbl, cnt)
UNION ALL
SELECT 'pct', l_returnflag, lbl, v, CAST(NULL AS BIGINT)
FROM (
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
) q CROSS JOIN LATERAL (VALUES
    ('p50_qty', p50), ('p90_qty', p90), ('p99_price', p99)
) AS w(lbl, v)
ORDER BY src, d1 ASC NULLS FIRST, d2 ASC NULLS FIRST
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    # round 6: q10_returned_item_revenue + q18_large_volume_customers →
    # tpch_customer_revenue (freed the slot for cdc_stream_silver)
    "tpch_customer_revenue": q_tpch_customer_revenue,
    # round 6 (cont.): events_funnel → events_rollups (funnel arm;
    # freed the slot for llmops.py::dedup_duplicate_spans)
    "pandas_zscore_outliers": q_pandas_zscore_outliers,
    "tpch_scalar_aggregates": q_tpch_scalar_aggregates,
    "q3_top_unshipped": q3_top_unshipped,
    "q5_revenue_by_nation": q5_revenue_by_nation,
    "join_semi_anti": q_join_semi_anti,
    # round-4 consolidations (driver window capped at 50 entries):
    # window_top3_per_segment + window_running_spend → window_analytics;
    # events_5min_windows + events_json_props → events_rollups. Round 5:
    # q12_priority_by_returnflag → tpch_scalar_aggregates (unpivoted);
    # bronze_latest_peek → queries/cdc.py::cdc_bronze_dq. The original
    # callables remain above — the unions call them verbatim.
    "window_analytics": q_window_analytics,
    "grouping_analytics": q_grouping_analytics,
    # round 6: distinct_counts → setops_customer_cohorts (distinct:*
    # tagged rows; freed the slot for curation_pack_sequences)
    "setops_customer_cohorts": q_setops_customer_cohorts,
    "events_rollups": q_events_rollups,
    "events_sessionize": q_events_sessionize,
    # round 6: pivot_status_by_priority → grouping_analytics (pivot arm;
    # freed the slot for cdc_changes_feed)
    # round 5: q4_order_priority_exists + min_order_per_customer →
    # correlated_subqueries (freed the slot for sql_dml_lifecycle)
    "correlated_subqueries": q_correlated_subqueries,
    "sql_privacy_view": q_privacy_view_sql,
    # round 6 (cont.): join_asof_last_error + join_range_value_bands →
    # join_asof_range (freed the slot for tpch_join_panel). The
    # original callables remain above — the union calls them verbatim.
    "join_asof_range": q_join_asof_range,
    "tpch_join_panel": q_tpch_join_panel,
    # round 6 (cont.): quantity_percentiles → grouping_analytics (pct
    # arm; freed the slot for llmops.py::text_chunk_stats)
}

_PRIV_VIEW_SQL_TEMPLATE = """
, gc AS (
    SELECT c_custkey, c_nationkey, c_mktsegment,
           '[' || CAST(CAST(floor(c_acctbal / 2000) AS BIGINT) * 2000 AS VARCHAR)
               || ',' ||
               CAST(CAST(floor(c_acctbal / 2000) AS BIGINT) * 2000 + 2000 AS VARCHAR)
               || ')' AS bal_band
    FROM customer
),
kcl AS (
    SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS cs
    FROM gc GROUP BY 1, 2, 3
)
SELECT 'view' AS kind, status AS k,
       CAST(count(*) AS VARCHAR) || ':' ||
       CAST(count(DISTINCT user_id) AS VARCHAR) AS v
FROM current_state GROUP BY status
UNION ALL
SELECT 'kanon', CAST(gc.c_custkey AS VARCHAR),
       CAST(gc.c_nationkey AS VARCHAR) || ':' || gc.c_mktsegment || ':'
       || gc.bal_band || ':' || CAST(kcl.cs AS VARCHAR)
FROM gc
JOIN kcl ON kcl.c_nationkey = gc.c_nationkey
        AND kcl.c_mktsegment = gc.c_mktsegment
        AND kcl.bal_band = gc.bal_band
WHERE kcl.cs >= 2
UNION ALL
SELECT 'kaud', CAST(c_nationkey AS VARCHAR) || ':' || c_mktsegment,
       CAST(count(*) AS VARCHAR) || ':' ||
       CAST(CAST(count(*) < 12 AS INT) AS VARCHAR)
FROM customer GROUP BY c_nationkey, c_mktsegment
UNION ALL
SELECT 'ldiv', c_mktsegment,
       CAST(count(*) AS VARCHAR) || ':' ||
       CAST(count(DISTINCT c_nationkey) AS VARCHAR) || ':' ||
       CAST(CAST(count(DISTINCT c_nationkey) >= 10 AS INT) AS VARCHAR)
FROM customer GROUP BY c_mktsegment
"""


def _priv_view_oracle() -> str:
    from privacy_cdc_lakehouse_spark.queries.cdc import _LATEST_CTE
    from privacy_cdc_lakehouse_spark.queries.llmops import _duck_hexn

    # seeded-Laplace replay: u = (md5-hex[1:13] int + 1) / 2^52 over
    # md5(salt|segment); noise = -scale * sgn(u-1/2) * ln(1-2|u-1/2|)
    # 6dp (ln-arg clamped at 2^-53); scale = sensitivity/ε = 2 for the
    # count (ε=0.5) and 2e6 cents for the clipped sum (ε=0.5, $10k clip)
    def noise(scale: str) -> str:
        return f"""round(-{scale} * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
                 * ln(greatest(1.1102230246251565e-16,
                               1.0 - 2.0 * abs(u - 0.5))), 6)"""

    dp_sql = f"""
UNION ALL
SELECT 'dp', 'count:' || c_mktsegment,
       CAST(n AS VARCHAR) || ':' ||
       CAST(CAST(round((n + {noise('2.0')}) * 1000000) AS BIGINT) AS VARCHAR)
FROM (
    SELECT c_mktsegment, n,
           (CAST({_duck_hexn(1, 13)} AS BIGINT) + 1) / 4503599627370496.0 AS u
    FROM (
        SELECT c_mktsegment, count(*) AS n,
               md5('dp-count' || '|' || c_mktsegment) AS h
        FROM customer GROUP BY 1
    )
)
UNION ALL
SELECT 'dp', 'sum:' || c_mktsegment,
       CAST(CAST(cs AS BIGINT) AS VARCHAR) || ':' ||
       CAST(CAST(round((cs + {noise('2000000.0')}) * 1000000) AS BIGINT)
            AS VARCHAR)
FROM (
    SELECT c_mktsegment, cs,
           (CAST({_duck_hexn(1, 13)} AS BIGINT) + 1) / 4503599627370496.0 AS u
    FROM (
        SELECT c_mktsegment,
               sum(least(greatest(CAST(round(c_acctbal * 100) AS DOUBLE),
                                  0.0), 1000000.0)) AS cs,
               md5('dp-sum' || '|' || c_mktsegment) AS h
        FROM customer GROUP BY 1
    )
)
UNION ALL
-- dpq replay (round 12): noisy-histogram quantiles — fixed grid
-- [-1000, 10000) x 110 bins, per-bin seeded Laplace(1/0.5), clamp 0,
-- ordered 6dp cumulative, first bin reaching q*total
SELECT 'dpq', m.qq,
       CAST(CAST(round(m.val * 1000000) AS BIGINT) AS VARCHAR)
       || ':' || CAST(CAST(round(m.tot * 1000000) AS BIGINT) AS VARCHAR)
FROM (
    WITH dpq_counts AS MATERIALIZED (
        SELECT CAST(least(floor((least(greatest(CAST(c_acctbal AS DOUBLE),
                                                -1000.0), 10000.0)
                                 - (-1000.0)) / 100.0), 109) AS INT) AS bin,
               count(*) AS n
        FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1
    ),
    dpq_noisy AS MATERIALIZED (
        SELECT bin, greatest(0.0, n0 + {noise('2.0')}) AS dp_n
        FROM (
            SELECT bin, n0,
                   (CAST({_duck_hexn(1, 13)} AS BIGINT) + 1)
                     / 4503599627370496.0 AS u
            FROM (
                SELECT g.bin AS bin, CAST(coalesce(c.n, 0) AS DOUBLE) AS n0,
                       md5('dp-quantile' || '|'
                           || CAST(g.bin AS VARCHAR)) AS h
                FROM (SELECT unnest(generate_series(0, 109)) AS bin) g
                LEFT JOIN dpq_counts c USING (bin)
            )
        )
    ),
    dpq_cum AS MATERIALIZED (
        SELECT bin,
               round(sum(dp_n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW), 6) AS cum
        FROM dpq_noisy
    ),
    dpq_tot AS MATERIALIZED (SELECT cum AS tot FROM dpq_cum WHERE bin = 109)
    SELECT q.qq, round(-1000.0 + (pk.bin + 1) * 100.0, 6) AS val,
           (SELECT tot FROM dpq_tot) AS tot
    FROM (VALUES ('0.25', 0.25), ('0.5', 0.5), ('0.9', 0.9)) q(qq, qv),
         LATERAL (SELECT min(bin) AS bin FROM dpq_cum, dpq_tot
                  WHERE cum >= q.qv * tot) pk
) m
"""
    return (
        _LATEST_CTE + _PRIV_VIEW_SQL_TEMPLATE + dp_sql + "\nORDER BY kind, k"
    )


ORACLES = {
    "q1_pricing_summary": _Q1_SQL,
    "tpch_customer_revenue": _TPCH_CUSTOMER_REVENUE_SQL,
    "q3_top_unshipped": _Q3_SQL,
    "q5_revenue_by_nation": _Q5_SQL,
    "tpch_scalar_aggregates": _SCALAR_AGG_SQL,
    "join_semi_anti": _SEMI_ANTI_SQL,
    "window_analytics": _WINDOW_ANALYTICS_SQL,
    "grouping_analytics": _GROUPING_ANALYTICS_SQL,
    "setops_customer_cohorts": _SETOPS_SQL,
    "events_rollups": _events_rollups_sql(),
    "events_sessionize": _SESSIONIZE_SQL,
    "pandas_zscore_outliers": _ZSCORE_SQL,
    "correlated_subqueries": _CORRELATED_SQL,
    "sql_privacy_view": _priv_view_oracle(),
    "join_asof_range": _ASOF_RANGE_SQL,
    "tpch_join_panel": _TPCH_JOIN_PANEL_SQL,
}
