"""Count-min sketch: never-undercount + bounded-overcount guarantees,
exact merge associativity, weights, collisions, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators import sketch as sk


def _items(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "item string")


def test_estimate_never_undercounts_and_is_exact_when_wide(spark):
    xs = ["a"] * 5 + ["b"] * 3 + ["c"]
    s = sk.cms_build(_items(spark, xs), "item", depth=4, width=4096)
    probes = _items(spark, ["a", "b", "c", "zzz"])
    got = {r["item"]: r["estimate"] for r in sk.cms_lookup(s, probes, "item", 4, 4096).collect()}
    # 3 distinct items in 4096 buckets across 4 rows: collisions are
    # vanishingly unlikely AND deterministic — exact equality holds
    assert got == {"a": 5, "b": 3, "c": 1, "zzz": 0}


def test_overcount_bounded_by_total_over_width(spark):
    import random

    rng = random.Random(7)
    xs = [f"item{rng.randrange(200)}" for _ in range(2000)]
    truth = {}
    for x in xs:
        truth[x] = truth.get(x, 0) + 1
    depth, width = 4, 16  # tiny width forces collisions
    s = sk.cms_build(_items(spark, xs), "item", depth, width)
    got = {
        r["item"]: r["estimate"]
        for r in sk.cms_lookup(
            s, _items(spark, sorted(truth)), "item", depth, width
        ).collect()
    }
    overs = 0
    for item, n in truth.items():
        assert got[item] >= n  # NEVER undercounts
        assert got[item] <= n + len(xs)  # trivial sanity ceiling
        overs += got[item] > n
    assert overs > 0  # width 16 with 200 items must collide somewhere
    # the classic bound eps = e/width holds in expectation; with the
    # min over 4 independent rows the mean overcount must be well
    # under one row's expected collision mass
    mean_over = sum(got[i] - truth[i] for i in truth) / len(truth)
    assert mean_over <= len(xs) / width


def test_merge_equals_build_of_union(spark):
    a = ["x"] * 3 + ["y"]
    b = ["x", "z", "z"]
    sa = sk.cms_build(_items(spark, a), "item", 3, 64)
    sb = sk.cms_build(_items(spark, b), "item", 3, 64)
    merged = sk.cms_merge(sa, sb)
    full = sk.cms_build(_items(spark, a + b), "item", 3, 64)
    m = {(r["row"], r["bucket"]): r["c"] for r in merged.collect()}
    f = {(r["row"], r["bucket"]): r["c"] for r in full.collect()}
    assert m == f


def test_weighted_build(spark):
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 2)], "item string, w int")
    s = sk.cms_build(df, "item", 2, 256, weight_col="w")
    got = {
        r["item"]: r["estimate"]
        for r in sk.cms_lookup(s, _items(spark, ["a", "b"]), "item", 2, 256).collect()
    }
    assert got == {"a": 15, "b": 2}


def test_null_items_skipped_and_validation(spark):
    import pytest

    df = spark.createDataFrame([("a",), (None,)], "item string")
    s = sk.cms_build(df, "item", 2, 64)
    assert s.agg(F.sum("c")).first()[0] == 2  # only 'a', in 2 rows
    with pytest.raises(ValueError):
        sk.cms_build(df, "item", 0, 64)
    with pytest.raises(ValueError):
        sk.cms_merge()


def test_sketch_plan_is_one_aggregate_no_join(spark):
    s = sk.cms_build(_items(spark, ["a"]), "item", 4, 1024)
    plan = s._jdf.queryExecution().explainString(
        s.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Join" not in plan and "Window" not in plan
    assert "HashAggregate" in plan and "Generate" in plan


# ---------------------- HLL distinct-count store ------------------------


def test_hll_store_merge_equals_full_build(spark):
    df = spark.range(5000).selectExpr("id % 700 AS x", "id % 4 AS g")
    a, b = df.filter("id < 2500"), df.filter("id >= 2500")
    merged = sk.hll_store_merge(
        sk.hll_store_build(a, ["g"], "x"), sk.hll_store_build(b, ["g"], "x")
    )
    full = sk.hll_store_build(df, ["g"], "x")
    m = {r["g"]: r["n_distinct_est"] for r in sk.hll_store_estimate(merged).collect()}
    f = {r["g"]: r["n_distinct_est"] for r in sk.hll_store_estimate(full).collect()}
    assert m == f  # register-wise union == build of the union


def test_hll_estimate_within_tolerance_of_exact(spark):
    df = spark.range(20000).selectExpr("id % 3123 AS x", "id % 2 AS g")
    est = {
        r["g"]: r["n_distinct_est"]
        for r in sk.hll_store_estimate(sk.hll_store_build(df, ["g"], "x")).collect()
    }
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(
            F.countDistinct("x").alias("n")
        ).collect()
    }
    for g in exact:
        assert abs(est[g] / exact[g] - 1.0) < 0.05  # lg_k=12 → ~1.6% rse


def test_hll_store_validation(spark):
    import pytest

    df = spark.range(5).selectExpr("id AS x", "id % 2 AS g")
    with pytest.raises(ValueError):
        sk.hll_store_build(df, [], "x")
    with pytest.raises(ValueError):
        sk.hll_store_merge()


def test_hist_sketch_quantiles_and_merge(spark):
    """Fixed-grid histogram sketch: quantiles within one bin width of
    the truth; merge == single build over the union; out-of-range
    values land in the under/overflow bins and clamp quantile answers
    to [lo, hi]; validation errors."""
    import pytest
    from pyspark.sql import functions as F

    from privacy_cdc_lakehouse_spark.operators import sketch as sk

    vals = [float(x) for x in range(1000)]  # uniform 0..999
    a = spark.createDataFrame([(v,) for v in vals[:500]], "v double")
    b = spark.createDataFrame([(v,) for v in vals[500:]], "v double")
    both = spark.createDataFrame([(v,) for v in vals], "v double")
    lo, hi, nb = 0.0, 1000.0, 100

    merged = sk.hist_sketch_merge(
        sk.hist_sketch_build(a, "v", lo, hi, nb),
        sk.hist_sketch_build(b, "v", lo, hi, nb),
    )
    single = sk.hist_sketch_build(both, "v", lo, hi, nb)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, single.collect())
    )
    qs = [0.5, 0.9, 0.99]
    got = {
        r["q"]: r["value"]
        for r in sk.hist_sketch_quantile(merged, qs, lo, hi, nb).collect()
    }
    for q in qs:
        truth = q * 1000.0
        assert abs(got[q] - truth) <= 1000.0 / nb + 1e-6, (q, got[q])

    # out-of-range values: underflow/overflow bins, clamped answers
    wild = spark.createDataFrame(
        [(-50.0,), (2000.0,), (500.0,)], "v double"
    )
    swild = sk.hist_sketch_build(wild, "v", lo, hi, nb)
    bins = {r["bin"]: r["n"] for r in swild.collect()}
    assert bins[-1] == 1 and bins[nb] == 1
    qw = {
        r["q"]: r["value"]
        for r in sk.hist_sketch_quantile(
            swild, [0.2, 1.0], lo, hi, nb
        ).collect()
    }
    assert qw[0.2] == lo and qw[1.0] == hi

    # wrong-grid reads fail loudly on the stamp (lsh_index discipline)
    with pytest.raises(Exception, match="grid stamp"):
        sk.hist_sketch_quantile(single, [0.5], lo, 500.0, nb).collect()
    with pytest.raises(ValueError, match="stamp columns"):
        sk.hist_sketch_quantile(single.select("bin", "n"), [0.5], lo, hi, nb)
    with pytest.raises(ValueError, match="n_bins"):
        sk.hist_sketch_build(a, "v", lo, hi, 0)
    with pytest.raises(ValueError, match="hi > lo"):
        sk.hist_sketch_build(a, "v", 5.0, 5.0)
    with pytest.raises(ValueError, match="qs"):
        sk.hist_sketch_quantile(single, [0.0], lo, hi, nb)
    with pytest.raises(ValueError, match="sketch"):
        sk.hist_sketch_merge()


def test_bloom_no_false_negatives_merge_and_fp_rate(spark):
    """Bloom filter: every inserted item tests positive (no false
    negatives — the Bloom contract); merge == single build; the FP
    rate on disjoint probes sits near the classic (1-e^(-kn/m))^k;
    validation errors."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from privacy_cdc_lakehouse_spark.operators import sketch as sk

    n, m_bits, k = 300, 4096, 4
    items = spark.range(n).select(F.col("id").alias("item"))
    a = items.filter(F.col("item") % 2 == 0)
    b = items.filter(F.col("item") % 2 == 1)
    merged = sk.bloom_merge(
        sk.bloom_build(a, "item", m_bits, k),
        sk.bloom_build(b, "item", m_bits, k),
    )
    single = sk.bloom_build(items, "item", m_bits, k)
    assert sorted(r["pos"] for r in merged.collect()) == sorted(
        r["pos"] for r in single.collect()
    )
    # no false negatives
    got = sk.bloom_might_contain(single, items, "item", m_bits, k)
    assert got.filter(~F.col("might_contain")).count() == 0
    # FP rate on 2000 disjoint probes near theory (generous bound)
    probes = spark.range(10_000, 12_000).select(F.col("id").alias("item"))
    fp = (
        sk.bloom_might_contain(single, probes, "item", m_bits, k)
        .filter(F.col("might_contain"))
        .count()
    )
    theory = (1.0 - math.exp(-k * n / m_bits)) ** k
    assert fp / 2000.0 <= 4 * theory + 0.01, (fp, theory)
    # NULL probe item: explicit false (build skips NULLs, so a NULL
    # is definitively absent — never a NULL boolean)
    nullp = spark.createDataFrame(
        [(None,), (5,)], "item long"
    )
    gotn = {r["item"]: r["might_contain"]
            for r in sk.bloom_might_contain(single, nullp, "item", m_bits, k).collect()}
    assert gotn[None] is False and gotn[5] is True
    # wrong-param probes fail loudly on the stamp
    with pytest.raises(Exception, match="param stamp"):
        sk.bloom_might_contain(single, items, "item", 2048, k).collect()
    with pytest.raises(ValueError, match="stamp columns"):
        sk.bloom_might_contain(single.select("pos"), items, "item", m_bits, k)
    with pytest.raises(ValueError, match="m_bits"):
        sk.bloom_build(items, "item", 1, 4)
    with pytest.raises(ValueError, match="filter"):
        sk.bloom_merge()


# --- KMV / theta sketch ------------------------------------------------------

import hashlib as _hashlib

from privacy_cdc_lakehouse_spark.operators.sketch import (
    KMV_SPACE,
    kmv_build,
    kmv_distinct_estimate,
    kmv_intersect_estimate,
    kmv_merge,
)


def _py_kmv_hash(item) -> int:
    return int(_hashlib.md5(f"kmv|{item}".encode()).hexdigest()[:13], 16)


def _items_df(spark, items):
    return spark.createDataFrame([(i,) for i in items], "item string")


def test_kmv_hash_matches_python_reference(spark):
    items = [f"doc{i}" for i in range(20)]
    got = sorted(
        r["hv"] for r in kmv_build(_items_df(spark, items), "item", k=64).collect()
    )
    want = sorted(_py_kmv_hash(i) for i in items)
    assert got == want  # unsaturated: sketch IS the hash set


def test_kmv_merge_equals_full_build(spark):
    items = [f"x{i}" for i in range(500)]
    full = kmv_build(_items_df(spark, items), "item", k=32)
    halves = kmv_merge(
        kmv_build(_items_df(spark, items[:300]), "item", k=32),
        kmv_build(_items_df(spark, items[250:]), "item", k=32),
        k=32,
    )
    assert sorted(r["hv"] for r in full.collect()) == sorted(
        r["hv"] for r in halves.collect()
    )


def test_kmv_estimate_exact_when_unsaturated(spark):
    items = [f"y{i}" for i in range(40)] * 3  # dups collapse
    est = kmv_distinct_estimate(
        kmv_build(_items_df(spark, items), "item", k=64), k=64
    ).collect()[0]
    assert est["exact"] is True
    assert est["n_est"] == 40.0


def test_kmv_estimate_tolerance_when_saturated(spark):
    n = 5000
    est = kmv_distinct_estimate(
        kmv_build(_items_df(spark, [f"z{i}" for i in range(n)]), "item", k=256),
        k=256,
    ).collect()[0]
    assert est["exact"] is False
    assert abs(est["n_est"] / n - 1.0) < 0.25  # ~1/sqrt(254) expected


def test_kmv_intersection_exact_regime(spark):
    a = [f"k{i}" for i in range(30)]
    b = [f"k{i}" for i in range(20, 50)]  # overlap = 10
    out = kmv_intersect_estimate(
        kmv_build(_items_df(spark, a), "item", k=64),
        kmv_build(_items_df(spark, b), "item", k=64),
        k=64,
    ).collect()[0]
    assert out["n_common"] == 10
    assert out["n_est"] == 10.0


def test_kmv_intersection_estimate_saturated(spark):
    a = [f"m{i}" for i in range(4000)]
    b = [f"m{i}" for i in range(2000, 6000)]  # true overlap = 2000
    out = kmv_intersect_estimate(
        kmv_build(_items_df(spark, a), "item", k=256),
        kmv_build(_items_df(spark, b), "item", k=256),
        k=256,
    ).collect()[0]
    assert abs(out["n_est"] / 2000 - 1.0) < 0.35


def test_kmv_stamp_mismatch_fails_loudly(spark):
    import pytest as _pytest

    sk = kmv_build(_items_df(spark, ["a", "b", "c"]), "item", k=16)
    with _pytest.raises(Exception, match="param stamp"):
        kmv_distinct_estimate(sk, k=32).collect()


def test_kmv_disjoint_intersection_is_zero(spark):
    out = kmv_intersect_estimate(
        kmv_build(_items_df(spark, [f"p{i}" for i in range(2000)]), "item", k=64),
        kmv_build(_items_df(spark, [f"q{i}" for i in range(2000)]), "item", k=64),
        k=64,
    ).collect()[0]
    # saturated sketches of disjoint sets: common-below-theta is 0 with
    # overwhelming probability at 52-bit hashes
    assert out["n_est"] == 0.0
