"""k-anonymity / l-diversity / generalization (operators/privacy.py) —
the release-side half of the reference's privacy layer (the masking
view is sql_privacy_view / catalog.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators import privacy as pv


def _people(spark):
    # (id, zip3, age_band, disease): class (100, 'a') has 3 members,
    # (100, 'b') 1, (200, 'a') 2; NULL zip3 class has 2.
    return spark.createDataFrame(
        [
            (1, 100, "a", "flu"),
            (2, 100, "a", "flu"),
            (3, 100, "a", "cold"),
            (4, 100, "b", "flu"),
            (5, 200, "a", "cold"),
            (6, 200, "a", "cold"),
            (7, None, "a", "flu"),
            (8, None, "a", "cold"),
        ],
        "id long, zip3 int, age_band string, disease string",
    )


def test_k_anonymize_suppresses_small_classes(spark):
    df = _people(spark)
    out = pv.k_anonymize(df, ["zip3", "age_band"], k=2)
    rows = {r["id"]: r["class_size"] for r in out.collect()}
    # k=2 drops only id 4 (class of 1); the NULL-keyed class of 2 stays
    assert rows == {1: 3, 2: 3, 3: 3, 5: 2, 6: 2, 7: 2, 8: 2}
    # k=3 keeps only the 3-member class
    assert {
        r["id"] for r in pv.k_anonymize(df, ["zip3", "age_band"], 3).collect()
    } == {1, 2, 3}
    # all input columns survive
    assert pv.k_anonymize(df, ["zip3"], 1).columns == [
        "id", "zip3", "age_band", "disease", "class_size",
    ]
    with pytest.raises(ValueError):
        pv.k_anonymize(df, ["zip3"], 0)
    with pytest.raises(ValueError):
        pv.k_anonymize(df, [], 2)


def test_k_anonymity_audit_counts(spark):
    df = _people(spark)
    audit = {
        (r["zip3"], r["age_band"]): (r["n"], r["is_suppressed"])
        for r in pv.k_anonymity_audit(df, ["zip3", "age_band"], 2).collect()
    }
    assert audit == {
        (100, "a"): (3, False),
        (100, "b"): (1, True),
        (200, "a"): (2, False),
        (None, "a"): (2, False),
    }


def test_l_diversity_audit(spark):
    df = _people(spark)
    got = {
        (r["zip3"], r["age_band"]): (r["n"], r["n_sensitive"], r["is_l_diverse"])
        for r in pv.l_diversity_audit(
            df, ["zip3", "age_band"], "disease", 2
        ).collect()
    }
    # (200,'a') is 2-anonymous but NOT 2-diverse (homogeneous 'cold')
    assert got[(200, "a")] == (2, 1, False)
    assert got[(100, "a")] == (3, 2, True)
    assert got[(100, "b")] == (1, 1, False)
    assert got[(None, "a")] == (2, 2, True)
    with pytest.raises(ValueError):
        pv.l_diversity_audit(df, ["zip3"], "disease", 0)


def test_generalize_numeric_labels(spark):
    df = spark.createDataFrame(
        [(1, 34.5), (2, -0.01), (3, 1000.0), (4, None), (5, 999.99)],
        "id long, bal double",
    )
    got = {
        r["id"]: r["g"]
        for r in df.select(
            "id", pv.generalize_numeric(F.col("bal"), 1000).alias("g")
        ).collect()
    }
    assert got == {
        1: "[0,1000)",
        2: "[-1000,0)",
        3: "[1000,2000)",
        4: None,
        5: "[0,1000)",
    }
    with pytest.raises(ValueError):
        pv.generalize_numeric(F.col("bal"), 0)


def test_k_anonymize_plan_no_corpus_window(spark):
    """The class table comes from ONE aggregate and joins back —
    never a corpus-wide window; at fixture scale AQE broadcasts it."""
    df = _people(spark)
    out = pv.k_anonymize(df, ["zip3", "age_band"], 2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "CartesianProduct" not in plan


# ------------------------- differential privacy -------------------------


def _py_laplace(key: str, scale: float, salt: str) -> float:
    import hashlib
    import math

    h = hashlib.md5(f"{salt}|{key}".encode()).hexdigest()
    u = (int(h[:13], 16) + 1) / 2.0**52
    mag = max(2.0**-53, 1.0 - 2.0 * abs(u - 0.5))
    sign = 1.0 if u >= 0.5 else -1.0
    return round(-scale * sign * math.log(mag), 6)


def test_laplace_noise_matches_python_replay(spark):
    from pyspark.sql import functions as F

    keys = [("a",), ("b",), ("longer-key-17",), ("0",)]
    df = spark.createDataFrame(keys, "k string")
    got = {
        r["k"]: r["noise"]
        for r in df.select(
            "k", pv.laplace_noise(F.col("k"), 2.5, salt="t").alias("noise")
        ).collect()
    }
    for (k,) in keys:
        assert got[k] == _py_laplace(k, 2.5, "t")


def test_dp_count_adds_seeded_noise(spark):
    rows = [("a",)] * 7 + [("b",)] * 3
    df = spark.createDataFrame(rows, "g string")
    got = {r["g"]: r for r in pv.dp_count(df, ["g"], epsilon=0.5).collect()}
    assert got["a"]["n"] == 7 and got["b"]["n"] == 3
    assert got["a"]["dp_n"] == 7 + _py_laplace("a", 2.0, "dp-count")
    assert got["b"]["dp_n"] == 3 + _py_laplace("b", 2.0, "dp-count")
    # deterministic: a second run releases the identical values
    again = {r["g"]: r["dp_n"] for r in pv.dp_count(df, ["g"], epsilon=0.5).collect()}
    assert again == {g: r["dp_n"] for g, r in got.items()}


def test_dp_sum_clips_before_summing(spark):
    rows = [("a", 5.0), ("a", 500.0), ("a", -50.0)]  # clip to [0, 100]
    df = spark.createDataFrame(rows, "g string, v double")
    got = pv.dp_sum(df, ["g"], "v", lo=0.0, hi=100.0, epsilon=1.0).first()
    assert got["clipped_sum"] == 105.0  # 5 + 100 + 0
    assert got["dp_sum"] == 105.0 + _py_laplace("a", 100.0, "dp-sum")


def test_dp_validation_errors(spark):
    import pytest

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        pv.dp_count(df, ["g"], epsilon=0.0)
    with pytest.raises(ValueError):
        pv.dp_count(df, [], epsilon=1.0)
    with pytest.raises(ValueError):
        pv.dp_sum(df, ["g"], "v", lo=5.0, hi=5.0, epsilon=1.0)


def test_dp_null_group_gets_sentinel_seed(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(None, 1), ("x", 1)], "g string, v int"
    )
    got = {
        r["g"]: r["dp_n"] for r in pv.dp_count(df, ["g"], epsilon=1.0).collect()
    }
    assert got[None] == 1 + _py_laplace("\x00", 1.0, "dp-count")
    assert got["x"] == 1 + _py_laplace("x", 1.0, "dp-count")


# --- dp_quantile --------------------------------------------------------------


def _py_laplace(key: str, scale: float, salt: str) -> float:
    import hashlib
    import math

    u = (int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:13], 16) + 1) / 2**52
    mag = max(2.0**-53, 1.0 - 2.0 * abs(u - 0.5))
    sign = 1.0 if u >= 0.5 else -1.0
    return round(-scale * sign * math.log(mag), 6)


def test_dp_quantile_matches_python_replay(spark):
    import math

    vals = [float(v) for v in range(0, 1000, 7)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    lo, hi, nb, eps = 0.0, 1000.0, 50, 0.5
    out = {
        r["q"]: (r["value"], r["dp_total"])
        for r in pv.dp_quantile(
            df, "x", [0.25, 0.5, 0.9], lo, hi, n_bins=nb, epsilon=eps
        ).collect()
    }
    # python replay of the pinned mechanism
    width = (hi - lo) / nb
    counts = [0] * nb
    for v in vals:
        counts[min(int((min(max(v, lo), hi) - lo) // width), nb - 1)] += 1
    noisy = [
        max(0.0, c + _py_laplace(str(i), 1.0 / eps, "dp-quantile"))
        for i, c in enumerate(counts)
    ]
    cum, acc = [], 0.0
    for x in noisy:
        acc += x
        cum.append(round(acc, 6))
    tot = cum[-1]
    for q in (0.25, 0.5, 0.9):
        b = next(i for i, c in enumerate(cum) if c >= q * tot)
        want = round(lo + (b + 1) * width, 6)
        assert out[q][0] == want
        assert math.isclose(out[q][1], round(tot, 6), abs_tol=1e-9)


def test_dp_quantile_accuracy_at_high_epsilon(spark):
    # eps=1000 -> noise ~ 0.001: quantiles land within one bin of truth
    df = spark.range(10_000).selectExpr("CAST(id AS DOUBLE) AS x")
    out = {
        r["q"]: r["value"]
        for r in pv.dp_quantile(
            df, "x", [0.5, 0.9], 0.0, 10_000.0, n_bins=100, epsilon=1000.0
        ).collect()
    }
    assert abs(out[0.5] - 5000.0) <= 100.0
    assert abs(out[0.9] - 9000.0) <= 100.0


def test_dp_quantile_releases_empty_bins_and_validates(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(5.0,)] * 10, "x double")
    # all mass in one bin; total = 10 + sum of ALL 10 bins' noise
    out = pv.dp_quantile(df, "x", [1.0], 0.0, 100.0, n_bins=10, epsilon=2.0)
    row = out.collect()[0]
    exp_tot = 0.0
    for i in range(10):
        exp_tot += max(
            0.0, (10 if i == 0 else 0) + _py_laplace(str(i), 0.5, "dp-quantile")
        )
    assert abs(row["dp_total"] - round(exp_tot, 6)) < 1e-4
    with _pytest.raises(ValueError, match="epsilon"):
        pv.dp_quantile(df, "x", [0.5], 0.0, 1.0, epsilon=0.0)
    with _pytest.raises(ValueError, match="quantiles"):
        pv.dp_quantile(df, "x", [1.5], 0.0, 1.0)
    with _pytest.raises(ValueError, match="hi > lo"):
        pv.dp_quantile(df, "x", [0.5], 1.0, 1.0)
