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
