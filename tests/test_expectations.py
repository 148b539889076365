"""Expectations layer: rule kinds, exact counts, quarantine split,
single-pass plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators import expectations as ex


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "ok", 10.0, 100),
            (2, "ok", -5.0, 100),  # range violation
            (3, None, 50.0, 200),  # null violation
            (3, "bad!", 20.0, 999),  # dup id + regex violation + missing fk
            (4, "ok", 1e9, None),  # range violation (and null fk: NOT a violation)
        ],
        "id long, status string, amount double, cust long",
    )


def _dim(spark):
    return spark.createDataFrame([(100,), (200,)], "c long")


def _rules(spark):
    return [
        ex.expect_not_null("status"),
        ex.expect_in_range("amount", 0.0, 1000.0),
        ex.expect_regex("status", "^[a-z]+$"),
        ex.expect_unique("id"),
        ex.expect_referential("cust", _dim(spark), "c"),
    ]


def test_validate_counts(spark):
    rep = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in ex.validate(_df(spark), _rules(spark)).collect()
    }
    assert rep["not_null_status"] == (1, False)
    assert rep["in_range_amount"] == (2, False)
    # NULL status also fails the regex (FALSE-or-NULL rule)
    assert rep["regex_status"] == (2, False)
    assert rep["unique_id"] == (1, False)  # one extra copy of id 3
    # cust=999 missing; cust=NULL is NOT an FK violation
    assert rep["fk_cust"] == (1, False)


def test_validate_all_pass(spark):
    df = spark.createDataFrame([(1, "ok", 1.0, 100)], "id long, status string, amount double, cust long")
    rep = ex.validate(df, _rules(spark))
    assert rep.filter(~F.col("passed")).count() == 0


def test_quarantine_split_and_reasons(spark):
    rules = [r for r in _rules(spark) if r.kind == "row"]
    valid, invalid = ex.quarantine(_df(spark), rules)
    assert valid.count() == 1 and valid.first()["id"] == 1
    reasons = {
        (r["id"], r["status"]): sorted(r["failed_rules"])
        for r in invalid.collect()
    }
    assert reasons[(2, "ok")] == ["in_range_amount"]
    assert reasons[(3, None)] == ["not_null_status", "regex_status"]
    assert reasons[(3, "bad!")] == ["regex_status"]
    assert reasons[(4, "ok")] == ["in_range_amount"]


def test_quarantine_requires_row_rules(spark):
    import pytest

    with pytest.raises(ValueError):
        ex.quarantine(_df(spark), [ex.expect_unique("id")])
    with pytest.raises(ValueError):
        ex.validate(_df(spark), [])


def test_row_rules_share_one_pass_no_join(spark):
    rules = [r for r in _rules(spark) if r.kind == "row"]
    plan = ex.validate(_df(spark), rules)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Join" not in plan
    # one aggregate pass evaluates every row rule (count tree nodes —
    # formatted mode prints each node again in the detail section)
    assert plan.count("Scan ExistingRDD (") == 1


def test_rule_names_never_parsed_as_sql(spark):
    """Round-10 advice regression: rule names are caller data — names
    carrying quotes/backticks/commas must flow through verbatim, never
    into a SQL parser."""
    hostile = "o'brien's `rule`, stack(1, 'x')"
    rep = ex.validate(
        _df(spark),
        [
            ex.expect_not_null("status", name=hostile),
            ex.expect_in_range("amount", 0.0, 1000.0, name="plain"),
        ],
    ).collect()
    by_name = {r["rule"]: r["n_violations"] for r in rep}
    assert by_name == {hostile: 1, "plain": 2}


def test_duplicate_rule_names_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="duplicate expectation names"):
        ex.validate(
            _df(spark),
            [
                ex.expect_not_null("status", name="r"),
                ex.expect_in_range("amount", 0.0, 1.0, name="r"),
            ],
        )
