"""Drift metrics: PSI / categorical PSI / binned KS / drift_report —
hand-replayed values, edge cases, plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators import drift

_EPS = 1e-6


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "value double")


def _py_shares(ref, cur, n_bins):
    lo, hi = min(ref), max(ref)
    width = (hi - lo) / n_bins if hi > lo else None
    shares = {}
    for side, xs in (("ref", ref), ("cur", cur)):
        counts = [0] * n_bins
        for x in xs:
            b = 0 if width is None else min(n_bins - 1, max(0, math.floor((x - lo) / width)))
            counts[b] += 1
        shares[side] = [c / len(xs) for c in counts]
    return shares


def _py_psi(ref, cur, n_bins):
    s = _py_shares(ref, cur, n_bins)
    return round(
        sum(
            (max(q, _EPS) - max(p, _EPS)) * math.log(max(q, _EPS) / max(p, _EPS))
            for p, q in zip(s["ref"], s["cur"])
        ),
        6,
    )


def _py_ks(ref, cur, n_bins):
    s = _py_shares(ref, cur, n_bins)
    d, ca, cb = 0.0, 0.0, 0.0
    for p, q in zip(s["ref"], s["cur"]):
        ca += p
        cb += q
        d = max(d, abs(ca - cb))
    return round(d, 6)


def test_psi_identical_distributions_is_zero(spark):
    xs = list(range(100))
    assert drift.psi(_vals(spark, xs), _vals(spark, xs), "value").first()["psi"] == 0.0


def test_psi_matches_python_replay(spark):
    ref = list(range(10))  # uniform over 10 bins
    cur = [9.0] * 10  # everything in the last bin
    got = drift.psi(_vals(spark, ref), _vals(spark, cur), "value", n_bins=10).first()["psi"]
    assert got == _py_psi(ref, cur, 10)
    assert got > 0.25  # a full collapse is an action-level shift


def test_psi_out_of_range_current_clamps_to_edge_bins(spark):
    ref = list(range(10))
    cur = [-50.0, -50.0, 100.0]  # outside the reference range entirely
    got = drift.psi(_vals(spark, ref), _vals(spark, cur), "value", n_bins=5).first()["psi"]
    assert got == _py_psi(ref, [0.0, 0.0, 9.0], 5)  # clamped == edge values


def test_ks_matches_python_replay_and_shift_direction(spark):
    ref = list(range(10))
    cur = [x + 5 for x in range(10)]
    got = drift.ks_statistic(
        _vals(spark, ref), _vals(spark, cur), "value", n_bins=10
    ).first()["ks"]
    assert got == _py_ks(ref, cur, 10)
    assert 0.0 < got <= 1.0


def test_ks_identical_is_zero(spark):
    xs = [1.0, 2.0, 2.0, 5.0]
    assert (
        drift.ks_statistic(_vals(spark, xs), _vals(spark, xs), "value").first()["ks"]
        == 0.0
    )


def test_categorical_psi(spark):
    ref = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, "c string")
    cur = spark.createDataFrame([("a",)] * 2 + [("b",)] * 8, "c string")
    got = drift.categorical_psi(ref, cur, "c").first()["psi"]
    expected = round(
        (0.2 - 0.8) * math.log(0.2 / 0.8) + (0.8 - 0.2) * math.log(0.8 / 0.2), 6
    )
    assert got == expected


def test_categorical_psi_unseen_category_smoothed(spark):
    ref = spark.createDataFrame([("a",)] * 10, "c string")
    cur = spark.createDataFrame([("a",)] * 5 + [("z",)] * 5, "c string")
    got = drift.categorical_psi(ref, cur, "c").first()["psi"]
    expected = round(
        (0.5 - 1.0) * math.log(0.5 / 1.0) + (0.5 - _EPS) * math.log(0.5 / _EPS), 6
    )
    assert got == expected


def test_constant_reference_degenerates_to_single_bin(spark):
    ref = [3.0] * 10
    cur = [3.0] * 7
    assert drift.psi(_vals(spark, ref), _vals(spark, cur), "value").first()["psi"] == 0.0


def test_drift_report_coarsening_matches_standalone_psi(spark):
    ref = [float(x % 17) for x in range(200)]
    cur = [float((x * 7) % 23) for x in range(150)]
    rep = {
        r["metric"]: r["value"]
        for r in drift.drift_report(
            _vals(spark, ref), _vals(spark, cur), "value", n_bins=10, ks_bins=100
        ).collect()
    }
    assert rep["psi"] == drift.psi(
        _vals(spark, ref), _vals(spark, cur), "value", n_bins=10
    ).first()["psi"]
    assert rep["ks"] == drift.ks_statistic(
        _vals(spark, ref), _vals(spark, cur), "value", n_bins=100
    ).first()["ks"]
    assert rep["n_ref"] == 200.0 and rep["n_cur"] == 150.0
    assert rep["mean_ref"] == round(sum(ref) / len(ref), 6)
    import statistics

    assert rep["std_cur"] == round(statistics.stdev(cur), 6)


def test_drift_report_rejects_non_multiple_grids(spark):
    import pytest

    with pytest.raises(ValueError):
        drift.drift_report(
            _vals(spark, [1.0]), _vals(spark, [1.0]), "value", n_bins=7, ks_bins=100
        )


def test_drift_plan_no_cartesian_no_corpus_window(spark):
    ref, cur = _vals(spark, range(50)), _vals(spark, range(50))
    plan = drift.drift_report(ref, cur, "value")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    # the only non-equi join is the broadcast 1-row bounds scalar
    assert "BroadcastNestedLoopJoin" in plan


def test_empty_current_side_does_not_raise(spark):
    """An empty comparison side must degrade (NULL-share smoothing /
    NULL KS), never trip an ANSI divide-by-zero."""
    ref = _vals(spark, range(10))
    cur = _vals(spark, []).filter("value IS NOT NULL")  # empty frame
    got = drift.psi(ref, cur, "value").first()["psi"]
    assert got is not None  # smoothing floors the empty side at eps
    ks = drift.ks_statistic(ref, cur, "value").first()["ks"]
    assert ks is None  # no current distribution to compare


def test_divergence_metrics_properties(spark):
    """JS is symmetric, 0 for identical samples, bounded by ln 2;
    TV in [0,1]; chi2 = 0 iff identical; all ride the report."""
    import math

    from privacy_cdc_lakehouse_spark.operators import drift as dr

    a = spark.createDataFrame([(float(i % 10),) for i in range(200)], "v double")
    b = spark.createDataFrame([(float(i % 10) + 5.0,) for i in range(200)], "v double")
    same = {
        r["metric"]: r["value"]
        for r in dr.drift_report(a, a, "v", n_bins=10, ks_bins=100).collect()
    }
    assert same["js"] == 0.0 and same["chi2"] == 0.0 and same["tv"] == 0.0
    moved = {
        r["metric"]: r["value"]
        for r in dr.drift_report(a, b, "v", n_bins=10, ks_bins=100).collect()
    }
    assert 0.0 < moved["js"] <= math.log(2) + 1e-9
    assert 0.0 < moved["tv"] <= 1.0
    assert moved["chi2"] > 0.0
    # symmetry of JS and TV: bins anchor on the REFERENCE side, so
    # reverse REPORT runs use a different grid — symmetry holds only on
    # a shared grid; check via the standalone helpers on
    # identical-range samples (the old reverse-report collect here was
    # dead: its result was never asserted)
    b2 = spark.createDataFrame(
        [(float(9 - (i % 10)),) for i in range(200)], "v double"
    )
    js_ab = dr.js_divergence(a, b2, "v").collect()[0]["js"]
    js_ba = dr.js_divergence(b2, a, "v").collect()[0]["js"]
    assert js_ab == js_ba
    chi = dr.chi_square_drift(a, b2, "v").collect()[0]["chi2"]
    assert chi >= 0.0


def test_ks_pvalue_two_sided_matches_python_and_clamps(spark):
    """ks_pvalue is the asymptotic TWO-SIDED two-sample p-value —
    leading Kolmogorov term 2*exp(-2 D^2 nm/(n+m)) clamped to 1 (the
    round-11 form lacked the factor 2: the one-sided/DKW bound)."""
    import math

    ref = [float(x % 17) for x in range(200)]
    cur = [float((x * 7) % 23) for x in range(150)]
    rep = {
        r["metric"]: r["value"]
        for r in drift.drift_report(
            _vals(spark, ref), _vals(spark, cur), "value", n_bins=10, ks_bins=100
        ).collect()
    }
    d, n, m = rep["ks"], 200.0, 150.0
    expect = round(min(1.0, 2.0 * math.exp(-2.0 * d * d * n * m / (n + m))), 6)
    assert rep["ks_pvalue"] == expect and 0.0 < rep["ks_pvalue"] <= 1.0
    # identical samples: D = 0 -> 2*exp(0) = 2, clamped to exactly 1
    same = {
        r["metric"]: r["value"]
        for r in drift.drift_report(
            _vals(spark, ref), _vals(spark, ref), "value", n_bins=10, ks_bins=100
        ).collect()
    }
    assert same["ks"] == 0.0 and same["ks_pvalue"] == 1.0


def test_wasserstein1_properties(spark):
    """W1 is 0 for identical samples, symmetric, bounded by 1 on the
    normalized grid, and equals TV=1-like full separation when all
    mass moves across the whole range; shift sensitivity: a small
    shift moves W1 but barely moves KS-insensitive mass metrics."""
    import pyspark.sql.functions as F  # noqa: F811

    _memo = {}

    def rep(a, b):
        # the same (a, b) pair is asserted against three times below —
        # one drift_report collect per DISTINCT pair keeps this
        # property test off the suite's critical path
        key = (tuple(a), tuple(b))
        if key not in _memo:
            _memo[key] = {
                r["metric"]: r["value"]
                for r in drift.drift_report(
                    _vals(spark, a), _vals(spark, b), "value",
                    n_bins=10, ks_bins=100,
                ).collect()
            }
        return _memo[key]

    a = [float(x % 13) for x in range(150)]
    same = rep(a, a)
    assert same["w1"] == 0.0
    # symmetry holds when both orderings share the grid (the grid is
    # reference-anchored, so same-range samples are required)
    b = [float((x * 5) % 13) for x in range(110)]
    assert rep(a, b)["w1"] == rep(b, a)["w1"] > 0.0
    assert 0.0 <= rep(a, b)["w1"] <= 1.0
    # python replay on the quantized grid (ref-anchored bins over a)
    lo, hi = min(a), max(a)
    nb = 100
    w = (hi - lo) / nb

    def binof(v):
        return min(int((v - lo) / w), nb - 1) if w > 0 else 0

    pa = [0.0] * nb
    pb = [0.0] * nb
    for v in a:
        pa[binof(v)] += 1 / len(a)
    for v in b:
        if lo <= v <= hi:
            pb[binof(v)] += 1 / len(b)
    # out-of-range cur values: binned_histogram clamps into edge bins
    for v in b:
        if v < lo:
            pb[0] += 1 / len(b)
        elif v > hi:
            pb[nb - 1] += 1 / len(b)
    ca = cb = 0.0
    acc = 0.0
    for i in range(nb):
        ca += pa[i]
        cb += pb[i]
        acc += abs(ca - cb)
    assert abs(rep(a, b)["w1"] - round(acc / nb, 6)) <= 1e-6
