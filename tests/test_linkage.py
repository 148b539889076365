"""Record linkage: blocking passes, field scoring, best-match
resolution, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators import linkage as lk


def _left(spark):
    return spark.createDataFrame(
        [
            (1, "alice smith", "A", 100.0),
            (2, "bob jones", "A", 50.0),
            (3, "carol doe", "B", 70.0),
        ],
        "lid long, name string, seg string, bal double",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (10, "alice smitX", "A", 102.0),  # near-dup of 1
            (11, "bob jones", "A", 50.0),  # exact dup of 2
            (12, "zelda none", "B", 999.0),  # matches nobody well
            (13, "carol doe", None, 70.0),  # NULL block key
        ],
        "rid long, name string, seg string, bal double",
    )


_FEATURES = [
    lk.Feature("name", "name", "name", "edit", 0.6),
    lk.Feature("seg", "seg", "seg", "exact", 0.1),
    lk.Feature("bal", "bal", "bal", "numeric", 0.3, scale=100.0),
]


def test_blocking_single_pass_and_null_keys(spark):
    cands = lk.blocked_candidates(
        _left(spark), _right(spark), [("seg", "seg")], "lid", "rid"
    )
    got = {(r["id_l"], r["id_r"]) for r in cands.collect()}
    # within-segment cross products; the NULL-seg record blocks nowhere
    assert got == {(1, 10), (1, 11), (2, 10), (2, 11), (3, 12)}


def test_blocking_multi_pass_unions_and_dedups(spark):
    cands = lk.blocked_candidates(
        _left(spark),
        _right(spark),
        [[("seg", "seg")], [("name", "name")]],
        "lid",
        "rid",
    )
    got = {(r["id_l"], r["id_r"]) for r in cands.collect()}
    # the name pass recovers the NULL-seg exact-name match (3, 13) and
    # re-finds (2, 11) without duplicating it
    assert got == {(1, 10), (1, 11), (2, 10), (2, 11), (3, 12), (3, 13)}


def test_scoring_feature_math(spark):
    cands = lk.blocked_candidates(
        _left(spark), _right(spark), [("seg", "seg")], "lid", "rid"
    )
    scored = lk.score_candidates(
        cands, _left(spark), _right(spark), _FEATURES, "lid", "rid",
        threshold=0.9,
    )
    got = {(r["id_l"], r["id_r"]): r for r in scored.collect()}
    exact = got[(2, 11)]
    assert exact["sim_name"] == 1.0 and exact["sim_seg"] == 1.0
    assert exact["score"] == 1.0 and exact["is_match"]
    near = got[(1, 10)]
    # 'alice smith' vs 'alice smitX': lev 1 over max-len 11
    assert abs(near["sim_name"] - (1 - 1 / 11)) < 1e-9
    assert near["sim_bal"] == 1.0 - 2.0 / 100.0
    expected = round((0.6 * (1 - 1 / 11) + 0.1 * 1.0 + 0.3 * 0.98), 6)
    assert near["score"] == expected and near["is_match"]
    assert not got[(3, 12)]["is_match"]  # zelda matches nobody


def test_resolution_keeps_best_per_right_record(spark):
    cands = lk.blocked_candidates(
        _left(spark), _right(spark), [("seg", "seg")], "lid", "rid"
    )
    scored = lk.score_candidates(
        cands, _left(spark), _right(spark), _FEATURES, "lid", "rid"
    )
    best = {r["id_r"]: r["id_l"] for r in lk.resolve_best_matches(scored).collect()}
    assert best == {10: 1, 11: 2, 12: 3}


def test_resolution_tie_breaks_on_left_id(spark):
    scored = spark.createDataFrame(
        [(5, 100, 0.9), (3, 100, 0.9)], "id_l long, id_r long, score double"
    )
    got = lk.resolve_best_matches(scored).collect()
    assert len(got) == 1 and got[0]["id_l"] == 3


def test_linkage_plan_no_cartesian(spark):
    cands = lk.blocked_candidates(
        _left(spark), _right(spark), [("seg", "seg")], "lid", "rid"
    )
    scored = lk.score_candidates(
        cands, _left(spark), _right(spark), _FEATURES, "lid", "rid"
    )
    plan = lk.resolve_best_matches(scored)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "Window" in plan  # per-right-record resolution


def test_blocked_candidates_hot_block_presplit_matches_plain(spark):
    """One blocking key holding 30% of records rides the salted path;
    the candidate SET must be identical to the plain join and the plan
    must stay non-quadratic (no cartesian; the split + salt visible)."""
    from privacy_cdc_lakehouse_spark.operators import linkage as lk

    n = 300
    left = spark.createDataFrame(
        [(i, "HOT" if i < 90 else f"b{i % 20}") for i in range(n)],
        "lid long, blk string",
    )
    right = spark.createDataFrame(
        [(1000 + i, "HOT" if i < 30 else f"b{i % 20}") for i in range(100)],
        "rid long, blk string",
    )
    plain = lk.blocked_candidates(left, right, [("blk", "blk")], "lid", "rid")
    split = lk.blocked_candidates(
        left, right, [("blk", "blk")], "lid", "rid",
        hot_block_threshold=50, salt=4,
    )
    a = sorted((r["id_l"], r["id_r"]) for r in plain.collect())
    b = sorted((r["id_l"], r["id_r"]) for r in split.collect())
    assert a == b and len(a) > 90 * 30  # the hot block genuinely expanded

    plan = split._jdf.queryExecution().explainString(
        split.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "_salt" in plan  # the hot path is in-plan
    assert "LeftAnti" in plan  # and the cold path excluded the hot set

    import pytest

    with pytest.raises(ValueError, match="hot_block_threshold"):
        lk.blocked_candidates(
            left, right, [("blk", "blk")], "lid", "rid",
            hot_block_threshold=0,
        )


def test_fellegi_sunter_weights_known_values(spark):
    """Hand-computed m/u and log-odds; clamping keeps an
    always-agreeing feature finite; validation."""
    import math

    from privacy_cdc_lakehouse_spark.operators import linkage as lk

    # 4 matches (3 agree on name), 6 non-matches (1 agrees on name);
    # 'const' agrees everywhere -> m=u=1 -> clamped, w_agree = 0
    rows = []
    for i in range(4):
        rows.append((1.0 if i < 3 else 0.0, 1.0, True))
    for i in range(6):
        rows.append((1.0 if i < 1 else 0.0, 1.0, False))
    scored = spark.createDataFrame(
        rows, "sim_name double, sim_const double, truth boolean"
    )
    got = {
        r["feature"]: r
        for r in lk.fellegi_sunter_weights(
            scored, ["name", "const"], "truth"
        ).collect()
    }
    assert got["name"]["n_match"] == 4 and got["name"]["n_nonmatch"] == 6
    assert got["name"]["m6"] == 0.75
    assert got["name"]["u6"] == round(1 / 6, 6)
    assert got["name"]["w_agree6"] == round(math.log(0.75 / (1 / 6)), 6)
    assert got["name"]["w_disagree6"] == round(
        math.log(0.25 / (5 / 6)), 6
    )
    # clamped: ln((1-eps)/(1-eps)) = 0, disagree weight finite
    assert got["const"]["w_agree6"] == 0.0
    assert abs(got["const"]["w_disagree6"]) < 1e-5

    import pytest

    with pytest.raises(ValueError, match="feature_names"):
        lk.fellegi_sunter_weights(scored, [], "truth")


def test_fellegi_sunter_rejects_degenerate_labels(spark):
    """Zero labeled matches (or non-matches) must raise, not clamp the
    undefined ratio into confident-looking weights."""
    import pytest
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from privacy_cdc_lakehouse_spark.operators import linkage as lk

    all_false = spark.createDataFrame(
        [(1.0, False), (0.0, False)], "sim_name double, truth boolean"
    )
    with pytest.raises(Exception, match="at least one labeled"):
        lk.fellegi_sunter_weights(all_false, ["name"], "truth").collect()


def test_fs_learned_weights_resolution_beats_hand_set(spark):
    """End-to-end: fellegi_sunter_weights output plugs into
    score_candidates(fs_weights=) and through resolve_best_matches.
    On a fixture whose hand-set weights trust an ANTI-correlated
    feature (tag always disagrees with the true partner), learned
    weights must resolve strictly more records to their construction
    partner (round-11 verdict task: wire learned weights into
    resolution)."""
    from privacy_cdc_lakehouse_spark.operators import linkage as lk

    n = 20
    master = spark.createDataFrame(
        [(i, f"customer_name_{i:04d}", i % 2) for i in range(n)],
        "lid long, name string, tag int",
    )
    # dirty: true partner's name with the FIRST char X'd (edit sim
    # .944 >= .9 vs the partner, <= .889 vs everyone else — the
    # distinguishing digits survive); tag FLIPPED vs the partner
    # (agrees with half the non-partners instead)
    dirty = spark.createDataFrame(
        [(1000 + i, "X" + f"customer_name_{i:04d}"[1:], (i + 1) % 2)
         for i in range(n)],
        "rid long, name string, tag int",
    )
    cands = spark.createDataFrame(
        [(l, 1000 + r) for l in range(n) for r in range(n)],
        "id_l long, id_r long",
    )
    feats = [
        lk.Feature("name", "name", "name", "edit", 0.1),
        lk.Feature("tag", "tag", "tag", "exact", 0.9),
    ]
    hand = lk.score_candidates(cands, master, dirty, feats, "lid", "rid")

    def accuracy(resolved):
        rows = resolved.collect()
        return sum(r["id_r"] - 1000 == r["id_l"] for r in rows) / len(rows)

    acc_hand = accuracy(lk.resolve_best_matches(hand))
    assert acc_hand < 0.5  # the anti-correlated tag dominates

    labeled = hand.withColumn(
        "_truth", (F.col("id_r") - 1000) == F.col("id_l")
    )
    fsw = lk.fellegi_sunter_weights(labeled, ["name", "tag"], "_truth")
    learned = lk.score_candidates(
        cands, master, dirty, feats, "lid", "rid",
        threshold=0.0, fs_weights=fsw,
    )
    acc_learned = accuracy(lk.resolve_best_matches(learned))
    assert acc_learned == 1.0 > acc_hand
    # dict form gives the identical scores as the frame form
    wd = {
        r["feature"]: (r["w_agree6"], r["w_disagree6"])
        for r in fsw.collect()
    }
    learned2 = lk.score_candidates(
        cands, master, dirty, feats, "lid", "rid",
        threshold=0.0, fs_weights=wd,
    )
    assert sorted(map(tuple, learned.collect())) == sorted(
        map(tuple, learned2.collect())
    )
    import pytest

    with pytest.raises(ValueError, match="missing features"):
        lk.score_candidates(
            cands, master, dirty, feats, "lid", "rid",
            fs_weights={"name": (1.0, -1.0)},
        )
