"""BLEU (sentence + corpus): clipping, brevity penalty, unsmoothed
zero-precision handling, pooled-vs-per-pair math, plan shape."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators import text as tx


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "pair_id long, cand string, ref string")


def _py_bleu(cand: str, ref: str, max_n: int = 4):
    cw, rw = cand.split(), ref.split()
    clipped, total = {}, {}
    for n in range(1, max_n + 1):
        cg = Counter(tuple(cw[i : i + n]) for i in range(len(cw) - n + 1))
        rg = Counter(tuple(rw[i : i + n]) for i in range(len(rw) - n + 1))
        clipped[n] = sum(min(c, rg[g]) for g, c in cg.items())
        total[n] = sum(cg.values())
    if any(total[n] == 0 or clipped[n] == 0 for n in range(1, max_n + 1)):
        return 0.0
    bp = 0.0 if not cw else math.exp(min(0.0, 1.0 - len(rw) / len(cw)))
    geo = math.exp(sum(math.log(clipped[n] / total[n]) / max_n for n in range(1, max_n + 1)))
    return round(bp * geo, 6)


def test_identical_pair_scores_one(spark):
    out = tx.sentence_bleu(
        _pairs(spark, [(1, "the quick brown fox jumps", "the quick brown fox jumps")])
    ).first()
    assert out["bleu"] == 1.0 and out["bp"] == 1.0
    assert out["p1"] == 1.0 and out["p4"] == 1.0


def test_clipping_caps_repeated_candidate_grams(spark):
    # Papineni et al.'s canonical degenerate candidate: p1 must clip to
    # 2/7, not 7/7
    out = tx.bleu_pair_stats(
        _pairs(spark, [(1, "the the the the the the the", "the cat is on the mat")])
    ).first()
    assert out["clipped_1"] == 2 and out["total_1"] == 7
    assert out["clipped_2"] == 0  # 'the the' never appears in the ref


def test_zero_precision_gives_zero_unsmoothed(spark):
    got = tx.sentence_bleu(
        _pairs(spark, [(1, "the the the the the the the", "the cat is on the mat")])
    ).first()
    assert got["bleu"] == 0.0


def test_matches_python_replay_incl_brevity(spark):
    cases = [
        (1, "the quick brown fox jumps over the lazy dog", "a quick brown fox leaps over the lazy dog"),
        (2, "it is a truth universally acknowledged", "it is a truth universally acknowledged that a single man"),
        (3, "colorless green ideas sleep furiously", "ideas sleep furiously in colorless green rooms again"),
        (4, "", "nonempty reference"),
        (5, "short one", "short one"),
    ]
    got = {r["pair_id"]: r["bleu"] for r in tx.sentence_bleu(_pairs(spark, cases)).collect()}
    for pid, cand, ref in cases:
        assert got[pid] == _py_bleu(cand, ref), (pid, got[pid], _py_bleu(cand, ref))


def test_brevity_penalty_fires_only_when_short(spark):
    long_c = tx.sentence_bleu(
        _pairs(spark, [(1, "a b c d e f g h", "a b c d e")])
    ).first()
    short_c = tx.sentence_bleu(
        _pairs(spark, [(1, "a b c d e", "a b c d e f g h")])
    ).first()
    assert long_c["bp"] == 1.0  # candidate longer than reference: no BP
    assert short_c["bp"] == round(math.exp(1 - 8 / 5), 6)


def test_corpus_bleu_pools_before_ratios(spark):
    rows = [
        (1, "the quick brown fox", "the quick brown fox"),
        (2, "a b c d", "x y z w"),
    ]
    out = tx.corpus_bleu(_pairs(spark, rows)).first()
    # pooled p1 = (4 + 0) / (4 + 4), NOT mean(1.0, 0.0)
    assert out["p1"] == 0.5
    assert out["cand_len"] == 8 and out["ref_len"] == 8
    # pair 2 contributes zero clipped everywhere but corpus BLEU is
    # still positive because pair 1's grams carry the pooled ratios
    assert out["bleu"] > 0.0


def test_bleu_plan_no_self_join(spark):
    plan = tx.sentence_bleu(
        _pairs(spark, [(1, "a b", "a b")])
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # grams explode per row, never a self-join


# ------------------------------ ROUGE-L ---------------------------------


def _py_lcs(a, b):
    import itertools

    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def test_rouge_l_hand_cases(spark):
    cases = [
        (1, "the cat sat", "the cat sat"),  # identical
        (2, "the cat sat on the mat", "the dog sat on a mat"),
        (3, "", "nonempty ref"),  # empty candidate
        (4, "xyz", "abc def"),  # zero overlap
    ]
    got = {r["pair_id"]: r for r in tx.rouge_l(_pairs(spark, cases)).collect()}
    assert got[1]["rouge_f"] == 1.0 and got[1]["lcs"] == 3
    c, r = "the cat sat on the mat".split(), "the dog sat on a mat".split()
    lcs = _py_lcs(c, r)
    assert got[2]["lcs"] == lcs
    p, rr = lcs / len(c), lcs / len(r)
    assert got[2]["rouge_f"] == round(2 * p * rr / (p + rr), 6)
    assert got[3]["rouge_f"] == 0.0 and got[3]["lcs"] == 0
    assert got[4]["rouge_f"] == 0.0


def test_rouge_l_deletion_only_is_subsequence(spark):
    # a candidate formed by deleting tokens is a subsequence: LCS must
    # equal the candidate length and precision must be exactly 1
    ref = "a b c d e f g h i j"
    cand = "a c d f g i j"  # deleted b, e, h
    got = tx.rouge_l(_pairs(spark, [(1, cand, ref)])).first()
    assert got["lcs"] == 7 and got["rouge_p"] == 1.0
    assert got["rouge_r"] == 0.7


def test_rouge_l_truncation(spark):
    ref = " ".join(str(i) for i in range(50))
    cand = ref
    got = tx.rouge_l(_pairs(spark, [(1, cand, ref)]), max_tokens=10).first()
    assert got["lcs"] == 10 and got["cand_tokens"] == 10
    assert got["rouge_f"] == 1.0


def test_rouge_n_known_values(spark):
    """Hand-computed clipped n-gram overlap, empty/gramless pairs get
    0-rows, clipping caps repeated candidate grams."""
    from privacy_cdc_lakehouse_spark.operators import text as tx

    pairs = spark.createDataFrame(
        [
            # cand bigrams: {a b, b c}; ref bigrams: {a b, b d} -> match 1
            (1, "a b c", "a b d"),
            # repeated cand gram clipped at ref count: cand {x y}x2+{y x},
            # ref {x y}x1 -> match 1, cand_grams 3, ref_grams 1
            (2, "x y x y", "x y"),
            # gramless candidate (1 token < n)
            (3, "solo", "a b c"),
            (4, "", ""),
        ],
        "pair_id long, cand string, ref string",
    )
    got = {r["pair_id"]: r for r in tx.rouge_n(pairs, n=2).collect()}
    assert got[1]["match"] == 1 and got[1]["cand_grams"] == 2
    assert got[1]["rouge_p"] == 0.5 and got[1]["rouge_r"] == 0.5
    assert got[1]["rouge_f"] == 0.5
    assert got[2]["match"] == 1 and got[2]["cand_grams"] == 3
    assert got[2]["ref_grams"] == 1
    assert got[2]["rouge_f"] == round(2 * (1/3) * 1.0 / ((1/3) + 1.0), 6)
    assert got[3]["match"] == 0 and got[3]["rouge_f"] == 0.0
    assert got[4]["rouge_f"] == 0.0 and len(got) == 4
    # rouge-1 on identical texts is a perfect score
    same = tx.rouge_n(
        spark.createDataFrame(
            [(1, "p q r", "p q r")], "pair_id long, cand string, ref string"
        ),
        n=1,
    ).collect()[0]
    assert same["rouge_f"] == 1.0

    import pytest

    with pytest.raises(ValueError, match="n must be"):
        tx.rouge_n(pairs, n=0)
