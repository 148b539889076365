"""BPE tokenizer (operators/tokenizer.py) — the Sennrich et al. 2016
subword recipe. The paper's own worked example is the ground truth for
the merge table; encode is pinned by a lossless-reassembly property
(concatenating a word's tokens and stripping </w> must reproduce the
word) plus OOV/empty-doc edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators import tokenizer as tk


def _wf(spark, pairs):
    return spark.createDataFrame(pairs, "word string, freq long")


def test_bpe_train_paper_example(spark):
    # Sennrich et al. 2016 §3.2 example vocabulary: low:5 lower:2
    # newest:6 widest:3. First merges: (e,s)->es (9), (es,t)->est (9),
    # (est,</w>)->est</w> (9), (l,o)->lo (7), (lo,w)->low (7), ...
    wf = _wf(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    merges, vocab = tk.bpe_train(wf, 5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
    ]
    segs = {r["word"]: r["tokens"] for r in vocab.collect()}
    assert segs["low"] == ["low", "</w>"]
    assert segs["newest"] == ["n", "e", "w", "est</w>"]
    assert segs["widest"] == ["w", "i", "d", "est</w>"]
    assert segs["lower"] == ["low", "e", "r", "</w>"]


def test_bpe_train_tie_break_lexicographic(spark):
    # Two words, disjoint alphabets, equal frequency: every adjacent
    # pair of "ab" and "cd" counts 1 — the argmax must be the
    # lexicographically smallest (a,b) pair, engine-independently.
    wf = _wf(spark, [("ab", 1), ("cd", 1)])
    merges, _ = tk.bpe_train(wf, 1)
    assert merges == [("a", "b")]


def test_bpe_train_merge_is_leftmost_nonoverlapping(spark):
    # "aaa": pairs (a,a)x2 -> merge (a,a). Leftmost non-overlapping
    # replace yields [aa, a, </w>], NOT [a, aa, </w>].
    wf = _wf(spark, [("aaa", 1)])
    merges, vocab = tk.bpe_train(wf, 1)
    assert merges == [("a", "a")]
    assert vocab.collect()[0]["tokens"] == ["aa", "a", "</w>"]


def test_bpe_train_stops_early_and_validates(spark):
    # Single 1-char word: after merging (a,</w>) no pair remains, so a
    # request for 5 merges learns exactly 1.
    wf = _wf(spark, [("a", 3)])
    merges, vocab = tk.bpe_train(wf, 5)
    assert merges == [("a", "</w>")]
    assert vocab.collect()[0]["tokens"] == ["a</w>"]
    with pytest.raises(ValueError):
        tk.bpe_train(wf, -1)


def test_bpe_encode_lossless_reassembly_and_oov(spark):
    docs = spark.createDataFrame(
        [
            (1, "low lower newest"),
            (2, "unknown low"),  # 'unknown' is OOV -> char fallback
            (3, "   "),  # whitespace-only -> zero tokens
        ],
        "doc_id long, text string",
    )
    wf = _wf(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    _, vocab = tk.bpe_train(wf, 5)
    enc = tk.bpe_encode(docs, vocab, lowercase=False)
    rows = {r["doc_id"]: r for r in enc.collect()}
    assert rows[1]["tokens"] == [
        "low", "</w>", "low", "e", "r", "</w>", "n", "e", "w", "est</w>",
    ]
    assert rows[1]["n_tokens"] == 10
    # OOV word falls back to single characters + </w>
    assert rows[2]["tokens"][:7] == ["u", "n", "k", "n", "o", "w", "n"]
    assert rows[2]["tokens"][7] == "</w>"
    assert rows[3]["tokens"] == [] and rows[3]["n_tokens"] == 0
    # lossless reassembly: concat(tokens) with </w> -> space restores
    # the whitespace-normalized document text
    rebuilt = (
        enc.filter(F.col("doc_id") == 1)
        .select(
            F.rtrim(
                F.replace(
                    F.array_join("tokens", ""), F.lit(tk.EOW), F.lit(" ")
                )
            ).alias("t")
        )
        .collect()[0]["t"]
    )
    assert rebuilt == "low lower newest"


def test_word_frequencies_lowercase_flag(spark):
    docs = spark.createDataFrame(
        [(1, "Low low LOW")], "doc_id long, text string"
    )
    lc = {r["word"]: r["freq"] for r in tk.word_frequencies(docs).collect()}
    assert lc == {"low": 3}
    raw = {
        r["word"]: r["freq"]
        for r in tk.word_frequencies(docs, lowercase=False).collect()
    }
    assert raw == {"Low": 1, "low": 1, "LOW": 1}


def test_bpe_train_plan_is_vocab_sized_no_join(spark):
    # The 100 TB contract: each training round is ONE aggregate over
    # the word-frequency dict — pairs from an index-aware transform,
    # never a join, never a corpus scan.
    wf = _wf(spark, [("low", 5), ("newest", 6)])
    syms = tk._symbols(F.col("repr"))
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(syms) - 2),
        lambda i: F.struct(
            F.element_at(syms, i + 1).alias("a"),
            F.element_at(syms, i + 2).alias("b"),
        ),
    )
    scored = (
        wf.select(
            tk.initial_repr(F.col("word")).alias("repr"),
            F.col("freq"),
        )
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("cnt"))
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Python" not in plan


def test_bpe_train_checkpointing_is_invisible(spark):
    """Periodic localCheckpoint of the dict (the production lineage
    bound) must not change a single merge or segmentation."""
    from privacy_cdc_lakehouse_spark.operators import tokenizer as tk

    docs = spark.createDataFrame(
        [(i, f"low lower lowest newer newest wide widest {i % 7}")
         for i in range(40)],
        "doc_id long, text string",
    )
    wf = tk.word_frequencies(docs)
    m0, v0 = tk.bpe_train(wf, num_merges=12, checkpoint_every=0)
    m1, v1 = tk.bpe_train(wf, num_merges=12, checkpoint_every=4)
    assert m0 == m1
    key = lambda df: sorted((r["word"], tuple(r["tokens"])) for r in df.collect())
    assert key(v0) == key(v1)

    import pytest

    with pytest.raises(ValueError, match="checkpoint_every"):
        tk.bpe_train(wf, num_merges=1, checkpoint_every=-1)
