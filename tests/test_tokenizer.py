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


def _python_apply_merges(words, merges):
    """Reference replay: apply the merge list in rank order to each
    word's initial SEP-padded repr with Python's leftmost
    non-overlapping str.replace (the same semantics as Spark/Java)."""
    out = {}
    for w in words:
        r = tk.SEP + tk.SEP.join(list(w)) + tk.SEP + tk.EOW + tk.SEP
        for a, b in merges:
            r = r.replace(
                tk.SEP + a + tk.SEP + b + tk.SEP, tk.SEP + a + b + tk.SEP
            )
        out[w] = [s for s in r.split(tk.SEP) if s]
    return out


def test_bpe_train_batched_vocab_consistent_with_merge_list(spark):
    """For ANY batch_size, the returned vocab must equal the result of
    applying the returned merge list sequentially (rank order) — the
    merge table is the tokenizer artifact; a vocab inconsistent with
    it would encode differently at inference."""
    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
             ("lowest", 4), ("newer", 3)]
    wf = _wf(spark, words)
    for bs in (2, 4, 16):
        merges, vocab = tk.bpe_train(wf, 10, batch_size=bs)
        assert len(merges) == len(set(merges)) <= 10
        segs = {r["word"]: r["tokens"] for r in vocab.collect()}
        assert segs == _python_apply_merges([w for w, _ in words], merges)


def test_bpe_train_batched_matches_sequential_on_disjoint_corpus(spark):
    """batch_size=1 is the sequential path by construction; on a
    corpus of disjoint-alphabet words, batched training must reach the
    SAME merge set and the SAME final segmentation (order may differ:
    a batch defers the freshly-created (ab,</w>) pairs to later
    rounds, which is the documented approximation)."""
    words = [("ab", 100), ("cd", 90), ("ef", 80), ("gh", 70)]
    wf = _wf(spark, words)
    seq_merges, seq_vocab = tk.bpe_train(wf, 8, batch_size=1)
    bat_merges, bat_vocab = tk.bpe_train(wf, 8, batch_size=8)
    assert sorted(seq_merges) == sorted(bat_merges)
    seq = {r["word"]: r["tokens"] for r in seq_vocab.collect()}
    bat = {r["word"]: r["tokens"] for r in bat_vocab.collect()}
    assert seq == bat
    # and when each round's head is conflict-free (every round admits
    # exactly one pick), batched order matches sequential exactly
    wf1 = _wf(spark, [("ab", 7)])
    m1, _ = tk.bpe_train(wf1, 2, batch_size=1)
    m4, _ = tk.bpe_train(wf1, 2, batch_size=4)
    assert m1 == m4 == [("a", "b"), ("ab", "</w>")]


def test_bpe_train_batched_disjoint_selection_and_validation(spark):
    """The in-round selection must reject pairs sharing an operand OR
    the produced symbol with an earlier pick (they would invalidate
    each other's counts mid-batch)."""
    head = [
        {"a": "a", "b": "b"},   # kept: footprint {a, b, ab}
        {"a": "b", "b": "c"},   # rejected: b used
        {"a": "c", "b": "ab"},  # rejected: 'ab' is a produced symbol
        {"a": "c", "b": "d"},   # kept
        {"a": "cd", "b": "x"},  # rejected: 'cd' produced by pick 2
        {"a": "e", "b": "e"},   # kept (a == b is fine)
    ]
    assert tk._select_disjoint_batch(head, 10) == [
        ("a", "b"), ("c", "d"), ("e", "e")
    ]
    assert tk._select_disjoint_batch(head, 2) == [("a", "b"), ("c", "d")]
    with pytest.raises(ValueError):
        tk.bpe_train(_wf(spark, [("a", 1)]), 1, batch_size=0)


# --- WordPiece scoring --------------------------------------------------------


def _py_train(word_freqs, num_merges, scoring="freq"):
    """Pure-Python replay of the pinned training semantics."""
    reprs = {w: list(w) + ["</w>"] for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        pc, sc = {}, {}
        for w, f in word_freqs.items():
            syms = reprs[w]
            for s in syms:
                sc[s] = sc.get(s, 0) + f
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + f
        if not pc:
            break
        if scoring == "wordpiece":
            best = min(
                pc, key=lambda p: (-(pc[p] / (sc[p[0]] * sc[p[1]])), p[0], p[1])
            )
        else:
            best = min(pc, key=lambda p: (-pc[p], p[0], p[1]))
        merges.append(best)
        a, b = best
        for w in reprs:
            syms, out, i = reprs[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            reprs[w] = out
    return merges, reprs


def _wf_df(spark, word_freqs):
    return spark.createDataFrame(
        [(w, f) for w, f in word_freqs.items()], "word string, freq long"
    )


bpe_train = tk.bpe_train


def test_wordpiece_prefers_rare_symbol_pairs(spark):
    # ('a','b') has the highest raw count but both symbols are common;
    # ('x','y') is rarer but its parts occur ONLY together
    wf = {"ab": 5, "ac": 20, "cb": 20, "xy": 3}
    m_freq, _ = bpe_train(_wf_df(spark, wf), 1)
    m_wp, _ = bpe_train(_wf_df(spark, wf), 1, scoring="wordpiece")
    # raw count: 'b</w>' (25) / 'c</w>' (20) territory — never (x, y)
    assert m_freq[0] != ("x", "y")
    assert m_freq[0] == _py_train(wf, 1, scoring="freq")[0][0]
    # wordpiece: x and y occur ONLY together -> score 3/(3*3) wins
    assert m_wp[0] == ("x", "y")


def test_wordpiece_matches_python_reference(spark):
    import random

    rnd = random.Random(11)
    words = {"".join(rnd.choices("abcde", k=rnd.randint(2, 6))): rnd.randint(1, 9)
             for _ in range(30)}
    got_m, got_vocab = bpe_train(_wf_df(spark, words), 8, scoring="wordpiece")
    want_m, want_reprs = _py_train(words, 8, scoring="wordpiece")
    assert got_m == want_m
    got_segs = {r["word"]: list(r["tokens"]) for r in got_vocab.collect()}
    assert got_segs == want_reprs


def test_wordpiece_batched_matches_sequential_set_on_disjoint_corpus(spark):
    """The disjoint-batch machinery is scoring-agnostic (round-12
    verdict task #1): under the WordPiece likelihood objective, batched
    training on a disjoint-alphabet corpus must reach the SAME merge
    set and the SAME final segmentation as sequential (order may
    differ — the documented fast-trainer approximation, same standing
    as the BPE parity test)."""
    wf = _wf_df(spark, {"ab": 100, "cd": 90, "ef": 80, "gh": 70})
    seq_m, seq_v = bpe_train(wf, 8, scoring="wordpiece", batch_size=1)
    bat_m, bat_v = bpe_train(wf, 8, scoring="wordpiece", batch_size=8)
    assert sorted(seq_m) == sorted(bat_m)
    seq = {r["word"]: list(r["tokens"]) for r in seq_v.collect()}
    bat = {r["word"]: list(r["tokens"]) for r in bat_v.collect()}
    assert seq == bat
    # conflict-free head (one admissible pick per round): exact order
    m1, _ = bpe_train(_wf_df(spark, {"ab": 7}), 2, scoring="wordpiece",
                      batch_size=1)
    m4, _ = bpe_train(_wf_df(spark, {"ab": 7}), 2, scoring="wordpiece",
                      batch_size=4)
    assert m1 == m4 == [("a", "b"), ("ab", "</w>")]


def test_wordpiece_rejects_bad_scoring(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="scoring"):
        bpe_train(_wf_df(spark, {"ab": 1}), 1, scoring="unigram")
    with _pytest.raises(ValueError, match="sym_mode"):
        bpe_train(
            _wf_df(spark, {"ab": 1}), 1, scoring="wordpiece", sym_mode="guess"
        )


def test_wordpiece_incremental_equals_recount(spark):
    """Round-13 verdict task #2: the incremental symbol-count
    maintenance must produce bit-identical counts — hence identical
    merge lists and segmentations — to the per-round recount,
    INCLUDING on corpora where the pair count differs from the applied
    replace count (repeated-pair words like 'abab'/'aaaa', where
    leftmost non-overlapping replace skips SEP-sharing sites, and
    self-pairs that consume two operands per merge)."""
    import random

    rnd = random.Random(17)
    words = {
        "".join(rnd.choices("ab", k=rnd.randint(2, 8))): rnd.randint(1, 9)
        for _ in range(40)
    }
    words.update({"abab": 50, "aaaa": 40, "aaab": 30, "bbbb": 20})
    for bs in (1, 4):
        inc_m, inc_v = bpe_train(
            _wf_df(spark, words), 10, scoring="wordpiece", batch_size=bs,
            sym_mode="incremental",
        )
        rec_m, rec_v = bpe_train(
            _wf_df(spark, words), 10, scoring="wordpiece", batch_size=bs,
            sym_mode="recount",
        )
        assert inc_m == rec_m, bs
        inc = {r["word"]: list(r["tokens"]) for r in inc_v.collect()}
        rec = {r["word"]: list(r["tokens"]) for r in rec_v.collect()}
        assert inc == rec, bs


# --- unigram-LM Viterbi segmentation -------------------------------------------


def _py_viterbi(word, scores, L=12, unk=-20.0):
    n = len(word)
    best = [(0.0, -1, "")] + [(float("-inf"), -1, "")] * n
    for i in range(1, n + 1):
        cands = []
        for j in range(max(0, i - L), i):
            piece = word[j:i]
            if piece in scores:
                cands.append(
                    (best[j][0] + scores[piece], len(piece), piece, j)
                )
        unk_cand = (best[i - 1][0] + unk, 1, word[i - 1], i - 1)
        if cands:
            s, plen, piece, j = max(cands)
            if s >= unk_cand[0]:
                best[i] = (s, j, piece)
                continue
        best[i] = (unk_cand[0], unk_cand[3], unk_cand[2])
    toks = []
    pos = n
    while pos > 0:
        s, j, piece = best[pos]
        toks.append(piece)
        pos = j
    return list(reversed(toks)), round(best[n][0], 6)


def _seg(spark, words, scores, **kw):
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    pdf = spark.createDataFrame(
        list(scores.items()), "piece string, logp double"
    )
    return {
        r["word"]: (list(r["tokens"]), r["logp"])
        for r in tk.viterbi_segment(wdf, pdf, **kw).collect()
    }


def test_viterbi_matches_python_reference(spark):
    import math
    import random

    rnd = random.Random(3)
    pieces = {"a", "b", "c", "ab", "bc", "abc", "cab", "ba", "cc", "abcb"}
    scores = {p: round(-rnd.uniform(0.5, 8.0), 3) for p in pieces}
    words = ["".join(rnd.choices("abc", k=rnd.randint(1, 10))) for _ in range(40)]
    got = _seg(spark, list(set(words)), scores)
    for w in set(words):
        toks, lp = _py_viterbi(w, scores)
        assert got[w][0] == toks, (w, got[w][0], toks)
        assert math.isclose(got[w][1], lp, abs_tol=1e-6)


def test_viterbi_prefers_likely_segmentation(spark):
    # 'abc' as one piece beats 'a'+'bc' when its logp is higher
    got = _seg(spark, ["abc"], {"abc": -1.0, "a": -0.4, "bc": -0.4})
    assert got["abc"][0] == ["a", "bc"]
    got2 = _seg(spark, ["abc"], {"abc": -0.5, "a": -0.4, "bc": -0.4})
    assert got2["abc"][0] == ["abc"]


def test_viterbi_unk_fallback(spark):
    got = _seg(spark, ["axb"], {"a": -1.0, "b": -1.0}, unk_logp=-5.0)
    assert got["axb"][0] == ["a", "x", "b"]
    assert got["axb"][1] == round(-1.0 - 5.0 - 1.0, 6)
    # fully OOV word: every char is an UNK
    got2 = _seg(spark, ["zz"], {"a": -1.0}, unk_logp=-7.0)
    assert got2["zz"][0] == ["z", "z"] and got2["zz"][1] == -14.0


def test_viterbi_respects_max_piece_len(spark):
    scores = {"abcd": -0.1, "ab": -1.0, "cd": -1.0}
    full = _seg(spark, ["abcd"], scores)
    assert full["abcd"][0] == ["abcd"]
    capped = _seg(spark, ["abcd"], scores, max_piece_len=2)
    assert capped["abcd"][0] == ["ab", "cd"]


# --- greedy WordPiece inference (round 15) ---------------------------------


def _hf_wordpiece(word, vocab, marker="##", unk="[UNK]", max_chars=100):
    """Independent python reference: HF WordPiece.tokenize verbatim."""
    if len(word) > max_chars:
        return [unk]
    toks, start = [], 0
    while start < len(word):
        end, cur = len(word), None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = marker + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk]
        toks.append(cur)
        start = end
    return toks


_WP_VOCAB = (
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    + ["the", "un", "re", "in", "th", "pro",
       "##ing", "##ed", "##er", "##s", "##ion", "##at", "##he", "##able"]
)


def test_wordpiece_segment_matches_hf_reference(spark):
    """Greedy longest-match-first parity with the HF algorithm on
    words covering: multi-piece greedy splits, continuation-marker
    resolution, UNK via out-of-alphabet chars, UNK via
    max_word_chars, and single-piece whole-word matches."""
    words = [
        "the", "theory", "unable", "reproducing", "thinking",
        "cat", "cats", "a", "x1y",        # '1' not in vocab -> UNK
        "naïve",                           # 'ï' not in vocab -> UNK
        "z" * 101,                         # over max_word_chars -> UNK
        "zzz", "prothesis", "unrelated",
    ]
    vocab = set(_WP_VOCAB)
    want = {w: _hf_wordpiece(w, vocab) for w in words}
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    pdf = spark.createDataFrame([(p,) for p in _WP_VOCAB], "piece string")
    got = {
        r["word"]: (list(r["tokens"]), r["n_tokens"], r["is_unk"])
        for r in tk.wordpiece_segment(wdf, pdf).collect()
    }
    assert set(got) == set(words)
    for w in words:
        assert got[w][0] == want[w], f"{w}: {got[w][0]} != {want[w]}"
        assert got[w][1] == len(want[w])
        assert got[w][2] == (want[w] == ["[UNK]"])
    # greedy is NOT shortest-output: 'thinking' must start with 'th'
    # (longest match at 0 among {t, th}), not 't'
    assert got["thinking"][0][0] == "th"


def test_wordpiece_segment_explicit_max_piece_chars(spark):
    """Passing max_piece_chars explicitly (the driver-free path) must
    match the derived default when it covers the vocab, and CAP
    matching when smaller (a piece longer than the cap can never
    match — same contract as viterbi's max_piece_len)."""
    wdf = spark.createDataFrame([("theory",)], "word string")
    pdf = spark.createDataFrame([(p,) for p in _WP_VOCAB], "piece string")
    auto = tk.wordpiece_segment(wdf, pdf).collect()[0]["tokens"]
    explicit = tk.wordpiece_segment(
        wdf, pdf, max_piece_chars=6
    ).collect()[0]["tokens"]
    assert list(auto) == list(explicit) == ["the", "##o", "##r", "##y"]
    capped = tk.wordpiece_segment(
        wdf, pdf, max_piece_chars=2
    ).collect()[0]["tokens"]
    assert list(capped) == ["th", "##e", "##o", "##r", "##y"]
    with pytest.raises(ValueError, match="pieces table is empty"):
        tk.wordpiece_segment(
            wdf, spark.createDataFrame([], "piece string")
        ).collect()


def test_wordpiece_encode_reassembly_and_unk_counts(spark):
    """Corpus-level encode: order-preserving reassembly across words,
    per-doc UNK word counts, empty docs kept with zero tokens."""
    docs = spark.createDataFrame(
        [
            (1, "The cat s1ts"),        # 's1ts' -> UNK ('1' not in vocab)
            (2, "thinking   re cats"),
            (3, "   "),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    pdf = spark.createDataFrame([(p,) for p in _WP_VOCAB], "piece string")
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"], r["n_unk_words"])
        for r in tk.wordpiece_encode(docs, pdf).collect()
    }
    vocab = set(_WP_VOCAB)
    exp1 = (
        _hf_wordpiece("the", vocab)
        + _hf_wordpiece("cat", vocab)
        + _hf_wordpiece("s1ts", vocab)
    )
    assert got[1] == (exp1, len(exp1), 1)
    exp2 = (
        _hf_wordpiece("thinking", vocab)
        + _hf_wordpiece("re", vocab)
        + _hf_wordpiece("cats", vocab)
    )
    assert got[2] == (exp2, len(exp2), 0)
    assert got[3] == ([], 0, 0) and got[4] == ([], 0, 0)


def test_wordpiece_vocab_from_segmentations_bridge(spark):
    """Trained-dict → HF-style piece table: position-0 symbols stay
    initial, later symbols get ##, </w> suffixes are stripped, the
    bare </w> symbol disappears."""
    vocab = spark.createDataFrame(
        [
            ("lower", ["low", "er</w>"]),
            ("low", ["low", "</w>"]),
            ("er", ["e", "r</w>"]),
        ],
        "word string, tokens array<string>",
    )
    got = {
        r["piece"]
        for r in tk.wordpiece_vocab_from_segmentations(vocab).collect()
    }
    assert got == {"low", "##er", "e", "##r"}
    # end-to-end: the bridged vocab drives the greedy encoder
    seg = tk.wordpiece_segment(
        spark.createDataFrame([("lower",), ("low",)], "word string"),
        tk.wordpiece_vocab_from_segmentations(vocab),
    ).collect()
    out = {r["word"]: list(r["tokens"]) for r in seg}
    assert out == {"lower": ["low", "##er"], "low": ["low"]}


def test_wordpiece_decode_round_trip(spark):
    """decode(encode(text)) == single-space-normalized lowercase text
    for docs with zero UNK words; UNK words decode as the literal
    token (lossy exactly where the vocab was)."""
    docs = spark.createDataFrame(
        [(1, "The  cat   thinking"), (2, "unable x1y cats"), (3, "")],
        "doc_id long, text string",
    )
    pdf = spark.createDataFrame([(p,) for p in _WP_VOCAB], "piece string")
    enc = tk.wordpiece_encode(docs, pdf)
    got = {
        r["doc_id"]: r["text"]
        for r in tk.wordpiece_decode(enc).collect()
    }
    assert got[1] == "the cat thinking"     # zero UNK -> exact round trip
    assert got[2] == "unable [UNK] cats"    # UNK word replaced, rest exact
    assert got[3] == ""
