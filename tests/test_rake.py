"""RAKE keyword extraction: hand-checkable fixture, pure-Python
reference parity, and pipeline edge cases."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pytest

from privacy_cdc_lakehouse_spark.operators.text import (
    RAKE_STOPWORDS,
    rake_keywords,
    rake_phrases,
)


def _py_rake(texts, stops=None, k=15):
    """Pure-Python replay of the pinned RAKE pipeline."""
    stops = stops if stops is not None else RAKE_STOPWORDS
    alt = "|".join(sorted(stops))
    occurrences = []
    for t in texts:
        s = t.lower()
        s = re.sub(r"[^a-z\s]+", " | ", s)
        s = re.sub(r"\s+", " ", s)
        s = re.sub(rf"\b({alt})\b", "|", s)
        for raw in s.split("|"):
            p = raw.strip()
            if p:
                occurrences.append([w for w in p.split(" ") if w])
    freq: Counter = Counter()
    deg: Counter = Counter()
    for ws in occurrences:
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    wscore = {w: deg[w] / freq[w] for w in freq}
    phrases = defaultdict(lambda: [0, 0.0, 0])
    for ws in occurrences:
        key = " ".join(ws)
        phrases[key][0] += 1
        phrases[key][1] = round(sum(wscore[w] for w in ws), 6)
        phrases[key][2] = len(ws)
    ranked = sorted(phrases.items(), key=lambda kv: (-kv[1][1], kv[0]))[:k]
    return [
        (p, s, n, f, i + 1) for i, (p, (f, s, n)) in enumerate(ranked)
    ]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_rake_phrases_split_on_stopwords_and_punct(spark):
    out = rake_phrases(
        _docs(spark, ["Deep learning of neural networks, and fast GPUs!"])
    ).collect()
    got = [(r["phrase"], r["n_words"]) for r in sorted(out, key=lambda r: r["pidx"])]
    assert got == [
        ("deep learning", 2),
        ("neural networks", 2),
        ("fast gpus", 2),
    ]


def test_rake_matches_python_reference(spark):
    texts = [
        "Compatibility of systems of linear constraints over the set of "
        "natural numbers. Criteria of compatibility of a system of linear "
        "Diophantine equations, strict inequations, and nonstrict "
        "inequations are considered.",
        "Upper bounds for components of a minimal set of solutions and "
        "algorithms of construction of minimal generating sets of "
        "solutions for all types of systems are given.",
        "These criteria and the corresponding algorithms for constructing "
        "a minimal supporting set of solutions can be used in solving all "
        "the considered types of systems and systems of mixed types.",
    ]
    got = [
        (r["phrase"], r["score6"], r["n_words"], r["freq"], r["pos"])
        for r in rake_keywords(_docs(spark, texts), k=10).collect()
    ]
    want = _py_rake(texts, k=10)
    assert got == want


def test_rake_multiword_phrases_outscore_common_words(spark):
    texts = ["linear diophantine equations are hard. linear algebra is fun."]
    top = rake_keywords(_docs(spark, texts), k=3).collect()
    assert top[0]["phrase"] == "linear diophantine equations"
    assert top[0]["n_words"] == 3


def test_rake_duplicate_phrase_freq_counted(spark):
    texts = ["red apples.", "red apples!", "green pears."]
    rows = {r["phrase"]: r["freq"] for r in rake_keywords(_docs(spark, texts)).collect()}
    assert rows["red apples"] == 2
    assert rows["green pears"] == 1


def test_rake_custom_stopwords_and_validation(spark):
    df = _docs(spark, ["alpha beta gamma"])
    got = {r["phrase"] for r in rake_keywords(df, stopwords=["beta"]).collect()}
    assert got == {"alpha", "gamma"}
    with pytest.raises(ValueError, match="alphabetic"):
        rake_keywords(df, stopwords=["a.b"])


def test_rake_empty_and_all_stopword_docs(spark):
    df = _docs(spark, ["", "the and of", "42 17", "  ", "ok words here"])
    out = rake_keywords(df).collect()
    assert {r["phrase"] for r in out} == {"ok words here"}


# --- TextRank ----------------------------------------------------------------

import hashlib as _hashlib

from privacy_cdc_lakehouse_spark.operators.text import textrank_keywords
from tests.test_graph import _py_pagerank


def _py_textrank(texts, k=15, window=2, iterations=10, stops=None):
    stops = set(stops if stops is not None else RAKE_STOPWORDS)
    edges = set()
    for t in texts:
        toks = [w for w in re.findall(r"[a-z]{2,}", t.lower()) if w not in stops]
        for d in range(1, window + 1):
            for i in range(len(toks) - d):
                a, b = toks[i], toks[i + d]
                if a != b:
                    edges.add((a, b))
                    edges.add((b, a))
    h = lambda w: int(_hashlib.md5(f"tr|{w}".encode()).hexdigest()[:13], 16)
    id_edges = [(h(a), h(b)) for a, b in edges]
    rank, _ = _py_pagerank(id_edges, iterations=iterations)
    words = {h(w): w for e in edges for w in e}
    scored = sorted(
        ((words[n], round(r, 6)) for n, r in rank.items()),
        key=lambda wr: (-wr[1], wr[0]),
    )[:k]
    return [(w, r, i + 1) for i, (w, r) in enumerate(scored)]


def test_textrank_matches_python_reference(spark):
    texts = [
        "graph ranking algorithms compute vertex importance from graph "
        "structure. the ranking converges after several iterations.",
        "keyword extraction with graph ranking selects central words; "
        "central words co-occur with many other words.",
    ]
    got = [
        (r["word"], r["rank6"], r["pos"])
        for r in textrank_keywords(_docs(spark, texts), k=10, iterations=4).collect()
    ]
    want = _py_textrank(texts, k=10, iterations=4)
    assert got == want


def test_textrank_hub_word_ranks_first(spark):
    # 'core' co-occurs with everything; fillers are distinct per use
    texts = ["core alpha. core beta. core gamma. core delta. core epsilon."]
    top = textrank_keywords(_docs(spark, texts), k=3, iterations=3).collect()
    assert top[0]["word"] == "core"
    assert top[0]["pos"] == 1


def test_textrank_ignores_stopwords_and_short_tokens(spark):
    texts = ["the of a x y z quick brown fox quick brown"]
    words = {r["word"] for r in textrank_keywords(_docs(spark, texts), k=20, iterations=2).collect()}
    assert "the" not in words and "of" not in words
    assert not any(len(w) < 2 for w in words)
    assert {"quick", "brown", "fox"} <= words


def test_textrank_weighted_option(spark):
    # all co-occurrence counts are 1 -> weighted == unweighted exactly
    texts = ["alpha beta gamma delta"]
    uw = textrank_keywords(_docs(spark, texts), k=10, iterations=3).collect()
    w = textrank_keywords(
        _docs(spark, texts), k=10, iterations=3, weighted=True
    ).collect()
    assert [tuple(r) for r in uw] == [tuple(r) for r in w]
    # a repeated bigram boosts its words under weights
    texts2 = ["hot spot hot spot hot spot cold zone"]
    top_w = textrank_keywords(
        _docs(spark, texts2), k=2, iterations=4, weighted=True
    ).collect()
    assert {r["word"] for r in top_w} == {"hot", "spot"}
