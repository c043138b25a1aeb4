"""POS / sentiment / simhash / sequence-classification / keyword cores."""

from __future__ import annotations

import math


from kgforge.config import PipelineConfig
from kgforge.encoders import StandInSeqClassifier, softmax
from kgforge.keywords import candidates_with_offsets, extract_keywords
from kgforge.ner import predict_pos
from kgforge.textops import (
    h32,
    pos_tag_word,
    sentiment_of,
    simhash32,
)


def test_pos_rules():
    cases = {"The": "DET", "the": "DET", "of": "ADP", "and": "CONJ",
             "they": "PRON", "Paris": "PROPN", "apple": "NOUN",
             "42": "NUM", ".": "PUNCT", "!": "PUNCT"}
    for w, tag in cases.items():
        assert pos_tag_word(w) == tag, w


def test_pos_pipeline_matches_word_rule():
    """The sliding-window/consolidation machinery must reproduce the plain
    word-level rule exactly (the property that makes the SQL oracle valid)."""
    from kgforge.tokenization import _WORD_RE

    texts = [
        "The quick Brown fox jumps over 12 lazy dogs .",
        "Industries Incorporated and Amélie of 2024 !",
        " ".join(f"word{i}" for i in range(200)),  # multi-span
    ]
    got = predict_pos(texts, PipelineConfig(max_length=32))
    for text, tags in zip(texts, got):
        words = [m.group(0) for m in _WORD_RE.finditer(text)]
        assert [t["word"] for t in tags] == words
        assert [t["label"] for t in tags] == [pos_tag_word(w) for w in words]
        for t in tags:
            assert t["score"] > 0.9


def test_sentiment_exact_ratio():
    n_pos, n_neg, pol, score = sentiment_of(["fast", "slow", "fast", "x"])
    assert (n_pos, n_neg, pol) == (2, 1, "Positive")
    assert score == 3 / 5


def test_sentiment_tie_is_positive():
    assert sentiment_of([])[2] == "Positive"


def test_seqcls_softmax_math():
    sc = StandInSeqClassifier()
    logits = sc.forward_texts(["fast good growth"])
    probs = softmax(logits, -1)
    out = sc.predict(["fast good growth"])[0]
    assert out["label"] == "Positive"
    assert math.isclose(out["score"], float(probs[0, 1]))


def test_seqcls_multilabel_sigmoid_threshold():
    sc = StandInSeqClassifier()
    out = sc.predict_multilabel(["slow bad error"], threshold=0.9)[0]
    assert [o["label"] for o in out] == ["Negative"]
    logits = sc.forward_texts(["slow bad error"])
    assert math.isclose(out[0]["score"], 1 / (1 + math.exp(-logits[0, 0])))


def test_h32_and_simhash_deterministic():
    assert h32("data") == h32("data")
    # explicit fold check
    acc = 0
    for ch in "ab":
        acc = (acc * 31 + ord(ch)) % (1 << 32)
    assert h32("ab") == acc
    assert 0 <= simhash32(["a", "b", "c"]) < (1 << 32)
    assert simhash32(["x", "y"]) == simhash32(["y", "x", "x"])  # distinct words


def test_simhash_similar_docs_close():
    base = [f"w{i}" for i in range(40)]
    a = simhash32(base)
    b = simhash32(base[:-1] + ["zz"])
    c = simhash32([f"q{i}" for i in range(40)])
    ham = lambda x, y: bin(x ^ y).count("1")  # noqa: E731
    assert ham(a, b) < ham(a, c)


def test_keyword_candidates_drop_stopwords_and_track_offsets():
    text = "data of the data pipeline"
    cands = candidates_with_offsets(text, (1, 2))
    assert "of" not in cands and "the" not in cands
    assert cands["data"] == [(0, 4), (12, 16)]
    assert "data pipeline" in cands  # bigram without stopwords
    assert all("of" not in k.split() for k in cands)


def test_keyword_scorers():
    texts = ["data query scan the table with fast merge data query"]
    cos = extract_keywords(texts, top_n=3, scorer="cosine")[0]
    assert len(cos) == 3
    assert cos[0].score >= cos[1].score >= cos[2].score
    mmr = extract_keywords(texts, top_n=3, scorer="mmr")[0]
    assert mmr[0].text == cos[0].text  # MMR first pick = most doc-similar
    assert len({k.text for k in mmr}) == 3
    ms = extract_keywords(texts, top_n=3, scorer="maxsum")[0]
    assert len(ms) == 3
    # determinism
    again = extract_keywords(texts, top_n=3, scorer="mmr")[0]
    assert [(k.text, k.score) for k in again] == [(k.text, k.score) for k in mmr]


def test_keyword_empty_text():
    assert extract_keywords([""])[0] == []
    assert extract_keywords(["the of and"])[0] == []


def test_kgram_rolling_hash_equals_naive():
    """The O(1) rolling recurrence (h*31 + in - out*31^k mod 2^32) must
    produce exactly the per-gram polynomial hash the SQL form computes."""
    from kgforge.textops import h32, kgram_hashes

    texts = ["the quick brown fox jumps over the lazy dog", "abc",
             "abcdefgh", "", "aaaaaaaaaaaa", "A" * 7,
             "Ünïcödé tèxt wíth mültibyte çhärs 北京 テスト"]
    for t in texts:
        lo = t.lower()
        naive = ([h32(lo[i:i + 8]) for i in range(len(lo) - 7)]
                 if len(lo) >= 8 else [])
        assert kgram_hashes(t, 8) == naive, t
    # different k
    t = "rolling hash windows"
    lo = t.lower()
    assert kgram_hashes(t, 4) == [h32(lo[i:i + 4]) for i in range(len(lo) - 3)]


def test_kgram_rolling_hash_property():
    """Property: for ANY text and window size, the O(1) rolling recurrence
    equals the independent per-gram polynomial hash."""
    from hypothesis import given, settings, strategies as st

    from kgforge.textops import h32, kgram_hashes

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=0, max_size=80), st.integers(2, 12))
    def check(t, k):
        lo = t.lower()
        naive = ([h32(lo[i:i + k]) for i in range(len(lo) - k + 1)]
                 if len(lo) >= k else [])
        assert kgram_hashes(t, k) == naive

    check()


def test_h32_sql_astral_cross_engine(spark):
    """Astral-plane regression: Spark's UTF8String is code-point-based, so
    ascii(substring(...)) yields full code points (not UTF-16 surrogate
    halves) — Python, Spark and DuckDB hash '😀' identically. Pins the
    verified engine behavior the h32_sql docstring asserts."""
    import duckdb
    from kgforge.textops import h32, h32_sql

    word = "a😀中"
    want = h32(word)
    got_spark = spark.sql(
        f"SELECT {h32_sql(chr(39) + word + chr(39), 'spark')} AS h"
    ).collect()[0]["h"]
    got_duck = duckdb.connect().execute(
        f"SELECT {h32_sql(chr(39) + word + chr(39), 'duckdb')} AS h"
    ).fetchone()[0]
    assert got_spark == want and got_duck == want
