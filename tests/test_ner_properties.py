"""Property-based tests for BIOES chunking and QA span decoding —
random-sequence invariants against independent re-implementations,
complementing the branch-by-branch golden tests."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from kgforge.ner import Token, consolidate_entities
from kgforge.qa import _decode

TAGS = ["O", "B-PER", "I-PER", "E-PER", "S-PER", "B-ORG", "I-ORG",
        "E-ORG", "S-ORG"]


def _tok(i, label):
    return Token(text=f"w{i}", score=0.9, label=label, label_index=0,
                 sentence=0, index=i, word_index=i, begin=i * 3,
                 end=i * 3 + 2, mask=0)


def _oracle_bioes(labels):
    """Independent re-implementation of the EntityBuilder semantics
    (ner.rs:355-426): returns (start, end_exclusive, cls) spans. The open
    entity remembers the tag that OPENED it (previous_node not updated on
    continuation)."""
    spans = []
    open_span = None       # (start, opening_tag, cls)

    def close(pos):
        nonlocal open_span
        if open_span is not None:
            s, _t, c = open_span
            if pos > s:
                spans.append((s, pos, c))
        open_span = None

    for pos, label in enumerate(labels):
        tag = label.split("-")[0]
        cls = label.split("-")[1] if "-" in label else ""
        if tag == "O":
            close(pos)
        elif tag in ("B", "S"):
            close(pos)
            open_span = (pos, tag, cls)
        else:
            if open_span is None:
                open_span = (pos, tag, cls)
            elif open_span[1] in ("E", "S") or open_span[2] != cls:
                close(pos)
                open_span = (pos, tag, cls)
    close(len(labels))
    return spans


@given(labels=st.lists(st.sampled_from(TAGS), min_size=0, max_size=24))
@settings(max_examples=150, deadline=None)
def test_bioes_matches_independent_oracle(labels):
    tokens = [_tok(i, lab) for i, lab in enumerate(labels)]
    got = consolidate_entities(tokens)
    want = _oracle_bioes(labels)
    assert len(got) == len(want)
    for e, (s, t, cls) in zip(got, want):
        n = t - s
        assert e.label == cls
        assert e.word == " ".join(f"w{i}" for i in range(s, t))
        assert (e.begin, e.end) == (s * 3, (t - 1) * 3 + 2)
        assert math.isclose(e.score, 0.9 ** n)


@given(labels=st.lists(st.sampled_from(TAGS), min_size=0, max_size=24))
@settings(max_examples=60, deadline=None)
def test_bioes_entities_are_disjoint_ordered_nonempty(labels):
    got = consolidate_entities([_tok(i, lab) for i, lab in enumerate(labels)])
    prev_end = -1
    for e in got:
        assert e.word                      # never empty
        assert e.begin > prev_end          # disjoint, in order
        prev_end = e.end


def test_bioes_invalid_tag_panics_like_reference():
    with pytest.raises(ValueError, match="Invalid tag"):
        consolidate_entities([_tok(0, "X-PER")])


# --------------------------------------------------------------------------
# QA outer-product decode (question_answering.rs:892-917)
# --------------------------------------------------------------------------

@given(n=st.integers(2, 12), k=st.integers(1, 5),
       max_len=st.integers(1, 6), seed=st.integers(0, 10_000))
@settings(max_examples=80, deadline=None)
def test_qa_decode_matches_bruteforce(n, k, max_len, seed):
    rng = np.random.default_rng(seed)
    start = rng.random(n)
    end = rng.random(n)
    got = _decode(start, end, top_k=k, max_answer_len=max_len)
    # brute force: all (s, e) with s <= e < s + max_len ranked by product
    cand = [(s, e, start[s] * end[e])
            for s in range(n) for e in range(n)
            if s <= e < s + max_len]
    cand.sort(key=lambda t: -t[2])
    want = cand[:k]
    assert len(got) == min(k, len(got))
    for (gs, ge, gp), (ws, we, wp) in zip(got, want):
        assert math.isclose(gp, wp, rel_tol=1e-12)
        assert gs <= ge < gs + max_len
    # scores descending
    ps = [p for _, _, p in got]
    assert ps == sorted(ps, reverse=True)
