"""Property-based tests (hypothesis) for the generation decode math —
invariants that must hold for ANY input, complementing the golden tests.
(The reference has no property tests at all, SURVEY §5; these guard the
ported branches against regressions.)"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from kgforge.generation import (
    EOS_ID, PAD_ID, BOS_ID,
    BeamHypotheses, GenerateConfig, StandInLMHead,
    banned_ngram_tokens, enforce_repetition_penalty, generate_ids,
    top_k_top_p_filtering,
)

finite_row = st.lists(
    st.floats(min_value=-30, max_value=30, allow_nan=False,
              allow_infinity=False),
    min_size=4, max_size=24, unique=True)


@given(row=finite_row, top_k=st.integers(1, 30))
@settings(max_examples=60, deadline=None)
def test_top_k_keeps_exactly_k_best(row, top_k):
    logits = np.array([row])
    v = logits.shape[-1]
    top_k_top_p_filtering(logits, top_k=top_k, top_p=1.0,
                          min_tokens_to_keep=1)
    kept = np.isfinite(logits[0])
    assert kept.sum() == min(top_k, v)
    # the kept set is exactly the top-k by value
    order = np.argsort(-np.array(row), kind="stable")
    assert set(np.nonzero(kept)[0]) == set(order[:min(top_k, v)])


@given(row=finite_row, top_p=st.floats(0.05, 0.99))
@settings(max_examples=60, deadline=None)
def test_top_p_keeps_a_value_prefix_covering_p(row, top_p):
    logits = np.array([row])
    orig = np.array(row)
    top_k_top_p_filtering(logits, top_k=0, top_p=top_p,
                          min_tokens_to_keep=1)
    kept_idx = set(np.nonzero(np.isfinite(logits[0]))[0])
    assert kept_idx, "nucleus must never be empty"
    m = len(kept_idx)
    order = np.argsort(-orig, kind="stable")
    # kept = the m best values (a prefix of the sorted order)
    assert kept_idx == set(order[:m])
    # and that prefix covers >= top_p of the original mass
    probs = np.exp(orig - orig.max())
    probs /= probs.sum()
    assert probs[order[:m]].sum() >= top_p - 1e-9


@given(row=finite_row, penalty=st.floats(1.0, 4.0),
       data=st.data())
@settings(max_examples=60, deadline=None)
def test_repetition_penalty_sign_and_order(row, penalty, data):
    logits = np.array([row])
    prev = data.draw(st.lists(
        st.integers(0, len(row) - 1), min_size=1, max_size=6))
    before = logits.copy()
    enforce_repetition_penalty(logits, [prev], penalty)
    for tok in range(len(row)):
        b, a = before[0, tok], logits[0, tok]
        if tok not in prev:
            assert a == b
        else:
            assert (a < 0) == (b < 0) or a == b == 0   # sign preserved
            assert a <= b + 1e-12                       # never increases


@given(row=st.lists(st.integers(0, 5), min_size=1, max_size=20),
       n=st.integers(2, 4))
@settings(max_examples=80, deadline=None)
def test_banned_ngrams_match_bruteforce(row, n):
    cur_len = len(row)
    got = set(banned_ngram_tokens([row], n, cur_len)[0])
    want = set()
    if cur_len + 1 >= n:
        query = tuple(row[cur_len + 1 - n:])
        for k in range(len(row) - n + 1):
            if tuple(row[k:k + n - 1]) == query:
                want.add(row[k + n - 1])
    assert got == want


@given(scores=st.lists(st.floats(-50, 0, allow_nan=False), min_size=1,
                       max_size=12, unique=True),
       num_beams=st.integers(1, 4))
@settings(max_examples=60, deadline=None)
def test_beam_hypotheses_keep_top_n(scores, num_beams):
    """After any add sequence, the kept hypotheses are exactly the
    top-num_beams by normalized score, and worst_score tracks their min.
    (length 1 hypotheses -> score == sum_logprob for any length penalty)."""
    h = BeamHypotheses(num_beams, None, 1.0, early_stopping=False)
    for s in scores:
        h.add([7], s)
    kept = sorted((s for s, *_ in h.beams), reverse=True)
    want = sorted(scores, reverse=True)[:num_beams]
    assert kept == sorted(want, reverse=True)
    assert h.worst_score == min(want)


@given(seed=st.integers(0, 10_000), max_length=st.integers(3, 12),
       n=st.integers(2, 3))
@settings(max_examples=25, deadline=None)
def test_greedy_decode_invariants(seed, max_length, n):
    """For any head seed: prompt is a prefix, length <= max_length, nothing
    but PAD after EOS, and no n-gram repeats anywhere in the row."""
    head = StandInLMHead(["w1", "w2", "w3", "w4", "w5"], seed=seed)
    cfg = GenerateConfig(do_sample=False, num_beams=1,
                         max_length=max_length, min_length=0,
                         no_repeat_ngram_size=n)
    prompt_ids = [BOS_ID] + head.encode("w1 w2")
    ids, _ = generate_ids(head, ["w1 w2"], cfg)[0]
    assert ids[:len(prompt_ids)] == prompt_ids
    assert len(ids) <= max(max_length, len(prompt_ids) + 1)
    if EOS_ID in ids:
        after = ids[ids.index(EOS_ID) + 1:]
        assert all(t == PAD_ID for t in after)
    live = ids[:ids.index(EOS_ID)] if EOS_ID in ids else ids
    grams = [tuple(live[k:k + n]) for k in range(len(live) - n + 1)]
    assert len(grams) == len(set(grams)), (live, n)
