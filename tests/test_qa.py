"""Extractive QA pipeline math (port of question_answering.rs; structure of
the reference's QA integration tests with scores under the stand-in head)."""

from __future__ import annotations

import numpy as np

from kgforge.qa import (
    _decode,
    generate_qa_features,
    predict_qa,
)


def test_features_pair_layout_and_pmask():
    feats = generate_qa_features("Where is Amy ?", "Amy lives in Paris .",
                                 max_seq_len=64)
    assert len(feats) == 1
    f = feats[0]
    # [CLS] q [SEP] ... [SEP]: p_mask covers CLS+question+first SEP and last SEP
    from kgforge.tokenization import tokenize_with_offsets
    qlen = len(tokenize_with_offsets("Where is Amy ?").ids)
    assert f.p_mask[:qlen + 2] == [1] * (qlen + 2)
    assert f.p_mask[-1] == 1
    assert all(m == 0 for m in f.p_mask[qlen + 2:-1])
    # context offsets are context-char offsets
    ctx = "Amy lives in Paris ."
    for p in range(qlen + 2, len(f.input_ids) - 1):
        assert ctx[f.begins[p]:f.ends[p]].strip() != ""


def test_long_context_multiple_spans_stride():
    ctx = " ".join(f"w{i}" for i in range(100))
    feats = generate_qa_features("q ?", ctx, max_seq_len=32, doc_stride=8,
                                 max_query_length=8)
    assert len(feats) > 1
    # span k starts at end_{k-1} - doc_stride
    ends_begin = [f.begins[f.p_mask.index(0)] for f in feats]
    assert ends_begin == sorted(ends_begin)


def test_decode_triu_and_max_answer_len():
    s = np.array([0.1, 0.6, 0.2, 0.1])
    e = np.array([0.1, 0.1, 0.7, 0.1])
    cands = _decode(s, e, top_k=16, max_answer_len=2)
    for sp, ep, score in cands:
        if score > 0:
            assert 0 <= ep - sp < 2
    # best in-window pair is (1,2)
    assert (cands[0][0], cands[0][1]) == (1, 2)
    # top_k=1 path (argmax)
    one = _decode(s, e, top_k=1, max_answer_len=2)
    assert (one[0][0], one[0][1]) == (1, 2)


def test_predict_extracts_planted_answer():
    context = "The Eiffel Tower stands in Paris near the Seine river today."
    out = predict_qa(
        [("Where does the tower stand ?", context)],
        answer_map={"Where does the tower stand ?": "Paris"},
        top_k=1,
    )
    assert len(out) == 1 and len(out[0]) == 1
    a = out[0][0]
    assert a.answer == "Paris"
    assert context[a.start:a.end] == "Paris"
    assert a.score > 0.5


def test_predict_multiword_answer_and_charslice():
    context = "Asked about it , John Smith said nothing at all yesterday ."
    out = predict_qa(
        [("Who said nothing ?", context)],
        answer_map={"Who said nothing ?": "John Smith"},
        top_k=3,
    )
    top = out[0][0]
    assert top.answer == "John Smith"
    assert context[top.start:top.end] == "John Smith"
    # top_k answers are deduped and sorted descending
    scores = [a.score for a in out[0]]
    assert scores == sorted(scores, reverse=True)
    assert len({(a.start, a.end) for a in out[0]}) == len(out[0])


def test_answer_found_across_sliding_windows():
    filler = " ".join(f"w{i}" for i in range(120))
    context = filler + " The answer is Quito here ."
    out = predict_qa(
        [("What is the answer ?", context)],
        answer_map={"What is the answer ?": "Quito"},
        top_k=1, max_seq_len=48, doc_stride=8, max_query_length=8,
    )
    assert out[0][0].answer == "Quito"


def test_unanswerable_returns_low_scores_not_crash():
    out = predict_qa([("Who ?", "nothing relevant here at all .")],
                     answer_map={}, top_k=2)
    assert len(out[0]) == 2  # best-effort spans, low scores
    assert all(0 <= a.score <= 1 for a in out[0])


def test_empty_inputs():
    assert predict_qa([], answer_map={}) == []
