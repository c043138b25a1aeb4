"""Zero-shot scoring math, ported from the reference:
- multilabel: per (premise, hypothesis) pair, softmax over
  [contradiction, entailment] = logits[..., 0::2], take entailment
  (zero_shot_classification.rs:1009) — mirrors tests/bart.rs:265-307 in
  structure, scores recomputed under the stand-in NLI;
- single-label: softmax of the entailment logit ACROSS labels
  (zero_shot_classification.rs:868) — mirrors tests/bart.rs:204-234;
- empty input -> empty output errors in the reference (tests/bart.rs:237-258).
"""

from __future__ import annotations

import numpy as np
import pytest

from kgforge.config import RELATIONS
from kgforge.encoders import (
    StandInNLI,
    multilabel_entailment_scores,
    single_label_scores,
    softmax,
)
from kgforge.triples import generate_candidates, score_candidates


@pytest.fixture(scope="module")
def nli():
    return StandInNLI()


def test_multilabel_slice_math():
    logits = np.array([[1.0, 5.0, 3.0], [4.0, 0.0, -1.0]])
    scores = multilabel_entailment_scores(logits)
    # pair softmax over [l0, l2]
    exp0 = np.exp(3.0) / (np.exp(1.0) + np.exp(3.0))
    exp1 = np.exp(-1.0) / (np.exp(4.0) + np.exp(-1.0))
    assert np.allclose(scores, [exp0, exp1])


def test_single_label_softmax_across_labels():
    entail = np.array([[2.0, 1.0, 0.0]])
    s = single_label_scores(entail)
    assert np.allclose(s.sum(axis=-1), 1.0)
    assert s[0].argmax() == 0
    assert np.allclose(s, softmax(entail, -1))


def test_entailed_relation_scores_high(nli):
    prem = "Sources confirmed that Amy Silva lives in Paris since 2019."
    hyp_good = "Amy Silva lives in Paris."
    hyp_bad = "Amy Silva works for Paris."
    logits = nli.forward_pairs([prem, prem], [hyp_good, hyp_bad])
    scores = multilabel_entailment_scores(logits)
    assert scores[0] > 0.95
    assert scores[1] < 0.05


def test_distractor_not_entailed(nli):
    prem = "Amy Silva visited Paris yesterday."
    hyp = "Amy Silva lives in Paris."
    s = multilabel_entailment_scores(nli.forward_pairs([prem], [hyp]))
    assert s[0] < 0.05


def test_svo_scan_matches_regex_semantics(nli):
    """_svo_in replaced the per-candidate dynamic regex (r6: the compile
    cost was 22% of pipeline Python time); it must match
    re.search(escape(subj)+r'\\s+'+escape(trigger)+r'\\s+'+escape(obj), p)
    verdict-for-verdict, including multi-whitespace runs, false subj
    prefixes, repeated subj occurrences, and no-whitespace adjacency."""
    import re as _re
    cases = [
        ("Amy Silva lives in Paris since 2019.", "Amy Silva", "lives in", "Paris"),
        ("Amy Silva  \t lives in\nParis.", "Amy Silva", "lives in", "Paris"),
        ("Amy Silvana lives in Paris.", "Amy Silva", "lives in", "Paris"),
        ("x Amy Silva x Amy Silva lives in Paris", "Amy Silva", "lives in", "Paris"),
        ("Amy Silvalives in Paris", "Amy Silva", "lives in", "Paris"),
        ("Amy Silva lives inParis", "Amy Silva", "lives in", "Paris"),
        ("nothing here", "Amy Silva", "lives in", "Paris"),
        ("a (b) c", "a", "(b)", "c"),          # regex-special chars escaped
        ("", "a", "b", "c"),
    ]
    for prem, subj, trig, obj in cases:
        pat = (_re.escape(subj) + r"\s+" + _re.escape(trig)
               + r"\s+" + _re.escape(obj))
        want = _re.search(pat, prem) is not None
        got = nli._svo_in(prem, subj, trig, obj)
        assert got == want, (prem, subj, trig, obj)


def test_scores_deterministic(nli):
    prem, hyp = ["a b c"], ["x lives in y."]
    a = nli.forward_pairs(prem, hyp)
    b = nli.forward_pairs(prem, hyp)
    assert np.array_equal(a, b)


def test_candidate_generation_type_gating():
    ents = [
        {"word": "Amy", "label": "PER", "begin": 0, "end": 3},
        {"word": "Paris", "label": "LOC", "begin": 13, "end": 18},
        {"word": "Acme Corp", "label": "ORG", "begin": 30, "end": 39},
    ]
    cands = generate_candidates(ents)
    preds = {(c.subj_word, c.pred, c.obj_word) for c in cands}
    assert ("Amy", "lives_in", "Paris") in preds
    assert ("Amy", "works_for", "Acme Corp") in preds
    assert ("Acme Corp", "located_in", "Paris") in preds
    assert ("Acme Corp", "founded_by", "Amy") in preds
    # no (LOC, *) subject relations exist
    assert not any(c.subj_word == "Paris" for c in cands)
    # hypotheses instantiate the template
    for c in cands:
        assert c.hypothesis == RELATIONS[c.pred]["template"].format(
            subj=c.subj_word, obj=c.obj_word)


def test_candidate_distance_gate():
    ents = [
        {"word": "Amy", "label": "PER", "begin": 0, "end": 3},
        {"word": "Paris", "label": "LOC", "begin": 500, "end": 505},
    ]
    assert generate_candidates(ents, max_pair_distance=200) == []


def test_empty_input_empty_output(nli):
    assert score_candidates([], [], nli).shape == (0,)
    assert generate_candidates([]) == []


def test_score_candidates_batching_invariance(nli):
    prems = [f"Amy Silva lives in Paris p{i}." for i in range(10)]
    hyps = ["Amy Silva lives in Paris."] * 10
    s1 = score_candidates(prems, hyps, nli, batch_size=3)
    s2 = score_candidates(prems, hyps, nli, batch_size=64)
    assert np.array_equal(s1, s2)


def test_classify_zero_shot_single_label(nli):
    from kgforge.triples import classify_zero_shot
    # structure of the reference zero-shot test (tests/bart.rs:204-234);
    # scores recomputed under the stand-in NLI
    out = classify_zero_shot(
        ["Who are you voting for in 2020?"],
        ["politics", "public health", "economics", "sports"], nli)
    assert len(out) == 1 and len(out[0]) == 1
    lab = out[0][0]
    assert lab["label"] in ("politics", "public health", "economics", "sports")
    assert 0 < lab["score"] <= 1
    # single-label scores renormalize across labels
    import numpy as np
    from kgforge.encoders import single_label_scores
    logits = nli.forward_pairs(
        ["Who are you voting for in 2020?"] * 4,
        [f"This example is about {l}." for l in
         ("politics", "public health", "economics", "sports")])
    expect = single_label_scores(logits[None, :, 2])
    assert abs(lab["score"] - float(expect.max())) < 1e-12


def test_classify_zero_shot_multilabel(nli):
    from kgforge.triples import classify_zero_shot
    out = classify_zero_shot(
        ["Amy Silva lives in Paris."],
        ["Amy Silva lives in Paris", "Amy Silva works for Paris"], nli,
        template="{}.", multilabel=True)
    scores = {o["label"]: o["score"] for o in out[0]}
    assert scores["Amy Silva lives in Paris"] > 0.95
    assert scores["Amy Silva works for Paris"] < 0.05


def test_classify_zero_shot_empty_errors(nli):
    import pytest as _pytest
    from kgforge.triples import classify_zero_shot
    with _pytest.raises(ValueError):
        classify_zero_shot([], ["a"], nli)
    with _pytest.raises(ValueError):
        classify_zero_shot(["x"], [], nli)


def test_golden_zero_shot_scores(nli):
    """Exact-score golden case (the reference's zero-shot test style,
    tests/bart.rs:265-307; values recomputed under the stand-in, 1e-4)."""
    from kgforge.encoders import multilabel_entailment_scores, single_label_scores
    prem = "Amy Silva lives in Paris."
    labels = ["Amy Silva lives in Paris", "Amy Silva works for Paris",
              "Paris lives in Amy Silva"]
    logits = nli.forward_pairs([prem] * 3, [f"{l}." for l in labels])
    ml = multilabel_entailment_scores(logits)
    assert np.allclose(ml, [0.999956, 0.000357, 0.000357], atol=1e-4)
    sl = single_label_scores(logits[None, :, 2])[0]
    assert np.allclose(sl, [0.99991, 4.5e-05, 4.5e-05], atol=1e-4)


def test_classify_zero_shot_custom_template_closure(nli):
    """ZeroShotTemplate closure (zero_shot_classification.rs:610): a
    callable template must produce the same scores as the equivalent
    format string."""
    from kgforge.triples import classify_zero_shot
    texts = ["The company opened a new office in Paris."]
    labels = ["geography", "finance"]
    a = classify_zero_shot(texts, labels, nli,
                           template="This text is about {}.")
    b = classify_zero_shot(texts, labels, nli,
                           template=lambda lbl: f"This text is about {lbl}.")
    assert a == b
    c = classify_zero_shot(texts, labels, nli,
                           template=lambda lbl: f"Totally different {lbl}!")
    assert c != a  # the closure really feeds the hypothesis text
