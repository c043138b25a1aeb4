"""Pipeline-math parity tests for NER, ported from the reference:
- consolidation label aggregation + score product (token_classification.rs:1137-1232)
- BIOES EntityBuilder transitions — every branch (ner.rs:355-426)
- structural golden cases from /root/reference/tests/bert.rs:388-451
  (scores recomputed under the stand-in encoder).
"""

from __future__ import annotations

import math

import pytest

from kgforge.config import NER_LABELS, PipelineConfig
from kgforge.encoders import StandInTokenClassifier
from kgforge.ner import (
    Token,
    consolidate_entities,
    consolidate_tokens,
    predict_entities,
    predict_tokens,
)
from kgforge.synth import build_gazetteer


def tok(text, label, score=0.9, mask=0, begin=0, end=1, word_index=1):
    return Token(text=text, score=score, label=label,
                 label_index=NER_LABELS.index(label) if label in NER_LABELS else 0,
                 sentence=0, index=0, word_index=word_index,
                 begin=begin, end=end, mask=mask)


# --- consolidation ----------------------------------------------------------

def test_consolidate_score_product_agreeing():
    # agreeing sub-tokens multiply scores (token_classification.rs:1174-1182)
    group = [tok("Amél", "B-PER", 0.9, mask=0, begin=0, end=4),
             tok("ie", "B-PER", 0.8, mask=1, begin=4, end=6)]
    out = consolidate_tokens(group, "first")
    assert len(out) == 1
    assert out[0].text == "Amélie"
    assert math.isclose(out[0].score, 0.9 * 0.8)
    assert (out[0].begin, out[0].end) == (0, 6)


def test_consolidate_score_product_disagreeing():
    # disagreeing sub-token contributes (1 - score)
    group = [tok("Amél", "B-PER", 0.9, mask=0),
             tok("ie", "I-PER", 0.8, mask=1)]
    out = consolidate_tokens(group, "first")
    assert math.isclose(out[0].score, 0.9 * (1 - 0.8))
    assert out[0].label == "B-PER"


def test_consolidate_last_aggregation():
    group = [tok("Amél", "B-PER", 0.9, mask=0), tok("ie", "I-LOC", 0.8, mask=1)]
    out = consolidate_tokens(group, "last")
    assert out[0].label == "I-LOC"


def test_consolidate_custom_aggregation_callable():
    """LabelAggregationOption::Custom(fn) (token_classification.rs:221):
    a user callable over the sub-token group decides the word label."""
    group = [tok("Amél", "B-PER", 0.9, mask=0), tok("ie", "I-LOC", 0.99, mask=1)]

    def highest_score(g):
        best = max(g, key=lambda t: t.score)
        return best.label_index, best.label

    out = consolidate_tokens(group, highest_score)
    assert out[0].label == "I-LOC"
    # score product still follows agreement with the CHOSEN label
    assert math.isclose(out[0].score, (1 - 0.9) * 0.99)


def test_consolidate_mode_tie_break_by_count_then_max_score():
    # Mode: max by (count, max score) — token_classification.rs:1218-1232
    group = [
        tok("a", "B-PER", 0.5, mask=0),
        tok("b", "I-LOC", 0.99, mask=1),
        tok("c", "B-PER", 0.4, mask=1),
    ]
    out = consolidate_tokens(group, "mode")
    assert out[0].label == "B-PER"  # count 2 beats count 1 despite 0.99

    group_tied = [
        tok("a", "B-PER", 0.5, mask=0),
        tok("b", "I-LOC", 0.99, mask=1),
    ]
    out = consolidate_tokens(group_tied, "mode")
    assert out[0].label == "I-LOC"  # counts tie at 1, max score wins


def test_consolidate_leaves_single_tokens_untouched():
    toks = [tok("Amy", "B-PER", 0.7, mask=0), tok("runs", "O", 0.9, mask=0)]
    assert consolidate_tokens(toks, "first") == toks


# --- BIOES chunking: every EntityBuilder branch ------------------------------

def _ents(labels, scores=None):
    scores = scores or [0.9] * len(labels)
    toks = [tok(f"w{i}", lab, s, begin=i * 2, end=i * 2 + 1, word_index=i + 1)
            for i, (lab, s) in enumerate(zip(labels, scores))]
    return consolidate_entities(toks)


def test_bioes_o_flushes():
    ents = _ents(["B-PER", "I-PER", "O"])
    assert len(ents) == 1
    assert ents[0].word == "w0 w1"
    assert ents[0].label == "PER"
    assert math.isclose(ents[0].score, 0.9 * 0.9)
    assert (ents[0].begin, ents[0].end) == (0, 3)


def test_bioes_b_flushes_and_starts():
    ents = _ents(["B-PER", "B-PER"])
    assert [e.word for e in ents] == ["w0", "w1"]


def test_bioes_single_tag():
    ents = _ents(["S-LOC", "S-LOC", "O"])
    assert [e.word for e in ents] == ["w0", "w1"]
    assert all(e.label == "LOC" for e in ents)


def test_bioes_inside_without_begin_starts_new():
    # reference golden shape: conll I-tags with no B (tests/bert.rs:388-421)
    ents = _ents(["O", "I-PER", "O", "O", "I-LOC"])
    assert [(e.word, e.label) for e in ents] == [("w1", "PER"), ("w4", "LOC")]


def test_bioes_label_change_flushes():
    ents = _ents(["I-PER", "I-LOC"])
    assert [(e.word, e.label) for e in ents] == [("w0", "PER"), ("w1", "LOC")]


def test_bioes_continuation_after_end_flushes():
    # entity STARTED by E: next I flushes (prev_tag in (E,S))
    ents = _ents(["E-PER", "I-PER"])
    assert [e.word for e in ents] == ["w0", "w1"]


def test_bioes_begin_then_end_then_inside_continues():
    # previous_node keeps the STARTING tag (B), so B I E I continues
    # (ner.rs:381-399 does not update previous_node on continuation)
    ents = _ents(["B-PER", "I-PER", "E-PER", "I-PER"])
    assert len(ents) == 1
    assert ents[0].word == "w0 w1 w2 w3"


def test_bioes_trailing_entity_flushed_at_end():
    ents = _ents(["O", "B-ORG", "I-ORG"])
    assert [e.word for e in ents] == ["w1 w2"]


def test_bioes_invalid_tag_raises():
    with pytest.raises(ValueError):
        _ents(["X-PER"])


def test_bioes_score_is_product():
    ents = _ents(["B-ORG", "I-ORG", "I-ORG"], [0.9, 0.8, 0.7])
    assert math.isclose(ents[0].score, 0.9 * 0.8 * 0.7)


# --- end-to-end on the stand-in encoder (reference golden structure) --------

@pytest.fixture(scope="module")
def encoder():
    return StandInTokenClassifier(build_gazetteer())


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig()


def test_golden_amy_paris(encoder, cfg):
    # mirrors bert_pre_trained_ner (tests/bert.rs:388-421): two inputs,
    # entity words + classes asserted; scores recomputed under the stand-in
    inputs = ["My name is Amy Silva. I live in Paris.",
              "Paris is a city in France."]
    toks = predict_tokens(inputs, encoder, cfg)
    ents0 = consolidate_entities(toks[0])
    assert ("Amy Silva", "PER") in [(e.word, e.label) for e in ents0]
    assert ("Paris", "LOC") in [(e.word, e.label) for e in ents0]
    ents1 = consolidate_entities(toks[1])
    assert [(e.word, e.label) for e in ents1][0] == ("Paris", "LOC")
    for e in ents0 + ents1:
        assert e.score > 0.95
        assert inputs[0][e.begin:e.end] == e.word or inputs[1][e.begin:e.end] == e.word


def test_golden_full_entities(encoder, cfg):
    # mirrors bert_pre_trained_ner_full_entities (tests/bert.rs:425-451)
    text = "Asked John Smith about Acme Corp in New York."
    toks = predict_tokens([text], encoder, cfg)
    ents = consolidate_entities(toks[0])
    got = [(e.word, e.label) for e in ents]
    assert got == [("John Smith", "PER"), ("Acme Corp", "ORG"), ("New York", "LOC")]
    for e in ents:
        assert text[e.begin:e.end] == e.word


def test_predict_entities_drops_o(encoder, cfg):
    toks = predict_tokens(["Amy lives in Paris."], encoder, cfg)
    ents = predict_entities(toks[0])
    assert all(e.label in ("PER", "LOC", "ORG", "MISC") for e in ents)
    words = [e.word for e in ents]
    assert "Amy" in words and "Paris" in words
    assert "lives" not in words


def test_long_document_sliding_window_consistency(encoder, cfg):
    """Entities found in a giant doc (multi-span) == entities found when the
    same sentences are fed separately — ownership dedup works."""
    sent = "Amy Silva works for Acme Corp. "
    long_text = ("filler words here and there. " * 20 + sent) * 5
    toks = predict_tokens([long_text], encoder, cfg)
    ents = consolidate_entities(toks[0])
    pairs = {(e.word, e.label, e.begin) for e in ents}
    assert sum(1 for w, l, _ in pairs if w == "Amy Silva") == 5
    assert sum(1 for w, l, _ in pairs if w == "Acme Corp") == 5
    for e in ents:
        assert long_text[e.begin:e.end] == e.word
