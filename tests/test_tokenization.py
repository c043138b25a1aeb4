"""Sliding-window featurization semantics, ported branch-for-branch from the
reference (generate_features token_classification.rs:808-883; ownership flags
:885-928)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from kgforge.tokenization import (
    MASK_SPECIAL,
    generate_features,
    split_sentences,
    tokenize_with_offsets,
)


def test_offsets_are_char_exact_multibyte():
    text = "Amélie Durand lives in São Paulo."
    tok = tokenize_with_offsets(text)
    for piece, b, e in zip(tok.pieces, tok.begins, tok.ends):
        assert text[b:e] == piece.removeprefix("##")


def test_subword_split_and_masks():
    tok = tokenize_with_offsets("Industries")
    assert tok.pieces == ["Indu", "##stri", "##es"]
    assert tok.masks == [0, 1, 1]


def test_short_text_single_span_all_owned():
    feats = generate_features("Amy lives in Paris.", 0, max_length=64)
    assert len(feats) == 1
    f = feats[0]
    assert f.masks[0] == MASK_SPECIAL and f.masks[-1] == MASK_SPECIAL
    assert all(f.reference_feature), "single span owns every position"


def test_window_stride_and_loop_guard():
    # 100 single-piece words; max_length=32 -> content 30, stride 8
    text = " ".join(["word"] * 100)
    feats = generate_features(text, 0, max_length=32)
    # reference loop: start_{k+1} = end_k - stride
    starts = []
    start = 0
    while len(starts) * 8 < 100:
        starts.append(start)
        end = min(start + 30, 100)
        if end == 100:
            break
        start = end - 8
    assert len(feats) == len(starts)


def test_ownership_exact_cover():
    """Every content token is owned by exactly one span (the invariant the
    reference's start/end cutoffs exist to guarantee)."""
    for n_words in (1, 5, 29, 30, 31, 60, 100, 250):
        text = " ".join(f"w{i}" for i in range(n_words))
        tok = tokenize_with_offsets(text)
        feats = generate_features(text, 0, max_length=32)
        owned_begins = []
        for f in feats:
            for pos, flag in enumerate(f.reference_feature):
                if flag and f.masks[pos] != MASK_SPECIAL:
                    owned_begins.append((f.begins[pos], f.ends[pos]))
        assert sorted(owned_begins) == sorted(zip(tok.begins, tok.ends)), n_words
        assert len(owned_begins) == len(set(owned_begins)) == len(tok.ids)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
               max_size=400))
def test_ownership_exact_cover_property(text):
    tok = tokenize_with_offsets(text)
    feats = generate_features(text, 0, max_length=16)
    owned = sum(
        1 for f in feats
        for pos, flag in enumerate(f.reference_feature)
        if flag and f.masks[pos] != MASK_SPECIAL
    )
    assert owned == len(tok.ids)


def test_empty_text_no_spans():
    assert generate_features("", 0, max_length=32) == []


def test_sentence_split_offsets_compose():
    text = "First one. Second two!\nthird line without period"
    sents = split_sentences(text)
    for begin, sent in sents:
        assert text[begin:begin + len(sent)] == sent
