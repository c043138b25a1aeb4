from __future__ import annotations

from kgforge.maskedlm import MaskedToken, StandInMLMHead, predict_masked


def _head(planted=None):
    return StandInMLMHead(["paris", "berlin", "tokyo", "banana"], planted)


def test_planted_fill_wins():
    head = _head({"in": "paris"})
    out = predict_masked(["Amy lives in [MASK] today"], head)
    assert len(out) == 1 and len(out[0]) == 1
    tok = out[0][0]
    assert tok.text == "paris"
    assert tok.id == 0
    assert tok.score > 10


def test_no_mask_yields_empty_list():
    out = predict_masked(["no mask here", "also none"], _head())
    assert out == [[], []]


def test_multiple_masks_in_order():
    head = _head({"in": "paris", "visit": "tokyo"})
    out = predict_masked(["Amy lives in [MASK] and will visit [MASK] soon"], head)
    assert [t.text for t in out[0]] == ["paris", "tokyo"]


def test_marker_adjacent_to_punctuation_is_found():
    """replace_mask_token replaces the marker anywhere in the text
    (masked_language.rs:581-590) — '[MASK].' must not be silently skipped."""
    head = _head({"in": "paris", "visit": "tokyo"})
    out = predict_masked(["Amy lives in [MASK]. She will visit [MASK], later"],
                         head)
    assert [t.text for t in out[0]] == ["paris", "tokyo"]


def test_deterministic_without_planting():
    a = predict_masked(["x [MASK]"], _head())
    b = predict_masked(["x [MASK]"], _head())
    assert a == b
    assert isinstance(a[0][0], MaskedToken)
