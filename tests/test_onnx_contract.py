"""#23 ONNX encoder contract — proves the stand-in <-> real-runtime swap is
a config change (ModelResource::{Torch, ONNX} duality, common.rs:85-89;
input assembly per onnx/encoder.rs:112-160) using a mocked
InferenceSession with the exact onnxruntime surface."""

from __future__ import annotations

import numpy as np
import pytest

from kgforge.config import PipelineConfig
from kgforge.encoders import (ONNXTokenClassifier, StandInTokenClassifier,
                              try_onnx_session)
from kgforge.ner import predict_tokens


class _InputMeta:
    def __init__(self, name):
        self.name = name


class MockInferenceSession:
    """Duck-typed onnxruntime.InferenceSession: get_inputs()/run(). The
    'model weights' are the stand-in gazetteer head, so the adapter's output
    must match the stand-in path bit-for-bit."""

    def __init__(self, input_names, gazetteer, seed=42):
        self._inputs = [_InputMeta(n) for n in input_names]
        self._head = StandInTokenClassifier(gazetteer, seed=seed)
        self.seen_feeds = []

    def get_inputs(self):
        return self._inputs

    def run(self, output_names, feed):
        assert output_names == ["logits"]
        assert set(feed) == {m.name for m in self._inputs}
        for v in feed.values():
            assert v.dtype == np.int64
        self.seen_feeds.append(sorted(feed))
        return [self._head.forward(feed["input_ids"],
                                   feed["attention_mask"], None)]


GAZ = {101: 1, 202: 2}


def test_adapter_matches_standin_logits():
    sess = MockInferenceSession(["input_ids", "attention_mask"], GAZ)
    onnx = ONNXTokenClassifier(sess)
    ids = np.array([[101, 7, 202], [7, 7, 7]], dtype=np.int64)
    attn = np.ones_like(ids)
    ref = StandInTokenClassifier(GAZ).forward(ids, attn, None)
    got = onnx.forward(ids, attn, continuation_mask=np.zeros_like(ids))
    np.testing.assert_array_equal(got, ref)


def test_feed_contains_exactly_declared_inputs():
    sess = MockInferenceSession(
        ["input_ids", "attention_mask", "token_type_ids", "position_ids"],
        GAZ)
    onnx = ONNXTokenClassifier(sess)
    ids = np.array([[101, 202]], dtype=np.int64)
    onnx.forward(ids, np.ones_like(ids))
    assert sess.seen_feeds[-1] == ["attention_mask", "input_ids",
                                   "position_ids", "token_type_ids"]


def test_unknown_expected_input_raises_reference_error():
    sess = MockInferenceSession(["input_ids", "pixel_values"], GAZ)
    onnx = ONNXTokenClassifier(sess)
    ids = np.array([[101]], dtype=np.int64)
    with pytest.raises(ValueError,
                       match="pixel_values not found but expected by model."):
        onnx.forward(ids, np.ones_like(ids))


def test_pipeline_swap_is_config_change():
    """The NER pipeline produces identical entities whether the encoder is
    the stand-in or the session-backed adapter — the real swap test.
    (Inputs use single-piece words so the stand-in's continuation hint is
    inert; a trained contextual model needs no hint at all.)"""
    from kgforge.synth import build_gazetteer
    gaz = build_gazetteer()
    cfg = PipelineConfig()
    texts = ["Zoë works for Acme Corp in Oslo .",
             "no entities here at all"]
    standin = StandInTokenClassifier(gaz)
    adapter = ONNXTokenClassifier(
        MockInferenceSession(["input_ids", "attention_mask"], gaz))
    a = predict_tokens(texts, standin, cfg)
    b = predict_tokens(texts, adapter, cfg)
    assert [[(t.text, t.label, round(t.score, 12)) for t in row]
            for row in a] == \
           [[(t.text, t.label, round(t.score, 12)) for t in row]
            for row in b]
    assert any(t.label != "O" for row in a for t in row)


def test_try_onnx_session_gated_import():
    """onnxruntime is absent in this sandbox (verified in SURVEY): the
    factory must return None, selecting the stand-in path."""
    assert try_onnx_session("/nonexistent/model.onnx") is None


# --------------------------------------------------------------------------
# decoder-with-past contract (ONNXCausalGenerator onnx/models.rs:218-287,
# 372-425; ONNXDecoder feed assembly onnx/decoder.rs:34-110;
# ONNXLayerCache :1106-1129)
# --------------------------------------------------------------------------

import numpy as np
import pytest

from kgforge.encoders import ONNXCausalDecoder, ONNXLayerCache

_V = 13


class _Meta:
    def __init__(self, name):
        self.name = name


def _step(S, ids_col, pos):
    """The mock LM's recurrence: position-weighted cumulative state."""
    return S + (ids_col.astype(np.int64) + 1) * pos


def _logits_of(S):
    return ((S[:, None] * 31 + np.arange(_V, dtype=np.int64) * 7) % 97).astype(float)


class _MockNoPast:
    """Full-sequence causal decoder: recomputes the state from scratch and
    emits per-position logits + the final KV state."""

    def get_inputs(self):
        return [_Meta(n) for n in ("input_ids", "attention_mask",
                                   "position_ids")]

    def get_outputs(self):
        return [_Meta(n) for n in ("logits", "present.0.key",
                                   "present.0.value")]

    def run(self, _names, feed):
        ids = feed["input_ids"]
        b, t = ids.shape
        S = np.zeros((b,), np.int64)
        logits = np.zeros((b, t, _V))
        for j in range(t):
            S = _step(S, ids[:, j], j + 1)
            logits[:, j, :] = _logits_of(S)
        return [logits, S[:, None], np.full((b, 1), t, np.int64)]


class _MockWithPast:
    """Single-new-token decoder: consumes the cached state, never re-reads
    old tokens — the whole point of the with-past session."""

    def get_inputs(self):
        return [_Meta(n) for n in ("input_ids", "attention_mask",
                                   "past_key_values.0.key",
                                   "past_key_values.0.value")]

    def get_outputs(self):
        return [_Meta(n) for n in ("logits", "present.0.key",
                                   "present.0.value")]

    def run(self, _names, feed):
        ids = feed["input_ids"]
        b, t = ids.shape
        assert t == 1, "with-past session receives ONLY the new token"
        S = feed["past_key_values.0.key"][:, 0]
        n = feed["past_key_values.0.value"][:, 0]
        S = _step(S, ids[:, 0], n + 1)
        return [_logits_of(S)[:, None, :], S[:, None], (n + 1)[:, None]]


def test_cached_incremental_decode_equals_full_redecode():
    """The KV-cache contract: greedy steps through the with-past session
    (new token only per step) must produce BIT-identical logits to
    re-running the full sequence through the no-past session each step —
    and the name rewrite past_key_values.* -> present.* must be what wires
    the cache back in."""
    dec = ONNXCausalDecoder(_MockNoPast(), _MockWithPast())
    full = ONNXCausalDecoder(_MockNoPast(), None)
    seq = np.array([[3, 5]], dtype=np.int64)
    mask = np.ones_like(seq)
    logits, cache = dec.forward(seq, mask)
    assert isinstance(cache, ONNXLayerCache)
    assert set(cache.values) == {"present.0.key", "present.0.value"}
    history = [3, 5]
    for tok in (2, 7, 1):
        history.append(tok)
        new = np.array([[tok]], dtype=np.int64)
        mask = np.ones((1, len(history)), dtype=np.int64)
        logits, cache = dec.forward(new, mask, cache=cache)
        f_ids = np.array([history], dtype=np.int64)
        f_logits, _ = full.forward(f_ids, np.ones_like(f_ids))
        np.testing.assert_array_equal(logits[:, -1, :], f_logits[:, -1, :])


def test_decoder_dispatch_fallbacks_and_errors():
    # both sessions absent -> the reference's construction error
    with pytest.raises(ValueError, match="Must provide at least one"):
        ONNXCausalDecoder(None, None)
    # with-past only + no cache -> models.rs:417 error
    wp_only = ONNXCausalDecoder(None, _MockWithPast())
    seq = np.array([[3]], dtype=np.int64)
    with pytest.raises(ValueError, match="No decoder_without_cache loaded"):
        wp_only.forward(seq, np.ones_like(seq))
    # no-past only + cache given -> models.rs:406-415 fallback: the FULL
    # sequence re-runs on the no-past session, cache ignored
    np_only = ONNXCausalDecoder(_MockNoPast(), None)
    _, cache = np_only.forward(seq, np.ones_like(seq))
    ids = np.array([[3, 9]], dtype=np.int64)
    logits, _ = np_only.forward(ids, np.ones_like(ids), cache=cache)
    ref, _ = np_only.forward(ids, np.ones_like(ids))
    np.testing.assert_array_equal(logits, ref)
    # cache missing the expected tensor -> decoder.rs:88-92 error
    bad = ONNXLayerCache({"present.9.key": np.zeros((1, 1), np.int64)})
    wp = ONNXCausalDecoder(None, _MockWithPast())
    with pytest.raises(ValueError, match="not found in cache"):
        wp.forward(seq, np.ones((1, 2), np.int64), cache=bad)
    # session declares a past input but caller passed no cache at all ->
    # decoder.rs:74-78 error (reachable via the without-past slot holding a
    # with-past-shaped session)
    odd = ONNXCausalDecoder(_MockWithPast(), None)
    with pytest.raises(ValueError, match="not found and cache was not provided"):
        odd.forward(seq, np.ones_like(seq))
