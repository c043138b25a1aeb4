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
