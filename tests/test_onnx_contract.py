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

    def __init__(self):
        self.calls = 0

    def get_inputs(self):
        return [_Meta(n) for n in ("input_ids", "attention_mask",
                                   "position_ids")]

    def get_outputs(self):
        return [_Meta(n) for n in ("logits", "present.0.key",
                                   "present.0.value")]

    def run(self, _names, feed):
        self.calls += 1
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

    def __init__(self):
        self.calls = 0

    def get_inputs(self):
        return [_Meta(n) for n in ("input_ids", "attention_mask",
                                   "past_key_values.0.key",
                                   "past_key_values.0.value")]

    def get_outputs(self):
        return [_Meta(n) for n in ("logits", "present.0.key",
                                   "present.0.value")]

    def run(self, _names, feed):
        self.calls += 1
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


# --------------------------------------------------------------------------
# seq2seq (conditional) generator contract — ONNXConditionalGenerator
# (onnx/models.rs:558-847 construction, :900-983 dispatch), encoder session
# per onnx/encoder.rs:17-210, decoder feed with encoder_hidden_states /
# encoder_attention_mask per onnx/decoder.rs:44-68
# --------------------------------------------------------------------------

from kgforge.encoders import ONNXConditionalGenerator


class _MockSeq2SeqEncoder:
    """Encoder session: last_hidden_state[b,t,0] = ids[b,t]*mask[b,t] — a
    deterministic 1-dim 'hidden state' the decoders cross-attend to."""

    def __init__(self):
        self.calls = 0

    def get_inputs(self):
        return [_Meta(n) for n in ("input_ids", "attention_mask")]

    def get_outputs(self):
        return [_Meta("last_hidden_state")]

    def run(self, _names, feed):
        self.calls += 1
        ids = feed["input_ids"].astype(np.int64)
        mask = feed["attention_mask"].astype(np.int64)
        return [(ids * mask)[:, :, None]]


class _BareEncoder(_MockSeq2SeqEncoder):
    """Encoder whose session exports no last_hidden_state output."""

    def get_outputs(self):
        return [_Meta("pooler_output")]


def _enc_summary(feed):
    """The mock decoders' cross-attention read: masked sum of the encoder
    hidden states. Both decoders MUST find these tensors in their feed —
    that is the seq2seq feed contract under test."""
    h = feed["encoder_hidden_states"]
    m = feed["encoder_attention_mask"].astype(np.int64)
    return (h[:, :, 0].astype(np.int64) * m).sum(axis=1)


def _s2s_step(S, ids_col, pos, E):
    return S + (ids_col.astype(np.int64) + 1) * pos * (E + 7)


def _s2s_logits(S, E):
    out = ((S[:, None] * 31 + E[:, None] * 13
            + np.arange(_V, dtype=np.int64) * 7) % 97).astype(float)
    out[:, :3] -= 1000.0  # a trained head never argmaxes PAD/BOS, and this
    return out            # one never stops early — decodes run to max_length


class _MockS2SNoPast:
    """Full-target-prefix decoder: recomputes the recurrence from scratch,
    cross-attending to the encoder summary at every step."""

    def __init__(self):
        self.calls = 0

    def get_inputs(self):
        return [_Meta(n) for n in ("input_ids", "encoder_hidden_states",
                                   "encoder_attention_mask")]

    def get_outputs(self):
        return [_Meta(n) for n in ("logits", "present.0.key",
                                   "present.0.value")]

    def run(self, _names, feed):
        self.calls += 1
        ids = feed["input_ids"]
        E = _enc_summary(feed)
        b, t = ids.shape
        S = np.zeros((b,), np.int64)
        logits = np.zeros((b, t, _V))
        for j in range(t):
            S = _s2s_step(S, ids[:, j], j + 1, E)
            logits[:, j, :] = _s2s_logits(S, E)
        return [logits, S[:, None], np.full((b, 1), t, np.int64)]


class _MockS2SWithPast:
    """Single-new-token decoder: cached self-attention state + fresh
    cross-attention over the encoder states every step."""

    def __init__(self):
        self.calls = 0

    def get_inputs(self):
        return [_Meta(n) for n in ("input_ids", "encoder_hidden_states",
                                   "encoder_attention_mask",
                                   "past_key_values.0.key",
                                   "past_key_values.0.value")]

    def get_outputs(self):
        return [_Meta(n) for n in ("logits", "present.0.key",
                                   "present.0.value")]

    def run(self, _names, feed):
        self.calls += 1
        ids = feed["input_ids"]
        b, t = ids.shape
        assert t == 1, "with-past session receives ONLY the new target token"
        E = _enc_summary(feed)
        S = feed["past_key_values.0.key"][:, 0]
        n = feed["past_key_values.0.value"][:, 0]
        S = _s2s_step(S, ids[:, 0], n + 1, E)
        return [_s2s_logits(S, E)[:, None, :], S[:, None], (n + 1)[:, None]]


def test_seq2seq_cached_incremental_equals_full_redecode():
    """The seq2seq KV-cache contract: greedy steps through the with-past
    session (new target token only, encoder states re-fed each step) must
    be BIT-identical to re-running the full target prefix through the
    no-past session — with the SAME encoder hidden states both ways."""
    enc = _MockSeq2SeqEncoder()
    wp = _MockS2SWithPast()
    gen = ONNXConditionalGenerator(enc, _MockS2SNoPast(), wp)
    full = ONNXConditionalGenerator(_MockSeq2SeqEncoder(), _MockS2SNoPast(),
                                    None)
    src = np.array([[4, 9, 6], [5, 2, 0]], dtype=np.int64)
    src_mask = np.array([[1, 1, 1], [1, 1, 0]], dtype=np.int64)
    states = gen.encode(src, src_mask)
    assert enc.calls == 1 and states.shape == (2, 3, 1)
    prefix = [[1], [1]]
    dec = np.array(prefix, dtype=np.int64)
    logits, cache = gen.forward(encoder_hidden_states=states,
                                encoder_attention_mask=src_mask,
                                decoder_input_ids=dec)
    assert set(cache.values) == {"present.0.key", "present.0.value"}
    for tok_a, tok_b in ((3, 8), (7, 2), (5, 5)):
        prefix[0].append(tok_a)
        prefix[1].append(tok_b)
        new = np.array([[tok_a], [tok_b]], dtype=np.int64)
        logits, cache = gen.forward(encoder_hidden_states=states,
                                    encoder_attention_mask=src_mask,
                                    decoder_input_ids=new, cache=cache)
        f_logits, _ = full.forward(input_ids=src,
                                   encoder_attention_mask=src_mask,
                                   decoder_input_ids=np.array(prefix,
                                                              np.int64))
        np.testing.assert_array_equal(logits[:, -1, :], f_logits[:, -1, :])
    assert wp.calls == 3


def test_seq2seq_dispatch_fallbacks_and_errors():
    enc = _MockSeq2SeqEncoder()
    # both decoder sessions absent -> construction error (models.rs:745-747)
    with pytest.raises(ValueError, match="Must provide at least one"):
        ONNXConditionalGenerator(enc, None, None)
    # encoder session without last_hidden_state -> models.rs:910-914 error
    bare = ONNXConditionalGenerator(_BareEncoder(), _MockS2SNoPast(), None)
    src = np.array([[4, 9]], dtype=np.int64)
    with pytest.raises(ValueError, match="`last_hidden_state` not found"):
        bare.forward(input_ids=src,
                     encoder_attention_mask=np.ones_like(src),
                     decoder_input_ids=src)
    # with-past only + no cache -> models.rs:976-978 error
    wp_only = ONNXConditionalGenerator(_MockSeq2SeqEncoder(), None,
                                       _MockS2SWithPast())
    dec = np.array([[1]], dtype=np.int64)
    with pytest.raises(ValueError, match="No decoder_without_cache loaded"):
        wp_only.forward(input_ids=src,
                        encoder_attention_mask=np.ones_like(src),
                        decoder_input_ids=dec)
    # no-past only + cache given -> models.rs:963-974 fallback: full target
    # prefix re-runs on the no-past session, cache ignored
    np_only = ONNXConditionalGenerator(_MockSeq2SeqEncoder(),
                                       _MockS2SNoPast(), None)
    states = np_only.encode(src, np.ones_like(src))
    _, cache = np_only.forward(encoder_hidden_states=states,
                               decoder_input_ids=dec)
    longer = np.array([[1, 6]], dtype=np.int64)
    a, _ = np_only.forward(encoder_hidden_states=states,
                           decoder_input_ids=longer, cache=cache)
    b, _ = np_only.forward(encoder_hidden_states=states,
                           decoder_input_ids=longer)
    np.testing.assert_array_equal(a, b)
    # encoder declares an input the caller did not offer -> encoder.rs:141
    # error (the encoder path has no cache fallback)
    with pytest.raises(ValueError,
                       match="attention_mask not found but expected"):
        np_only.encoder.forward(input_ids=src)
    # default encoder_attention_mask = ones over (batch, source_len)
    # (models.rs:920-931): forwarding with states but no mask must work and
    # equal the explicit all-ones mask
    c, _ = np_only.forward(encoder_hidden_states=states,
                           decoder_input_ids=dec)
    d, _ = np_only.forward(encoder_hidden_states=states,
                           encoder_attention_mask=np.ones((1, 2), np.int64),
                           decoder_input_ids=dec)
    np.testing.assert_array_equal(c, d)


# --------------------------------------------------------------------------
# pipeline swap: Summarizer / Translator over the ONNX seq2seq head — the
# ModelResource::{Torch, ONNX} duality at the pipeline surface
# --------------------------------------------------------------------------

from kgforge.generation import (GenerateConfig, ONNXSeq2SeqLMHead,
                                Summarizer)
from kgforge.translation import M2M100, Translator

_WORDS = ["data", "join", "merge", "sort", "spark", "graph",
          "alpha", "beta", ">>fr.<<", ">>en.<<"]  # + 3 specials = _V = 13


def _s2s_head(with_past: bool):
    wp = _MockS2SWithPast() if with_past else None
    gen = ONNXConditionalGenerator(_MockSeq2SeqEncoder(), _MockS2SNoPast(),
                                   wp)
    head = ONNXSeq2SeqLMHead(_WORDS, gen)
    assert head.vocab_size == _V  # mock logits cover the head vocab
    return head


_S2S_GREEDY = GenerateConfig(do_sample=False, num_beams=1, max_length=10,
                             min_length=2, no_repeat_ngram_size=3)


def test_summarizer_onnx_swap_cached_equals_uncached():
    """Summarizer over the cached two-session generator must emit the same
    summaries as over the no-past-only generator — and the with-past
    session must actually have served the steps."""
    cached, uncached = _s2s_head(True), _s2s_head(False)
    docs = ["data join merge sort", "spark graph data"]
    a = Summarizer(cached, _S2S_GREEDY).summarize(docs)
    b = Summarizer(uncached, _S2S_GREEDY).summarize(docs)
    assert a == b and all(s for s in a)
    assert cached.generator.decoder_with_past.calls > 0
    # encoder ran once per batch, not once per step
    assert cached.generator.encoder.session.calls == 1


def test_summarizer_onnx_beam_reorder_falls_back_to_full_decode():
    """Beam search reorders hypotheses between steps, breaking the
    one-new-token contract — the head must fall back to full re-decode
    (never the with-past session with a stale cache) and still match the
    uncached generator bit-for-bit."""
    cfg = GenerateConfig(do_sample=False, num_beams=2, max_length=8,
                         min_length=2, early_stopping=True)
    cached, uncached = _s2s_head(True), _s2s_head(False)
    docs = ["data join merge", "sort spark"]
    a = Summarizer(cached, cfg).summarize(docs)
    b = Summarizer(uncached, cfg).summarize(docs)
    assert a == b and all(s for s in a)


def test_translator_onnx_swap():
    """Translator construction is a pure head swap: forced-BOS markers
    resolve through the inherited vocab and never leak into output."""
    sup = {"English", "French"}
    cfg = GenerateConfig(do_sample=False, num_beams=1, max_length=10,
                         min_length=2)
    a = Translator(_s2s_head(True), M2M100, sup, sup, cfg).translate(
        ["data join merge"], "English", "French")
    b = Translator(_s2s_head(False), M2M100, sup, sup, cfg).translate(
        ["data join merge"], "English", "French")
    assert a == b and len(a) == 1 and a[0]
    assert ">>" not in a[0]


# --------------------------------------------------------------------------
# causal pipeline swap: TextGenerator / ConversationModel over the ONNX
# causal head — completes the swap story for the causal generation family
# --------------------------------------------------------------------------

from kgforge.conversation import ConversationManager, ConversationModel
from kgforge.generation import ONNXCausalLMHead, TextGenerator


def _causal_head(with_past: bool):
    dec = ONNXCausalDecoder(_MockNoPast(),
                            _MockWithPast() if with_past else None)
    head = ONNXCausalLMHead(_WORDS, dec)
    assert head.vocab_size == _V and not head.is_encoder_decoder
    return head


def test_text_generator_onnx_swap_cached_equals_uncached():
    """TextGenerator over the cached two-session causal decoder must emit
    the same continuations as over the no-past-only decoder, the with-past
    session must actually serve steps, and the prefix contract survives."""
    cfg = GenerateConfig(do_sample=False, num_beams=1, max_length=8,
                         min_length=1, no_repeat_ngram_size=3)
    cached, uncached = _causal_head(True), _causal_head(False)
    prompts = ["data join", "spark graph merge"]
    a = TextGenerator(cached, cfg).generate(prompts, prefix="alpha")
    b = TextGenerator(uncached, cfg).generate(prompts, prefix="alpha")
    assert a == b and len(a) == 2
    assert cached.decoder.decoder_with_past.calls > 0
    assert not any(s.startswith("alpha") for s in a)  # prefix stripped


def test_conversation_onnx_swap():
    """ConversationModel batch responses are identical across the cached
    and uncached causal decoders, multi-turn (history carried)."""
    cached, uncached = _causal_head(True), _causal_head(False)
    outs = []
    for head in (cached, uncached):
        model = ConversationModel(head)
        mgr = ConversationManager()
        c1 = mgr.create("data join merge")
        c2 = mgr.create("spark graph")
        model.generate_responses(mgr)
        mgr.get(c1).add_user_input("sort beta")
        mgr.get(c2).add_user_input("alpha data")
        model.generate_responses(mgr)
        outs.append([mgr.get(c1).generated_responses,
                     mgr.get(c2).generated_responses])
    assert outs[0] == outs[1]
    assert all(len(r) == 2 for r in outs[0])
