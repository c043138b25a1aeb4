"""Sentence-embedding semantics (mirrors tests/sentence_embeddings.rs:9-55 in
structure; values recomputed under the stand-in): masked mean pooling +
L2-normalize clamp 1e-12 (layers.rs:39-76, pipeline.rs:403-411)."""

from __future__ import annotations

import numpy as np

from kgforge.encoders import StandInEmbedder
from kgforge.link import cosine_topk, rerank_ambiguous


def test_unit_norm():
    emb = StandInEmbedder(dim=64)
    v = emb.encode(["hello world", "a", "Amélie Durand in São Paulo"])
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_deterministic():
    a = StandInEmbedder(dim=64).encode(["same text"])
    b = StandInEmbedder(dim=64).encode(["same text"])
    assert np.array_equal(a, b)


def test_empty_text_zero_vector():
    v = StandInEmbedder(dim=64).encode(["", "   "])
    assert np.allclose(v, 0.0)


def test_mean_pooling_order_invariance():
    """Mean pooling is order-invariant over tokens — a property the real
    mean-pooled model does NOT have but the bag-of-token stand-in does; it
    pins the pooling implementation as a true masked mean."""
    emb = StandInEmbedder(dim=64)
    a = emb.encode(["alpha beta gamma"])
    b = emb.encode(["gamma alpha beta"])
    assert np.allclose(a, b, atol=1e-6)


def test_similar_texts_closer():
    emb = StandInEmbedder(dim=64)
    v = emb.encode([
        "mining shipping harbor town",
        "mining shipping harbor city",
        "software campus banking group",
    ])
    assert v[0] @ v[1] > v[0] @ v[2]


def test_cosine_topk_deterministic_and_sorted():
    rng = np.random.default_rng(7)
    corpus = rng.normal(size=(50, 16)).astype(np.float32)
    queries = corpus[:3] + 0.01
    idx, scores = cosine_topk(queries, corpus, k=5)
    assert idx.shape == (3, 5)
    assert (np.diff(scores, axis=1) <= 1e-9).all()
    assert idx[0, 0] == 0 and idx[1, 0] == 1 and idx[2, 0] == 2


def test_rerank_ambiguous_uses_context():
    emb = StandInEmbedder(dim=64)
    ctx = "Amy works for Apex near the mining shipping harbor."
    cands = [[("ORG_SOFT", "Apex Software Labs software campus banking", 0.5),
              ("ORG_MINE", "Apex Mining Group mining shipping harbor", 0.5)]]
    assert rerank_ambiguous([ctx], cands, emb) == ["ORG_MINE"]
    ctx2 = "Amy works for Apex near the software campus banking district."
    assert rerank_ambiguous([ctx2], cands, emb) == ["ORG_SOFT"]


def test_rerank_single_candidate_passthrough():
    emb = StandInEmbedder(dim=64)
    assert rerank_ambiguous(["any"], [[("E1", "desc", 1.0)]], emb) == ["E1"]


def test_golden_embedding_values():
    """Element-level golden asserts (the reference's sentence-embeddings test
    style, tests/sentence_embeddings.rs:9-33; values recomputed under the
    stand-in, pinned to 1e-4) — regression protection for the encoder."""
    emb = StandInEmbedder(dim=64)
    v = emb.encode(["this is an example sentence", "each sentence is converted"])
    assert np.allclose(v[0][:6], [0.0, 0.19245, -0.19245, 0.0, 0.3849, 0.0],
                       atol=1e-4)
    assert np.allclose(v[1][:6], [0.0, 0.208514, -0.208514, 0.0, 0.0, 0.0],
                       atol=1e-4)


# --------------------------------------------------------------------------
# pooling variants + Dense layer (layers.rs:39-76, pipeline.rs:150-152)
# --------------------------------------------------------------------------

def _toy_batch():
    """[2, 3, 2] embeddings; row 0 has one pad (mask 1,1,0), row 1 none."""
    emb = np.array([[[1.0, -2.0], [3.0, 4.0], [99.0, 99.0]],
                    [[2.0, 2.0], [-6.0, 0.0], [4.0, 1.0]]])
    mask = np.array([[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]])
    return emb, mask


def test_pooling_cls_takes_position_zero():
    from kgforge.encoders import PoolingConfig, pool_token_embeddings
    emb, mask = _toy_batch()
    got = pool_token_embeddings(emb, mask, PoolingConfig(
        cls_token=True, mean_tokens=False))
    assert np.array_equal(got, np.array([[1.0, -2.0], [2.0, 2.0]]))


def test_pooling_masked_max_ignores_pads():
    from kgforge.encoders import PoolingConfig, pool_token_embeddings
    emb, mask = _toy_batch()
    got = pool_token_embeddings(emb, mask, PoolingConfig(
        max_tokens=True, mean_tokens=False))
    # row 0: the padded [99, 99] position is filled with -1e9 first
    assert np.array_equal(got, np.array([[3.0, 4.0], [4.0, 2.0]]))


def test_pooling_mean_and_sqrt_len_denominators():
    from kgforge.encoders import PoolingConfig, pool_token_embeddings
    emb, mask = _toy_batch()
    mean = pool_token_embeddings(emb, mask, PoolingConfig(mean_tokens=True))
    np.testing.assert_allclose(mean[0], [4.0 / 2, 2.0 / 2])
    np.testing.assert_allclose(mean[1], [0.0 / 3, 3.0 / 3])
    sq = pool_token_embeddings(emb, mask, PoolingConfig(
        mean_tokens=False, mean_sqrt_len_tokens=True))
    np.testing.assert_allclose(sq[0], np.array([4.0, 2.0]) / np.sqrt(2.0))
    np.testing.assert_allclose(sq[1], np.array([0.0, 3.0]) / np.sqrt(3.0))


def test_pooling_all_pad_row_mean_is_zero_via_clamp():
    from kgforge.encoders import PoolingConfig, pool_token_embeddings
    emb = np.ones((1, 2, 3))
    mask = np.zeros((1, 2))
    got = pool_token_embeddings(emb, mask, PoolingConfig(mean_tokens=True))
    assert np.array_equal(got, np.zeros((1, 3)))   # 0 / clamp(0, 1e-8)


def test_pooling_modes_concatenate_in_declaration_order():
    from kgforge.encoders import PoolingConfig, pool_token_embeddings
    emb, mask = _toy_batch()
    conf = PoolingConfig(cls_token=True, max_tokens=True, mean_tokens=True,
                         mean_sqrt_len_tokens=True)
    got = pool_token_embeddings(emb, mask, conf)
    assert got.shape == (2, 8)                    # 4 modes * D=2
    parts = [
        pool_token_embeddings(emb, mask, PoolingConfig(
            cls_token=True, mean_tokens=False)),
        pool_token_embeddings(emb, mask, PoolingConfig(
            max_tokens=True, mean_tokens=False)),
        pool_token_embeddings(emb, mask, PoolingConfig(mean_tokens=True)),
        pool_token_embeddings(emb, mask, PoolingConfig(
            mean_tokens=False, mean_sqrt_len_tokens=True)),
    ]
    assert np.array_equal(got, np.concatenate(parts, axis=1))


def test_pooling_config_rejects_no_modes():
    import pytest
    from kgforge.encoders import PoolingConfig
    with pytest.raises(ValueError):
        PoolingConfig(mean_tokens=False)


def test_default_encode_unchanged_by_pooling_port():
    """Mean-pool default must be bit-identical to the pre-port formula
    (mat.mean(axis=0) then batch L2 normalize) — kg_doc_embeddings digests
    depend on it."""
    import re
    from kgforge.encoders import StandInEmbedder
    emb = StandInEmbedder(dim=64)
    texts = ["this is an example sentence", "", "Amélie Durand in São Paulo"]
    got = emb.encode(texts)
    want = np.zeros((len(texts), 64))
    for i, t in enumerate(texts):
        toks = re.findall(r"\w+", t, re.UNICODE)
        if toks:
            want[i] = np.stack([emb._token_vec(x) for x in toks]).mean(axis=0)
    want = want / np.clip(np.linalg.norm(want, axis=1, keepdims=True),
                          1e-12, None)
    assert np.array_equal(got, want.astype(np.float32))


def test_encode_cls_and_multi_mode_width():
    from kgforge.encoders import PoolingConfig, StandInEmbedder
    emb = StandInEmbedder(dim=16)
    v = emb.encode(["alpha beta"], pooling=PoolingConfig(
        cls_token=True, max_tokens=True, mean_tokens=True))
    assert v.shape == (1, 48)
    # CLS slice is the (normalized) first token's vector direction
    first = emb._token_vec("alpha")
    full = emb.encode(["alpha beta"], pooling=PoolingConfig(
        cls_token=True, max_tokens=True, mean_tokens=True), normalize=False)
    np.testing.assert_allclose(full[0, :16], first)


def test_dense_layer_forward_and_activations():
    import math
    import pytest
    from kgforge.encoders import ACTIVATIONS, DenseLayer
    d = DenseLayer(4, 3, bias=True, activation="identity", seed=7)
    x = np.array([[1.0, -2.0, 0.5, 3.0]])
    np.testing.assert_allclose(d.forward(x), x @ d.weight.T + d.bias)
    # tanh applied on top of the same affine map
    dt = DenseLayer(4, 3, bias=True, activation="tanh", seed=7)
    np.testing.assert_allclose(dt.forward(x), np.tanh(x @ d.weight.T + d.bias))
    # activation math matches the reference formulas (activations.rs:5-30)
    xs = np.linspace(-3, 3, 13)
    np.testing.assert_allclose(
        ACTIVATIONS["gelu"](xs),
        [v * 0.5 * (1 + math.erf(v / math.sqrt(2))) for v in xs])
    np.testing.assert_allclose(ACTIVATIONS["relu"](xs), np.maximum(xs, 0))
    np.testing.assert_allclose(ACTIVATIONS["swish"](xs),
                               xs / (1 + np.exp(-xs)))
    np.testing.assert_allclose(ACTIVATIONS["mish"](xs),
                               xs * np.tanh(np.log1p(np.exp(xs))))
    np.testing.assert_allclose(
        ACTIVATIONS["gelu_new"](xs),
        xs * 0.5 * (np.tanh((0.044715 * xs ** 3 + xs)
                            * np.sqrt(2 / np.pi)) + 1))
    with pytest.raises(ValueError):
        DenseLayer(4, 3, activation="softmax")
    # bias=False zeroes the bias term
    nb = DenseLayer(4, 3, bias=False, activation="identity", seed=7)
    assert np.array_equal(nb.bias, np.zeros(3))


def test_encode_with_dense_projection_is_normalized_and_deterministic():
    from kgforge.encoders import DenseLayer, StandInEmbedder
    emb = StandInEmbedder(dim=32)
    dense = DenseLayer(32, 8, activation="tanh", seed=11)
    a = emb.encode(["projected sentence", "another one"], dense=dense)
    b = emb.encode(["projected sentence", "another one"],
                   dense=DenseLayer(32, 8, activation="tanh", seed=11))
    assert a.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-6)
    assert np.array_equal(a, b)
