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
