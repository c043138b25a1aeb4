"""LSH ANN: determinism + recall vs the exact brute-force baseline."""

from __future__ import annotations

import numpy as np

from kgforge.ann import ann_topk_local, hyperplanes, signatures
from kgforge.link import cosine_topk


def _corpus(n=400, d=64, seed=3):
    rng = np.random.default_rng(seed)
    # clustered corpus (realistic for embeddings; uniform-random vectors are
    # the pathological case for LSH)
    centers = rng.standard_normal((20, d)) * 3
    out = centers[rng.integers(0, 20, n)] + rng.standard_normal((n, d)) * 0.5
    return out.astype(np.float64)


def test_signatures_deterministic_and_bucketed():
    c = _corpus(50)
    p = hyperplanes(64, 8, 4, seed=42)
    s1 = signatures(c, p)
    s2 = signatures(c, p)
    assert np.array_equal(s1, s2)
    assert s1.shape == (50, 4)
    assert (s1 < (1 << 8)).all()


def test_ann_recall_vs_bruteforce():
    corpus = _corpus()
    queries = corpus[:10] + 0.01
    exact_idx, _ = cosine_topk(queries, corpus, k=5)
    ann_idx, ann_scores = ann_topk_local(queries, corpus, k=5,
                                         n_planes=8, n_tables=8)
    hits = total = 0
    for qi in range(len(queries)):
        hits += len(set(exact_idx[qi]) & set(ann_idx[qi]))
        total += 5
    recall = hits / total
    assert recall >= 0.8, recall
    # scores are true cosines, descending
    for s in ann_scores:
        assert all(a >= b - 1e-12 for a, b in zip(s, s[1:]))


def test_ann_identical_across_runs():
    corpus = _corpus(100)
    a = ann_topk_local(corpus[:3], corpus, k=4)
    b = ann_topk_local(corpus[:3], corpus, k=4)
    assert a == b
