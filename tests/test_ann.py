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


def test_hot_label_candidates_bounded_by_lsh():
    """Skew contract for near-dup at scale: when EVERY vector shares one
    label (hot block — the label-blocked q_embedding_neardup would go
    quadratic), LSH bucketing still (a) bounds candidate-pair counts well
    below all-pairs and (b) recalls >=90% of the true near-duplicate
    (cos>=0.9) pairs."""
    rng = np.random.default_rng(7)
    n_base, d = 800, 64
    base = rng.standard_normal((n_base, d))
    # plant 40 near-duplicate partners (tiny perturbations of base vectors)
    partners = base[:40] + rng.standard_normal((40, d)) * 0.02
    vecs = np.vstack([base, partners])
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)

    true_pairs = set()
    sims = vn @ vn.T
    iu = np.triu_indices(len(vecs), 1)
    for i, j in zip(*iu):
        if sims[i, j] >= 0.9:
            true_pairs.add((i, j))
    assert len(true_pairs) >= 35  # the planted near-dups are really there

    planes = hyperplanes(d, n_planes=10, n_tables=8, seed=42)
    sig = signatures(vn, planes)
    cand = set()
    max_bucket = 0
    n_candidate_pairs = 0
    for t in range(sig.shape[1]):
        buckets: dict[int, list[int]] = {}
        for i, key in enumerate(sig[:, t]):
            buckets.setdefault(int(key), []).append(i)
        for members in buckets.values():
            max_bucket = max(max_bucket, len(members))
            n_candidate_pairs += len(members) * (len(members) - 1) // 2
            for a in range(len(members)):
                for b in range(a + 1, len(members)):
                    cand.add((members[a], members[b]))

    all_pairs = len(vecs) * (len(vecs) - 1) // 2
    # (a) the hot block never goes quadratic: candidate work is a small
    # fraction of all-pairs, and no single bucket dominates
    assert n_candidate_pairs < 0.10 * all_pairs, (n_candidate_pairs, all_pairs)
    assert max_bucket < 0.25 * len(vecs), max_bucket
    # (b) near-duplicates survive the blocking
    recall = len(true_pairs & cand) / len(true_pairs)
    assert recall >= 0.9, recall


def test_ivf_recall_vs_bruteforce():
    corpus = _corpus()
    queries = corpus[:10] + 0.01
    exact_idx, _ = cosine_topk(queries, corpus, k=5)
    from kgforge.ann import ivf_topk_local
    ivf_idx, ivf_scores = ivf_topk_local(queries, corpus, k=5,
                                         n_centroids=16, n_probe=4)
    hits = sum(len(set(exact_idx[qi]) & set(ivf_idx[qi]))
               for qi in range(len(queries)))
    recall = hits / (5 * len(queries))
    assert recall >= 0.8, recall
    for s in ivf_scores:
        assert all(a >= b - 1e-12 for a, b in zip(s, s[1:]))


def test_ivf_deterministic_and_bounded_lists():
    from kgforge.ann import ivf_assign, ivf_topk_local, kmeans_fit
    import numpy as np
    corpus = _corpus(300)
    a = ivf_topk_local(corpus[:3], corpus, k=4)
    b = ivf_topk_local(corpus[:3], corpus, k=4)
    assert a == b
    cents = kmeans_fit(corpus, 16, seed=42)
    assert cents.shape == (16, corpus.shape[1])
    # unit centroids (spherical k-means)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    assign = ivf_assign(corpus, cents, 1)[:, 0]
    # inverted lists stay balanced enough that probing n_probe/n_centroids
    # of them bounds candidate work well below the full corpus
    counts = np.bincount(assign, minlength=16)
    assert counts.max() < 0.5 * len(corpus), counts.max()
    probes = ivf_assign(corpus[:5], cents, 4)
    assert probes.shape == (5, 4)
    # each probe row: distinct centroids, best-first
    for row in probes:
        assert len(set(row.tolist())) == 4


def test_ivf_distributed_recall_on_clustered_embeddings(spark, tmp_path):
    """Gate the DISTRIBUTED q_embedding_ivf_topk (not just the local
    reference): on clustered embeddings (the realistic regime — the sf
    tables' synthetic vectors are isotropic, every ANN's pathological case)
    the equi-join-on-centroid plan must recall >=80% of brute-force top-k."""
    import pandas as pd

    from kgforge.link import cosine_topk
    from kgforge.queries import q_embedding_ivf_topk

    corpus = _corpus(n=400, d=64, seed=11)
    pdf = pd.DataFrame({
        "vec_id": range(len(corpus)),
        "embedding": [row.astype("float32").tolist() for row in corpus],
        "label": [i % 7 for i in range(len(corpus))],
    })
    pdf.to_parquet(f"{tmp_path}/embeddings.parquet")
    got = q_embedding_ivf_topk(spark, str(tmp_path)).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["corpus_id"])
    # exact brute force excluding self (the query excludes query_id==corpus_id)
    queries = corpus[:5]
    exact_idx, _ = cosine_topk(queries, corpus, k=6)
    hits = total = 0
    for qi in range(5):
        want = [i for i in exact_idx[qi] if i != qi][:5]
        hits += len(set(want) & by_q.get(qi, set()))
        total += len(want)
    assert hits / total >= 0.8, (hits, total)


def test_ivf_assign_properties():
    """Properties: probes are always valid distinct centroid ids in
    best-first order, and assignment is scale-invariant (cosine ignores
    vector magnitude)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from kgforge.ann import ivf_assign, kmeans_fit

    corpus = _corpus(120, d=16, seed=5)
    cents = kmeans_fit(corpus, 8, seed=42)

    @settings(max_examples=50, deadline=None)
    @given(st.integers(0, 119), st.floats(0.1, 100.0))
    def check(i, scale):
        v = corpus[i:i + 1]
        p1 = ivf_assign(v, cents, 3)[0]
        p2 = ivf_assign(v * scale, cents, 3)[0]
        assert p1.tolist() == p2.tolist()          # magnitude-invariant
        assert len(set(p1.tolist())) == 3          # distinct
        assert all(0 <= c < 8 for c in p1)
        sims = (v / np.linalg.norm(v)) @ cents.T
        assert sims[0, p1[0]] >= sims[0, p1[1]] >= sims[0, p1[2]] - 1e-12

    check()
