"""Approximate nearest neighbors: random-hyperplane LSH and IVF over
embeddings.

Brute-force cosine top-k (kgforge.link.cosine_topk / the embedding_topk
query) is the exact baseline; two scale paths:

- LSH: L independent hash tables of ``n_planes`` signed random hyperplanes
  each. Candidates = vectors sharing a bucket in ANY table; exact cosine
  reranks the candidates. At 100 TB the bucket join replaces the all-pairs
  cross join — cost goes from O(N*Q) to O(sum of bucket sizes), with recall
  tuned by (n_planes, n_tables).
- IVF (inverted-file index, the FAISS coarse-quantizer design): k-means
  centroids trained on a bounded sample, every corpus vector assigned to its
  nearest centroid (the inverted list), queries probe their ``n_probe``
  nearest centroids and rerank exact cosine within those lists. At 100 TB
  training is O(sample) on the driver, assignment is one Arrow map pass,
  and probing is an equi-join on centroid_id — candidate work is
  O(N * n_probe / n_centroids) per query instead of O(N).

Deterministic: hyperplanes/centroid-init come from seeded generators, Lloyd
runs a fixed iteration count, ties break by index; identical at any
parallelism.
"""

from __future__ import annotations

import numpy as np


def hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    """[n_tables, n_planes, dim] seeded Gaussian hyperplanes."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def signatures(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """[N, dim] x [T, P, dim] -> [N, T] uint64 bucket keys."""
    n, t = vectors.shape[0], planes.shape[0]
    out = np.zeros((n, t), dtype=np.uint64)
    weights = (1 << np.arange(planes.shape[1], dtype=np.uint64))
    for ti in range(t):
        bits = (vectors @ planes[ti].T) >= 0          # [N, P]
        out[:, ti] = bits.astype(np.uint64) @ weights
    return out


def ann_topk_local(
    queries: np.ndarray,
    corpus: np.ndarray,
    k: int,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
) -> tuple[list[list[int]], list[list[float]]]:
    """Single-node reference implementation (the distributed form lives in
    kgforge.queries.q_embedding_ann_topk as a bucket join + rerank)."""
    planes = hyperplanes(corpus.shape[1], n_planes, n_tables, seed)
    csig = signatures(corpus, planes)
    qsig = signatures(queries, planes)
    qn = queries / np.clip(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12, None)
    cn = corpus / np.clip(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-12, None)
    idx_out, score_out = [], []
    for qi in range(len(queries)):
        cand = np.zeros(len(corpus), dtype=bool)
        for ti in range(n_tables):
            cand |= csig[:, ti] == qsig[qi, ti]
        cand_ids = np.nonzero(cand)[0]
        sims = cn[cand_ids] @ qn[qi]
        order = np.argsort(-sims, kind="stable")[:k]
        idx_out.append([int(cand_ids[i]) for i in order])
        score_out.append([float(sims[i]) for i in order])
    return idx_out, score_out


def _norm_rows(v: np.ndarray) -> np.ndarray:
    return v / np.clip(np.linalg.norm(v, axis=1, keepdims=True), 1e-12, None)


def kmeans_fit(sample: np.ndarray, n_centroids: int, n_iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (cosine): seeded init from sample
    rows, fixed Lloyd iterations, centroids re-normalized each round; an
    emptied cluster keeps its previous centroid. Returns [C, dim] unit rows."""
    sn = _norm_rows(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    init = rng.choice(len(sn), size=min(n_centroids, len(sn)), replace=False)
    cents = sn[np.sort(init)].copy()
    for _ in range(n_iters):
        assign = np.argmax(sn @ cents.T, axis=1)          # ties -> lowest id
        for ci in range(len(cents)):
            members = sn[assign == ci]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    cents[ci] = m / n
    return cents


def ivf_assign(vectors: np.ndarray, centroids: np.ndarray,
               n_probe: int = 1) -> np.ndarray:
    """[N, dim] -> [N, n_probe] nearest-centroid ids by cosine (stable
    order: descending similarity, ties by lower centroid id)."""
    vn = _norm_rows(np.asarray(vectors, dtype=np.float64))
    sims = vn @ centroids.T                               # [N, C]
    order = np.argsort(-sims, axis=1, kind="stable")      # stable: low id wins ties
    return order[:, :n_probe]


def ivf_topk_local(
    queries: np.ndarray,
    corpus: np.ndarray,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_n: int | None = None,
    seed: int = 42,
) -> tuple[list[list[int]], list[list[float]]]:
    """Single-node IVF reference (the distributed form lives in
    kgforge.queries.q_embedding_ivf_topk as an equi-join on centroid_id)."""
    train = corpus[: train_n or len(corpus)]
    cents = kmeans_fit(train, n_centroids, seed=seed)
    cassign = ivf_assign(corpus, cents, 1)[:, 0]          # [N]
    qprobe = ivf_assign(queries, cents, n_probe)          # [Q, n_probe]
    qn = _norm_rows(queries)
    cn = _norm_rows(corpus)
    idx_out, score_out = [], []
    for qi in range(len(queries)):
        cand_ids = np.nonzero(np.isin(cassign, qprobe[qi]))[0]
        sims = cn[cand_ids] @ qn[qi]
        order = np.argsort(-sims, kind="stable")[:k]
        idx_out.append([int(cand_ids[i]) for i in order])
        score_out.append([float(sims[i]) for i in order])
    return idx_out, score_out
