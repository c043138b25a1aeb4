"""Approximate nearest neighbors: random-hyperplane LSH over embeddings.

Brute-force cosine top-k (kgforge.link.cosine_topk / the embedding_topk
query) is the exact baseline; this is the scale path: L independent hash
tables of ``n_planes`` signed random hyperplanes each. Candidates = vectors
sharing a bucket in ANY table; exact cosine reranks the candidates. At 100 TB
the bucket join replaces the all-pairs cross join — cost goes from O(N*Q) to
O(sum of bucket sizes), with recall tuned by (n_planes, n_tables).

Deterministic: hyperplanes come from a seeded generator; identical at any
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
