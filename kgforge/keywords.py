"""Keyword extraction — port of the reference pipeline's semantics
(src/pipelines/keywords_extraction/): regex word ngrams minus stopwords
(tokenizer.rs:36-85), embed document + candidates, then rank by

- CosineSimilarity top-k              (scorer.rs:74-88)
- Maximal Marginal Relevance (MMR)    (scorer.rs:90-135)
- MaxSum (min intra-candidate sim over combinations of the 2n best)
                                      (scorer.rs:137-183)

Offsets are char offsets of every occurrence of the candidate, like the
reference's Keyword.offsets (pipeline.rs:41-48).
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass

import numpy as np

from .encoders import StandInEmbedder
from .stopwords import ENGLISH_STOPWORDS

WORD_RE = re.compile(r"\b\w+\b", re.UNICODE)  # tokenizer.rs:7 default

# the reference's full 318-entry English stopword registry
# (keywords_extraction/stopwords.rs:31-350) — candidate sets and therefore
# MMR/MaxSum picks now match the reference on real text
STOPWORDS = ENGLISH_STOPWORDS


@dataclass
class Keyword:
    text: str
    score: float
    offsets: list[tuple[int, int]]


def candidates_with_offsets(
    text: str, ngram_range: tuple[int, int] = (1, 1)
) -> dict[str, list[tuple[int, int]]]:
    """Candidate ngrams (lowercased key) -> occurrence offsets; any ngram
    containing a stopword is dropped (tokenizer.rs:52-84)."""
    words = [(m.group(0), m.start(), m.end()) for m in WORD_RE.finditer(text)]
    out: dict[str, list[tuple[int, int]]] = {}
    lo, hi = ngram_range
    for n in range(lo, hi + 1):
        for i in range(len(words) - n + 1):
            gram = words[i:i + n]
            if any(w.lower() in STOPWORDS for w, _, _ in gram):
                continue
            key = " ".join(w for w, _, _ in gram).lower()
            out.setdefault(key, []).append((gram[0][1], gram[-1][2]))
    return out


def _rank_cosine(doc_vec, cand_vecs, keys, offsets, top_n):
    sims = cand_vecs @ doc_vec
    order = sorted(range(len(keys)), key=lambda i: (-float(sims[i]), keys[i]))
    return [Keyword(keys[i], float(sims[i]), offsets[i]) for i in order[:top_n]]


def _rank_mmr(doc_vec, cand_vecs, keys, offsets, top_n, diversity=0.5):
    """MMR: first pick = most similar to doc; then argmax of
    (1-diversity)*doc_sim - diversity*max_sim_to_selected (scorer.rs:90-135)."""
    doc_sims = cand_vecs @ doc_vec
    n = len(keys)
    if n == 0:
        return []
    selected = [int(np.argmax(doc_sims))]
    while len(selected) < min(top_n, n):
        best_j, best_val = None, None
        sel_vecs = cand_vecs[selected]
        for j in range(n):
            if j in selected:
                continue
            max_sel = float(np.max(sel_vecs @ cand_vecs[j]))
            val = (1 - diversity) * float(doc_sims[j]) - diversity * max_sel
            if best_val is None or val > best_val or (val == best_val and keys[j] < keys[best_j]):
                best_j, best_val = j, val
        selected.append(best_j)
    return [Keyword(keys[i], float(doc_sims[i]), offsets[i]) for i in selected]


def _rank_maxsum(doc_vec, cand_vecs, keys, offsets, top_n):
    """MaxSum: among the 2n most doc-similar candidates, pick the size-n
    combination minimizing summed pairwise similarity (scorer.rs:137-183)."""
    doc_sims = cand_vecs @ doc_vec
    pool = sorted(range(len(keys)), key=lambda i: (-float(doc_sims[i]), keys[i]))[: 2 * top_n]
    if len(pool) <= top_n:
        chosen = pool
    else:
        best_combo, best_val = None, None
        for combo in itertools.combinations(pool, top_n):
            val = sum(float(cand_vecs[a] @ cand_vecs[b])
                      for a, b in itertools.combinations(combo, 2))
            if best_val is None or val < best_val:
                best_combo, best_val = combo, val
        chosen = list(best_combo)
    chosen.sort(key=lambda i: (-float(doc_sims[i]), keys[i]))
    return [Keyword(keys[i], float(doc_sims[i]), offsets[i]) for i in chosen]


def extract_keywords(
    texts: list[str],
    embedder: StandInEmbedder | None = None,
    top_n: int = 5,
    ngram_range: tuple[int, int] = (1, 1),
    scorer: str = "cosine",           # cosine | mmr | maxsum
    diversity: float = 0.5,
) -> list[list[Keyword]]:
    embedder = embedder or StandInEmbedder()
    out: list[list[Keyword]] = []
    for text in texts:
        cands = candidates_with_offsets(text, ngram_range)
        if not cands:
            out.append([])
            continue
        keys = sorted(cands)
        doc_vec = embedder.encode([text])[0]
        cand_vecs = embedder.encode(keys)
        offsets = [cands[k] for k in keys]
        if scorer == "cosine":
            out.append(_rank_cosine(doc_vec, cand_vecs, keys, offsets, top_n))
        elif scorer == "mmr":
            out.append(_rank_mmr(doc_vec, cand_vecs, keys, offsets, top_n, diversity))
        elif scorer == "maxsum":
            out.append(_rank_maxsum(doc_vec, cand_vecs, keys, offsets, top_n))
        else:
            raise ValueError(f"unknown scorer {scorer!r}")
    return out
