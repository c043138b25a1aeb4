"""Masked language model — port of the reference pipeline semantics
(src/pipelines/masked_language.rs:570-637):

1. optionally replace a user-facing mask marker with the tokenizer's mask
   token (replace_mask_token path, :581-590);
2. tokenize + pad the batch;
3. locate mask-token positions (``input_ids == mask_token_id``, :600-604);
4. forward; at each mask position take max over the vocab dim
   (``max_dim``, i.e. raw-logit argmax — the reference does NOT softmax
   here, :624-627);
5. emit MaskedToken{text, id, score} per mask, in position order; sequences
   without masks yield an empty list (:619-632).

The stand-in vocab head scores each candidate piece by a deterministic hash
of (left context word, candidate) plus a plantable context map, so tests can
pin exact fills while the argmax/position bookkeeping is the reference math.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import numpy as np


MASK_MARKER = "[MASK]"


@dataclass
class MaskedToken:
    """Reference MaskedToken (masked_language.rs:74)."""
    text: str
    id: int
    score: float


class StandInMLMHead:
    """vocab: candidate fill pieces; logits(left_word, candidate) from a
    stable hash, overridable with a planted {left_word: fill} map."""

    def __init__(self, vocab: list[str], planted: dict[str, str] | None = None,
                 seed: int = 42):
        self.vocab = list(vocab)
        self.planted = planted or {}
        self.seed = seed

    def logits(self, left_word: str) -> np.ndarray:
        out = np.empty(len(self.vocab), dtype=np.float64)
        for i, cand in enumerate(self.vocab):
            h = hashlib.md5(f"{self.seed}|{left_word}|{cand}".encode()).digest()
            out[i] = int.from_bytes(h[:8], "little") / 2**64
        want = self.planted.get(left_word)
        if want is not None and want in self.vocab:
            out[self.vocab.index(want)] += 10.0
        return out


def predict_masked(
    texts: list[str],
    head: StandInMLMHead,
    mask_marker: str = MASK_MARKER,
) -> list[list[MaskedToken]]:
    """Port of MaskedLanguageModel::predict (masked_language.rs:576-637)."""
    out: list[list[MaskedToken]] = []
    # locate markers anywhere in the RAW text (replace_mask_token replaces
    # the marker string wherever it occurs, :581-590) — a whitespace split
    # would silently miss "[MASK]." / "[MASK]," adjacent to punctuation
    marker_re = re.compile(re.escape(mask_marker))
    word_re = re.compile(r"\w+", re.UNICODE)
    for text in texts:
        tokens: list[MaskedToken] = []
        for m in marker_re.finditer(text):
            lefts = word_re.findall(text[:m.start()])
            left = lefts[-1] if lefts else ""
            logits = head.logits(left)
            best = int(np.argmax(logits))          # max over vocab dim (:626)
            tokens.append(MaskedToken(
                text=head.vocab[best],
                id=best,
                score=float(logits[best]),         # raw logit, not softmaxed
            ))
        out.append(tokens)                          # [] when no mask (:619)
    return out
