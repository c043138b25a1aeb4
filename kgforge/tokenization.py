"""Tokenization with char offsets + sliding-window featurization.

Ports the *semantics* (not the code) of the reference's featurizer:

- tokenize with CHARACTER offsets (the reference slices the original sentence
  by char, src/pipelines/token_classification.rs:1108-1117 — so Python
  code-point indexing matches natively);
- deterministic WordPiece-like sub-word split so that sub-token consolidation
  has real work to do;
- sliding spans of ``max_length - n_special`` tokens advancing by
  ``end - doc_stride`` with loop guard ``len(spans) * doc_stride < n_tokens``
  (src/pipelines/token_classification.rs:836-882);
- per-token ownership ("reference_feature") flags with cutoff ``doc_stride/2``
  plus leading/trailing special tokens at interior span edges
  (src/pipelines/token_classification.rs:885-928).

Everything here is pure Python/numpy — unit-testable without Spark, and
invoked inside Arrow-batched UDFs on the cluster.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

# token masks (reference: rust-tokenizers Mask enum, used at
# token_classification.rs:1016-1022)
MASK_NONE = 0          # word-initial piece
MASK_CONTINUATION = 1  # non-initial sub-word piece
MASK_SPECIAL = 2       # [CLS]/[SEP]/[PAD]

CLS_ID = 0
SEP_ID = 1
PAD_ID = 2
N_RESERVED_IDS = 8

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_SUBWORD_CHUNK = 4  # pieces of ≤4 chars → multi-piece words exercise consolidation

_SENT_RE = re.compile(r"[^.!?\n]*[.!?]+|[^.!?\n]+", re.UNICODE)


import functools


@functools.lru_cache(maxsize=1 << 20)
def token_id(piece: str) -> int:
    """Stable 31-bit vocab id from the piece text (md5-derived; deterministic
    across processes, unlike Python's salted hash()). Cached: natural-language
    piece vocabulary is small and highly repetitive."""
    h = hashlib.md5(piece.encode("utf-8")).digest()
    return N_RESERVED_IDS + (int.from_bytes(h[:4], "little") & 0x7FFFFFFF)


@dataclass
class TokenizedInput:
    """One text, sub-word tokenized, with char offsets into the original."""
    pieces: list[str]
    ids: list[int]
    begins: list[int]   # char offset, inclusive
    ends: list[int]     # char offset, exclusive
    masks: list[int]    # MASK_NONE | MASK_CONTINUATION


def split_sentences(text: str) -> list[tuple[int, str]]:
    """Deterministic sentence split; returns (char_begin, sentence) pairs.

    Offsets compose: sentence-local token offsets + char_begin give
    document-absolute offsets (SURVEY §7: never re-find substrings).
    """
    out = []
    for m in _SENT_RE.finditer(text):
        s = m.group(0)
        stripped = s.strip()
        if not stripped:
            continue
        begin = m.start() + (len(s) - len(s.lstrip()))
        out.append((begin, stripped))
    return out


def tokenize_with_offsets(text: str) -> TokenizedInput:
    """Word-level regex tokenize, then deterministic sub-word chunking.

    A word of n chars becomes ceil(n/4) pieces; the first piece has
    MASK_NONE, later pieces MASK_CONTINUATION (mirrors WordPiece '##'
    continuation bookkeeping the reference relies on for consolidation,
    token_classification.rs:1016-1022).
    """
    pieces: list[str] = []
    ids: list[int] = []
    begins: list[int] = []
    ends: list[int] = []
    masks: list[int] = []
    for m in _WORD_RE.finditer(text):
        word = m.group(0)
        start = m.start()
        for i in range(0, len(word), _SUBWORD_CHUNK):
            piece = word[i:i + _SUBWORD_CHUNK]
            marked = piece if i == 0 else "##" + piece
            pieces.append(marked)
            ids.append(token_id(marked))
            begins.append(start + i)
            ends.append(start + min(i + _SUBWORD_CHUNK, len(word)))
            masks.append(MASK_NONE if i == 0 else MASK_CONTINUATION)
    return TokenizedInput(pieces, ids, begins, ends, masks)


class WordPieceTokenizer:
    """WordPiece: longest-match-first sub-word split with ``##``
    continuations and the BERT ``lower_case`` / ``strip_accents``
    normalization flags the reference exposes
    (src/pipelines/token_classification.rs:237-242 — forwarded to
    rust_tokenizers' BertTokenizer; that crate is external, so this is a
    pure-Python implementation of the same public algorithm).

    Offsets remain CHARACTER offsets into the ORIGINAL text: normalization
    (lowercasing, NFD accent stripping) tracks a per-normalized-char map
    back to source char indices, so accent-expanding or case-expanding
    inputs keep char-exact spans. A word with any unmatchable position (or
    longer than ``max_input_chars_per_word``) becomes one ``[UNK]`` piece
    spanning the whole word — BERT's whole-word-UNK rule.

    Same ``tokenize_with_offsets`` contract as the default chunk tokenizer;
    plug into the pipeline with ``PipelineConfig(tokenizer="wordpiece")``.
    """

    UNK = "[UNK]"

    def __init__(self, vocab, lower_case: bool = False,
                 strip_accents: bool | None = None,
                 max_input_chars_per_word: int = 100):
        self.vocab = frozenset(vocab)
        self.lower_case = lower_case
        # unset strip_accents follows lower_case — BERT BasicTokenizer's
        # default, which the reference's Option<bool> None selects
        self.strip_accents = (lower_case if strip_accents is None
                              else strip_accents)
        self.max_input_chars_per_word = max_input_chars_per_word

    @classmethod
    def from_words(cls, words, lower_case: bool = False,
                   strip_accents: bool | None = None) -> "WordPieceTokenizer":
        """Vocab = each word's normalized full form + per-char fallback
        pieces (every char c and '##' + c), so in-vocab words are one piece
        and everything else degrades to char pieces instead of [UNK]."""
        tok = cls((), lower_case=lower_case, strip_accents=strip_accents)
        vocab: set[str] = set()
        for w in words:
            norm, _ = tok._normalize(w)
            if not norm:
                continue
            vocab.add(norm)
            for ch in norm:
                vocab.add(ch)
                vocab.add("##" + ch)
        tok.vocab = frozenset(vocab)
        return tok

    def _normalize(self, word: str) -> tuple[str, list[int]]:
        """-> (normalized word, source char index per normalized char)."""
        import unicodedata
        chars: list[str] = []
        idx_map: list[int] = []
        for i, ch in enumerate(word):
            ch = ch.lower() if self.lower_case else ch
            if self.strip_accents:
                for d in unicodedata.normalize("NFD", ch):
                    if unicodedata.category(d) != "Mn":
                        chars.append(d)
                        idx_map.append(i)
            else:
                for d in ch:        # lower() may expand (e.g. 'İ' -> 'i̇')
                    chars.append(d)
                    idx_map.append(i)
        return "".join(chars), idx_map

    def _wordpiece(self, norm: str) -> list[tuple[str, int, int]] | None:
        """Greedy longest-match-first over the normalized word; None when
        some position cannot be matched (whole word -> [UNK])."""
        out: list[tuple[str, int, int]] = []
        start = 0
        while start < len(norm):
            end = len(norm)
            found = None
            while start < end:
                sub = norm[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    found = sub
                    break
                end -= 1
            if found is None:
                return None
            out.append((found, start, end))
            start = end
        return out

    def tokenize_with_offsets(self, text: str) -> TokenizedInput:
        pieces: list[str] = []
        ids: list[int] = []
        begins: list[int] = []
        ends: list[int] = []
        masks: list[int] = []
        for m in _WORD_RE.finditer(text):
            word = m.group(0)
            start = m.start()
            sub = None
            if len(word) <= self.max_input_chars_per_word:
                norm, idx_map = self._normalize(word)
                if norm:
                    sub = self._wordpiece(norm)
            if sub is None:
                pieces.append(self.UNK)
                ids.append(token_id(self.UNK))
                begins.append(start)
                ends.append(start + len(word))
                masks.append(MASK_NONE)
                continue
            for piece, s, e in sub:
                pieces.append(piece)
                ids.append(token_id(piece))
                begins.append(start + idx_map[s])
                ends.append(start + idx_map[e - 1] + 1)
                masks.append(MASK_NONE if s == 0 else MASK_CONTINUATION)
        return TokenizedInput(pieces, ids, begins, ends, masks)


@dataclass
class InputFeature:
    """One sliding-window span, with special tokens added.

    Mirrors reference InputFeature (token_classification.rs:193-207):
    input_ids, offsets (None for specials), mask, reference_feature flags,
    example_index.
    """
    input_ids: list[int]
    begins: list[int]        # -1 for special tokens
    ends: list[int]          # -1 for special tokens
    masks: list[int]
    reference_feature: list[bool]
    example_index: int


def _build_with_special_tokens(
    ids: list[int], begins: list[int], ends: list[int], masks: list[int]
) -> tuple[list[int], list[int], list[int], list[int]]:
    """[CLS] content [SEP] — adds 2 special tokens (n_special_tokens=2)."""
    return (
        [CLS_ID] + ids + [SEP_ID],
        [-1] + begins + [-1],
        [-1] + ends + [-1],
        [MASK_SPECIAL] + masks + [MASK_SPECIAL],
    )


def _reference_feature_flag(
    start_token: int,
    end_token: int,
    total_length: int,
    doc_stride: int,
    span_len: int,
    span_masks: list[int],
) -> list[bool]:
    """Ownership flags: which positions of this span "own" their token.

    Port of get_reference_feature_flag (token_classification.rs:885-928):
    interior span edges disown doc_stride/2 tokens (+ adjacent specials).
    """
    if start_token > 0:
        leading_special = 0
        for m in span_masks:
            if m != MASK_SPECIAL:
                break
            leading_special += 1
        start_cutoff = doc_stride // 2 + leading_special
    else:
        start_cutoff = 0
    if end_token < total_length:
        trailing_special = 0
        for m in reversed(span_masks):
            if m != MASK_SPECIAL:
                break
            trailing_special += 1
        end_cutoff = span_len - doc_stride // 2 - trailing_special
    else:
        end_cutoff = span_len
    flags = [True] * span_len
    for i in range(min(start_cutoff, span_len)):
        flags[i] = False
    for i in range(max(end_cutoff, 0), span_len):
        flags[i] = False
    return flags


def generate_features(
    text: str, example_index: int, max_length: int = 64, n_special: int = 2,
    tokenizer: WordPieceTokenizer | None = None,
) -> list[InputFeature]:
    """Split one text into overlapping spans.

    Port of generate_features (token_classification.rs:808-882):
      max_content_length = max_length - n_special
      doc_stride = max_length // 4
      while len(spans) * doc_stride < n_tokens:
          end = min(start + max_content_length, n_tokens)
          ... emit span ...
          if end == n_tokens: break
          start = end - doc_stride
    """
    tok = (tokenizer.tokenize_with_offsets(text) if tokenizer is not None
           else tokenize_with_offsets(text))
    total = len(tok.ids)
    max_content_length = max_length - n_special
    doc_stride = max_length // 4

    spans: list[InputFeature] = []
    start_token = 0
    while len(spans) * doc_stride < total:
        end_token = min(start_token + max_content_length, total)
        ids, begins, ends, masks = _build_with_special_tokens(
            tok.ids[start_token:end_token],
            tok.begins[start_token:end_token],
            tok.ends[start_token:end_token],
            tok.masks[start_token:end_token],
        )
        flags = _reference_feature_flag(
            start_token, end_token, total, doc_stride, len(ids), masks
        )
        spans.append(InputFeature(ids, begins, ends, masks, flags, example_index))
        if end_token == total:
            break
        start_token = end_token - doc_stride
    return spans
