"""Deterministic text operators with engine-exact SQL mirrors.

These back three reference pipelines with stand-in models whose math is
EXACTLY expressible in SQL, giving the driver's DuckDB oracle full coverage
of a "model" stage end-to-end:

- POS tagging (reference: src/pipelines/pos_tagging.rs — same machinery as
  token classification with a POS label head). Stand-in head: closed-class
  word lists + shape rules. Rules depend only on features preserved by a
  word's FIRST sub-word piece (case, digits, punct, and closed-class words
  chosen <= 4 chars = single-piece), so pipeline output == word-level rule.
- Sentiment (reference: src/pipelines/sentiment.rs — Positive/Negative over
  an SST-2 head). Stand-in head: lexicon counts; score is the exact ratio
  (n_pos + 1) / (n_pos + n_neg + 2) — integer math, engine-exact.
- SimHash document fingerprinting (dedup family): 32-bit simhash over
  distinct words hashed with an explicit polynomial rolling hash
  h = fold(acc * 31 + codepoint) mod 2^32 — pure integer ops, bit-identical
  in Spark SQL and DuckDB (no md5 byte-order trap).
"""

from __future__ import annotations

import re

# --- POS ---------------------------------------------------------------------

POS_LABELS = ["NOUN", "PROPN", "DET", "ADP", "CONJ", "PRON", "NUM", "PUNCT"]
POS_LABEL2ID = {l: i for i, l in enumerate(POS_LABELS)}

# closed-class lists: every word <= 4 chars (single sub-word piece)
DET_WORDS = ("the", "a", "an", "this", "that", "each", "some")
ADP_WORDS = ("of", "in", "on", "at", "by", "for", "with", "to", "from", "near")
CONJ_WORDS = ("and", "or", "but", "nor", "so", "yet")
PRON_WORDS = ("i", "you", "he", "she", "it", "we", "they", "them", "him", "her")

_DIGITS_RE = re.compile(r"^[0-9]+$")
_NOWORD_RE = re.compile(r"^[^0-9A-Za-z_]+$", re.ASCII)


def pos_tag_word(word: str) -> str:
    """Rule head, applied to a word (or equivalently its first piece)."""
    if _DIGITS_RE.match(word):
        return "NUM"
    if _NOWORD_RE.match(word):
        return "PUNCT"
    lower = word.lower()
    if lower in DET_WORDS:
        return "DET"
    if lower in ADP_WORDS:
        return "ADP"
    if lower in CONJ_WORDS:
        return "CONJ"
    if lower in PRON_WORDS:
        return "PRON"
    if word[:1].isupper():
        return "PROPN"
    return "NOUN"


def pos_case_sql(word_expr: str, engine: str) -> str:
    """The identical rule as SQL. engine: 'spark' | 'duckdb'."""
    def inlist(words):
        return ", ".join(f"'{w}'" for w in words)
    if engine == "spark":
        match = lambda p: f"{word_expr} rlike '^{p}$'"  # noqa: E731
    else:
        match = lambda p: f"regexp_full_match({word_expr}, '{p}')"  # noqa: E731
    return f"""CASE
  WHEN {match('[0-9]+')} THEN 'NUM'
  WHEN {match('[^0-9A-Za-z_]+')} THEN 'PUNCT'
  WHEN lower({word_expr}) IN ({inlist(DET_WORDS)}) THEN 'DET'
  WHEN lower({word_expr}) IN ({inlist(ADP_WORDS)}) THEN 'ADP'
  WHEN lower({word_expr}) IN ({inlist(CONJ_WORDS)}) THEN 'CONJ'
  WHEN lower({word_expr}) IN ({inlist(PRON_WORDS)}) THEN 'PRON'
  WHEN substring({word_expr}, 1, 1) <> lower(substring({word_expr}, 1, 1)) THEN 'PROPN'
  ELSE 'NOUN' END"""


# --- sentiment ----------------------------------------------------------------

POSITIVE_LEX = ("fast", "good", "great", "value", "growth", "big")
NEGATIVE_LEX = ("slow", "bad", "poor", "small", "error", "under")


def sentiment_of(words: list[str]) -> tuple[int, int, str, float]:
    """-> (n_pos, n_neg, polarity, score). Exact integer/rational math."""
    n_pos = sum(1 for w in words if w in POSITIVE_LEX)
    n_neg = sum(1 for w in words if w in NEGATIVE_LEX)
    polarity = "Positive" if n_pos >= n_neg else "Negative"
    score = (n_pos + 1) / (n_pos + n_neg + 2)
    return n_pos, n_neg, polarity, score


# --- polynomial word hash + simhash --------------------------------------------

_MOD32 = 1 << 32


def h32(word: str) -> int:
    """Polynomial rolling hash: fold(acc * 31 + codepoint) mod 2^32."""
    acc = 0
    for ch in word:
        acc = (acc * 31 + ord(ch)) % _MOD32
    return acc


def simhash32(words: list[str]) -> int:
    """32-bit SimHash over DISTINCT words (unweighted)."""
    ws = sorted(set(words))
    out = 0
    for j in range(32):
        s = sum(1 if (h32(w) >> j) & 1 else -1 for w in ws)
        if s > 0:
            out |= 1 << j
    return out


def h32_sql(word_expr: str, engine: str) -> str:
    """The identical polynomial hash in SQL. engine: 'spark' | 'duckdb'.

    Astral-safe, verified empirically (test_h32_sql_astral_cross_engine):
    Spark strings are UTF8String with CODE-POINT semantics, so
    ascii(substring(s, i, 1)) returns the full code point for astral-plane
    characters (U+1F600 -> 128512), matching DuckDB unicode() and Python
    ord() exactly — NOT the UTF-16 surrogate half a JVM String.charAt
    mental model would predict. All three engines hash any Unicode input
    identically."""
    if engine == "spark":
        chars = f"transform(sequence(1, length({word_expr})), i -> ascii(substring({word_expr}, i, 1)))"
        return f"aggregate({chars}, cast(0 as bigint), (acc, c) -> (acc * 31 + c) % 4294967296)"
    chars = f"[unicode({word_expr}[i]) for i in range(1, length({word_expr}) + 1)]"
    return f"list_reduce(list_prepend(CAST(0 AS BIGINT), {chars}), (acc, c) -> (acc * 31 + c) % 4294967296)"


def kgram_hashes(text: str, k: int = 8) -> list[int]:
    """Rabin-Karp k-gram fingerprint hashes (pure-Python oracle): the
    polynomial hash of every character k-gram of the lowercased text,
    computed with O(1) rolling updates (h_next = (h*31 + in - out*31^k))."""
    t = text.lower()
    n = len(t)
    if n < k:
        return []
    pow_k = pow(31, k, _MOD32)
    h = 0
    for ch in t[:k]:
        h = (h * 31 + ord(ch)) % _MOD32
    out = [h]
    for i in range(k, n):
        h = (h * 31 + ord(t[i]) - ord(t[i - k]) * pow_k) % _MOD32
        out.append(h)
    return out


def kgram_fingerprint_sql(text_expr: str, engine: str, k: int = 8) -> str:
    """k-gram rolling-hash fingerprint expressions per engine: the list of
    polynomial hashes of every character k-gram of lower(text). The SQL form
    recomputes each gram's hash from its chars (O(len*k) map-side work, no
    shuffle — the Python kgram_hashes oracle proves the O(len) rolling
    recurrence yields identical values)."""
    h = h32_sql("g", engine)
    if engine == "spark":
        grams = (f"transform(sequence(1, length({text_expr}) - {k - 1}), "
                 f"i -> substring({text_expr}, i, {k}))")
        return (f"CASE WHEN length({text_expr}) >= {k} "
                f"THEN transform({grams}, g -> {h}) "
                f"ELSE cast(array() as array<bigint>) END")
    grams = (f"[{text_expr}[i:i+{k - 1}] "
             f"for i in range(1, length({text_expr}) - {k - 2})]")
    return f"list_transform({grams}, g -> {h})"


def simhash_sql(words_expr: str, engine: str) -> str:
    """SimHash over a distinct-word list expression, generated per engine."""
    h = h32_sql("w", engine)
    if engine == "spark":
        hs = f"transform({words_expr}, w -> {h})"
        bit = lambda j: (  # noqa: E731
            f"(CASE WHEN aggregate(hs, cast(0 as bigint), "
            f"(acc, x) -> acc + (CASE WHEN (x div {1 << j}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
            f"THEN cast({1 << j} as bigint) ELSE cast(0 as bigint) END)")
    else:
        hs = f"list_transform({words_expr}, w -> {h})"
        bit = lambda j: (  # noqa: E731
            f"(CASE WHEN list_sum(list_transform(hs, "
            f"x -> CASE WHEN (x // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
            f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
    total = " + ".join(bit(j) for j in range(32))
    return hs, total
