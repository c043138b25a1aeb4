"""Mention/alias normalization shared by synth (dict build) and link (probe).

Char-level, deterministic: casefold + NFKD + strip combining marks +
whitespace collapse. Matches on normalized forms only — never re-finds
substrings in the original text (offset discipline, SURVEY §7).
"""

from __future__ import annotations

import unicodedata


def normalize_mention(surface: str) -> str:
    s = unicodedata.normalize("NFKD", surface.casefold())
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    return " ".join(s.split())
