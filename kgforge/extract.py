"""Stage 1 — deterministic HTML -> text extraction.

The north-star invariant (BASELINE.json input_hint): extracted text is
BYTE-IDENTICAL per url to the reference extractor. We therefore define a
versioned, hash-pinned extractor (trafilatura-equivalent in spirit:
boilerplate removal + block-level text extraction) implemented as a pure
function and wrapped in an Arrow-batched pandas UDF.

Rules (EXTRACTOR_VERSION pins them — any change bumps the version and the
stage-1 lineage hash):
1. decode UTF-8 (errors -> replacement char, deterministic);
2. drop <script>...</script>, <style>...</style>, <nav>...</nav>,
   <header>...</header>, <footer>...</footer> and HTML comments;
3. the text content of each block element (title, h1-h6, p, li),
   in document order, becomes one output line;
4. inline tags inside blocks are stripped; HTML entities unescaped;
5. lines joined with "\n". No trailing newline.
"""

from __future__ import annotations

import hashlib
import html as _htmllib
import re

EXTRACTOR_VERSION = "kgforge-extract-v1"

_DROP_RE = re.compile(
    r"<(script|style|nav|header|footer)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.DOTALL | re.IGNORECASE,
)
_BLOCK_RE = re.compile(
    r"<(title|h[1-6]|p|li)\b[^>]*>(.*?)</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text(html_bytes: bytes) -> str:
    """Pure stage-1 extractor; deterministic byte-for-byte."""
    raw = html_bytes.decode("utf-8", errors="replace")
    cleaned = _DROP_RE.sub("", raw)
    lines = []
    for m in _BLOCK_RE.finditer(cleaned):
        inner = _TAG_RE.sub("", m.group(2))
        lines.append(_htmllib.unescape(inner))
    return "\n".join(lines)


def extractor_hash() -> str:
    """Lineage identity of the extractor (version string, pinned)."""
    return hashlib.sha256(EXTRACTOR_VERSION.encode()).hexdigest()[:16]


def wrap_html(text: str, url: str) -> bytes:
    """Inverse used by the synthetic generator: produce realistic HTML whose
    extraction is byte-identical to ``text``. Adds boilerplate (nav, script,
    footer) that the extractor must strip. First line becomes the <title>."""
    lines = text.split("\n")
    body = "\n".join(f"  <p>{_escape(line)}</p>" for line in lines[1:])
    title = _escape(lines[0]) if lines else ""
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><title>{title}</title>\n"
        f"<script>var u='{url}';trk(u);</script>\n"
        "<style>p { margin: 0 }</style></head>\n"
        "<body><nav><a href='/'>home</a> | <a href='/about'>about</a></nav>\n"
        "<header><h3>site banner</h3></header>\n"
        "<!-- generated page -->\n"
        f"{body}\n"
        "<footer>© example</footer></body></html>"
    ).encode("utf-8")


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
