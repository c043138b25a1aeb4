"""Stage-1 invariant: byte-identical extraction per url (BASELINE.json)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from kgforge.extract import EXTRACTOR_VERSION, extract_text, extractor_hash, wrap_html
from kgforge.synth import gen_pages


def test_round_trip_on_synthetic_pages():
    pages, _ = gen_pages(0, 80)
    for p in pages:
        assert extract_text(p["html"]) == p["text"], p["url"]


def test_boilerplate_is_stripped():
    html = (b"<html><head><title>T</title><script>var x=1;</script>"
            b"<style>p{}</style></head><body><nav>skip</nav>"
            b"<header><h1>skip too</h1></header><!-- c --><p>keep</p>"
            b"<footer>skip</footer></body></html>")
    assert extract_text(html) == "T\nkeep"


def test_entities_unescaped_and_multibyte():
    html = "<p>Café &amp; bar &lt;3</p>".encode("utf-8")
    assert extract_text(html) == "Café & bar <3"


def test_inline_tags_stripped_inside_blocks():
    html = b"<p>a <b>bold</b> and <a href='x'>link</a></p>"
    assert extract_text(html) == "a bold and link"


def test_invalid_utf8_is_deterministic():
    html = b"<p>ok \xff\xfe broken</p>"
    assert extract_text(html) == extract_text(html)


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.text(alphabet=st.characters(exclude_characters="\n\r",
                                   exclude_categories=("Cs", "Cc")), max_size=60),
    min_size=1, max_size=6))
def test_wrap_extract_round_trip_property(lines):
    text = "\n".join(lines)
    assert extract_text(wrap_html(text, "https://x/y")) == text


def test_extractor_versioned():
    assert EXTRACTOR_VERSION.startswith("kgforge-extract-")
    assert len(extractor_hash()) == 16
