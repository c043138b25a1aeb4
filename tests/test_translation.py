"""Translation pipeline (#21) — language->prefix/forced-BOS bookkeeping
ported from common.rs:1570-1730 and translation_pipeline.rs:1470-1497, plus
the 213-variant language registry."""

from __future__ import annotations

import pytest

from kgforge.generation import GenerateConfig, StandInLMHead
from kgforge.languages import (LANGUAGES, NLLB_CODES, display_name,
                               iso_639_1, iso_639_3, nllb_code)
from kgforge.translation import (M2M100, MARIAN, MBART50, NLLB, T5,
                                 Translator, get_prefix_and_forced_bos_id)

SUP = {"English", "French", "German", "Spanish", "Asturian"}


def _head():
    vocab = ["data", "join", "merge", "sort",
             ">>fr<<", ">>en<<", ">>fr.<<", ">>en.<<", ">>ast<<",
             "eng_Latn", "fra_Latn"]
    return StandInLMHead(vocab, seed=42, is_encoder_decoder=True)


def _tid(head):
    return lambda t: head.word_id[t]


# --------------------------------------------------------------------------
# language registry
# --------------------------------------------------------------------------

def test_language_registry_complete():
    """The reference Language enum has 213 variants
    (translation_pipeline.rs:34-246); every one has an ISO-639-3 code and
    142 have ISO-639-1 codes."""
    assert len(LANGUAGES) == 213
    assert all(iso_639_3(l) for l in LANGUAGES)
    assert sum(1 for l in LANGUAGES if iso_639_1(l)) == 142
    assert len(NLLB_CODES) == 201


def test_language_codes_spotcheck():
    assert iso_639_1("English") == "en" and iso_639_3("English") == "eng"
    assert iso_639_1("Achinese") is None and iso_639_3("Achinese") == "ace"
    assert nllb_code("English") == "eng_Latn"
    assert nllb_code("Nepali") is None         # :494-507 None arm


def test_display_name_camelcase_split():
    """Display impl (:248-271): CamelCase split on uppercase boundaries."""
    assert display_name("English") == "English"
    assert display_name("TaizziAdeniArabic") == "Taizzi Adeni Arabic"
    assert display_name("WesternFrisian") == "Western Frisian"


# --------------------------------------------------------------------------
# prefix / forced-BOS per model flavor (common.rs:1570-1730)
# --------------------------------------------------------------------------

def test_marian_prefix():
    assert get_prefix_and_forced_bos_id(
        MARIAN, None, "French", SUP, SUP, None) == (">>fr<< ", None)
    # single-target Marian needs no prefix
    assert get_prefix_and_forced_bos_id(
        MARIAN, None, "French", SUP, {"French"}, None) == (None, None)
    with pytest.raises(ValueError, match="Missing target language for Marian"):
        get_prefix_and_forced_bos_id(MARIAN, None, None, SUP, SUP, None)


def test_t5_prefix_uses_display_names():
    p, b = get_prefix_and_forced_bos_id(T5, "English", "French", SUP, SUP,
                                        None)
    assert p == "translate English to French:" and b is None
    with pytest.raises(ValueError, match="Missing source language for T5"):
        get_prefix_and_forced_bos_id(T5, None, "French", SUP, SUP, None)


def test_mbart50_prefix_and_forced_bos():
    head = _head()
    p, b = get_prefix_and_forced_bos_id(MBART50, "English", "French", SUP,
                                        SUP, _tid(head))
    assert p == ">>en<< "
    assert b == head.word_id[">>fr<<"]


def test_m2m100_code_length_formatting():
    head = _head()
    p, b = get_prefix_and_forced_bos_id(M2M100, "English", "French", SUP,
                                        SUP, _tid(head))
    assert p == ">>en.<< "                      # 2-letter: >>xx.<<
    assert b == head.word_id[">>fr.<<"]
    p, b = get_prefix_and_forced_bos_id(M2M100, "Asturian", "French", SUP,
                                        SUP, _tid(head))
    assert p == ">>ast<< "                      # 3-letter: >>xxx<<


def test_nllb_prefix_and_forced_bos():
    head = _head()
    p, b = get_prefix_and_forced_bos_id(NLLB, "English", "French", SUP, SUP,
                                        _tid(head))
    assert p == "eng_Latn"
    assert b == head.word_id["fra_Latn"]
    with pytest.raises(ValueError, match="Missing source language for NLLB"):
        get_prefix_and_forced_bos_id(NLLB, None, "French", SUP, SUP,
                                     _tid(head))


def test_unsupported_language_rejected():
    """translation_pipeline.rs:1279 / common.rs:1576-1592 semantics."""
    with pytest.raises(ValueError, match="not in list of supported"):
        get_prefix_and_forced_bos_id(MARIAN, None, "Japanese", SUP, SUP,
                                     None)
    with pytest.raises(ValueError, match="not in list of supported"):
        get_prefix_and_forced_bos_id(T5, "Korean", "French", SUP, SUP, None)


def test_no_iso1_code_rejected_for_marian():
    with pytest.raises(ValueError, match="no ISO639-I code"):
        get_prefix_and_forced_bos_id(
            MARIAN, None, "Achinese", SUP, SUP | {"Achinese"}, None)


# --------------------------------------------------------------------------
# end-to-end translate
# --------------------------------------------------------------------------

def test_translate_deterministic_and_marker_free():
    head = _head()
    tr = Translator(head, M2M100, SUP, SUP,
                    GenerateConfig(do_sample=False, num_beams=3,
                                   max_length=16, min_length=2))
    a = tr.translate(["data join merge"], "English", "French")
    b = tr.translate(["data join merge"], "English", "French")
    assert a == b and len(a) == 1
    assert ">>" not in a[0] and a[0]            # markers never leak


def test_nllb_prefix_does_not_swallow_first_source_word():
    """NLLB/T5 prefixes carry no trailing space; the word-level head must
    still see the first source word (a fused 'eng_Latndata' token would
    silently drop both). With a single-word source, losing it would empty
    the encoder set and produce an empty translation."""
    head = _head()
    tr = Translator(head, NLLB, SUP, SUP,
                    GenerateConfig(do_sample=False, num_beams=1,
                                   max_length=10, min_length=1))
    out = tr.translate(["data data data"], "English", "French")[0]
    assert "data" in out.split(), out


def test_translate_forced_bos_changes_decode_state():
    """The forced-BOS token is the decoder's first step (step-1 force,
    generation_utils.rs:336-345): decodes for different targets may branch
    from the very first content token."""
    head = _head()
    tr = Translator(head, M2M100, SUP, SUP,
                    GenerateConfig(do_sample=False, num_beams=1,
                                   max_length=12, min_length=2))
    fr = tr.translate(["data join merge sort"], "English", "French")
    en = tr.translate(["data join merge sort"], "French", "English")
    assert fr and en  # both decode; branching depends on the stand-in hash
