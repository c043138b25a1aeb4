"""Translation pipeline (#21) — port of the reference semantics:

  - language -> generation-prefix and/or forced-BOS token id per model
    flavor: ``get_prefix_and_forced_bos_id``
    (src/pipelines/common.rs:1570-1730) for Marian / T5 / MBart50 / M2M100 /
    NLLB;
  - supported-language validation with the reference's error semantics
    (translation_pipeline.rs:1279, common.rs:1576-1592);
  - prefix prepended to every text, then generate, then decode
    (TranslationModel::translate, translation_pipeline.rs:1470-1497).

The language registry (213 variants + ISO-639-1/-3 + NLLB codes) lives in
``kgforge.languages``. The backbone is the stand-in LM head; the bookkeeping
above is pure, portable math and is what this module pins."""

from __future__ import annotations

from .generation import GenerateConfig, StandInLMHead, generate_ids
from .languages import display_name, iso_639_1, nllb_code

MARIAN = "marian"
T5 = "t5"
MBART50 = "mbart50"
M2M100 = "m2m100"
NLLB = "nllb"


def _require_iso1(language: str, supported: set[str]) -> str:
    code = iso_639_1(language)
    if code is None:
        raise ValueError(
            f"This language has no ISO639-I code. Languages supported by "
            f"model: {sorted(supported)}.")
    return code


def get_prefix_and_forced_bos_id(
    model_type: str,
    source_language: str | None,
    target_language: str | None,
    supported_source_languages: set[str],
    supported_target_languages: set[str],
    token_to_id=None,
) -> tuple[str | None, int | None]:
    """Port of TokenizerOption::get_prefix_and_forced_bos_id
    (common.rs:1570-1730). ``token_to_id`` resolves language-marker tokens
    (e.g. ">>fr<<") to vocab ids for the forced-BOS flavors."""
    if source_language is not None and (
            source_language not in supported_source_languages):
        raise ValueError(
            f"{display_name(source_language)} not in list of supported "
            f"languages: {sorted(supported_source_languages)}")
    if target_language is not None and (
            target_language not in supported_target_languages):
        raise ValueError(
            f"{display_name(target_language)} not in list of supported "
            f"languages: {sorted(supported_target_languages)}")

    if model_type == MARIAN:
        if len(supported_target_languages) > 1:
            if target_language is None:
                raise ValueError(
                    "Missing target language for Marian (multiple languages "
                    f"supported by model: {sorted(supported_target_languages)}"
                    ", need to specify target language)")
            return (f">>{_require_iso1(target_language, supported_target_languages)}<< ",
                    None)
        return (None, None)

    if model_type == T5:
        if source_language is None:
            raise ValueError("Missing source language for T5")
        if target_language is None:
            raise ValueError("Missing target language for T5")
        return (f"translate {display_name(source_language)} to "
                f"{display_name(target_language)}:", None)

    if model_type == MBART50:
        if source_language is None:
            raise ValueError(
                "Missing source language for MBart (multiple languages "
                f"supported by model: {sorted(supported_source_languages)}, "
                "need to specify target language)")
        if target_language is None:
            raise ValueError(
                "Missing target language for MBart (multiple languages "
                f"supported by model: {sorted(supported_target_languages)}, "
                "need to specify target language)")
        src = _require_iso1(source_language, supported_source_languages)
        tgt = _require_iso1(target_language, supported_target_languages)
        return (f">>{src}<< ", token_to_id(f">>{tgt}<<"))

    if model_type == M2M100:
        if source_language is None:
            raise ValueError(
                "Missing source language for M2M100 (multiple languages "
                f"supported by model: {sorted(supported_source_languages)}, "
                "need to specify target language)")
        if target_language is None:
            raise ValueError(
                "Missing target language for M2M100 (multiple languages "
                f"supported by model: {sorted(supported_target_languages)}, "
                "need to specify target language)")
        src = _require_iso1(source_language, supported_source_languages)
        tgt = _require_iso1(target_language, supported_target_languages)
        if len(src) == 2:
            prefix = f">>{src}.<< "
        elif len(src) == 3:
            prefix = f">>{src}<< "
        else:
            raise ValueError("Invalid ISO 639-I code")
        if len(tgt) == 2:
            tgt_token = f">>{tgt}.<<"
        elif len(tgt) == 3:
            tgt_token = f">>{tgt}<<"
        else:
            raise ValueError("Invalid ISO 639-3 code")
        return (prefix, token_to_id(tgt_token))

    if model_type == NLLB:
        src = source_language and nllb_code(source_language)
        if not src:
            raise ValueError(
                "Missing source language for NLLB. Need to specify one "
                f"from: {sorted(supported_source_languages)}")
        tgt = target_language and nllb_code(target_language)
        if not tgt:
            raise ValueError(
                "Missing target language for NLLB. Need to specify one "
                f"from: {sorted(supported_target_languages)}")
        return (src, token_to_id(tgt))

    return (None, None)


TRANSLATION_CONFIG = GenerateConfig(
    # TranslationConfig::new defaults mirror GenerateConfig with beams=3,
    # max 512 (translation_pipeline.rs:600-680); small max here keeps the
    # stand-in decode bounded
    min_length=0, max_length=48, do_sample=False, early_stopping=True,
    num_beams=3, no_repeat_ngram_size=3)


class Translator:
    """Port of TranslationModel::translate (translation_pipeline.rs:1470-1497):
    resolve (prefix, forced_bos) for the language pair, prepend the prefix,
    generate, decode. Language-marker tokens (">>fr.<<" &c.) are part of the
    head vocab so forced-BOS ids resolve exactly as
    TokenizerOption::convert_tokens_to_ids would."""

    def __init__(self, head: StandInLMHead, model_type: str,
                 supported_source_languages: set[str],
                 supported_target_languages: set[str],
                 cfg: GenerateConfig = TRANSLATION_CONFIG):
        assert head.is_encoder_decoder
        self.head = head
        self.model_type = model_type
        self.supported_source_languages = set(supported_source_languages)
        self.supported_target_languages = set(supported_target_languages)
        self.cfg = cfg

    def _token_to_id(self, token: str) -> int:
        if token not in self.head.word_id:
            raise ValueError(f"language token {token!r} not in model vocab")
        return self.head.word_id[token]

    def translate(self, texts: list[str], source_language: str | None,
                  target_language: str | None) -> list[str]:
        prefix, forced_bos = get_prefix_and_forced_bos_id(
            self.model_type, source_language, target_language,
            self.supported_source_languages, self.supported_target_languages,
            self._token_to_id)
        if prefix is not None:
            # the reference concatenates prefix+text directly
            # (translation_pipeline.rs:1487-1495) because subword tokenizers
            # split at the ':'/marker boundary anyway; our word-level head
            # splits on whitespace, so flavors whose prefix carries no
            # trailing space (T5 "…:", NLLB "eng_Latn") must get a
            # separator or the prefix fuses with — and drops — the first
            # source word
            sep = "" if prefix.endswith(" ") else " "
            texts = [f"{prefix}{sep}{t}" for t in texts]
        cfg = self.cfg
        if forced_bos is not None:
            from dataclasses import replace
            cfg = replace(cfg, forced_bos_token_id=forced_bos)
        return [self.head.decode(self._strip_forced_bos(ids, forced_bos))
                for ids, _ in generate_ids(self.head, texts, cfg)]

    @staticmethod
    def _strip_forced_bos(ids: list[int], forced_bos: int | None) -> list[int]:
        # the decoded output drops the language-marker BOS the same way the
        # reference's decode(skip_special_tokens) drops added specials
        if forced_bos is not None and len(ids) > 1 and ids[1] == forced_bos:
            return [ids[0]] + ids[2:]
        return ids
