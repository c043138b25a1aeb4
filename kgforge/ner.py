"""Token-classification + NER pipeline math.

Pure-Python/numpy port of the reference's pipeline semantics (NOT its code):

- ``predict_tokens``   <- TokenClassificationModel::predict
  (src/pipelines/token_classification.rs:957-1042): featurize, micro-batch,
  pad to batch max, forward, softmax, argmax, decode owned positions only,
  then optional sub-token consolidation.
- ``consolidate_tokens`` <- token_classification.rs:1137-1202 (score product
  with 1-score for disagreeing sub-tokens; label aggregation First/Last/Mode
  with the Mode tie-break by (count, max score), :1218-1232).
- ``consolidate_entities`` <- the BIOES EntityBuilder state machine
  (src/pipelines/ner.rs:324-457): flush on O; flush+start on B/S; I/E continue
  unless previous was E/S or the class changed; entity word = token texts
  joined by " ", score = product of token scores, offset = [first.begin,
  last.end].

The Spark stage at the bottom wraps ``predict_tokens`` in ``mapInPandas`` —
one encoder per Python worker, Arrow batches in/out, no per-row Python.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from .config import NER_LABELS, PipelineConfig
from .encoders import StandInTokenClassifier, softmax
from .tokenization import (
    MASK_CONTINUATION,
    MASK_SPECIAL,
    PAD_ID,
    InputFeature,
    generate_features,
)


@dataclass(slots=True)
class Token:
    """Reference Token struct (token_classification.rs:150-171).
    slots=True: created once per decoded sub-word token (130k per 600
    pages) — slot storage measurably cuts allocation + attribute cost."""
    text: str
    score: float
    label: str
    label_index: int
    sentence: int
    index: int
    word_index: int
    begin: int   # char offsets (None-offset specials never reach output here)
    end: int
    mask: int


@dataclass(slots=True)
class Entity:
    """Reference Entity struct (ner.rs:138-149)."""
    word: str
    score: float
    label: str
    begin: int
    end: int


def _pad_features(
    features: list[InputFeature],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad ids to max-in-batch; attention mask 1 on real tokens
    (port of pad_features, token_classification.rs:1044-1090). Also returns
    the continuation mask the stand-in encoder uses for word-consistent
    continuation labels."""
    max_len = max(len(f.input_ids) for f in features)
    ids = np.full((len(features), max_len), PAD_ID, dtype=np.int64)
    mask = np.zeros((len(features), max_len), dtype=np.int64)
    cont = np.zeros((len(features), max_len), dtype=np.int64)
    for i, f in enumerate(features):
        n = len(f.input_ids)
        ids[i, :n] = f.input_ids
        mask[i, :n] = 1
        cont[i, :n] = [1 if m == MASK_CONTINUATION else 0 for m in f.masks]
    return ids, mask, cont


def predict_tokens(
    texts: list[str],
    encoder: StandInTokenClassifier,
    cfg: PipelineConfig,
    consolidate_sub_tokens: bool = True,
    return_special: bool = False,
    labels: list[str] | None = None,
) -> list[list[Token]]:
    """Port of TokenClassificationModel::predict (token_classification.rs:957-1042)."""
    labels = labels or NER_LABELS
    from .workers import get_tokenizer
    kind = getattr(cfg, "tokenizer", "chunk")
    enc_kind = getattr(encoder, "tokenizer_kind", None)
    if enc_kind is not None and enc_kind != kind:
        # the gazetteer is keyed on ITS tokenizer's pieces; featurizing with
        # a different one silently misses every entity (all-O output) —
        # refuse loudly instead
        raise ValueError(
            f"encoder gazetteer keyed for tokenizer {enc_kind!r} but "
            f"cfg.tokenizer={kind!r}")
    tokenizer = get_tokenizer(kind)
    features: list[InputFeature] = []
    for example_index, text in enumerate(texts):
        features.extend(
            generate_features(text, example_index, cfg.max_length,
                              cfg.n_special_tokens, tokenizer)
        )

    example_tokens: list[list[Token]] = [[] for _ in texts]
    for start in range(0, len(features), cfg.batch_size):
        batch = features[start:start + cfg.batch_size]
        ids, attn, cont = _pad_features(batch)
        if getattr(encoder, "needs_token_texts", False):
            piece_texts = [
                [
                    ("##" if f.masks[p] == MASK_CONTINUATION else "")
                    + texts[f.example_index][f.begins[p]:f.ends[p]]
                    if f.begins[p] >= 0 else ""
                    for p in range(len(f.input_ids))
                ] + [""] * (ids.shape[1] - len(f.input_ids))
                for f in batch
            ]
        else:
            piece_texts = None
        logits = encoder.forward(ids, attn, cont, piece_texts)
        scores = softmax(logits, axis=-1)
        label_idx = np.argmax(scores, axis=-1)
        # gather each position's winning score in ONE vectorized pass (the
        # per-token scores[bi, pos, li] numpy indexing dominated this loop);
        # .tolist() hands the decode loop plain Python ints/floats with the
        # identical float64 bits
        top_scores = np.take_along_axis(
            scores, label_idx[..., None], axis=-1)[..., 0]
        for bi, feat in enumerate(batch):
            word_idx = 0
            text = texts[feat.example_index]
            tlen = len(text)
            toks = example_tokens[feat.example_index]
            li_row = label_idx[bi].tolist()
            sc_row = top_scores[bi].tolist()
            fmasks, fbegins, fends = feat.masks, feat.begins, feat.ends
            for pos, owned in enumerate(feat.reference_feature):
                if not owned:
                    continue
                mask = fmasks[pos]
                if mask == MASK_SPECIAL and not return_special:
                    continue
                if mask != MASK_CONTINUATION:
                    word_idx += 1
                li = li_row[pos]
                begin, end = fbegins[pos], fends[pos]
                # decode_token: char-offset slice of the original string
                # (token_classification.rs:1108-1117), end clamped to len
                tok_text = text[begin:min(end, tlen)] if begin >= 0 else ""
                toks.append(Token(
                    text=tok_text,
                    score=sc_row[pos],
                    label=labels[li],
                    label_index=li,
                    sentence=feat.example_index,
                    index=pos,
                    word_index=word_idx,
                    begin=begin,
                    end=end,
                    mask=mask,
                ))
    if consolidate_sub_tokens:
        return [consolidate_tokens(toks, cfg.label_aggregation) for toks in example_tokens]
    return example_tokens


def predict_pos(texts: list[str], cfg: PipelineConfig, seed: int = 42) -> list[list[dict]]:
    """POS tagging (reference: POSModel::predict, pos_tagging.rs:262-290):
    identical machinery with a POS head, return_special=False, word-level
    consolidation; emits POSTag{word, score, label} per word."""
    from .encoders import StandInPOSTagger
    from .textops import POS_LABELS

    tagger = StandInPOSTagger(seed=seed)
    token_lists = predict_tokens(
        texts, tagger, cfg, consolidate_sub_tokens=True,
        return_special=False, labels=POS_LABELS,
    )
    return [
        [{"word": t.text, "score": t.score, "label": t.label,
          "begin": t.begin, "end": t.end} for t in toks]
        for toks in token_lists
    ]


def _consolidate_label(group: list[Token], aggregation) -> tuple[int, str]:
    """Label aggregation (token_classification.rs:1204-1232). A callable is
    the Custom variant (LabelAggregationOption::Custom(fn), :221): it
    receives the sub-token group and returns (label_index, label)."""
    if callable(aggregation):
        return aggregation(group)
    if aggregation == "first":
        return group[0].label_index, group[0].label
    if aggregation == "last":
        return group[-1].label_index, group[-1].label
    if aggregation == "mode":
        stats: dict[tuple[int, str], list[float]] = defaultdict(lambda: [0, 0.0])
        for t in group:
            s = stats[(t.label_index, t.label)]
            s[0] += 1
            s[1] = max(s[1], t.score)
        # max by (count, max score) — the reference's exact tie-break (:1218-1232)
        (label_index, label), _ = max(stats.items(), key=lambda kv: (kv[1][0], kv[1][1]))
        return label_index, label
    raise ValueError(f"unknown label aggregation {aggregation!r}")


def consolidate_tokens(tokens: list[Token], aggregation="first") -> list[Token]:
    """Merge continuation sub-words into word-level tokens
    (token_classification.rs:1137-1202). Groups are a word-initial token plus
    its following MASK_CONTINUATION tokens; score is the product of
    (score if sub-label agrees else 1 - score) (:1174-1182).

    Single forward pass: the overwhelming majority of groups are
    singletons, so the previous one-list-per-token grouping allocated a
    list per token for nothing (measured hot). A group STARTS at any
    non-continuation token — or at a continuation with no open group,
    i.e. stream position 0, exactly the old `and groups` guard."""
    out: list[Token] = []
    n = len(tokens)
    i = 0
    while i < n:
        j = i + 1
        while j < n and tokens[j].mask == MASK_CONTINUATION:
            j += 1
        if j == i + 1:
            out.append(tokens[i])
            i = j
            continue
        group = tokens[i:j]
        label_index, label = _consolidate_label(group, aggregation)
        score = 1.0
        text = ""
        for t in group:
            text += t.text
            score *= t.score if t.label_index == label_index else 1.0 - t.score
        first, last = group[0], group[-1]
        out.append(Token(
            text=text, score=score, label=label, label_index=label_index,
            sentence=first.sentence, index=first.index,
            word_index=first.word_index, begin=first.begin, end=last.end,
            mask=0,
        ))
        i = j
    return out


def predict_entities(tokens: list[Token]) -> list[Entity]:
    """NERModel::predict post-processing: drop 'O' (ner.rs:253-273)."""
    return [
        Entity(word=t.text, score=t.score, label=_class_of(t.label),
               begin=t.begin, end=t.end)
        for t in tokens if t.label != "O"
    ]


@lru_cache(maxsize=4096)
def _tag_of(label: str) -> str:
    # label vocabulary is tiny and fixed; the split ran once per decoded
    # token (57k calls per 600 pages) before caching
    tag = label.split("-")[0]
    if tag not in ("B", "I", "O", "E", "S"):
        raise ValueError(f"Invalid tag encountered for label {label!r}")
    return tag


@lru_cache(maxsize=4096)
def _class_of(label: str) -> str:
    parts = label.split("-")
    return parts[1] if len(parts) > 1 else ""


def consolidate_entities(tokens: list[Token]) -> list[Entity]:
    """BIOES chunking state machine — port of EntityBuilder
    (ner.rs:355-426) including every transition branch:
      O            -> flush
      B / S        -> flush, then start new
      I / E        -> continue, UNLESS the open entity's STARTING tag was E
                      or S or the class changed (then flush + start new); if
                      no open entity, start new. NB the reference does not
                      update previous_node on continuation (ner.rs:381-399),
                      so the comparison is against the tag that OPENED the
                      entity, not the immediately preceding token's tag.
    Entity word joins token texts with " " (ner.rs:404-408); score is the
    product of token scores (ner.rs:409)."""
    entities: list[Entity] = []
    open_entity: tuple[int, str, str] | None = None  # (start position, tag, class)

    def flush(position: int) -> None:
        nonlocal open_entity
        if open_entity is not None:
            start, _tag, cls = open_entity
            span = tokens[start:position]
            if span:
                entities.append(Entity(
                    word=" ".join(t.text for t in span),
                    score=float(np.prod([t.score for t in span])),
                    label=cls,
                    begin=span[0].begin,
                    end=span[-1].end,
                ))
        open_entity = None

    for position, token in enumerate(tokens):
        tag = _tag_of(token.label)
        cls = _class_of(token.label)
        if tag == "O":
            flush(position)
        elif tag in ("B", "S"):
            flush(position)
            open_entity = (position, tag, cls)
        else:  # I or E
            if open_entity is not None:
                _, prev_tag, prev_cls = open_entity
                if prev_tag in ("E", "S") or prev_cls != cls:
                    flush(position)
                    open_entity = (position, tag, cls)
                # else: continue — reference keeps previous_node unchanged
            else:
                open_entity = (position, tag, cls)
    flush(len(tokens))
    return entities
