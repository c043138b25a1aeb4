"""Extractive question answering — port of the reference pipeline math
(src/pipelines/question_answering.rs):

- featurize: question truncated to max_query_length (:926-930); context
  sliding windows of ``max_seq_len - pair_specials - query_len`` advancing by
  ``end - doc_stride`` with the same ``len(spans) * doc_stride < n`` loop
  guard (:986-1018); pair encoding [CLS] q [SEP] c [SEP];
- p_mask: 1 on question+CLS positions and every [SEP] (:1066-1083);
- per-span: mask logits to -inf where p_mask==1, softmax start and end
  independently (:833-847);
- decode: outer = start ⊗ end, keep upper triangle within max_answer_len
  (triu(0).tril(max_answer_len-1)), flatten, top-k by score (:892-917);
- answers are CHAR slices of the original context (chars().take(end).skip
  (start), :858-864);
- per example: dedupe by (start, end, answer) keeping first occurrence
  (:119-131), sort by descending score, take top_k (:879-887).

The stand-in QA head peaks start/end logits on a planted answer span;
every step downstream of the logits is the reference math.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .config import PipelineConfig
from .encoders import _hash_noise, softmax
from .tokenization import (
    CLS_ID,
    PAD_ID,
    SEP_ID,
    tokenize_with_offsets,
)

NEG_INF = np.finfo(np.float64).min


@dataclass
class Answer:
    """Reference Answer struct (question_answering.rs:102)."""
    score: float
    start: int
    end: int
    answer: str


@dataclass
class QaFeature:
    input_ids: list[int]
    begins: list[int]          # char offsets into CONTEXT; -1 for specials/query
    ends: list[int]
    p_mask: list[int]
    example_index: int


def generate_qa_features(
    question: str,
    context: str,
    max_seq_len: int = 64,
    doc_stride: int = 16,
    max_query_length: int = 16,
    example_index: int = 0,
) -> list[QaFeature]:
    """Port of generate_features (question_answering.rs:919-1019).
    Reference defaults: max_seq_len 384, doc_stride 128, max_query_length 64
    (:201-203); tests use smaller values to exercise multiple spans."""
    q = tokenize_with_offsets(question)
    q_ids = q.ids[:max_query_length]
    ctx = tokenize_with_offsets(context)

    sequence_added_tokens = 2        # [CLS] ... [SEP]
    sequence_pair_added_tokens = 3   # [CLS] q [SEP] c [SEP]
    max_context_length = max_seq_len - sequence_pair_added_tokens - len(q_ids)

    spans: list[QaFeature] = []
    start_token = 0
    total = len(ctx.ids)
    while len(spans) * doc_stride < total:
        end_token = min(start_token + max_context_length, total)
        ids = ([CLS_ID] + q_ids + [SEP_ID]
               + ctx.ids[start_token:end_token] + [SEP_ID])
        begins = ([-1] * (len(q_ids) + 2)
                  + ctx.begins[start_token:end_token] + [-1])
        ends = ([-1] * (len(q_ids) + 2)
                + ctx.ends[start_token:end_token] + [-1])
        # p_mask (get_mask, :1066-1083): question + CLS region, plus all SEPs
        question_length = len(q_ids) + sequence_added_tokens
        p_mask = [1] * question_length + [0] * (len(ids) - question_length)
        for pos, tid in enumerate(ids):
            if tid == SEP_ID:
                p_mask[pos] = 1
        spans.append(QaFeature(ids, begins, ends, p_mask, example_index))
        if end_token == total:
            break
        start_token = end_token - doc_stride
    return spans


class StandInQAHead:
    """Deterministic QA head: start/end logits peak on the first occurrence
    of ``answer_map[question]`` in the context (char match); noise elsewhere."""

    def __init__(self, answer_map: dict[str, str], seed: int = 42):
        self.answer_map = answer_map
        self.seed = seed

    def forward(self, features: list[QaFeature], questions: list[str],
                contexts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        max_len = max(len(f.input_ids) for f in features)
        ids = np.full((len(features), max_len), PAD_ID, dtype=np.int64)
        for i, f in enumerate(features):
            ids[i, :len(f.input_ids)] = f.input_ids
        start_logits = _hash_noise(ids, 2, self.seed)[..., 0] * 10
        end_logits = _hash_noise(ids, 2, self.seed + 1)[..., 1] * 10
        for i, f in enumerate(features):
            question = questions[f.example_index]
            context = contexts[f.example_index]
            answer = self.answer_map.get(question)
            if not answer:
                continue
            at = context.find(answer)
            if at < 0:
                continue
            a_begin, a_end = at, at + len(answer)
            covered = [
                p for p in range(len(f.input_ids))
                if f.begins[p] >= a_begin and 0 <= f.ends[p] <= a_end
                and f.begins[p] >= 0
            ]
            if covered:
                start_logits[i, covered[0]] += 12.0
                end_logits[i, covered[-1]] += 12.0
        return start_logits, end_logits


def _decode(start_probs: np.ndarray, end_probs: np.ndarray, top_k: int,
            max_answer_len: int) -> list[tuple[int, int, float]]:
    """Port of decode (question_answering.rs:892-917)."""
    outer = np.outer(start_probs, end_probs)
    outer = np.triu(outer, 0) - np.triu(outer, max_answer_len)
    flat = outer.flatten()
    n = len(start_probs)
    if top_k == 1:
        order = [int(np.argmax(flat))]
    else:
        order = list(np.argsort(-flat, kind="stable")[:top_k])
    return [(int(ix) // n, int(ix) % n, float(flat[ix])) for ix in order]


def predict_qa(
    inputs: list[tuple[str, str]],
    answer_map: dict[str, str] | None = None,
    top_k: int = 1,
    cfg: PipelineConfig | None = None,
    max_seq_len: int = 64,
    doc_stride: int = 16,
    max_query_length: int = 16,
    max_answer_len: int = 15,
    head: StandInQAHead | None = None,
) -> list[list[Answer]]:
    """Port of QuestionAnsweringModel::predict (question_answering.rs:778-890)."""
    cfg = cfg or PipelineConfig()
    head = head or StandInQAHead(answer_map or {})
    questions = [q for q, _ in inputs]
    contexts = [c for _, c in inputs]

    features: list[QaFeature] = []
    for example_index, (question, context) in enumerate(inputs):
        features.extend(generate_qa_features(
            question, context, max_seq_len, doc_stride, max_query_length,
            example_index))

    per_example: dict[int, list[Answer]] = {}
    for bstart in range(0, len(features), cfg.batch_size):
        batch = features[bstart:bstart + cfg.batch_size]
        start_logits, end_logits = head.forward(batch, questions, contexts)
        for i, f in enumerate(batch):
            n = len(f.input_ids)
            s = start_logits[i, :n].copy()
            e = end_logits[i, :n].copy()
            pm = np.array(f.p_mask, dtype=bool)
            s[pm] = NEG_INF
            e[pm] = NEG_INF
            s = softmax(s)
            e = softmax(e)
            context = contexts[f.example_index]
            for sp, ep, score in _decode(s, e, top_k, max_answer_len):
                begin = f.begins[sp] if f.begins[sp] >= 0 else 0
                end = f.ends[ep] if f.ends[ep] >= 0 else 0
                per_example.setdefault(f.example_index, []).append(Answer(
                    score=score, start=begin, end=end,
                    answer=context[begin:end],
                ))

    out: list[list[Answer]] = []
    for example_id in range(len(inputs)):
        answers = per_example.get(example_id, [])
        # remove_duplicates keeps first occurrence (:119-131)
        seen, uniq = [], []
        for a in answers:
            key = (a.start, a.end, a.answer)
            if key not in seen:
                seen.append(key)
                uniq.append(a)
        uniq.sort(key=lambda a: -a.score)
        out.append(uniq[:top_k])
    return out
