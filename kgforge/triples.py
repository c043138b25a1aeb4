"""Stage 3 — candidate (subj, pred, obj) generation + zero-shot scoring.

Mirrors the reference's zero-shot classification pipeline driven through a
custom template closure (supported by the reference via ZeroShotTemplate,
src/pipelines/zero_shot_classification.rs:610):

- the premise is the sentence containing the candidate pair;
- each candidate predicate contributes one hypothesis from its template
  (cross join of inputs x labels, zero_shot_classification.rs:730-738 — here
  the label set is conditioned on the entity-type pair, which only shrinks
  the cross join);
- scoring is the multilabel path: per (premise, hypothesis) pair take
  [contradiction, entailment] = logits[..., 0::2], softmax over the two,
  keep the entailment probability (zero_shot_classification.rs:1009), then
  threshold (predict_multilabel's downstream filter).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .config import RELATIONS
from .encoders import StandInNLI, multilabel_entailment_scores

# (subj_type, obj_type) -> [relation names] — closed-world candidate gating
_TYPE_PAIR_RELATIONS: dict[tuple[str, str], list[str]] = {}
for _name, _spec in RELATIONS.items():
    _TYPE_PAIR_RELATIONS.setdefault((_spec["subj"], _spec["obj"]), []).append(_name)


@dataclass
class Candidate:
    subj_word: str
    subj_type: str
    subj_begin: int
    subj_end: int
    obj_word: str
    obj_type: str
    obj_begin: int
    obj_end: int
    pred: str
    hypothesis: str


def generate_candidates(
    entities: list[dict], max_pair_distance: int = 200
) -> list[Candidate]:
    """Ordered entity pairs within one sentence, gated by relation type
    signatures. ``entities``: dicts with word/label/begin/end (stage-2 rows).
    """
    out: list[Candidate] = []
    for a in entities:
        for b in entities:
            if a is b:
                continue
            if (a["begin"], a["end"]) == (b["begin"], b["end"]):
                continue
            rels = _TYPE_PAIR_RELATIONS.get((a["label"], b["label"]))
            if not rels:
                continue
            if abs(b["begin"] - a["begin"]) > max_pair_distance:
                continue
            for pred in rels:
                template = RELATIONS[pred]["template"]
                out.append(Candidate(
                    subj_word=a["word"], subj_type=a["label"],
                    subj_begin=a["begin"], subj_end=a["end"],
                    obj_word=b["word"], obj_type=b["label"],
                    obj_begin=b["begin"], obj_end=b["end"],
                    pred=pred,
                    hypothesis=template.format(subj=a["word"], obj=b["word"]),
                ))
    return out


def classify_zero_shot(
    texts: list[str],
    labels: list[str],
    nli: StandInNLI,
    template="This example is about {}.",
    multilabel: bool = False,
    max_length: int | None = 128,
) -> list[list[dict]]:
    """Zero-shot classification entry point, both scoring modes.

    ``template``: a "{}"-style format string (the reference default,
    zero_shot_classification.rs:717-728) OR a ``label -> hypothesis``
    callable (the ZeroShotTemplate closure, :610).

    ``max_length``: LongestFirst token budget per (premise, hypothesis)
    pair, the reference's default truncation for this pipeline; None
    disables (test hook).

    - single-label: softmax of the ENTAILMENT logit across labels
      (zero_shot_classification.rs:841-888, scoring :868);
    - multilabel: per (text, label) pair softmax over
      [contradiction, entailment] = logits[..., 0::2]
      (zero_shot_classification.rs:983-1032, scoring :1009).

    Empty inputs or labels raise, like the reference's error path
    (tests/bart.rs:237-258)."""
    if not texts or not labels:
        raise ValueError("zero-shot classification requires non-empty inputs and labels")
    from .encoders import multilabel_entailment_scores, single_label_scores

    # a callable template is the reference's ZeroShotTemplate closure
    # (zero_shot_classification.rs:610); a string is the default
    # "{}"-formatted hypothesis (:717-728)
    hypotheses = [template(label) if callable(template)
                  else template.format(label) for label in labels]
    premises = [t for t in texts for _ in labels]           # cross join
    hyps = hypotheses * len(texts)                           # (rs:730-738)
    if max_length is not None:
        # LongestFirst pair truncation before the model — the reference's
        # encode_pair_list(..., TruncationStrategy::LongestFirst, ...)
        # (zero_shot_classification.rs:740-745): token-wise and JOINT, so a
        # long premise is trimmed only as far as the (short) hypothesis
        # requires, never a caller-side char clip. The batch form
        # tokenizes each unique premise once, not once per label.
        from .tokenization import truncate_pairs
        premises, hyps = truncate_pairs(premises, hyps, max_length)
    logits = nli.forward_pairs(premises, hyps)
    logits = logits.reshape(len(texts), len(labels), 3)      # (rs:856-866)
    if multilabel:
        scores = multilabel_entailment_scores(logits)        # [n_texts, n_labels]
        return [
            [{"text": t, "label": labels[j], "id": j, "score": float(scores[i, j]),
              "sentence": i} for j in range(len(labels))]
            for i, t in enumerate(texts)
        ]
    scores = single_label_scores(logits[..., 2])
    best = scores.argmax(axis=-1)
    return [
        [{"text": t, "label": labels[int(best[i])], "id": int(best[i]),
          "score": float(scores[i, best[i]]), "sentence": i}]
        for i, t in enumerate(texts)
    ]


def score_candidates(
    premises: list[str], hypotheses: list[str], nli: StandInNLI,
    batch_size: int = 64, max_length: int | None = None,
) -> np.ndarray:
    """Entailment probabilities for (premise, hypothesis) pairs, computed in
    micro-batches of ``batch_size`` like every reference pipeline.

    ``max_length``: when set, each pair is jointly truncated with
    TruncationStrategy::LongestFirst before scoring — the reference's
    encode_pair_list path (zero_shot_classification.rs:740-745) truncates
    token-wise, longer side first, never a caller-side char clip."""
    if max_length is not None:
        from .tokenization import truncate_pairs
        premises, hypotheses = truncate_pairs(premises, hypotheses, max_length)
    scores = np.empty(len(premises), dtype=np.float64)
    for start in range(0, len(premises), batch_size):
        p = premises[start:start + batch_size]
        h = hypotheses[start:start + batch_size]
        logits = nli.forward_pairs(p, h)
        scores[start:start + len(p)] = multilabel_entailment_scores(logits)
    return scores
