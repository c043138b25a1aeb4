"""Pipeline configuration.

Mirrors the knobs of the reference pipelines:
- ``max_length`` / ``doc_stride`` — sliding-window featurization
  (reference: src/pipelines/token_classification.rs:836-837, stride = max_length/4)
- ``batch_size`` — micro-batch size inside the inference UDF
  (reference: src/pipelines/token_classification.rs:291, default 64)
- ``label_aggregation`` — sub-token consolidation policy
  (reference: src/pipelines/token_classification.rs:209-222)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # --- featurization / inference ---
    max_length: int = 64            # tokens per span incl. special tokens
    n_special_tokens: int = 2       # [CLS] ... [SEP]
    tokenizer: str = "chunk"        # chunk | wordpiece | bpe | unigram (the TokenizerOption families, common.rs:258-330; WordPiece flags per token_classification.rs:237-242)
    batch_size: int = 64            # features per inference micro-batch
    label_aggregation: str = "first"  # first | last | mode
    # --- stage 3 (relation scoring) ---
    relation_threshold: float = 0.5
    nli_max_length: int = 128       # LongestFirst pair budget for NLI/zero-shot (zero_shot_classification.rs:740-745)
    max_pair_distance: int = 200    # max char distance subj..obj within a sentence
    # --- stage 4 (linking) ---
    embedding_dim: int = 64
    # --- skew handling ---
    # no knobs: hot-domain skew is neutralized by keying every wide
    # exchange on a uniform hash (xxhash64(url, sent_idx) for the model
    # stage, pmod(xxhash64(url), B) for the write) with an IN-PARTITION
    # length sort for batch homogeneity (pipeline.repartition_by_length);
    # AQE skew-join covers the remaining joins. Arrow batch sizing lives
    # on the Spark session (bench.py / cli.py), not here.
    # --- model identity (lineage) ---
    model_name: str = "standin-v1"
    seed: int = 42
    # --- execution ---
    shuffle_partitions: int = 32

    @property
    def doc_stride(self) -> int:
        # reference: token_classification.rs:837  `let doc_stride = self.max_length / 4`
        return self.max_length // 4

    @property
    def max_content_length(self) -> int:
        # reference: token_classification.rs:836
        return self.max_length - self.n_special_tokens

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


# NER label space (IOB over CoNLL-style classes, matching the reference's
# bert-ner golden tests, /root/reference/tests/bert.rs:388-451)
NER_LABELS: list[str] = [
    "O",
    "B-PER", "I-PER",
    "B-ORG", "I-ORG",
    "B-LOC", "I-LOC",
    "B-MISC", "I-MISC",
]
NER_LABEL2ID: dict[str, int] = {l: i for i, l in enumerate(NER_LABELS)}

# NLI label order used by the zero-shot pipeline: the multilabel path takes
# logits[..., 0::2] == [contradiction, entailment]
# (reference: src/pipelines/zero_shot_classification.rs:1009 `slice(-1,0,3,2)`)
NLI_LABELS: list[str] = ["contradiction", "neutral", "entailment"]

# Closed relation set planted by the synthetic generator (FIXTURES.md §3).
RELATIONS: dict[str, dict] = {
    "lives_in":   {"trigger": "lives in",     "subj": "PER", "obj": "LOC",
                   "template": "{subj} lives in {obj}."},
    "works_for":  {"trigger": "works for",    "subj": "PER", "obj": "ORG",
                   "template": "{subj} works for {obj}."},
    "located_in": {"trigger": "is located in", "subj": "ORG", "obj": "LOC",
                   "template": "{subj} is located in {obj}."},
    "founded_by": {"trigger": "was founded by", "subj": "ORG", "obj": "PER",
                   "template": "{subj} was founded by {obj}."},
}
