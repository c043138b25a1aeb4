"""Per-Python-worker model singletons.

The reference loads model weights once per process and reuses them for every
batch (resource cache, src/common/resources/remote.rs:74-131). The Spark
analog: lazily build each stand-in model ONCE per Python worker process and
reuse it across all Arrow batches of all tasks scheduled on that worker —
never per-row, never per-batch (SURVEY §7 "Model-in-UDF lifecycle").
"""

from __future__ import annotations

from .config import PipelineConfig
from .encoders import StandInEmbedder, StandInNLI, StandInTokenClassifier

_CACHE: dict[tuple, object] = {}


def get_token_classifier(seed: int = 42) -> StandInTokenClassifier:
    key = ("tokcls", seed)
    if key not in _CACHE:
        from .synth import build_gazetteer
        _CACHE[key] = StandInTokenClassifier(build_gazetteer(), seed=seed)
    return _CACHE[key]  # type: ignore[return-value]


def get_nli(seed: int = 42) -> StandInNLI:
    key = ("nli", seed)
    if key not in _CACHE:
        _CACHE[key] = StandInNLI(seed=seed)
    return _CACHE[key]  # type: ignore[return-value]


def get_embedder(dim: int = 64, seed: int = 42) -> StandInEmbedder:
    key = ("emb", dim, seed)
    if key not in _CACHE:
        _CACHE[key] = StandInEmbedder(dim=dim, seed=seed)
    return _CACHE[key]  # type: ignore[return-value]
