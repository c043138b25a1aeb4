"""Triple P/R vs gold (the BASELINE.json correctness gate)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PRResult:
    precision: float
    recall: float
    n_pred: int
    n_gold: int
    n_hit: int

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def triple_pr(pred: DataFrame, gold: DataFrame, keys=("url", "subj_id", "pred", "obj_id")) -> PRResult:
    """Set-based precision/recall on (url, subj_id, pred, obj_id)."""
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    n_pred = p.count()
    n_gold = g.count()
    n_hit = p.join(g, list(keys), "inner").count()
    return PRResult(
        precision=n_hit / n_pred if n_pred else 0.0,
        recall=n_hit / n_gold if n_gold else 0.0,
        n_pred=n_pred, n_gold=n_gold, n_hit=n_hit,
    )
