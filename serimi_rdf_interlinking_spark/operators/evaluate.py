"""J7/A13 — alignment evaluation vs a gold standard.

Reference: util/file4.rb:113-139 computes P/R/F1 by set algebra over
`src=tgt` pairs; here both sides are DataFrames and the set ops are
joins (inner = true positives, anti = fp/fn).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PRF:
    tp: int
    fp: int
    fn: int

    @property
    def precision(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else 0.0

    @property
    def recall(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p and r) else 0.0


def evaluate_alignment(predicted: DataFrame, gold: DataFrame) -> PRF:
    """predicted: (source, target[, score]); gold: (source, target)."""
    p = predicted.select("source", "target").distinct()
    g = gold.select("source", "target").distinct()
    tp = p.join(g, ["source", "target"], "inner").count()
    fp = p.join(g, ["source", "target"], "left_anti").count()
    fn = g.join(p, ["source", "target"], "left_anti").count()
    return PRF(tp=tp, fp=fp, fn=fn)
