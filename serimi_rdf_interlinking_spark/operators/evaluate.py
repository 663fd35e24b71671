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


def recall_diagnosis(
    predicted: DataFrame, gold: DataFrame, searched: DataFrame | None = None
) -> DataFrame:
    """Recall breakdown per the reference's recall() analysis
    (util/file4.rb:144-168): for each missed gold pair, classify whether
    the source was never searched (blocking/label gap) or searched but
    mis-resolved (candidate/disambiguation gap).

    searched: one-column (source) frame of sources the matcher
    attempted (e.g. MatchResult.scores.select('src')). Returns
    (source, target, reason) for the false negatives.
    """
    from pyspark.sql import functions as F

    p = predicted.select("source", "target").distinct()
    g = gold.select("source", "target").distinct()
    missed = g.join(p, ["source", "target"], "left_anti")
    if searched is None:
        return missed.withColumn("reason", F.lit("missed"))
    s = (
        searched.select(F.col(searched.columns[0]).alias("source"))
        .distinct()
        .withColumn("was_searched", F.lit(True))
    )
    return (
        missed.join(s, "source", "left")
        .withColumn(
            "reason",
            F.when(F.col("was_searched"), F.lit("searched_but_unresolved")).otherwise(
                F.lit("never_searched")
            ),
        )
        .select("source", "target", "reason")
    )
