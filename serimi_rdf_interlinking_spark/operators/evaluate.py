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


def sameas_audit(
    links: DataFrame,
    target_kb: DataFrame,
    namespace: str | None = None,
) -> DataFrame:
    """J8 — owl:sameAs link QA (util/sameas.rb:46-112): of the emitted
    links whose target falls in `namespace`, how many point at a
    REDIRECT alias (stale link) and how many of those redirect to a
    disambiguation page (ambiguous link)?

    links: (source, target) alignment pairs (e.g. MatchResult.alignments
    or read_gold_alignments output). target_kb: triples of the linked
    dataset carrying wikiPageRedirects rows. Returns one row
    (n_links, n_redirected, n_ambiguous, ratio_redirected,
    ratio_ambiguous).

    The reference paginates one SPARQL ASK-style query per link; here
    it is a single broadcast-friendly left join against the redirect
    edge set. Intended-semantics note: the reference prints
    `lines_redirected.size.to_f / count` (sameas.rb:102-110) — Ruby
    Integer#size is the byte width (8), so its printed ratios are
    constant nonsense; we compute the intended count/count ratio.
    """
    from pyspark.sql import functions as F

    from ..sources.triples import WIKI_REDIRECT

    o = links.select(F.col("target").alias("uri")).distinct()
    if namespace:
        o = o.filter(F.col("uri").startswith(namespace))
    # pre-aggregate per alias so a URI with several redirect rows still
    # counts as ONE redirected link (the reference's per-link existence
    # check has the same cardinality)
    red = (
        target_kb.filter(F.col("p") == WIKI_REDIRECT)
        .select(F.col("s").alias("uri"), F.col("o").alias("rtarget"))
        .groupBy("uri")
        .agg(
            F.max(
                F.col("rtarget").contains("disambiguation").cast("int")
            ).alias("amb")
        )
        .withColumn("is_redirected", F.lit(1))
    )
    j = o.join(red, "uri", "left")
    return j.agg(
        F.count("*").alias("n_links"),
        F.coalesce(F.sum("is_redirected"), F.lit(0)).alias("n_redirected"),
        F.coalesce(F.sum("amb"), F.lit(0)).alias("n_ambiguous"),
    ).select(
        "n_links",
        "n_redirected",
        "n_ambiguous",
        # n_links == 0 would divide by zero -> null; report 0.0 instead
        F.coalesce(
            F.round(F.col("n_redirected") / F.col("n_links"), 6), F.lit(0.0)
        ).alias("ratio_redirected"),
        F.coalesce(
            F.round(F.col("n_ambiguous") / F.col("n_links"), 6), F.lit(0.0)
        ).alias("ratio_ambiguous"),
    )


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
