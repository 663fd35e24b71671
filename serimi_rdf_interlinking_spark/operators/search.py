"""Full-text BM25 retrieval over the document corpus: tokenize,
corpus statistics (df / doc length / avgdl), Lucene-style BM25
scoring, and scale-safe per-query top-k.

The webtext staple the KG pipeline feeds: once pages are extracted
and deduplicated, keyword retrieval over the corpus is the first
consumer-facing query. Everything here is JVM-side column expression
— no Python UDF anywhere on the scoring path.

Scale design:
* postings (doc, term, tf) and doc lengths are each ONE hash
  aggregation of the exploded token stream;
* query terms and their idf are a tiny frame — broadcast onto the
  postings, so the only corpus-sized shuffles are the posting/length
  joins keyed on doc id;
* per-query ranking reuses the two-level truncating top-k from
  operators/similarity.py — at most k rows per (query, partition)
  ever shuffle, never a full per-query sort of every matching doc.

FP parity contract (the DuckDB oracle recomputes BM25 itself): every
arithmetic step is written in the same operation order as the oracle
SQL, and the per-doc score is rounded to 9 dp BEFORE ranking so the
one legitimately order-dependent step (summing a query's 2-4 term
contributions) cannot flip a rank across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, term) token stream: lowercase, maximal [a-z0-9] runs.
    Mirrors exactly in SQL (string_split_regex on the same pattern)."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias(
                "term"
            ),
        )
        .filter(F.col("term") != "")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs per query by BM25 (Robertson/Sparck-Jones idf in
    the non-negative Lucene form):

        idf(t)       = ln((N - df + 0.5) / (df + 0.5) + 1)
        score(d, q)  = sum_{t in q}  idf(t) * tf * (k1 + 1)
                       / (tf + k1 * (1 - b + b * dl/avgdl))

    `queries` is (query_id, term); N and avgdl are over docs with at
    least one token. Returns (query_id, doc_id, rk, score) with rk
    1-based, ties broken by ascending doc id on the 9-dp-rounded
    score (see module docstring).
    """
    from serimi_rdf_interlinking_spark.operators.similarity import (
        _partial_topk,
    )

    from .partitioning import widen_to_cluster

    # ONE scan + tokenize of the corpus: the postings are materialized
    # (eager localCheckpoint) because three consumers (df, stats via
    # dl, the scoring join) would otherwise each re-execute the
    # explode+aggregate subtree (plan-audited: 4 corpus scans); dl is
    # derived from tf (sum of term frequencies == token count), never
    # from a second pass over the token stream. Widened first: the
    # tokenize explode + partial aggregation run in the scan's tasks,
    # and a single-file input serializes them behind one core.
    toks = tokenize(widen_to_cluster(docs), id_col, text_col)
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))

    # tiny frame: query terms + idf + corpus stats, broadcast onto
    # the postings so no corpus row shuffles for the term join
    qidf = (
        queries.select("query_id", "term")
        .distinct()
        .join(df, "term")
        .crossJoin(stats)
        .withColumn(
            "idf",
            F.log(
                (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
            ),
        )
        .select("query_id", "term", "idf", "avgdl")
    )
    contrib = (
        tf.join(F.broadcast(qidf), "term")
        .join(dl, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (k1 + 1)
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("c"), 9).alias("score_r")
    )
    topk = _partial_topk(
        scored.select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            F.col("score_r").alias("cos"),
        ),
        k,
    )
    return topk.select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rk"),
        F.round("cos", 6).alias("score"),
    )
