"""BM25 retrieval (operators/search.py) vs a pure-python in-test
reference implementation (third engine besides Spark and the driver
row's DuckDB oracle)."""

import math
import re

import pandas as pd
import pytest

from serimi_rdf_interlinking_spark.operators.search import bm25_topk, tokenize

DOCS = pd.DataFrame(
    {
        "doc_id": range(8),
        "text": [
            "spark window agg window window",
            "hash join table hash",
            "the quick spark fox jumps over the lazy join",
            "table table table scan",
            "spark streaming window state",
            "",  # empty doc: excluded from N/avgdl
            "Filter&Vector, STREAM: spark!",  # punctuation + case
            "join join join join hash",
        ],
    }
)
QUERIES = pd.DataFrame(
    {"query_id": [0, 0, 1, 1], "term": ["spark", "window", "join", "hash"]}
)


def _py_bm25(docs: pd.DataFrame, queries: pd.DataFrame, k1=1.2, b=0.75):
    toks = {
        r.doc_id: re.findall(r"[a-z0-9]+", r.text.lower())
        for r in docs.itertuples()
    }
    toks = {d: t for d, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    scores: dict = {}
    for q, term in queries.itertuples(index=False):
        if term not in df:
            continue
        idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1)
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
                scores[(q, d)] = scores.get((q, d), 0.0) + c
    return scores


def test_tokenize_lowercase_and_split(spark):
    out = tokenize(spark.createDataFrame(DOCS)).toPandas()
    got = sorted(out[out.doc_id == 6]["term"])
    assert got == ["filter", "spark", "stream", "vector"]
    assert (out["term"] != "").all()
    assert 5 not in set(out["doc_id"])  # empty doc yields no tokens


def test_bm25_matches_python(spark):
    out = bm25_topk(
        spark.createDataFrame(DOCS), spark.createDataFrame(QUERIES), k=10
    ).toPandas()
    exp = _py_bm25(DOCS, QUERIES)
    got = {(r.query_id, r.doc_id): r.score for r in out.itertuples()}
    assert set(got) == set(exp)
    for key, s in exp.items():
        assert got[key] == pytest.approx(round(s, 6), abs=2e-6)
    # ranks: descending score, doc_id tie-break, 1-based and dense
    for q, grp in out.groupby("query_id"):
        grp = grp.sort_values("rk")
        assert list(grp["rk"]) == list(range(1, len(grp) + 1))
        keys = list(zip(-grp["score"], grp["doc_id"]))
        assert keys == sorted(keys)


def test_bm25_k_truncation_and_ties(spark):
    # 7 docs match "join or hash"-free query 0 terms? use k=2 to force cut
    out = bm25_topk(
        spark.createDataFrame(DOCS), spark.createDataFrame(QUERIES), k=2
    ).toPandas()
    assert (out.groupby("query_id").size() <= 2).all()
    exp = _py_bm25(DOCS, QUERIES)
    for q, grp in out.groupby("query_id"):
        full = sorted(
            ((d, s) for (qq, d), s in exp.items() if qq == q),
            key=lambda x: (-round(x[1], 9), x[0]),
        )
        assert list(grp.sort_values("rk")["doc_id"]) == [d for d, _ in full[:2]]


def test_bm25_plan_broadcast_and_no_udf(spark):
    df = bm25_topk(
        spark.createDataFrame(DOCS), spark.createDataFrame(QUERIES), k=3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan  # query-term join stays broadcast
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan, plan
