"""LSH-blocked label similarity join (north_star selection tier).

Correctness anchor: an INDEPENDENT pure-python shingle/Jaccard
reference (no Spark, no shared code) — every returned pair's jaccard
must equal it exactly, and planted typo/spacing/spelling variants
must be retrieved even though no exact token equality exists (the
case the tokenized inverted-index tier cannot retrieve).
"""

import re

from serimi_rdf_interlinking_spark.operators.blocking import lsh_label_join


def _norm(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9]+", " ", s).strip().lower()


def _shingles(s: str, k: int = 4) -> set:
    n = _norm(s)
    return {n[i : i + k] for i in range(max(len(n) - k + 1, 1))}


def _jac(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return round(len(sa & sb) / len(sa | sb), 6)


SRC = [
    ("s1", "Centro Hospitalar de Lisboa"),
    ("s2", "burnished seashell gold plum"),
    ("s3", "Apollo Theatre"),
    ("s4", "zzz unrelated qqq"),
]
TGT = [
    ("t1", "Centro Hospitlar de Lisboa"),    # typo: dropped 'a'
    ("t2", "burnishedseashell gold plum"),   # spacing variant
    ("t3", "Apollo Theater"),                # spelling variant
    ("t4", "completely different thing"),
]


def test_retrieves_fuzzy_variants_token_join_cannot(spark):
    sdf = spark.createDataFrame(SRC, "src_id string, label string")
    tdf = spark.createDataFrame(TGT, "tgt_id string, label string")
    got = {
        (r.src_id, r.tgt_id): r.jaccard
        for r in lsh_label_join(sdf, tdf, verify_threshold=0.4).collect()
    }
    # the planted variants share NO exact token with their source
    # (the typo'd/joined/respelled word differs), yet LSH retrieves
    # them; and every emitted jaccard equals the independent reference
    for pair in [("s1", "t1"), ("s2", "t2"), ("s3", "t3")]:
        assert pair in got, pair
    assert ("s4", "t4") not in got
    labels = dict(SRC) | dict(TGT)
    for (a, b), j in got.items():
        assert j == _jac(labels[a], labels[b]), (a, b)
        assert j >= 0.4


def test_emitted_pairs_subset_of_true_threshold_pairs(spark):
    """LSH may MISS low-similarity pairs (candidate recall is
    probabilistic by design) but must never EMIT a pair below the
    verify threshold or with a wrong jaccard — verification is exact."""
    sdf = spark.createDataFrame(SRC, "src_id string, label string")
    tdf = spark.createDataFrame(TGT, "tgt_id string, label string")
    got = {
        (r.src_id, r.tgt_id): r.jaccard
        for r in lsh_label_join(sdf, tdf, verify_threshold=0.6).collect()
    }
    labels = dict(SRC) | dict(TGT)
    truth = {
        (a, b): _jac(la, lb)
        for a, la in SRC
        for b, lb in TGT
        if _jac(la, lb) >= 0.6
    }
    assert set(got).issubset(set(truth))
    for pair, j in got.items():
        assert j == truth[pair]


def test_short_and_empty_labels_do_not_crash(spark):
    sdf = spark.createDataFrame(
        [("s1", "ab"), ("s2", ""), ("s3", "!!!")],
        "src_id string, label string",
    )
    tdf = spark.createDataFrame(
        [("t1", "ab"), ("t2", "")], "tgt_id string, label string"
    )
    got = {
        (r.src_id, r.tgt_id): r.jaccard
        for r in lsh_label_join(sdf, tdf, verify_threshold=0.9).collect()
    }
    # 'ab' == 'ab' exactly; '' and '!!!' normalize to the same empty
    # shingle and match each other at jaccard 1.0
    assert got[("s1", "t1")] == 1.0
    assert got[("s2", "t2")] == 1.0
    assert got[("s3", "t2")] == 1.0
