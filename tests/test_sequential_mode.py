"""Reference-parity sequential mode: ordered chunk loop with the pivot
FIFO carried across chunks (serimi_class.rb:279-298)."""

import pytest

from serimi_rdf_interlinking_spark.config import SerimiConfig
from serimi_rdf_interlinking_spark.matcher import SerimiMatcher
from serimi_rdf_interlinking_spark.operators.evaluate import evaluate_alignment
from serimi_rdf_interlinking_spark.sources.fixtures import CLASS_CITY


def test_sequential_pivot_mode_quality(spark, fixture_small, triple_dfs):
    src, tgt = triple_dfs
    cfg = SerimiConfig(
        chunk=10, topk=1, mode="sequential", use_pivot=True, shuffle_partitions=4
    )
    res = SerimiMatcher(cfg).run(spark, src, tgt, CLASS_CITY)
    gold = spark.createDataFrame(fixture_small.gold, ["source", "target"])
    prf = evaluate_alignment(res.alignments, gold)
    assert prf.precision >= 0.9, (prf.tp, prf.fp, prf.fn)
    assert prf.recall >= 0.9, (prf.tp, prf.fp, prf.fn)


def test_sequential_matches_batch_when_pivots_off(spark, triple_dfs):
    src, tgt = triple_dfs
    batch = SerimiMatcher(
        SerimiConfig(chunk=10, topk=1, shuffle_partitions=4)
    ).run(spark, src, tgt, CLASS_CITY)
    seq = SerimiMatcher(
        SerimiConfig(chunk=10, topk=1, mode="sequential", shuffle_partitions=4)
    ).run(spark, src, tgt, CLASS_CITY)
    a = {(r.source, r.target) for r in batch.alignments.collect()}
    b = {(r.source, r.target) for r in seq.alignments.collect()}
    assert a == b
