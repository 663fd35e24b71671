"""Frozen-cascade divergence measurement (round-2 verdict #4, round-1
advice #4): batch mode freezes the searchable-predicate cascade after
warm-up (matcher's SURVEY §7 divergence), while sequential mode folds
the reference's per-hit promotion (search_module.rb:107-108). On a
predicate-heterogeneous corpus the two RETRIEVE different candidates.

The fixture (build_promotion_divergence_fixture) makes the divergence
mechanical: post-warm-up chunks pair a "decoy" entity (correct target
labeled under tgt:alias, identical-label decoy under tgt:name) with an
"alias-only" entity whose hit promotes alias to the cascade front.

Measured, pinned result (P/R vs fixture gold, chunk=2, topk=1):
  batch       P = 1.0   R = 5/13  (0.3846)
  sequential  P = 1.0   R = 11/13 (0.8462)
Mechanics of the delta: with the frozen [name, ...] cascade, every
decoy entity retrieves its decoy at the name tier (break-on-first-hit
never reaches alias). The decoy then poisons its CHUNK: the A1
group-presence floor (predicates in >= 40% of groups) leaves only
rdf:type as a scorable predicate, whose values don't overlap the
origin — so the whole chunk scores zero and emits nothing, starving
the paired alias-only entity too. Sequential mode loses only the
FIRST post-warm-up chunk (promotion hasn't happened yet); every later
chunk searches alias first and resolves both entities. Precision is
unaffected here because rejected chunks emit nothing rather than
wrong pairs.
"""

import pytest


@pytest.fixture(scope="module")
def divergence_dfs(spark):
    from serimi_rdf_interlinking_spark.sources.fixtures import (
        build_promotion_divergence_fixture,
    )
    from serimi_rdf_interlinking_spark.sources.triples import TRIPLE_SCHEMA

    fx = build_promotion_divergence_fixture()
    src = spark.createDataFrame(fx.source, TRIPLE_SCHEMA)
    tgt = spark.createDataFrame(fx.target, TRIPLE_SCHEMA)
    return src, tgt, set(fx.gold)


def _run(spark, src, tgt, mode):
    from serimi_rdf_interlinking_spark.config import SerimiConfig
    from serimi_rdf_interlinking_spark.matcher import SerimiMatcher
    from serimi_rdf_interlinking_spark.sources.fixtures import CLASS_CITY

    cfg = SerimiConfig(chunk=2, topk=1, mode=mode, shuffle_partitions=4)
    res = SerimiMatcher(cfg).run(spark, src, tgt, CLASS_CITY)
    return {(r.source, r.target) for r in res.alignments.collect()}, res


def test_frozen_cascade_divergence_is_pinned(spark, divergence_dfs):
    src, tgt, gold = divergence_dfs
    assert len(gold) == 13

    got_b, res_b = _run(spark, src, tgt, "batch")
    got_s, res_s = _run(spark, src, tgt, "sequential")

    # both modes learn the same initial cascade with name ahead of alias
    preds = [p.rsplit("/", 1)[-1] for p in res_b.search_predicates]
    assert "name" in preds and "alias" in preds
    assert preds.index("name") < preds.index("alias")

    # precision 1.0 in both modes: decoy-poisoned chunks emit nothing
    assert got_b <= gold
    assert got_s <= gold

    # pinned recall: batch = warm-up only (5/13); sequential recovers
    # everything except the first post-warm-up chunk (11/13)
    assert len(got_b & gold) == 5
    assert len(got_s & gold) == 11

    # the recovered entities are exactly the promotion-dependent ones
    recovered = {s.rsplit("/", 1)[-1] for s, _ in got_s - got_b}
    assert recovered == {"7", "8", "9", "10", "11", "12"}
