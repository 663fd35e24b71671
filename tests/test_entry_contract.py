"""Driver-contract smoke: entry() runs and returns rows with a stable
schema; queries()/oracle_sql() keys line up."""

import __spark_entry__ as E


def test_registry_shape():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 30
    # every oracle belongs to a registered query
    assert set(oracles).issubset(set(qs))
    # round 5 closed the LAST rows-only entry: media_features now has
    # a pinned expected-value VALUES oracle (tools/gen_oracle_pins.py),
    # so every registered query is value-checked by the driver.
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) == 5
    cols = set(df.columns)
    assert {"doc_id", "canonical_id", "lang_pred", "quality", "fp_exact"} <= cols


def test_two_sample_queries_run(spark):
    a = E.q_pricing_summary(spark, "/root/testdata/sf0.001")
    assert a.count() > 0
    b = E.q_dedup_exact(spark, "/root/testdata/sf0.001")
    assert b.count() == 500
