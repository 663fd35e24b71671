"""Two-pass bucketed exact percentiles (operators/quantiles.py):
bit-parity with Spark's own exact percentile() (the semantics the
DuckDB quantile_cont oracle shares), plan shape (no full-group value
buffering), and degenerate-group edges."""

import math

import pytest
from pyspark.sql import functions as F

from serimi_rdf_interlinking_spark.operators.quantiles import (
    bucket_histogram,
    exact_grouped_percentiles,
)

SF_DIR = "/root/testdata/sf0.01"
PS = [0.25, 0.5, 0.75]


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bit_parity_with_builtin_percentile_unrounded(spark):
    """UNROUNDED doubles must equal percentile()'s exactly — the
    interpolation arithmetic (v0 + (pos-k0)*(v1-v0) with pos=(n-1)p)
    is the shared definition, so any mismatch is a real bug, not
    tolerance noise."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = exact_grouped_percentiles(
        spark, li, "l_returnflag", "l_extendedprice", PS, width=16.0
    )
    ref = {
        r.g: [r.q25, r.q50, r.q75, r.qmax]
        for r in li.groupBy(F.col("l_returnflag").alias("g"))
        .agg(
            F.percentile("l_extendedprice", 0.25).alias("q25"),
            F.percentile("l_extendedprice", 0.5).alias("q50"),
            F.percentile("l_extendedprice", 0.75).alias("q75"),
            F.max("l_extendedprice").alias("qmax"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for g in ref:
        for i in range(3):
            assert got[g]["ps"][i] == ref[g][i], (g, PS[i])
        assert got[g]["max"] == ref[g][3]


def test_pass1_plan_is_primitive_hash_aggregate(spark):
    """The histogram pass must keep primitive agg buffers: a
    percentile()-style ObjectHashAggregate buffers every group value
    on one task — the exact failure mode this operator removes."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = _plan(bucket_histogram(li, "l_returnflag", "l_extendedprice"))
    assert "HashAggregate" in plan
    assert "ObjectHashAggregate" not in plan
    assert "percentile" not in plan
    assert "BatchEvalPython" not in plan


def test_pass2_range_filter_pushes_to_parquet_scan(spark):
    """The located-bucket rescan must push its raw-value range
    disjunction into the parquet scan (row-group stats then skip
    nearly the whole table at scale); the exact floor-bucket predicate
    alone is expression-based and NOT pushable — the range layer is
    what makes pass 2 cheap."""
    from serimi_rdf_interlinking_spark.operators.quantiles import (
        located_bucket_values,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = located_bucket_values(
        li, "l_returnflag", "l_extendedprice", 16.0,
        {"N": {100, 101}, "R": {200}},
    )
    plan = _plan(df)
    assert "GreaterThanOrEqual(l_extendedprice" in plan.split("PushedFilters")[1][:400]


def test_small_and_singleton_groups(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 7.5)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = exact_grouped_percentiles(spark, df, "g", "v", PS, width=1.0)
    # a: n=3, pos(.25)=0.5 -> 1+0.5*(2-1)=1.5; pos(.5)=1 -> 2; pos(.75)=1.5 -> 3
    assert got["a"]["ps"] == [1.5, 2.0, 3.0]
    assert got["a"]["max"] == 4.0
    # singleton: all percentiles collapse to the value
    assert got["b"]["ps"] == [7.5, 7.5, 7.5]
    assert got["b"]["n"] == 1


def test_negative_values_and_cross_bucket_ranks(spark):
    """floor() bucketing of negatives + adjacent order statistics that
    land in DIFFERENT buckets (v0 at a bucket's top, v1 in the next)."""
    vals = [-3.5, -1.25, 0.99, 1.01, 10.0, 10.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    got = exact_grouped_percentiles(spark, df, "g", "v", PS, width=1.0)
    n = len(vals)
    sv = sorted(vals)
    for p, gv in zip(PS, got["g"]["ps"]):
        pos = (n - 1) * p
        k0, k1 = int(math.floor(pos)), int(math.ceil(pos))
        if k0 == k1:
            assert gv == sv[k0]
        else:
            assert gv == (k1 - pos) * sv[k0] + (pos - k0) * sv[k1]


def test_histogram_cap_raises_loudly(spark):
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(50)], "g string, v double"
    )
    with pytest.raises(RuntimeError, match="refusing to degrade"):
        exact_grouped_percentiles(
            spark, df, "g", "v", PS, width=1.0, max_hist_rows=10
        )
