"""asof_join (operators/temporal.py) vs pandas.merge_asof — an
independent third implementation of the semantics (the driver row's
oracle is DuckDB's native ASOF JOIN, so the operator ends up anchored
by three engines).

merge_asof's allow_exact_matches=True matches our >= tie rule;
merge_asof requires sorted inputs and has no multi-row (key, ts)
determinism, so the fixture keeps (key, ts) unique on the right —
the collapse rule itself is exercised separately.
"""

import numpy as np
import pandas as pd
import pytest

from serimi_rdf_interlinking_spark.operators.temporal import asof_join


def _mk(seed: int, n_left: int = 400, n_right: int = 300, n_keys: int = 11):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "lts": rng.integers(0, 100_000, n_left).astype("int64"),
            "lid": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "rts": rng.integers(0, 100_000, n_right).astype("int64"),
            "rv": rng.random(n_right).round(6),
        }
    )
    # unique (k, rts) so pandas merge_asof is deterministic
    right = right.drop_duplicates(["k", "rts"]).reset_index(drop=True)
    return left, right


def _pandas_asof(left, right, direction):
    merged = pd.merge_asof(
        left.sort_values("lts", kind="mergesort"),
        right.sort_values("rts", kind="mergesort").rename(
            columns={"rts": "asof_rts", "rv": "asof_rv"}
        ),
        left_on="lts",
        right_on="asof_rts",
        by="k",
        direction=direction,
        allow_exact_matches=True,
    )
    return merged.sort_values("lid").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("seed", [3, 17])
def test_asof_matches_pandas(spark, direction, seed):
    lpd, rpd = _mk(seed)
    out = (
        asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on=["k"],
            left_ts="lts",
            right_ts="rts",
            right_cols=["rv"],
            direction=direction,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = _pandas_asof(lpd, rpd, direction)
    pd.testing.assert_series_equal(
        out["asof_rts"].astype("float64"), exp["asof_rts"].astype("float64"),
        check_names=False,
    )
    pd.testing.assert_series_equal(
        out["asof_rv"].astype("float64"), exp["asof_rv"].astype("float64"),
        check_names=False,
    )


def test_asof_tolerance(spark):
    lpd, rpd = _mk(23)
    out = (
        asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on=["k"],
            left_ts="lts",
            right_ts="rts",
            right_cols=["rv"],
            tolerance_us=500,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    merged = pd.merge_asof(
        lpd.sort_values("lts", kind="mergesort"),
        rpd.sort_values("rts", kind="mergesort").rename(
            columns={"rts": "asof_rts", "rv": "asof_rv"}
        ),
        left_on="lts",
        right_on="asof_rts",
        by="k",
        direction="backward",
        tolerance=500,
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(
        out["asof_rv"].astype("float64"),
        merged["asof_rv"].astype("float64"),
        check_names=False,
    )


def test_asof_tolerance_ntz_timestamps(spark):
    """tolerance_us with TIMESTAMP_NTZ columns (what this repo's
    parquet loads yield): _as_micros must route NTZ through a
    timestamp cast — a bare cast('long') on NTZ raises
    AnalysisException, which made the documented timestamp support
    latent until now."""
    from pyspark.sql import functions as F

    lpd, rpd = _mk(31)
    left = spark.createDataFrame(lpd).withColumn(
        "lts", F.timestamp_seconds(F.col("lts")).cast("timestamp_ntz")
    )
    right = spark.createDataFrame(rpd).withColumn(
        "rts", F.timestamp_seconds(F.col("rts")).cast("timestamp_ntz")
    )
    out = (
        asof_join(
            left,
            right,
            on=["k"],
            left_ts="lts",
            right_ts="rts",
            right_cols=["rv"],
            tolerance_us=500 * 1_000_000,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    merged = pd.merge_asof(
        lpd.sort_values("lts", kind="mergesort"),
        rpd.sort_values("rts", kind="mergesort").rename(
            columns={"rts": "asof_rts", "rv": "asof_rv"}
        ),
        left_on="lts",
        right_on="asof_rts",
        by="k",
        direction="backward",
        tolerance=500,
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(
        out["asof_rv"].astype("float64"),
        merged["asof_rv"].astype("float64"),
        check_names=False,
    )


def test_asof_right_tie_collapse(spark):
    """Multiple right rows at the same (key, ts) collapse to the max
    payload struct — deterministic under any shuffle order."""
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "lts": [10], "lid": [0]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1], "rts": [5, 5, 5], "rv": [0.2, 0.9, 0.4]})
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["rv"]
    ).toPandas()
    assert out["asof_rv"].tolist() == [0.9]


def test_asof_single_shuffle_plan(spark):
    """Plan shape: the union-sort encoding must not contain a join —
    the whole as-of is one Exchange on the key plus a window sort."""
    lpd, rpd = _mk(5)
    df = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        on=["k"],
        left_ts="lts",
        right_ts="rts",
        right_cols=["rv"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Window" in plan
