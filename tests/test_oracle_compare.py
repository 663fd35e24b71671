"""Driver-parity oracle compare: every queries() entry that has an
oracle_sql() is run on Spark AND DuckDB at sf0.001 and compared
value-for-value (sorted columns, sorted rows, numeric tolerance).

This is the local twin of the driver's CORRECTNESS gate — it exists so
engine/oracle divergences (e.g. the round-1 sessionize sub-second epoch
truncation) are caught by `pytest` before a round is graded.
"""

import os

import duckdb
import numpy as np
import pytest

import __spark_entry__ as E

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True), cols


def _diff(sdf, odf):
    s, scols = _canon(sdf)
    o, ocols = _canon(odf)
    if scols != ocols:
        return f"schema {scols} vs {ocols}"
    if len(s) != len(o):
        return f"rows {len(s)} vs {len(o)}"
    for c in scols:
        # Dtype-strict: the driver hashes the materialized pandas values,
        # so an int64-vs-float64 skew (e.g. DuckDB sum(int) -> HUGEINT ->
        # float64) fails its hash even when every value is equal.  The
        # round-1/2 `sessionize` red survived this gate because we only
        # compared values with tolerance — never again.
        sk, ok_ = s[c].dtype.kind, o[c].dtype.kind
        if sk != ok_:
            return f"dtype skew in column {c}: spark {s[c].dtype} vs oracle {o[c].dtype}"
    for c in scols:
        try:
            if not np.allclose(
                s[c].astype(float), o[c].astype(float),
                rtol=1e-9, atol=1e-9, equal_nan=True,
            ):
                return f"values differ in column {c}"
        except (ValueError, TypeError):
            if not s[c].astype(str).equals(o[c].astype(str)):
                return f"values differ in column {c} (string)"
    return None


@pytest.mark.parametrize("name", sorted(E.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    sdf = E.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(E.oracle_sql()[name]).df()
    err = _diff(sdf, odf)
    assert err is None, f"{name}: {err}"
