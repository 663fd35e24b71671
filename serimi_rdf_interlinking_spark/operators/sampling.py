"""Deterministic sampling/splitting for training-data pipelines.

Train/validation/test splits and stratified samples must be
REPRODUCIBLE — across runs, machines, and engines — and must not
require a global shuffle or a random() whose sequence depends on
partitioning. Both operators key on a content-stable hash bucket:
bucket(key) = first-15-hex-digits of md5(key) as an integer, mod
10_000 — the same md5 idiom the dedup oracles use, so DuckDB
reproduces the assignment bit-for-bit
(('0x' || substr(md5(key), 1, 15))::BIGINT % 10000).

Scale shape: pure per-row column expressions — no shuffle, no state;
the split decision rides the scan. Skew-free by construction (md5
buckets are uniform regardless of key distribution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def _bucket(key: Column) -> Column:
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
        .cast("long")
        % _BUCKETS
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Adds `split_col` assigning each row to a named split by its
    key's hash bucket; fractions must sum to <= 1 (any remainder maps
    to '__rest__'). The same key ALWAYS lands in the same split — the
    property random() cannot give — so e.g. all near-dup survivors of
    one document family stay co-split when keyed on canonical_id."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = _bucket(F.col(key_col))
    expr = None
    lo = 0.0
    for name, frac in fractions.items():
        hi = lo + frac
        cond = (b >= int(round(lo * _BUCKETS))) & (
            b < int(round(hi * _BUCKETS))
        )
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
        lo = hi
    return df.withColumn(split_col, expr.otherwise(F.lit("__rest__")))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    key_col: str,
) -> DataFrame:
    """Keeps ~`fraction` of rows WITHIN EACH stratum, deterministically:
    the hash bucket is salted with the stratum value, so the kept set
    is stable per (stratum, key) and independent across strata — a
    skew-free exact-SQL-mirrorable stand-in for sampleBy().

    NULL semantics match the documented DuckDB oracle idiom
    (``md5(stratum || '|' || key)``): F.concat propagates NULL like
    SQL ``||`` (unlike concat_ws, which silently skips NULL inputs and
    would sample null-stratum rows under an unintended key), so a row
    with a NULL stratum or key hashes to NULL and is EXCLUDED from the
    sample on both engines identically."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    b = _bucket(
        F.concat(
            F.col(strata_col).cast("string"),
            F.lit("|"),
            F.col(key_col).cast("string"),
        )
    )
    return df.filter(b < int(round(fraction * _BUCKETS)))
