"""Temporal operators: distributed as-of join.

An as-of join attaches, to every left row, the single right row with
the greatest right timestamp <= the left timestamp (direction
"backward"; "forward" is the mirror: smallest right ts >= left ts)
within the same key group — pandas.merge_asof / DuckDB ASOF JOIN
semantics. Spark has no built-in as-of join; the naive encodings are
both scale-killers:

* inequality join + per-left argmax: Catalyst plans a range join that
  degenerates to per-key cartesian fan-out (hot keys quadratic);
* window over a full outer product: same explosion.

The scale-right plan is the union-sort trick used here: tag both
sides, union, ONE shuffle on the key, one sort by (ts, side) inside
each key partition, then `last(right_payload, ignorenulls=True)` over
an unbounded-preceding running window carries the most recent right
payload forward onto each left row. Cost is a single sort-shuffle of
|L|+|R| rows — no fan-out, no range join, AQE-skew-splittable — and
the plan survives 100 TB as long as no single key's row set exceeds a
task (the same bound any per-key window has).

Tie rule (both engines must agree for oracle parity): at equal
timestamps the right row IS visible to the left row (>= / <=, matching
DuckDB's ASOF `ON l.ts >= r.ts`). Multiple right rows sharing
(key, ts) are collapsed deterministically to the max-by-payload-struct
row before the union, so the match is well-defined under any shuffle
order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: every `left` row, plus the payload
    (`right_cols`) of the nearest `right` row at-or-before
    (backward) / at-or-after (forward) its timestamp within the same
    `on` key group; nulls where no right row qualifies.

    `tolerance_us` (microseconds) nulls out matches farther than the
    bound, mirroring pandas.merge_asof(tolerance=...).

    Timestamps are compared at microsecond precision (Spark timestamps
    are micros); ints/longs are accepted too and compared as-is.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    right_cols = [c for c in right_cols if c not in on and c != right_ts]

    # collapse right-side (key, ts) duplicates deterministically:
    # max of the payload struct — any tie-break works as long as the
    # oracle uses the same one.
    r = (
        right.groupBy(*on, F.col(right_ts).alias("__ts"))
        .agg(F.max(F.struct(*right_cols)).alias("__payload"))
        .withColumn("__side", F.lit(0))
    )
    left_cols = [c for c in left.columns]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(1).alias("__side"),
        F.struct(*left_cols).alias("__left"),
    )
    r_tagged = r.select(
        *on, "__ts", "__payload", "__side",
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # backward: ascending ts; right rows (__side 0) sort before left
    # rows at equal ts, so "at-or-before" includes ties.
    # forward: descending ts, same side order → "at-or-after".
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).withColumn(
        "__match_ts", F.last(F.when(F.col("__side") == 0, F.col("__ts")),
                             ignorenulls=True).over(w)
    )

    out = matched.filter(F.col("__side") == 1)
    if tolerance_us is not None:
        lus = _as_micros(F.col("__ts"), left.schema[left_ts].dataType)
        rus = _as_micros(F.col("__match_ts"), right.schema[right_ts].dataType)
        gap = (lus - rus) if direction == "backward" else (rus - lus)
        keep = gap <= F.lit(int(tolerance_us))
        out = out.withColumn(
            "__match", F.when(keep, F.col("__match"))
        ).withColumn("__match_ts", F.when(keep, F.col("__match_ts")))

    sel = [F.col(f"__left.{c}").alias(c) for c in left_cols]
    sel.append(F.col("__match_ts").alias(f"asof_{right_ts}"))
    sel.extend(F.col(f"__match.{c}").alias(f"asof_{c}") for c in right_cols)
    return out.select(*sel)


def _as_micros(col, dtype):
    from pyspark.sql.types import TimestampNTZType, TimestampType

    if isinstance(dtype, TimestampType):
        return F.unix_micros(col)
    if isinstance(dtype, TimestampNTZType):
        # parquet event times load as TIMESTAMP_NTZ in this repo;
        # cast('long') on NTZ raises AnalysisException, so go through
        # TimestampType first (exact under the session's UTC timezone,
        # the same cast-before-unix_micros convention the driver
        # queries use)
        return F.unix_micros(col.cast("timestamp"))
    return col.cast("long")
