"""Event-stream analytics: ordered funnel conversion and weekly
retention cohorts — the standard consumer queries over a crawl/event
log once sessionization and dedup have run.

Both are pure DataFrame compositions (no UDF, no window over the
whole corpus):

* funnel: step i is ONE equi-join of the step-i events against the
  step-(i-1) frontier (user, first completion time) plus a partial
  min-aggregate — per-user state never leaves the executors, and the
  frontier shrinks monotonically with each step;
* retention: two hash aggregations and one join, with calendar-free
  integer week bucketing (epoch_micros // week) so the bucketing is
  bit-identical in any engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_US = 7 * 24 * 3600 * 1_000_000


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: a user completes step i at the EARLIEST event
    of type steps[i] strictly after their step-(i-1) completion time
    (first-touch chaining). Returns (step_idx, step, n_users) with
    one row per step — n_users monotonically non-increasing.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("t"))
        .localCheckpoint(eager=True)
    )
    counts = [
        frontier.agg(
            F.lit(0).alias("step_idx"),
            F.lit(steps[0]).alias("step"),
            F.count("*").alias("n_users"),
        )
    ]
    for i, step in enumerate(steps[1:], start=1):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("ts2")
        )
        frontier = (
            nxt.join(frontier, "user")
            .filter(F.col("ts2") > F.col("t"))
            .groupBy("user")
            .agg(F.min("ts2").alias("t"))
            .localCheckpoint(eager=True)
        )
        counts.append(
            frontier.agg(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                F.count("*").alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: cohort = a user's first-activity
    week (epoch_micros // week, calendar-free), offset = activity
    week - cohort week. Returns (cohort_week, offset_weeks, n_users)
    with n_users = distinct active users of that cohort at that
    offset; offset 0 row is the cohort size.
    """
    wk = (
        events.select(
            F.col(user_col).alias("user"),
            # parquet yields TIMESTAMP_NTZ, which unix_micros rejects;
            # the session tz is UTC so the cast is epoch-preserving
            F.floor(
                F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(WEEK_US)
            )
            .cast("long")
            .alias("wk"),
        )
        .distinct()
    )
    cohort = wk.groupBy("user").agg(F.min("wk").alias("cohort_week"))
    return (
        wk.join(cohort, "user")
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("offset_weeks"),
        )
        # (user, wk) is distinct and wk == cohort+offset, so each user
        # appears once per group: count(*) == count_distinct(user)
        # without the expand/double-shuffle a distinct-count costs
        .agg(F.count("*").alias("n_users"))
    )
