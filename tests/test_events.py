"""Funnel + retention (operators/events.py) vs hand-computed and
pure-python references."""

import datetime as dt

import pandas as pd
import pytest

from serimi_rdf_interlinking_spark.operators.events import (
    WEEK_US,
    funnel,
    retention_cohorts,
)


def _ev(rows):
    return pd.DataFrame(
        [
            {
                "user_id": u,
                "ts": dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
                "event_type": t,
            }
            for u, h, t in rows
        ]
    )


def test_funnel_first_touch_ordering(spark):
    ev = _ev(
        [
            # u1 completes all three in order
            (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
            # u2 clicks BEFORE viewing: click must not count
            (2, 5, "click"), (2, 6, "view"),
            # u3 views only
            (3, 0, "view"),
            # u4: purchase before click -> stops at click
            (4, 0, "view"), (4, 1, "purchase"), (4, 2, "click"),
            # u5 never views; later steps can't count
            (5, 0, "click"), (5, 1, "purchase"),
        ]
    )
    out = (
        funnel(spark.createDataFrame(ev), ["view", "click", "purchase"])
        .orderBy("step_idx")
        .toPandas()
    )
    assert list(out["step"]) == ["view", "click", "purchase"]
    assert list(out["n_users"]) == [4, 2, 1]  # views: u1-u4; clicks: u1,u4; purchase: u1


def test_funnel_equal_ts_not_counted(spark):
    # strict > chaining: click at the same instant as view is NOT after
    ev = _ev([(1, 0, "view"), (1, 0, "click")])
    out = funnel(spark.createDataFrame(ev), ["view", "click"]).toPandas()
    got = dict(zip(out["step"], out["n_users"]))
    assert got == {"view": 1, "click": 0}


def _py_retention(ev: pd.DataFrame):
    wk = {
        (r.user_id, int(r.ts.timestamp() * 1_000_000) // WEEK_US)
        for r in ev.itertuples()
    }
    cohort = {}
    for u, w in wk:
        cohort[u] = min(cohort.get(u, w), w)
    out: dict = {}
    for u, w in wk:
        key = (cohort[u], w - cohort[u])
        out[key] = out.get(key, 0) + 1
    return out


def test_retention_matches_python(spark):
    rows = []
    for u in range(20):
        for d in range(0, 30, 3 + u % 4):
            rows.append((u, 24 * (d + u % 7), "view"))
    ev = _ev(rows)
    out = retention_cohorts(spark.createDataFrame(ev)).toPandas()
    got = {
        (r.cohort_week, r.offset_weeks): r.n_users for r in out.itertuples()
    }
    assert got == _py_retention(ev)
    # offset-0 row exists for every cohort and is its largest row
    for (c, o), n in got.items():
        assert (c, 0) in got and got[(c, 0)] >= 1
        assert o >= 0
