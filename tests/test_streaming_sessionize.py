"""Custom stateful streaming operator (applyInPandasWithState):
per-user sessionization parity with the batch/oracle semantics.

The stream emits CLOSED sessions; each user's final session stays open
in state when an AvailableNow run terminates, so expected output =
every session except each user's last — computed here independently in
pandas from the same events.
"""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def ordered_events(spark, tmp_path_factory):
    """Events re-written time-ordered in one file: AvailableNow replays
    files in order, and the gap rule (like the reference-style batch
    query) assumes ordered replay; late-data handling is the
    watermarked variant's job."""
    src = "/root/testdata/sf0.001/events.parquet"
    out = str(tmp_path_factory.mktemp("events_ordered") / "ev")
    (
        spark.read.parquet(src)
        .repartition(1)
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def _expected_closed(pdf: pd.DataFrame, gap_us: int):
    """All sessions except each user's last, by the batch gap rule."""
    rows = []
    for uid, g in pdf.sort_values(["user_id", "us", "event_id"]).groupby(
        "user_id"
    ):
        sessions = []
        sid = 0
        start = last = None
        n = 0
        for t in g["us"]:
            t = int(t)
            if start is None:
                sid += 1
                start, last, n = t, t, 1
            elif t - last > gap_us:
                sessions.append((uid, sid, n, start, last))
                sid += 1
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        rows.extend(sessions)  # final (open) session excluded
    return sorted(rows)


def test_stream_sessionize_matches_batch_rule(spark, ordered_events, tmp_path):
    from serimi_rdf_interlinking_spark.streaming.sessionize import (
        stream_sessionize,
    )

    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    # NoTimeout: emissions are exactly the gap-closed sessions, so the
    # comparison below is deterministic (a processing-time timeout
    # would race AvailableNow termination and flush open sessions
    # nondeterministically).
    q = stream_sessionize(
        spark, ordered_events, out, ckpt, gap_seconds=3600.0,
        timeout_ms=None,
    )
    assert q.awaitTermination(300), "stream did not terminate in 300s"

    got = sorted(
        (
            int(r.user_id), int(r.session_id), int(r.n_events),
            int(r.start_us), int(r.end_us),
        )
        for r in spark.read.parquet(out).collect()
    )

    ev = spark.read.parquet(ordered_events).toPandas()
    ev["us"] = pd.to_datetime(ev["ts"]).astype("int64") // 1000
    expected = _expected_closed(ev, gap_us=3600 * 1_000_000)

    assert len(expected) > 0  # fixture genuinely has multi-session users
    assert got == expected


@pytest.mark.parametrize("state_buckets", [None, 2])
def test_event_time_sessionize_out_of_order_cross_batch(
    spark, tmp_path, state_buckets
):
    """Watermarked event-time variant (round-2 verdict #8): an event
    arriving in a LATER micro-batch with an EARLIER event time (within
    the watermark delay) must fold in event-time order — emitted
    sessions equal the batch lag+cumsum rule on the union of both
    files, minus each user's final (still-open) session.

    Parametrized over the round-6 bucketed state keying (2 buckets for
    3 users forces multi-user buckets): the emitted session SET must be
    keying-independent."""
    import time

    import pandas as pd

    from serimi_rdf_interlinking_spark.streaming.sessionize import (
        stream_sessionize_event_time,
    )

    ev_dir = str(tmp_path / "events")
    sec = lambda s: pd.Timestamp(s * 1_000_000_000)

    # batch 1: user 1 at 10s, 100s, then 10_000s (a later session);
    # user 2 at 50s. max ts -> watermark after batch 1 = 10_000s - delay.
    # (t=0 would be dropped: Spark's late filter discards ts <= the
    # current watermark, and the initial watermark is epoch 0.)
    f1 = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 2],
            "ts": [sec(10), sec(100), sec(10_000), sec(50)],
            "event_type": ["a"] * 4,
            "value": [1.0] * 4,
        }
    )
    # batch 2: user 1's out-of-order straggler at 9_200s (< 10_000s seen
    # in batch 1, but above the 8_200s watermark -> must be kept and
    # folded BEFORE the 10_000s event), plus far-future flush events
    # that push the watermark past every real session.
    f2 = pd.DataFrame(
        {
            "event_id": [5, 6, 7],
            "user_id": [1, 1, 2],
            "ts": [sec(9_200), sec(100_000), sec(100_000)],
            "event_type": ["a"] * 3,
            "value": [1.0] * 3,
        }
    )
    spark.createDataFrame(f1).coalesce(1).write.mode("append").parquet(ev_dir)
    time.sleep(1.1)  # distinct mtimes => deterministic file order
    spark.createDataFrame(f2).coalesce(1).write.mode("append").parquet(ev_dir)

    out = str(tmp_path / "sessions")
    q = stream_sessionize_event_time(
        spark, ev_dir, out, str(tmp_path / "ckpt"),
        gap_seconds=3600.0, watermark_delay="30 minutes",
        max_files_per_trigger=1, state_buckets=state_buckets,
    )
    assert q.awaitTermination(300), "stream did not terminate in 300s"

    got = sorted(
        (
            int(r.user_id), int(r.session_id), int(r.n_events),
            int(r.start_us), int(r.end_us),
        )
        for r in spark.read.parquet(out).collect()
    )
    s = 1_000_000  # seconds -> microseconds
    assert got == [
        (1, 1, 2, 10 * s, 100 * s),         # {10,100}
        (1, 2, 2, 9_200 * s, 10_000 * s),   # straggler folded in order
        (2, 1, 1, 50 * s, 50 * s),
    ]
    # cross-check against the shared batch-rule helper on the union
    ev = spark.read.parquet(ev_dir).toPandas()
    ev["us"] = pd.to_datetime(ev["ts"]).astype("int64") // 1000
    assert got == _expected_closed(ev, gap_us=3600 * 1_000_000)


@pytest.mark.parametrize("state_buckets", [None, 2])
def test_event_time_sessionize_randomized_parity(
    spark, tmp_path, state_buckets
):
    """Seeded randomized stream: 3 users x ~10 events with bounded
    out-of-order arrival across 3 micro-batches (displacement kept
    well inside the 2-hour watermark delay), plus far-future flush
    events. Emitted sessions must equal the batch gap rule minus each
    user's final (open, flush-started) session. Parametrized over the
    round-6 bucketed state keying (multi-user buckets at 2 buckets /
    3 users): same emitted set."""
    import random
    import time

    import pandas as pd

    from serimi_rdf_interlinking_spark.streaming.sessionize import (
        stream_sessionize_event_time,
    )

    rng = random.Random(29)
    events = []  # (event_id, user_id, t_seconds)
    eid = 1
    for uid in (1, 2, 3):
        t = rng.randrange(100, 1000)
        for _ in range(10):
            # gaps 1-90 min: some extend sessions (gap 3600s), some split
            t += rng.randrange(60, 5400)
            events.append((eid, uid, t))
            eid += 1
    # bounded shuffle: sort by event time, then swap within windows of
    # 3 — arrival displacement stays far below the 2h watermark delay
    events.sort(key=lambda e: e[2])
    for i in range(0, len(events) - 1, 3):
        j = min(i + rng.randrange(1, 3), len(events) - 1)
        events[i], events[j] = events[j], events[i]
    flush_t = max(t for _, _, t in events) + 90_000  # ~1 day later
    files = [events[0:10], events[10:20], events[20:30]]
    files[-1] = files[-1] + [(900 + u, u, flush_t) for u in (1, 2, 3)]

    ev_dir = str(tmp_path / "events")
    sec = lambda s: pd.Timestamp(s * 1_000_000_000)
    for chunk in files:
        pdf = pd.DataFrame(
            {
                "event_id": [e[0] for e in chunk],
                "user_id": [e[1] for e in chunk],
                "ts": [sec(e[2]) for e in chunk],
                "event_type": ["a"] * len(chunk),
                "value": [1.0] * len(chunk),
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(ev_dir)
        time.sleep(1.1)

    q = stream_sessionize_event_time(
        spark, ev_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        gap_seconds=3600.0, watermark_delay="2 hours",
        max_files_per_trigger=1, state_buckets=state_buckets,
    )
    assert q.awaitTermination(300), "stream did not terminate in 300s"

    got = sorted(
        (
            int(r.user_id), int(r.session_id), int(r.n_events),
            int(r.start_us), int(r.end_us),
        )
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    ev = spark.read.parquet(ev_dir).toPandas()
    ev["us"] = pd.to_datetime(ev["ts"]).astype("int64") // 1000
    expected = _expected_closed(ev, gap_us=3600 * 1_000_000)
    assert len(expected) >= 6  # the gap distribution really splits
    assert got == expected


class _FakeState:
    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.updated = None
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def remove(self):
        self.removed = True
        self._v = None

    def update(self, v):
        self.updated = v
        self._v = v

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_timeout_branch_flushes_open_session():
    from serimi_rdf_interlinking_spark.streaming.sessionize import (
        make_sessionizer,
    )

    fn = make_sessionizer(gap_seconds=3600.0, timeout_ms=1000)
    st = _FakeState(value=(3, 100, 200, 7), timed_out=True)
    out = list(fn((42,), iter(()), st))
    assert st.removed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row.user_id, row.session_id, row.n_events, row.start_us,
            row.end_us) == (42, 3, 7, 100, 200)


def test_gap_splits_sessions_and_updates_state():
    from serimi_rdf_interlinking_spark.streaming.sessionize import (
        make_sessionizer,
    )

    fn = make_sessionizer(gap_seconds=1.0, timeout_ms=None)
    ts = pd.to_datetime([0, 500_000, 2_000_000, 2_100_000], unit="us")
    pdf = pd.DataFrame({"ts": ts, "event_id": [1, 2, 3, 4]})
    st = _FakeState()
    out = list(fn((7,), iter([pdf]), st))
    # one closed session (events 1-2), second session open in state
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row.session_id, row.n_events, row.start_us, row.end_us) == (
        1, 2, 0, 500_000,
    )
    assert st.updated == (2, 2_000_000, 2_100_000, 2)
    assert st.timeout_set is None  # NoTimeout variant sets no duration
