"""Watermarked event-time windowed aggregation: append-mode emissions
are FINAL (exactly the batch aggregate for their window) and every
window safely below the watermark is emitted."""

import math

import pandas as pd
import pytest


def test_stream_time_buckets_finalized_windows(spark, tmp_path):
    from serimi_rdf_interlinking_spark.streaming.ingest import (
        stream_time_buckets,
    )

    # file-stream sources need a DIRECTORY; the sf tables are single files
    src = str(tmp_path / "events_dir")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(src)
    out = str(tmp_path / "buckets")
    ckpt = str(tmp_path / "ckpt")
    q = stream_time_buckets(
        spark, src, out, ckpt, window="5 minutes", watermark="10 minutes"
    )
    assert q.awaitTermination(300), "stream did not terminate in 300s"

    got = {
        (r.bucket_start, r.event_type): (r.n, r.v)
        for r in spark.read.parquet(out).collect()
    }
    assert got, "stream emitted nothing"

    ev = spark.read.parquet(src).toPandas()  # same rewritten dir
    us = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    ev["bucket"] = (us // 300_000_000) * 300_000_000
    batch = {}
    for (b, et), g in ev.groupby(["bucket", "event_type"]):
        batch[(pd.Timestamp(b * 1000).to_pydatetime(), et)] = (
            len(g),
            round(float(g["value"].sum()), 4),
        )

    # 1. every emitted row is FINAL: identical to the batch aggregate
    for key, (n, v) in got.items():
        bk = (key[0], key[1])
        assert bk in batch, f"spurious window {key}"
        bn, bv = batch[bk]
        assert n == bn and math.isclose(v, bv, abs_tol=1e-6), (key, (n, v), (bn, bv))

    # 2. completeness: all windows strictly below the final watermark
    # (max event time - 10 min) were flushed
    max_us = int(us.max())
    wm_us = max_us - 600_000_000
    expected_done = {
        k for k in batch if (k[0].timestamp() * 1e6) + 300_000_000 < wm_us
    }
    missing = expected_done - set(got)
    assert not missing, sorted(missing)[:5]


def test_stream_dedup_exact_drops_cross_batch_duplicates(spark, tmp_path):
    """Streaming exact dedup: duplicates arriving in a LATER micro-batch
    (within the watermark horizon) are dropped; the first arrival and
    all distinct texts survive."""
    import time

    from serimi_rdf_interlinking_spark.streaming.ingest import (
        stream_dedup_exact,
    )

    src = str(tmp_path / "docs_dir")
    ts = pd.Timestamp(1_600_000_000, unit="s")
    f1 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "ts": [ts, ts, ts],
            "text": ["alpha beta", "gamma delta", "ALPHA   beta!"],  # 3 ~ 1
        }
    )
    f2 = pd.DataFrame(
        {
            "doc_id": [4, 5],
            "ts": [ts + pd.Timedelta(minutes=5)] * 2,
            "text": ["alpha beta", "epsilon zeta"],  # 4 duplicates 1
        }
    )
    spark.createDataFrame(f1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(f2).coalesce(1).write.mode("append").parquet(src)

    q = stream_dedup_exact(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ck"),
        watermark="1 hour",
    )
    assert q.awaitTermination(300), "stream did not terminate in 300s"
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    keys = {r.dedup_key for r in rows}
    ids = sorted(r.doc_id for r in rows)
    # one survivor per distinct normalized text: {alpha beta},
    # {gamma delta}, {epsilon zeta}
    assert len(rows) == len(keys) == 3
    # doc 3 (same normalized text as 1) and doc 4 (cross-batch dup) drop
    assert 2 in ids and 5 in ids
    assert ids.count(3) == 0 and ids.count(4) + ids.count(1) == 1
