"""Structured Streaming ingestion of the page corpus.

The reference is a batch CLI (SURVEY.md §2.9: no streaming operators);
its sequential chunk loop with offset resume maps to a foreachBatch
driver loop here. Incremental crawls land as parquet files; the stream
extracts triples per micro-batch and appends them exactly-once-per-file
(checkpointed by the streaming engine), with Trigger.AvailableNow
semantics for catch-up runs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..extract import extract_triples
from ..sources.triples import PAGE_SCHEMA


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """readStream(pages parquet) → mapInPandas extraction → append sink.

    Returns the StreamingQuery; callers use processAllAvailable()/stop()
    (tests) or awaitTermination() (deployments).
    """
    stream = (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )
    extracted = extract_triples(stream, from_html=False)

    writer = (
        extracted.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_time_buckets(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    schema=None,
):
    """Watermarked event-time windowed aggregation — the streaming form
    of the batch time_buckets query: tumbling windows over event time,
    late rows beyond the watermark dropped, finalized windows appended
    exactly once.

    Built entirely from Spark primitives (withWatermark + window +
    groupBy count/sum): state is one row per (window, event_type) and
    the watermark bounds it — the scale-correct shape for an unbounded
    event stream. Returns the StreamingQuery.
    """
    from pyspark.sql import functions as F

    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_dir)
        # watermarks require TimestampType; events carry TIMESTAMP_NTZ
        # (cast is exact under the session's UTC timezone)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "v",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
