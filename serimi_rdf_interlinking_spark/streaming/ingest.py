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
