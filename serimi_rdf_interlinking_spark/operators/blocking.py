"""A12/O4 — blocking order + chunk assignment.

The reference orders all source instances by shared-token frequency so
homonym sources co-occur in chunks (search_module.rb:33-56), then
slices offset/limit windows (initializer.rb:93-130).

Spark design: a distributed sort by the blocking key followed by
zipWithIndex for a contiguous global rank. zipWithIndex is two linear
jobs (count per partition, then offsetting) — no single-partition
window, so the global ordering scales. Chunk ids derive from the rank
(first chunk 5, then sigma — the reference's warm-up, initializer.rb:94-98).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import SerimiConfig
from ..functions.columns import norm_tokens


def blocking_order(
    triples: DataFrame,
    members: DataFrame,
    labels: list[str],
    cfg: SerimiConfig,
    mat=None,
) -> DataFrame:
    """Returns (s, rank, chunk_id) for every source with a label value.

    Reference semantics: subjects are emitted in descending order of
    their tokens' document frequency (first occurrence wins). Sources
    without any label triple never enter $bdata — they are excluded
    here too (the caller logs the count).

    ``mat`` materializes the range-partitioned frame before the
    partition-count collect (the partition ids MUST be pinned:
    repartitionByRange samples, so a recompute could re-draw ranges and
    desynchronize the collected offsets from the later rank pass).
    The matcher passes its tracked ``_mat`` so the blocks are released
    at end-of-run; standalone callers get an untracked eager
    localCheckpoint.
    """
    spark = triples.sparkSession
    data = None
    for label in labels:
        cand = (
            triples.join(members, "s", "left_semi")
            .filter((F.col("p") == label) & ~F.col("is_bnode"))
            .select("s", "o")
        )
        if cand.head(1):
            data = cand
            break
    if data is None:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("s", T.StringType()),
                    T.StructField("rank", T.LongType()),
                    T.StructField("chunk_id", T.LongType()),
                ]
            ),
        )

    toks = data.select("s", F.explode(norm_tokens("o")).alias("tok"))
    tc = toks.groupBy("tok").agg(F.count("*").alias("tok_freq"))
    # per subject: best (most frequent) token decides its position;
    # ties broken by token then subject for determinism.
    keyed = (
        toks.join(tc, "tok")
        .groupBy("s")
        .agg(
            F.min(
                F.struct(
                    (-F.col("tok_freq")).alias("neg_freq"),
                    F.col("tok").alias("tok"),
                    F.col("s").alias("s2"),
                )
            ).alias("k")
        )
    )
    # contiguous global rank, fully JVM-side and shuffle-parallel:
    # range-sort by the key, then rank = per-partition row_number plus
    # the cumulative count of earlier partitions (collected offsets are
    # one small row per partition — no single-partition window, no
    # Python RDD round trip).
    ordered = keyed.repartitionByRange(max(triples.sparkSession.sparkContext.defaultParallelism, 1), "k")
    ordered = ordered.withColumn("pid", F.spark_partition_id())
    ordered = (mat or (lambda df: df.localCheckpoint(eager=True)))(ordered)
    part_counts = (
        ordered.groupBy("pid").agg(F.count("*").alias("n")).orderBy("pid").collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in part_counts:
        offsets[r.pid] = acc
        acc += r.n
    off_map = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    ) if offsets else F.create_map()
    from pyspark.sql import Window

    w = Window.partitionBy("pid").orderBy("k")
    ranked = ordered.withColumn(
        "rank", F.row_number().over(w) - 1 + off_map[F.col("pid")]
    ).select("s", "rank")

    warm = cfg.warmup_chunk
    sigma = cfg.chunk
    chunk = (
        F.when(F.col("rank") < warm, F.lit(0))
        .otherwise(1 + F.floor((F.col("rank") - warm) / sigma))
        .cast("long")
    )
    return ranked.withColumn("chunk_id", chunk)
