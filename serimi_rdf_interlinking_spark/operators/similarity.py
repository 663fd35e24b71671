"""Similarity search over embedding columns.

* brute-force cosine top-k — the exactness baseline (cross join of the
  query set against the corpus; queries are few, so the join broadcasts
  the query side and scans the corpus once);
* LSH-bucketed ANN — the scale path: sign-random-projection bucket
  keys from deterministic md5-derived hyperplanes; probes only matching
  buckets. Recall is tested against the brute-force baseline.

All arithmetic is JVM-side (zip_with/aggregate higher-order functions —
whole-stage codegen, no Python).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(c: Column) -> Column:
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda s, x: s + x * x))


def _partial_topk(scored: DataFrame, k: int) -> DataFrame:
    """Scale-safe top-k per query over (query_id, neighbor_id, cos).

    Two-level truncating aggregate instead of a row_number() window:
    a window shuffles EVERY scored corpus row for a query into that
    query's single partition and fully sorts it — at a 100-TB corpus
    the per-query fan-in is a straggler/spill machine. Here level 1
    groups by (query_id, input partition) — no shuffle moves raw rows;
    each group truncates to its local top-k via
    slice(sort_array(collect_list(struct(-cos, neighbor_id))), 1, k) —
    so the one shuffle carries at most k rows per (query, partition).
    Level 2 merges those k-lists to the final top-k. Any global top-k
    element is in its own partition's top-k, so the union of local
    winners always contains the answer; the (-cos, neighbor_id) struct
    sort reproduces the window's (desc cos, asc neighbor_id) total
    order exactly, ties included.
    Returns (query_id, neighbor_id, cos, rk) like the window form."""
    pack = F.slice(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("cos")).alias("nc"),
                    F.col("neighbor_id").alias("nid"),
                )
            )
        ),
        1,
        k,
    )
    local = (
        scored.groupBy("query_id", F.spark_partition_id().alias("part"))
        .agg(pack.alias("top"))
        .select("query_id", F.explode("top").alias("t"))
        .select("query_id", F.col("t.nc").alias("nc"), F.col("t.nid").alias("nid"))
    )
    return (
        local.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("nc", "nid"))), 1, k
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "query_id",
            F.col("t.nid").alias("neighbor_id"),
            (-F.col("t.nc")).alias("cos"),
            (F.col("pos") + 1).alias("rk"),
        )
        .orderBy("query_id", "rk")
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self).
    Returns (query_id, neighbor_id, cos, rk)."""
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = (
        corpus.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("qv"), F.col("v"))
                / (_norm(F.col("qv")) * _norm(F.col("v"))),
                6,
            ),
        )
    )
    return _partial_topk(scored, k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 bytes — stable
    across runs/machines with no RNG dependency."""
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        ctr = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{ctr}".encode()).digest()
            vals.extend(b / 127.5 - 1.0 for b in h)
            ctr += 1
        planes.append(vals[:dim])
    return planes


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id (one bit per hyperplane)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(vec, arr) >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's SRP bucket plus (multiprobe
    level 1) every bucket at Hamming distance 1 — the standard
    multi-probe LSH recall/scan trade. With n_planes=4 and multiprobe=1
    each query scans 5/16 of the corpus on average instead of all of it;
    recall is measured in tests against cosine_topk."""
    if dim is None:
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        dim = int(first.d)
    planes = _hyperplanes(dim, n_planes)
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", srp_bucket(F.col("v"), planes))
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket0", srp_bucket(F.col("qv"), planes))
    probes = [F.col("bucket0")]
    if multiprobe >= 1:
        probes += [
            F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
        ]
    q = q0.withColumn("bucket", F.explode(F.array(*probes))).drop("bucket0")
    scored = (
        corpus.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("qv"), F.col("v"))
                / (_norm(F.col("qv")) * _norm(F.col("v"))),
                6,
            ),
        )
    )
    return _partial_topk(scored, k)
