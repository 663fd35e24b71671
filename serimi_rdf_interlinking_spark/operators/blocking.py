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


# ---------------------------------------------------------------------------
# LSH-blocked label similarity join (north_star selection tier)
# ---------------------------------------------------------------------------


def _char_shingle_rows(
    df: DataFrame, id_col: str, label_col: str, k: int
) -> DataFrame:
    """(id, sh) distinct character k-shingles of the keyword-normalized
    label. Labels shorter than k yield one shingle (the whole label) —
    substr past the end truncates identically in Spark and DuckDB, so
    the SQL oracle mirrors bit-for-bit."""
    from .dedup import _norm

    base = df.select(F.col(id_col).alias("id"), _norm(label_col).alias("nrm"))
    n_sh = F.greatest(F.length("nrm") - F.lit(k - 1), F.lit(1))
    return base.select(
        "id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_sh),
                    lambda i: F.col("nrm").substr(i, F.lit(k)),
                )
            )
        ).alias("sh"),
    )


def _char_minhash_banded(
    sh: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, band_key) from char-shingle rows — same integer
    md5->XOR minhash family and order-insensitive band keys as the
    dedup LSH (operators/dedup.py minhash_signatures; see its shape
    notes for why this stays in primitive agg buffers)."""
    from .dedup import _XOR_SEEDS

    r = num_hashes // bands
    x = (
        F.conv(F.substring(F.md5(F.col("sh")), 1, 15), 16, 10)
        .cast("long")
        .alias("x")
    )
    hashed = sh.select("id", x).select(
        "id",
        *[
            F.col("x").bitwiseXOR(F.lit(_XOR_SEEDS[s])).alias(f"h{s}")
            for s in range(num_hashes)
        ],
    )
    sig = hashed.groupBy("id").agg(
        *[F.min(f"h{s}").alias(f"m{s}") for s in range(num_hashes)]
    )
    exploded = sig.select(
        "id",
        F.posexplode(
            F.array(*[F.col(f"m{s}") for s in range(num_hashes)])
        ).alias("seed", "minhash"),
    )
    return (
        exploded.withColumn("band", F.floor(F.col("seed") / r))
        .groupBy("id", "band")
        .agg(
            F.concat_ws(
                "-",
                F.transform(
                    F.sort_array(F.collect_list("minhash")),
                    lambda m: m.cast("string"),
                ),
            ).alias("band_key")
        )
    )


def lsh_label_join(
    src: DataFrame,
    tgt: DataFrame,
    src_id: str = "src_id",
    src_label: str = "label",
    tgt_id: str = "tgt_id",
    tgt_label: str = "label",
    num_hashes: int = 12,
    bands: int = 4,
    k: int = 4,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """LSH-blocked similarity join between two label sets — the
    north_star's fuzzy selection tier ("LSH-blocked similarity join on
    rdfs:label/name predicates") next to the exact tokenized
    inverted-index retrieval (operators/candidates.py): character
    k-shingle minhash signatures per side, band-bucket equi-join
    ACROSS the two sides (never a self all-pairs), then exact
    character-Jaccard verification bounded to the LSH candidates.
    Catches typo/spacing variants where no full token matches exactly.
    Returns (src_id, tgt_id, jaccard >= verify_threshold).

    Scale shape: both sides shuffle once on (band, band_key) — the
    join never materializes src x tgt; verification work is linear in
    |candidates| x shingles-per-label. Token-frequency skew does not
    apply (band keys are near-uniform minhash tuples); a pathological
    all-identical-label corpus degrades to the true duplicate set,
    which is the correct answer, not a skew artifact. Each side's
    shingle frame is re-derived by its 3 consumers (banding, sizes,
    verify) instead of persisted — same trade as minhash_lsh_pairs
    (operators/dedup.py): shingling is a linear stateless map over
    label rows, and a persist inside an operator races against itself
    when the consumers run within one action."""
    assert num_hashes % bands == 0
    src_sh = _char_shingle_rows(src, src_id, src_label, k)
    tgt_sh = _char_shingle_rows(tgt, tgt_id, tgt_label, k)
    a = _char_minhash_banded(src_sh, num_hashes, bands).select(
        F.col("id").alias("id_a"), "band", "band_key"
    )
    b = _char_minhash_banded(tgt_sh, num_hashes, bands).select(
        F.col("id").alias("id_b"), "band", "band_key"
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .select("id_a", "id_b")
        .distinct()
    )
    sizes_a = src_sh.groupBy("id").agg(F.count("*").alias("n_a"))
    sizes_b = tgt_sh.groupBy("id").agg(F.count("*").alias("n_b"))
    co = (
        cand.join(src_sh.select(F.col("id").alias("id_a"), "sh"), "id_a")
        .join(tgt_sh.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("co"))
    )
    return (
        co.join(sizes_a, co.id_a == sizes_a.id)
        .drop("id")
        .join(sizes_b, co.id_b == sizes_b.id)
        .drop("id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("co") / (F.col("n_a") + F.col("n_b") - F.col("co")), 6
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select(
            F.col("id_a").alias("src_id"),
            F.col("id_b").alias("tgt_id"),
            "jaccard",
        )
        .orderBy("src_id", "tgt_id")
    )
