"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock over the headline set (lower is better).
Each query is forced with a count() (full plan execution, no result
materialization to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # SERIMI-operator mappings
    "entropy_label_select",
    "stopword_mining",
    "blocking_token_freq",
    "group_max_selection",
    "topk_per_group",
    "set_operations",
    # relational core
    "pricing_summary",
    "pricing_rollup",
    "quantity_quantiles",
    "revenue_per_nation",
    "top_orders",
    "local_supplier_volume",
    "priority_shipping_mix",
    "brand_revenue_share",
    "small_quantity_revenue",
    "semi_anti_join",
    "running_window",
    "sessionize",
    "time_buckets",
    # training-data ops
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "simhash",
    "embedding_near_dup_srp",
    "cosine_topk",
    "cosine_topk_gemm",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "language_id",
    "quality_score",
    "token_counts",
    "fingerprint",
    "pack_documents",
    "media_features",
    "doc_split",
    # flagship end-to-end matcher (fixture-based, fixed size)
    "serimi_alignment",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry_mod
    from serimi_rdf_interlinking_spark.session import get_spark

    spark = get_spark(
        app_name="serimi-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    from pyspark.sql import functions as F

    def force(df) -> int:
        """Force full evaluation: a bare count() lets Catalyst prune
        per-row projections / cardinality-preserving joins (and
        count(non-null expr) simplifies to count(*)), so we sum a
        mod-reduced hash of every column."""
        row = df.select(
            F.count("*").alias("n"),
            F.sum(
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in df.columns]),
                    F.lit(1_000_000),
                )
            ).alias("h"),
        ).collect()[0]
        return int(row.n)

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = force(df)
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt}s ({n} rows)", file=sys.stderr, flush=True)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_query_wall_clock_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
