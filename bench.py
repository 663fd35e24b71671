"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock over the headline set (lower is better),
summing each query's BEST-OF-2 consecutive runs in one JVM after a
warmup action. Protocol rationale (round-3 verdict #4): a single cold
pass made the first query absorb all JVM/codegen warmup (8.6s reported
for a three-aggregation plan) and let co-tenant CPU spikes poison
individual timings (2-3x phantom "regressions" that an isolated rerun
erased) — min-of-2 keeps transient spikes out of the recorded number,
so round-over-round deltas are signal. Each run forces the full plan
(row count + value hash), no driver materialization.
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
    "nation_trade_volume",
    "part_supplier_diversity",
    "min_cost_supplier",
    "late_sole_shipper",
    "customer_order_distribution",
    "idle_rich_customers",
    "semi_anti_join",
    "running_window",
    "rolling_time_window",
    "event_pivot",
    "sessionize",
    "time_buckets",
    "asof_join",
    "pagerank",
    "khop_reach",
    "triangle_count",
    "sssp",
    "bm25_search",
    "funnel",
    "retention_cohorts",
    # training-data ops
    "dedup_exact",
    "stream_dedup_exact",
    "stream_enrich",
    "stream_time_buckets",
    "stream_sessionize",
    "stream_sessionize_ooo",
    "dedup_minhash_lsh",
    "lsh_label_join",
    "dedup_clusters",
    "dedup_canonical",
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
    "video_frames",
    "media_probe",
    "doc_split",
    # flagship end-to-end matcher (fixture-based, fixed size)
    "serimi_alignment",
    # north-star KG-construction pipeline e2e (pages -> extract ->
    # link -> canonicalize -> materialize; fixture-based, fixed size)
    "kg_pipeline",
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

    # warmup: spin up the executor pool, parquet footer reads, codegen
    # and the Python-worker pool BEFORE any timed run — a cheap
    # multi-table action plus one pandas-UDF plan so neither JVM JIT
    # nor Arrow worker startup lands on the first timed query
    t0 = time.time()
    for t in ("lineitem", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    force(qs["language_id"](spark, sf_dir).limit(100))
    print(
        f"# warmup: {round(time.time() - t0, 3)}s", file=sys.stderr, flush=True
    )

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        best, n = None, 0
        for _attempt in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = force(df)
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        timings[name] = best
        total += best
        print(f"# {name}: {best}s ({n} rows)", file=sys.stderr, flush=True)

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
