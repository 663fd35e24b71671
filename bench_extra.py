"""Per-query isolation bench (optimization-round instrument; bench.py
itself is frozen for measurement). Same session config, warmup and
best-of-2 forcing protocol as bench.py, but over an arbitrary query
subset, so a single optimization's before/after can be measured without
paying for the whole headline suite.

Usage:
    SPARK_GRAFT_SF_DIR=... python bench_extra.py query [query ...]
Prints one JSON line {"queries": {...}, "sf_dir": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = sys.argv[1:]

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F
    from serimi_rdf_interlinking_spark.session import get_spark

    spark = get_spark(
        app_name="serimi-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    def force(df) -> int:
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
    for t in ("lineitem", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    force(qs["language_id"](spark, sf_dir).limit(100))

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = force(df)
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        timings[name] = best
        print(f"# {name}: {best}s ({n} rows)", file=sys.stderr, flush=True)
    print(json.dumps({"queries": timings, "sf_dir": sf_dir}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
