"""Value-hash snapshot of declared queries: for each query, record
(row count, sum of pmod(xxhash64(all columns), 1e6)) — the exact
forcing expression bench.py uses. Running this before and after an
optimization and diffing the JSON proves the optimization did not
change a single bit of any query's output at that SF.

Usage:
    python tools/qhash.py <sf_dir> <out.json> [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    names = sys.argv[3:]

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F
    from serimi_rdf_interlinking_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="qhash", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    qs = entry_mod.queries()
    if not names:
        names = sorted(qs)

    out: dict = {}
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            row = df.select(
                F.count("*").alias("n"),
                F.sum(
                    F.pmod(
                        F.xxhash64(*[F.col(c) for c in df.columns]),
                        F.lit(1_000_000),
                    )
                ).alias("h"),
            ).collect()[0]
            out[name] = [int(row.n), None if row.h is None else int(row.h)]
        except Exception as exc:  # record, keep going
            out[name] = ["ERR", repr(exc)[:200]]
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
