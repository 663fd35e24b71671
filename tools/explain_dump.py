"""Dump `.explain("formatted")` for declared queries to files.

Usage:
    python tools/explain_dump.py <sf_dir> <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query. Streaming replay
queries build their DataFrame by RUNNING the stream; the dumped plan is
the plan of the returned (batch) DataFrame either way.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]

    import __spark_entry__ as entry_mod
    from serimi_rdf_interlinking_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="explain-dump", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"# wrote {name}_{suffix}.txt", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
