"""Regenerate serimi_rdf_interlinking_spark/data/oracle_pins.json —
the pinned expected-value tables behind the two oracle entries whose
kernels are not ANSI-SQL-expressible:

* ``asm_part_pairs`` — advanced_string_matching scores for every
  distinct (p_name_a, p_name_b) pair with p_partkey <= 20 across ALL
  test scale factors (the pytest oracle gate runs at sf0.001, the
  driver at sf0.01 — the pin table must cover both). Values are
  produced by the SAME Spark expression the query runs
  (F.round(asm_udf(...), 6)), so literal-parsing the repr on the
  DuckDB side reproduces the doubles bit-for-bit.
* ``serimi_alignment`` — the deterministic fixture matcher output
  (n_entities=30, seed=7), the reference's own gold-eval discipline
  (util/file4.rb:48-140) applied to the flagship e2e: the expected 28
  alignments are computed once and diffed rows+schema+hash by the
  driver every round.

Run after any semantics change to the ASM kernel or the matcher:
    python tools/gen_oracle_pins.py
then re-run pytest — the oracle-compare gate fails loudly on any
stale pin (inner-join row-count mismatch / hash mismatch), so a stale
file can never silently pass.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT = os.path.join(
    ROOT, "serimi_rdf_interlinking_spark", "data", "oracle_pins.json"
)
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from serimi_rdf_interlinking_spark.functions.udfs import asm_udf
    from serimi_rdf_interlinking_spark.session import get_spark

    spark = get_spark(app_name="gen-oracle-pins", shuffle_partitions=4)

    # -- ASM part-name pair scores (union of pairs over every SF) ------
    pair_frames = []
    for d in SF_DIRS:
        part = spark.read.parquet(f"{d}/part.parquet").filter(
            F.col("p_partkey") <= 20
        )
        a = part.select(
            F.col("p_partkey").alias("id_a"), F.col("p_name").alias("na")
        )
        b = part.select(
            F.col("p_partkey").alias("id_b"), F.col("p_name").alias("nb")
        )
        pair_frames.append(
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("na", "nb")
        )
    pairs = pair_frames[0]
    for f in pair_frames[1:]:
        pairs = pairs.unionByName(f)
    scored = (
        pairs.distinct()
        .withColumn("asm", F.round(asm_udf(())(F.col("na"), F.col("nb")), 6))
        .orderBy("na", "nb")
        .collect()
    )
    asm_rows = [[r.na, r.nb, r.asm] for r in scored]

    # -- flagship matcher expected alignments --------------------------
    align = E.q_serimi_alignment(spark, SF_DIRS[0]).collect()
    align_rows = [[r.source, r.target, r.score] for r in align]

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(
            {"asm_part_pairs": asm_rows, "serimi_alignment": align_rows},
            f,
            indent=1,
        )
    print(
        f"wrote {OUT}: {len(asm_rows)} asm pairs, "
        f"{len(align_rows)} alignments"
    )
    spark.stop()


if __name__ == "__main__":
    main()
