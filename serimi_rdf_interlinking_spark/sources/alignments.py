"""S6/S7 — alignment sink + gold-alignment reader.

Output format parity with the reference (initializer.rb:254-263):
* txt — `source=target` lines with angle brackets stripped
  (initializer.rb:258 gsub(/[<>]/,""));
* nt  — `<s> <http://www.w3.org/2002/07/owl#sameAs> <t> .` triples.

The gold reader parses the reference's `src=tgt` files
(util/file4.rb:64-72; cf. dailymed-tcm-modified.txt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def alignment_lines(alignments: DataFrame, fmt: str = "txt") -> DataFrame:
    """One-column DataFrame of formatted output lines."""
    strip = lambda c: F.regexp_replace(c, r"[<>]", "")
    if fmt == "txt":
        line = F.concat(strip(F.col("source")), F.lit("="), strip(F.col("target")))
    elif fmt == "nt":
        line = F.concat(
            F.lit("<"), strip(F.col("source")), F.lit("> <"),
            F.lit(OWL_SAMEAS), F.lit("> <"), strip(F.col("target")), F.lit("> ."),
        )
    else:
        raise ValueError(f"unknown alignment format {fmt!r}")
    return alignments.select(line.alias("value")).orderBy("value")


def write_alignments(alignments: DataFrame, path: str, fmt: str = "txt") -> None:
    """Text sink (one file per partition; coalesce(1) for the
    reference's single-file contract at small scale)."""
    alignment_lines(alignments, fmt).coalesce(1).write.mode("overwrite").text(path)


def read_gold_alignments(spark: SparkSession, path: str) -> DataFrame:
    """`src=tgt` lines -> (source, target). Handles the reference gold
    files' URL-encoded targets by decoding percent-escapes the way the
    eval harness does (util/file4.rb:94-97 CGI unescape)."""
    lines = spark.read.text(path)
    eq = F.instr(F.col("value"), "=")
    df = (
        lines.filter(eq > 0)
        .select(
            F.trim(F.expr("substring(value, 1, instr(value, '=') - 1)")).alias("source"),
            F.trim(F.expr("substring(value, instr(value, '=') + 1)")).alias("target"),
        )
        .filter((F.col("source") != "") & (F.col("target") != ""))
        .withColumn("target", F.url_decode("target"))
        .distinct()
    )
    return df
