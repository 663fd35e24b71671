"""Alignment sink/reader formats (S6/S7) and the spark-submit CLI."""

import subprocess
import sys

from pyspark.sql import functions as F

from serimi_rdf_interlinking_spark.sources.alignments import (
    alignment_lines,
    read_gold_alignments,
    write_alignments,
)


def test_alignment_txt_format(spark):
    al = spark.createDataFrame(
        [("<http://a/1>", "http://b/1", 0.9)], ["source", "target", "score"]
    )
    lines = [r.value for r in alignment_lines(al, "txt").collect()]
    assert lines == ["http://a/1=http://b/1"]


def test_alignment_nt_format(spark):
    al = spark.createDataFrame(
        [("http://a/1", "http://b/1", 0.9)], ["source", "target", "score"]
    )
    lines = [r.value for r in alignment_lines(al, "nt").collect()]
    assert lines == [
        "<http://a/1> <http://www.w3.org/2002/07/owl#sameAs> <http://b/1> ."
    ]


def test_write_then_read_roundtrip(spark, tmp_path):
    al = spark.createDataFrame(
        [("http://a/1", "http://b/1", 0.9), ("http://a/2", "http://b/2%20x", 0.8)],
        ["source", "target", "score"],
    )
    out = str(tmp_path / "align_txt")
    write_alignments(al, out, "txt")
    back = read_gold_alignments(spark, out)
    got = {(r.source, r.target) for r in back.collect()}
    # reader url-decodes targets like the reference eval harness
    assert ("http://a/1", "http://b/1") in got
    assert ("http://a/2", "http://b/2 x") in got


def test_cli_parser_defaults():
    from serimi_rdf_interlinking_spark.cli import build_parser

    args = build_parser().parse_args(
        ["-s", "src", "-t", "tgt", "-c", "K", "-o", "out"]
    )
    assert args.chunk == 20
    assert args.string_threshold == 0.7
    assert args.topk == 0
    assert args.format == "txt"
    assert not args.use_pivot


def test_cli_end_to_end(spark, triple_dfs, tmp_path):
    """Run the CLI main() in-process against fixture parquet."""
    src, tgt = triple_dfs
    src_dir = str(tmp_path / "src")
    tgt_dir = str(tmp_path / "tgt")
    out_dir = str(tmp_path / "out")
    src.write.mode("overwrite").parquet(src_dir)
    tgt.write.mode("overwrite").parquet(tgt_dir)

    from serimi_rdf_interlinking_spark.cli import main
    from serimi_rdf_interlinking_spark.sources.fixtures import CLASS_CITY

    rc = main(
        [
            "-s", src_dir, "-t", tgt_dir, "-c", CLASS_CITY, "-o", out_dir,
            "-k", "10", "-p", "1", "--shuffle-partitions", "4",
        ]
    )
    assert rc == 0
    lines = spark.read.text(out_dir).collect()
    assert len(lines) > 10
    assert all("=" in r.value for r in lines)
