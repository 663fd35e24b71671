"""spark-submit primary script for the interlinking CLI.

Usage (the package itself ships in the --py-files zip, which
spark-submit prepends to sys.path on the driver and executors):

    spark-submit --master <cluster> \
        --py-files serimi_spark.zip \
        tools/spark_submit_main.py \
        -s <source triples> -t <target triples> \
        -c <class URI> -o <alignment output dir> [flags...]

A separate launcher is required because `cli.py` uses package-relative
imports: spark-submit executes the primary file as a top-level script
(no package context), so the entry point must import the CLI through
the package instead of being the package module itself.
"""

import sys

from serimi_rdf_interlinking_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
