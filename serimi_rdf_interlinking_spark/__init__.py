"""serimi_rdf_interlinking_spark — a PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
SERIMI RDF-interlinking reference (samuraraujo/SERIMI-RDF-Interlinking).

Built from scratch on the DataFrame/SQL API (Catalyst-optimized), with
vectorized Arrow/pandas UDFs for the string-metric kernels and the
per-chunk RDS disambiguation math. The reference's per-resource SPARQL
round trips become set-oriented joins over columnar triple tables; its
sequential Ruby loops become chunk-parallel grouped-map operations.

Layout
------
functions/   scalar kernels (simmetrics-parity string metrics) + UDFs
operators/   relational operators from SURVEY.md §2 (entropy, blocking,
             candidate search, RDS scoring, dedup, ANN, text stats, CC)
sources/     triple/page schemas, deterministic fixtures, checkpoint IO
plans/       end-to-end pipelines (KG construction, matcher driver)
streaming/   Structured Streaming ingestion shell
"""

__version__ = "0.1.0"

from .config import SerimiConfig  # noqa: F401
