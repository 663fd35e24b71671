"""S1 extension seam — live SPARQL-endpoint source.

The reference's ONLY data source is a SPARQL endpoint driven through
its activerdf adapter (serimi.rb session setup; serimi_module.rb:132-138
limit/offset windows, :233-235 class sample `limit 4000`;
search_module.rb `bif:contains` searches). This repo deliberately maps
S1 to table reads (`sources/io.py`) — the scale path ingests dumps, not
endpoints — but a user pointing the CLI at a real endpoint needs an
adapter. This module is that seam:

* `read_sparql_endpoint(spark, url, ...)` returns a TRIPLE_SCHEMA
  DataFrame by paginating `SELECT ?s ?p ?o` windows (LIMIT/OFFSET,
  the reference's own chunking idiom) and fetching pages IN PARALLEL
  on executors via mapInPandas — the driver never holds the corpus.
* the HTTP transport is pluggable (`transport=`): tests inject a fake;
  the default urllib JSON-results transport needs network access, which
  this sandbox doesn't have — it is written against the public
  SPARQL 1.1 Protocol + JSON Results specs and raises a clear error
  when the endpoint is unreachable.

Scale notes: an endpoint is a single-node service — this source is for
dimension-scale pulls (a target KB of millions of triples, the
reference's regime), not the 10^12-page corpus (which arrives as
dump files/Iceberg). Page fetches are spread across executors with
bounded parallelism (`n_partitions`); `page_size` bounds each response.
A count probe sizes the offset space up front, so the page list is a
small literal DataFrame and Spark schedules fetches like any other
scan.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

# transport: (endpoint_url, sparql_query) -> parsed JSON results dict
Transport = Callable[[str, str], dict]


def default_transport(endpoint_url: str, query: str) -> dict:
    """SPARQL 1.1 Protocol GET with JSON results. Requires network
    access (none in this sandbox — tests inject a fake transport)."""
    import urllib.parse
    import urllib.request

    url = endpoint_url + "?" + urllib.parse.urlencode(
        {"query": query, "format": "application/sparql-results+json"}
    )
    req = urllib.request.Request(
        url, headers={"Accept": "application/sparql-results+json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except Exception as ex:  # pragma: no cover - no network in sandbox
        raise RuntimeError(
            f"SPARQL endpoint {endpoint_url!r} unreachable: {ex}. "
            "For offline use, ingest a dump into parquet/Iceberg and "
            "point the CLI at the table instead (sources/io.py)."
        ) from ex


def _rows_from_results(results: dict) -> list[tuple[str, str, str, bool, bool]]:
    """SPARQL JSON results -> TRIPLE_SCHEMA tuples.

    o_is_uri mirrors the reference's URI test on the object; is_bnode
    marks bnode SUBJECTS (the reference's F5 filter drops candidate
    descriptions rooted at bnodes)."""
    out = []
    for b in results.get("results", {}).get("bindings", []):
        s, p, o = b.get("s"), b.get("p"), b.get("o")
        if s is None or p is None or o is None:
            continue
        out.append(
            (
                s["value"],
                p["value"],
                o["value"],
                o.get("type") == "uri",
                s.get("type") == "bnode",
            )
        )
    return out


def read_sparql_endpoint(
    spark: SparkSession,
    endpoint_url: str,
    where: str = "?s ?p ?o",
    page_size: int = 10000,
    n_partitions: int = 8,
    transport: Transport | None = None,
    max_rows: int | None = None,
) -> DataFrame:
    """Paginated distributed read of `SELECT ?s ?p ?o WHERE { where }`.

    One COUNT probe on the driver sizes the offset space; the
    (offset, limit) pages become a small DataFrame repartitioned to
    `n_partitions`, and each executor task fetches its pages through
    `transport` inside mapInPandas — parallel, restartable per page,
    and the driver never materializes the triples."""
    import pandas as pd

    from .triples import TRIPLE_SCHEMA

    tr = transport or default_transport
    count_q = f"SELECT (COUNT(*) AS ?n) WHERE {{ {where} }}"
    res = tr(endpoint_url, count_q)
    bindings = res.get("results", {}).get("bindings", [])
    total = int(bindings[0]["n"]["value"]) if bindings else 0
    if max_rows is not None:
        total = min(total, max_rows)
    offsets = list(range(0, total, page_size))
    if not offsets:
        return spark.createDataFrame([], TRIPLE_SCHEMA)

    # ORDER BY makes LIMIT/OFFSET pagination stable across pages (an
    # unordered SELECT may repeat/drop rows between requests on some
    # stores). The reference's adapter paginates unordered — a known
    # flaw we do not replicate.
    base_q = (
        "SELECT ?s ?p ?o WHERE {{ {w} }} ORDER BY ?s ?p ?o "
        "LIMIT {limit} OFFSET {offset}"
    )

    def fetch(pdfs: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            for off in pdf["off"]:
                limit = min(page_size, total - int(off))
                q = base_q.format(w=where, limit=limit, offset=int(off))
                rows = _rows_from_results(tr(endpoint_url, q))
                yield pd.DataFrame(
                    rows, columns=["s", "p", "o", "o_is_uri", "is_bnode"]
                )

    pages = spark.createDataFrame(
        [(o,) for o in offsets], "off long"
    ).repartition(min(n_partitions, len(offsets)))
    return pages.mapInPandas(fetch, TRIPLE_SCHEMA)
