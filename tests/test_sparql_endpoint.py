"""S1 extension seam: SPARQL-endpoint source with an injected fake
transport (no network in the sandbox). The fake serves the SPARQL 1.1
JSON results protocol over an in-memory triple store, so the adapter's
COUNT probe, ORDER BY pagination, distributed page fetch and
TRIPLE_SCHEMA conversion are exercised for real."""

import re

import pytest


def _fake_transport(store):
    """store: list of (s, p, o, o_is_uri, is_bnode). Serves COUNT and
    ORDER BY ?s ?p ?o LIMIT/OFFSET windows like a SPARQL 1.1 endpoint."""
    ordered = sorted(store, key=lambda t: (t[0], t[1], t[2]))

    def binding(t):
        s, p, o, o_is_uri, is_bnode = t
        return {
            "s": {"type": "bnode" if is_bnode else "uri", "value": s},
            "p": {"type": "uri", "value": p},
            "o": {"type": "uri" if o_is_uri else "literal", "value": o},
        }

    def transport(url, query):
        if "COUNT" in query:
            return {
                "results": {
                    "bindings": [{"n": {"value": str(len(ordered))}}]
                }
            }
        m = re.search(r"LIMIT (\d+) OFFSET (\d+)", query)
        assert m, f"unpaginated query: {query}"
        assert "ORDER BY" in query  # stable pagination contract
        limit, off = int(m.group(1)), int(m.group(2))
        page = ordered[off : off + limit]
        return {"results": {"bindings": [binding(t) for t in page]}}

    return transport


@pytest.fixture(scope="module")
def store(fixture_small):
    return list(fixture_small.target)


def test_endpoint_read_roundtrip(spark, store):
    from serimi_rdf_interlinking_spark.sources.sparql_endpoint import (
        read_sparql_endpoint,
    )

    df = read_sparql_endpoint(
        spark,
        "http://endpoint.test/sparql",
        page_size=37,  # forces many pages with a ragged final window
        n_partitions=4,
        transport=_fake_transport(store),
    )
    got = {(r.s, r.p, r.o, r.o_is_uri, r.is_bnode) for r in df.collect()}
    assert got == set(store)
    assert df.schema.fieldNames() == ["s", "p", "o", "o_is_uri", "is_bnode"]


def test_endpoint_empty_and_capped(spark, store):
    from serimi_rdf_interlinking_spark.sources.sparql_endpoint import (
        read_sparql_endpoint,
    )

    empty = read_sparql_endpoint(
        spark, "http://e.test/sparql", transport=_fake_transport([])
    )
    assert empty.count() == 0
    capped = read_sparql_endpoint(
        spark,
        "http://e.test/sparql",
        page_size=10,
        max_rows=25,
        transport=_fake_transport(store),
    )
    assert capped.count() == 25


def test_read_table_dispatches_urls_to_endpoint(spark, monkeypatch):
    from serimi_rdf_interlinking_spark.sources import io as io_mod
    from serimi_rdf_interlinking_spark.sources import sparql_endpoint as ep

    called = {}

    def spy(spark_, url, **kw):
        called["url"] = url
        return spark_.createDataFrame([], "s string")

    monkeypatch.setattr(ep, "read_sparql_endpoint", spy)
    io_mod.read_table(spark, "https://dbpedia.test/sparql")
    assert called["url"] == "https://dbpedia.test/sparql"


def test_default_transport_unreachable_guides_to_dump(spark):
    """Without network, the default transport must fail fast with a
    message pointing at the dump-ingestion path (port 1 refuses
    immediately — no DNS, no timeout wait)."""
    from serimi_rdf_interlinking_spark.sources.sparql_endpoint import (
        read_sparql_endpoint,
    )

    with pytest.raises(RuntimeError, match="ingest a dump"):
        read_sparql_endpoint(spark, "http://127.0.0.1:1/sparql")


def test_matcher_runs_against_fake_endpoint(spark, fixture_small):
    """End-to-end: the matcher consumes an endpoint-backed target frame
    exactly like a table read (the reference's only mode)."""
    from serimi_rdf_interlinking_spark.config import SerimiConfig
    from serimi_rdf_interlinking_spark.matcher import SerimiMatcher
    from serimi_rdf_interlinking_spark.sources.fixtures import CLASS_CITY
    from serimi_rdf_interlinking_spark.sources.sparql_endpoint import (
        read_sparql_endpoint,
    )
    from serimi_rdf_interlinking_spark.sources.triples import TRIPLE_SCHEMA

    src = spark.createDataFrame(fixture_small.source, TRIPLE_SCHEMA)
    tgt = read_sparql_endpoint(
        spark,
        "http://endpoint.test/sparql",
        page_size=200,
        transport=_fake_transport(list(fixture_small.target)),
    )
    cfg = SerimiConfig(chunk=10, topk=1, shuffle_partitions=4)
    res = SerimiMatcher(cfg).run(spark, src, tgt, CLASS_CITY)
    got = {(r.source, r.target) for r in res.alignments.collect()}
    gold = set(fixture_small.gold)
    assert len(got & gold) / len(gold) >= 0.9
