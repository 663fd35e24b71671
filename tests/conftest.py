import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from serimi_rdf_interlinking_spark.session import get_spark

    s = get_spark(app_name="serimi-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_small():
    from serimi_rdf_interlinking_spark.sources.fixtures import (
        build_interlinking_fixture,
    )

    return build_interlinking_fixture(n_entities=40, seed=7)


@pytest.fixture(scope="session")
def triple_dfs(spark, fixture_small):
    from serimi_rdf_interlinking_spark.sources.triples import TRIPLE_SCHEMA

    src = spark.createDataFrame(fixture_small.source, TRIPLE_SCHEMA)
    tgt = spark.createDataFrame(fixture_small.target, TRIPLE_SCHEMA)
    return src, tgt
