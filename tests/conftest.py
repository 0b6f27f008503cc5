import pytest

from phenobert_spark.config import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="phenobert-spark-tests", master="local[4]", shuffle_partitions=8
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def onto():
    from phenobert_spark.ontology import fixture_ontology

    return fixture_ontology()
