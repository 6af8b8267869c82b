import pytest

from biomedical_entity_linking_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_corpus():
    from biomedical_entity_linking_spark.data.generator import generate_corpus

    return generate_corpus(n_entities=80, seed=42)
