import pytest

from web3_knowledge_graph_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
