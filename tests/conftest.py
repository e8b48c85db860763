import json
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLDEN_DIR = os.path.join(HERE, 'golden')
POOL_PATH = os.path.join(REPO, 'fixtures', 'pool.json')
BEL_DIR = '/root/reference/src/pybel/testing/resources/bel'


def load_golden(name):
    with open(os.path.join(GOLDEN_DIR, '{}.json'.format(name))) as f:
        return json.load(f)


def load_pool():
    with open(POOL_PATH) as f:
        return json.load(f)


@pytest.fixture(scope='session')
def pool():
    return load_pool()


@pytest.fixture(scope='session')
def spark():
    """Shared local SparkSession for the test run."""
    from pybel_spark.session import get_spark
    spark = get_spark(app_name='pybel-spark-tests', cores=4, shuffle_partitions=8)
    yield spark
