import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedup.config import DedupConfig
from dedup.session import get_spark


@pytest.fixture(scope="session")
def config():
    # small-scale test knobs; semantic thresholds stay at defaults
    return DedupConfig(shuffle_partitions=8, conv_partitions=8)


@pytest.fixture(scope="session")
def spark(config):
    s = get_spark("dedup-tests", master="local[4]", config=config)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
