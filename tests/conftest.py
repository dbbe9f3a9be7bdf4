from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tweetaggregates_spark.pbshim import ensure_protobuf
from tweetaggregates_spark.session import get_spark

# Activate the pure-Python protobuf fallback BEFORE any SparkSession
# starts: transformWithState's Python workers import google.protobuf,
# and they inherit PYTHONPATH from the JVM, which inherits it from this
# process. No-op when real protobuf is installed.
ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
