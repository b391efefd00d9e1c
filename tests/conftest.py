import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minimel_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("minimel_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pinned_rdd_ids(spark):
    """Ids of currently-registered persistent RDDs. Leak tests must compare
    id SETS (assert no NEW ids remain), not global counts: Spark's
    ContextCleaner asynchronously drops unreferenced caches from EARLIER
    tests sharing the session, so a count taken before an operator and
    re-read after can legitimately shrink (the source of full-suite-only
    flakes). unpersist() removes from this registry synchronously (only
    block deletion is async), so new-id checks are deterministic."""
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
