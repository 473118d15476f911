from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_database_spark.session import get_spark

SF_SMALL = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    # Test-session shuffle width: the suite runs on ≤15K-row fixtures
    # where every one of the engine's scale-adaptive width pins
    # (repartition(shuffle_partitions(), key)) would otherwise launch
    # 32 tasks per stage — pure scheduling overhead at this data size
    # (r10; VERDICT r09 item 2: the 2,257 s suite outgrew the driver's
    # pytest window). Every pin reads the live conf through
    # neo4j_database_spark.session.shuffle_partitions, so the engine
    # code paths exercised are identical — only the task count drops.
    # Correctness is partition-count-independent by design (and pinned
    # by the *_partitioning_independence / *_copartitioned_mode tests).
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
