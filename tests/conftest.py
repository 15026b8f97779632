from __future__ import annotations

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests run ~1200 tiny queries at sf0.001 where shuffles are a few KB:
# the engine's 16KB AQE coalesce floor (sized for bench-scale
# Python-boundary stages — session.py RUNTIME_CONFS) keeps up to 8
# post-shuffle tasks alive per micro-shuffle here, pure task-scheduling
# overhead that inflated the round-11 driver pytest wall past its time
# budget (VERDICT r11 item 2). Restore Spark's 1MB default for test
# sessions only; bench/driver sessions are unaffected. setdefault so an
# explicit operator-level A/B (SPARK_GRAFT_AQE_MIN_PARTITION_SIZE=...)
# still wins.
os.environ.setdefault("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "1MB")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    from spark_cep_spark.session import get_spark

    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from spark_cep_spark.io import load_tables

    return load_tables(spark, sf_dir)
