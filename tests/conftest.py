from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# sf0.01 mirrors the driver's correctness gate; override for speed:
#   SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 pytest ...
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from pe_firm_investment_database_pipeline_spark.session import get_spark

    s = get_spark("pe-pipeline-tests", driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
