from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigbugdata_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="bigbugdata-tests")
    yield spark


@pytest.fixture(scope="module", autouse=True)
def _release_pinned_frames():
    """Release operator-pinned cache blocks at each module boundary (the
    caching contract in bigbugdata_spark.caching): within a module the
    warm cache is the legitimate steady state, across modules it would
    accumulate."""
    yield
    from bigbugdata_spark.caching import release_pinned

    release_pinned()


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE
