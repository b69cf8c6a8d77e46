import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_flink_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def drain_stream(q, soft_s=300, hard_s=1800):
    """Wait for a streaming query started with availableNow to finish.

    Slow-host hardening (VERDICT-r8 #8): a fixed awaitTermination(300)
    conflates 'host is loaded' with 'query hung'.  Poll up to a generous
    hard deadline; past it, stop the query and fail with the last progress
    event so a genuine hang is diagnosable.  Returns the drain seconds.
    """
    import time

    start = time.time()
    while q.isActive and time.time() - start < hard_s:
        q.awaitTermination(10)
    took = time.time() - start
    if q.isActive:
        progress = q.lastProgress
        q.stop()
        raise AssertionError(
            f"streaming query still active after {hard_s}s (hang, not load); "
            f"last progress: {progress}"
        )
    if q.exception() is not None:
        raise q.exception()
    return took
