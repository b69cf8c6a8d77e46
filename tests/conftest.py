import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_flink_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"

# Test scratch (streaming checkpoints, replay fixture dirs, format
# round-trip outputs) on tmpfs when it has headroom: every micro-batch
# pays walCommit/commitOffsets/state-store fsyncs into these dirs, and
# the suite runs hundreds of micro-batches — the same media choice
# session.py makes for shuffle scratch.  Purely a test-harness location;
# no operator behavior changes.
if os.path.isdir("/dev/shm"):
    try:
        _st = os.statvfs("/dev/shm")
        if _st.f_bavail * _st.f_frsize >= 8 * 1024**3:
            _shm_tmp = "/dev/shm/spark_graft_tests"
            os.makedirs(_shm_tmp, exist_ok=True)
            tempfile.tempdir = _shm_tmp
    except OSError:
        pass


@pytest.fixture(scope="session")
def spark():
    # 2 shuffle/state partitions: the suite's inputs are sf0.001-sized
    # (hundreds of rows), so partition count only multiplies per-batch
    # state-store and task overheads; operators that need a specific
    # parallelism pass num_partitions explicitly.
    s = get_spark("tests", shuffle_partitions="2")
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
