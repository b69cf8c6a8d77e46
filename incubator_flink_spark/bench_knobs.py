"""Bench-time iteration knobs for the heaviest EXTRA queries.

The registered semantics of every query are UNCHANGED in normal runs
(driver correctness gate, tools/check.py, tests): the knobs activate
only when ``SPARK_GRAFT_BENCH_FAST=1``, which bench.py sets for its
extras timing pass (never for the headline set — that series must stay
comparable to the recorded baseline).  The fast settings reduce
iteration counts / input floors so the ~60-query extras pass stops
growing linearly with registry size while still exercising the same
plan shapes; BENCH json records ``extras_fast`` so the numbers are
never mistaken for full-semantics timings.
"""

from __future__ import annotations

import os


def bench_fast() -> bool:
    return os.environ.get("SPARK_GRAFT_BENCH_FAST", "") == "1"


def knob(full, fast):
    """``full`` in normal runs; ``fast`` under SPARK_GRAFT_BENCH_FAST=1."""
    return fast if bench_fast() else full
