"""SparkSession factory with 100TB-scale-oriented defaults.

The reference engine hand-tunes managed memory, operator chaining and
two-phase aggregation (taskmanager.memory.managed.fraction in
flink-end-to-end-tests/test-scripts/test_tpch.sh:42); on Spark the
equivalents are AQE, partial aggregation and whole-stage codegen, which
are free as long as plans stay declarative.  This module only sets the
knobs that matter:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- shuffle partitions sized for the local[32] harness; on a real cluster
  AQE coalescing makes the initial number a ceiling, not a constant
- Arrow enabled so every pandas-UDF boundary is vectorized
- UTC session timezone (event-time semantics must not depend on host tz)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _local_dir() -> str | None:
    """Shuffle/spill scratch directory (spark.local.dir).

    Shuffle files belong on the fastest local media available (guide §2.1:
    local disk bandwidth can be the tighter limit for shuffle files).  On
    this single-node harness the measured cost of ONE tiny exchange was
    ~0.7-0.85s against the root filesystem vs ~0.45-0.6s on tmpfs (fresh-
    JVM A/B, 3 runs each) — at these data sizes every query is exchange-
    count-bound, so the scratch location is a first-order constant.
    Parameterised: $SPARK_GRAFT_LOCAL_DIR overrides; default is tmpfs when
    present (the sandbox's RAM-backed /dev/shm — shuffle volume here is
    MBs), else Spark's own default.  On a real cluster you would point
    this at striped local NVMe instead; nothing else changes.
    """
    env = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if env:
        return env
    # tmpfs only when it actually has headroom: shuffle files competing
    # with a nearly-full (or tiny, container-capped) /dev/shm would fail
    # with ENOSPC mid-job (ADVICE r10).  8 GiB free is orders of
    # magnitude above this harness's MB-scale shuffle volume; hosts
    # below it fall back to Spark's default scratch.  (r11 A/B, same
    # code same day: tmpfs headline 20.6s vs root-fs 23.8s, extras 145
    # vs 167 — the r10 "suspect" flag is resolved; the coincident q13
    # regression was the side-table PythonRDD broadcast, fixed in
    # queries/nexmark.py.)
    if os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 8 * 1024**3:
                return "/dev/shm/spark_graft_local"
        except OSError:
            pass
    return None


def get_spark(app_name: str = "incubator_flink_spark", shuffle_partitions: str | None = None) -> SparkSession:
    """Return (or create) the engine SparkSession.

    On the test harness this is ``local[N]``; the config set here is the
    same one we would ship to a 1000-executor cluster, minus driver memory.
    """
    builder = (
        SparkSession.builder.master(f"local[{DEFAULT_SHUFFLE_PARTITIONS}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    ld = _local_dir()
    if ld:
        # static conf: only effective when this call creates the JVM
        # (bench.py / tools each run in a fresh process, so it applies)
        builder = builder.config("spark.local.dir", ld)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
