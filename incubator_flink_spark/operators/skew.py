"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in session.py) is the first line of
defense; this module provides explicit salting for cases AQE can't fix —
e.g. a single hot key joined against a small-but-not-broadcastable build
side, or deterministic plans where runtime re-splitting is disabled.

``salted_join``: replicate the build side SALT times and scatter the
probe side's hot keys across salt buckets — the classic
skew-normalization, equivalent to the reference's DataSet-era ship
strategies for skewed inputs (flink-optimizer cost model chooses
partitioning; Flink streaming relies on key distribution alone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join probe⋈build on ``key`` with the probe side salted into
    ``salt`` buckets and the build side replicated ``salt`` times, so one
    hot key spreads over ``salt`` reducers. Output columns = probe ∪ build
    (join key once), same as a plain join."""
    p = probe.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    b = build.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = p.join(b, [key, "__salt"], how)
    return out.drop("__salt")
