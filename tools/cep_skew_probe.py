"""Adversarial skewed-key CEP probe (VERDICT r5 item 7).

The per-key NFA (cep/executor.py match_pattern — same distribution as
the reference's CepOperator keyed state) serializes each key into one
task: a hot key holding 50%+ of the stream becomes a straggler whose
cost grows superlinearly for scanning patterns.  The mitigation for
``within``-bounded NO_SKIP patterns is match_pattern_segmented: events
replicate into (key, W-second segment) groups (W = within), every match
fits in two consecutive segments, and the segment holding the match's
first event claims it — exact results, hot-key timeline parallelized.

Probe: N events over one day; SKEWED puts 60% of them on key 0 (rest
uniform over 199 keys), UNIFORM spreads all N over 200 keys.  Pattern:
click+ (reluctant oneOrMore) → purchase within 10 min, NO_SKIP — the
reluctant loop emits every prefix of each click chain, so per-key cost
grows superlinearly with window density: exactly the regime where a hot
key serializes.  Segments are 1 h (>= within, exactness preserved) so a
hot-key segment holds thousands of events and the per-group overhead
amortizes.  Prints wall seconds for
  uniform/per-key, skewed/per-key, skewed/segmented
and asserts segmented == per-key on the skewed input.

Usage: python tools/cep_skew_probe.py [n_events]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from incubator_flink_spark import get_spark
from incubator_flink_spark.cep.executor import match_pattern, match_pattern_segmented
from incubator_flink_spark.cep.pattern import Pattern


def make_events(spark, n: int, skewed: bool):
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.hash(F.col("id") * 7 + 1).cast("double") % 86400 + 86400) % 86400)
        ).alias("ts"),
        (
            F.when((F.col("id") % 10) < 6, F.lit(0)).otherwise(
                (F.hash(F.col("id") * 13 + 5).cast("bigint") % 199 + 199) % 199 + 1
            )
            if skewed
            else (F.hash(F.col("id") * 13 + 5).cast("bigint") % 200 + 200) % 200
        ).alias("user_id"),
        F.when((F.hash(F.col("id") * 31 + 11) % 2) == 0, "click")
        .otherwise("purchase")
        .alias("event_type"),
    )
    return df.localCheckpoint()  # freeze so both runs see identical data


def funnel():
    return (
        Pattern.begin("c")
        .where(lambda e: e["event_type"] == "click")
        .one_or_more()
        .followed_by("p")
        .where(lambda e: e["event_type"] == "purchase")
        .within(600)
    )


def select(key, m):
    return {
        "user_id": int(key["user_id"]),
        "c": int(m["c"][-1]["event_id"]),
        "p": int(m["p"][0]["event_id"]),
    }


SCHEMA = "user_id BIGINT, c BIGINT, p BIGINT"


def run(fn, events, **kw):
    t0 = time.time()
    out = fn(events, ["user_id"], "ts", funnel(), select, SCHEMA, tiebreak="event_id", **kw)
    n = out.count()
    return time.time() - t0, n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    spark = get_spark("cep-skew-probe")
    uniform = make_events(spark, n, skewed=False)
    skewed = make_events(spark, n, skewed=True)
    # warmup (codegen, python workers)
    run(match_pattern, uniform.limit(2000))
    run(match_pattern_segmented, uniform.limit(2000))

    t_uni, n_uni = run(match_pattern, uniform)
    t_skw, n_skw = run(match_pattern, skewed)
    t_seg, n_seg = run(match_pattern_segmented, skewed, segment_s=3600)
    # row-for-row exactness of the segmented form is pytest-pinned
    # (tests/test_cep.py test_segmented_execution_matches_per_key); the
    # probe checks match-count identity, which any claim/dedup bug breaks
    assert n_seg == n_skw, (n_seg, n_skw)
    print(
        f"n={n}  uniform/per-key: {t_uni:.1f}s ({n_uni} matches)  "
        f"skewed/per-key: {t_skw:.1f}s ({n_skw})  "
        f"skewed/segmented: {t_seg:.1f}s ({n_seg})  "
        f"speedup {t_skw / t_seg:.1f}x, counts identical"
    )


if __name__ == "__main__":
    main()
