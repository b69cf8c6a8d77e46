"""A/B probe for the nexmark_q13 regression (VERDICT r10 #1).

Hypotheses from the r10 verdict:
  (a) tmpfs spark.local.dir hurts the 32-partition range-sort shuffle;
  (b) localCheckpoint RDD blocks accumulated by EARLIER extras queries
      (distributed_rank / verify_jaccard / near_pairs_lsh pins) squeeze
      execution memory for q13's global sort.

Modes (fresh JVM each — run this script once per mode):
  python tools/q13_probe.py iso        # q13 alone, 5 reps
  python tools/q13_probe.py ctx        # replicate the bench context:
                                       # run the checkpoint-heavy extras
                                       # that precede q13 in bench order,
                                       # then q13 x5
Local dir comes from $SPARK_GRAFT_LOCAL_DIR (or the session default).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from incubator_flink_spark import get_spark
from incubator_flink_spark.queries import REGISTRY

SF = "/root/testdata/sf0.1"

# extras that run before nexmark_q13 in bench order and create
# localCheckpoint pins: rank consumers, dedup verify pins, LSH sig pins
CTX = [
    "semantic_dedup", "star_rfm_segments", "perplexity_buckets",
    "zorder_layout_stats", "source_cap_sample", "winnowing_pairs",
    "multi_signal_dedup", "incremental_dedup", "quality_linear_probe",
]


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "iso"
    spark = get_spark("q13probe")
    # warmup as bench does
    noop(REGISTRY["nexmark_q13"].fn(spark, "/root/testdata/sf0.001"))
    if mode == "ctx":
        os.environ["SPARK_GRAFT_BENCH_FAST"] = "1"
        for name in CTX:
            spark.catalog.clearCache()
            t0 = time.time()
            noop(REGISTRY[name].fn(spark, SF))
            print(f"ctx {name}: {time.time()-t0:.3f}", flush=True)
        del os.environ["SPARK_GRAFT_BENCH_FAST"]
    times = []
    for i in range(5):
        spark.catalog.clearCache()
        t0 = time.time()
        noop(REGISTRY["nexmark_q13"].fn(spark, SF))
        times.append(round(time.time() - t0, 3))
    print(f"MODE={mode} localdir={spark.conf.get('spark.local.dir', '<default>')} "
          f"q13 times={times}", flush=True)
    try:
        n_cached = spark.sparkContext._jsc.getPersistentRDDs().size()
        mem = spark.sparkContext._jvm.org.apache.spark.SparkEnv.get().blockManager().memoryStore().currentUnrollMemory()
        print(f"persistentRDDs={n_cached}", flush=True)
    except Exception as exc:  # diagnostics only
        print(f"storage-info unavailable: {exc}", flush=True)


if __name__ == "__main__":
    main()
