"""Per-query wall-time profiler for the optimization rounds (guide §1).

Runs named registry queries (or the top-N slowest from BENCH_local.json)
against $SPARK_GRAFT_SF_DIR with the noop sink, labelled via
setJobDescription, and reports per-query wall seconds over --runs
repetitions plus the physical-plan shape summary (Exchange count, join
strategies, Python boundary nodes).

Usage: python tools/profile_queries.py [--runs 2] [--explain-dir DIR] q1 q2 ...
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from incubator_flink_spark import get_spark
from incubator_flink_spark.queries import REGISTRY


def plan_summary(df) -> tuple[str, str]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    counts: dict[str, int] = {}
    for node in re.findall(r"^\s*[*+\-\s]*\(?\d*\)?\s*([A-Za-z]+[A-Za-z0-9]*)", txt, re.M):
        counts[node] = counts.get(node, 0) + 1
    keys = [
        "Exchange", "BroadcastExchange", "SortMergeJoin", "BroadcastHashJoin",
        "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
        "BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow",
        "FlatMapGroupsInPandas", "Window", "HashAggregate", "SortAggregate",
        "ObjectHashAggregate", "Sort", "Generate", "InMemoryTableScan",
    ]
    summary = ", ".join(f"{k}={counts[k]}" for k in keys if counts.get(k))
    return summary, txt


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 2
    explain_dir = None
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--explain-dir" in args:
        i = args.index("--explain-dir")
        explain_dir = args[i + 1]
        del args[i : i + 2]
        os.makedirs(explain_dir, exist_ok=True)
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    for name in names:
        fn = REGISTRY[name].fn
        # one warmup at sf0.001 (codegen), one at the measured SF (page cache)
        spark.catalog.clearCache()
        fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        summary, txt = plan_summary(df)
        if explain_dir:
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(txt)
        df.write.mode("overwrite").format("noop").save()
        times = []
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: {times} | {summary}", flush=True)


if __name__ == "__main__":
    main()
