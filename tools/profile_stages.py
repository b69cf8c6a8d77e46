"""Stage-level profiler for optimization rounds (guide §1, §7.1).

Runs named registry queries with the noop sink under a Spark session
that writes an event log, then parses the log to attribute wall time to
stages (with their callsite names) and jobs.  This substitutes for the
Spark UI (disabled on the harness): it answers "which exchange/scan/
python stage is the time going to" per query.

Usage:
  python tools/profile_stages.py [--fast] [--runs 1] q1 q2 ...

--fast sets SPARK_GRAFT_BENCH_FAST=1 (the extras-bench condition).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    args = sys.argv[1:]
    runs = 1
    if "--fast" in args:
        args.remove("--fast")
        os.environ["SPARK_GRAFT_BENCH_FAST"] = "1"
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from pyspark.sql import SparkSession

    from incubator_flink_spark.session import get_spark  # config parity

    # same config as get_spark() plus the event log
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    builder = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("profile_stages")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark_graft_local"))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from incubator_flink_spark.queries import REGISTRY

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

    # warmup at sf0.001 (codegen/JVM), then measured run(s) with markers
    spans: dict[str, tuple[float, float]] = {}
    for name in names:
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
    for name in names:
        spark.catalog.clearCache()
        best = None
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"PROFILE:{name}:run{r}")
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            t1 = time.time()
            if best is None or (t1 - t0) < (best[1] - best[0]):
                best = (t0, t1)
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
        spans[name] = best
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log (file, or Spark-4 rolling dir eventlog_v2_<app>)
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(EVDIR) if app_id in p]
        path = os.path.join(EVDIR, cands[0])
    if os.path.isdir(path):
        lines: list[str] = []
        for part in sorted(os.listdir(path)):
            if part.startswith("events"):
                with open(os.path.join(path, part)) as f:
                    lines.extend(f)
    else:
        with open(path) as f:
            lines = list(f)
    jobs: list[dict] = []
    stages: dict[int, dict] = {}
    job_desc: dict[int, str] = {}
    task_metrics: dict[int, dict] = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_desc[jid] = ev.get("Properties", {}).get("spark.job.description", "")
                jobs.append({"id": jid, "t0": ev["Submission Time"] / 1000.0,
                             "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])]})
            elif e == "SparkListenerJobEnd":
                for j in jobs:
                    if j["id"] == ev["Job ID"]:
                        j["t1"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                agg = task_metrics.setdefault(sid, {"run": 0.0, "cpu": 0.0, "deser": 0.0, "gc": 0.0, "ser": 0.0, "srows": 0, "n": 0})
                agg["run"] += m.get("Executor Run Time", 0) / 1000.0
                agg["cpu"] += m.get("Executor CPU Time", 0) / 1e9
                agg["deser"] += m.get("Executor Deserialize Time", 0) / 1000.0
                agg["gc"] += m.get("JVM GC Time", 0) / 1000.0
                agg["ser"] += m.get("Result Serialization Time", 0) / 1000.0
                agg["srows"] += (m.get("Shuffle Read Metrics") or {}).get("Total Records Read", 0)
                agg["n"] += 1
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except json.JSONDecodeError:
                            nm = ""
                        if nm and (not scopes or scopes[-1] != nm):
                            scopes.append(nm)
                stages[si["Stage ID"]] = {
                    "id": si["Stage ID"],
                    "name": si.get("Stage Name", ""),
                    "dur": (com - sub) / 1000.0 if sub and com else 0.0,
                    "t0": (sub or 0) / 1000.0,
                    "tasks": si.get("Number of Tasks", 0),
                    "scopes": ",".join(scopes[:12]),
                }

    for name in names:
        t0, t1 = spans[name]
        print(f"\n=== {name}: wall {t1 - t0:.3f}s ===")
        q_jobs = [j for j in jobs if j.get("t1") and j["t0"] >= t0 - 0.05 and j["t1"] <= t1 + 0.05
                  and job_desc.get(j["id"], "").startswith(f"PROFILE:{name}")]
        gap_prev = t0
        tot_job = 0.0
        for j in sorted(q_jobs, key=lambda x: x["t0"]):
            gap = j["t0"] - gap_prev
            gap_prev = j["t1"]
            tot_job += j["t1"] - j["t0"]
            print(f"  job {j['id']:>4}  {j['t1'] - j['t0']:7.3f}s  (+{gap:5.2f}s gap)")
            st = [stages[s] for s in j["stages"] if s in stages]
            for s in sorted(st, key=lambda x: -x["dur"])[:4]:
                nm = s["name"].split("\n")[0][:40]
                tm = task_metrics.get(s["id"], {})
                mtxt = (f"run={tm.get('run',0):.2f} cpu={tm.get('cpu',0):.2f} deser={tm.get('deser',0):.2f} "
                        f"gc={tm.get('gc',0):.2f} srows={tm.get('srows',0)}" if tm else "")
                print(f"       stage {s['dur']:7.3f}s  tasks={s['tasks']:<4} {mtxt} [{s.get('scopes','')}]")
        print(f"  sum(job wall)={tot_job:.3f}s; driver gaps={t1 - t0 - tot_job:.3f}s; jobs={len(q_jobs)}")


if __name__ == "__main__":
    main()
