"""Stage-level profiler for one or more registered queries.

Runs each query with the bench session + warmup, then dumps per-stage
metrics from the Spark UI REST API (wall, task-time sum, shuffle
bytes, python eval presence) so optimization targets the right stage
(guide §1.1/§7.1). The UI is enabled just for this tool; bench.py and
tests keep it off.

Usage:
    python tools/stageprof.py q359 q360
    SP_SF_DIR=/root/testdata/sf0.1 SP_RUNS=2 python tools/stageprof.py q359
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from owl_etl_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SP_SF_DIR", "/root/testdata/sf0.1")
runs = int(os.environ.get("SP_RUNS", "1"))

spark = get_spark(app_name="stageprof", extra_conf={"spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl

import __spark_entry__ as entrymod  # noqa: E402

qs = entrymod.queries()
by_prefix = {k.split("_")[0]: (k, v) for k, v in qs.items()}

# bench.py warmup shape
spark.read.parquet(f"{sf_dir}/nation.parquet").count()
for t in (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split():
    spark.read.parquet(f"{sf_dir}/{t}.parquet").schema

# Python worker pool warm (mirrors bench.py round-12 warmup); skip
# with SP_COLD=1 to measure cold-start behavior itself.
if os.environ.get("SP_COLD", "") != "1":
    par = spark.sparkContext.defaultParallelism
    ident = lambda it: it  # noqa: E731
    (
        spark.range(par * 8, numPartitions=par)
        .mapInPandas(ident, schema="id bigint")
        .mapInPandas(ident, schema="id bigint")
        .count()
    )

names = sys.argv[1:]
for p in names:
    full, fn = by_prefix[p]
    fn(spark, sf_dir).schema


def stages_after(job_ids):
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
    out = []
    for jid in job_ids:
        j = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs/{jid}"))
        out.extend(j["stageIds"])
    stages = []
    for sid in sorted(set(out)):
        try:
            ss = json.load(
                urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages/{sid}")
            )
        except Exception:
            continue
        for s in ss:
            if s["status"] not in ("COMPLETE", "FAILED"):
                continue
            t0 = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            t1 = s.get("completionTime")
            stages.append(
                {
                    "stage": sid,
                    "name": s["name"].split("\n")[0][:70],
                    "tasks": s["numCompleteTasks"],
                    "wall_hint": f"{t0}..{t1}",
                    "task_time_s": round(s["executorRunTime"] / 1000.0, 2),
                    "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                    "in_mb": round(s["inputBytes"] / 1e6, 1),
                    "sh_read_mb": round(s["shuffleReadBytes"] / 1e6, 2),
                    "sh_write_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
                    "sh_fetch_wait_s": round(s.get("shuffleFetchWaitTime", 0) / 1000.0, 2),
                    "ser_time_s": round(
                        (s.get("executorDeserializeTime", 0)) / 1000.0, 2
                    ),
                }
            )
    return stages


tracker = spark.sparkContext.statusTracker
for p in names:
    full, fn = by_prefix[p]
    for r in range(runs):
        before = set(tracker().getJobIdsForGroup(None) or [])
        spark.sparkContext.setJobDescription(f"stageprof:{full}")
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        after = set(tracker().getJobIdsForGroup(None) or [])
        jobs = sorted(after - before)
        print(f"\n=== {full} run {r+1}: {dt:.3f}s wall, {n} rows, jobs {jobs}")
        for s in stages_after(jobs):
            print("   ", json.dumps(s))
        spark.sparkContext.setJobDescription(None)

spark.stop()
