"""Interleaved A/B for the 10x SCALE TIER (VERDICT r11 Next-round #3):
the headline paired protocol (tools/ab_bench.py) adjudicates sf0.1
moves, but tier walls had only single samples — r11's q310 23.9->32.9s
(1.38x) was unfalsifiable. This runs ONE arm sample: build the
deterministic 10x tier with the TREE'S OWN bench._build_scale_tier,
run the five heaviest tier families, print one JSON line. Drive it
alternately against HEAD and a prior round's `git archive` tree
(H,R,H,R,H,R), then judge on min-vs-min per query — same noise rule as
the headline protocol (<1.15x is noise unless reproduced).

Usage:
    python tools/scale_ab.py <tree> [>> runs.jsonl]
    AB_SF_DIR=/root/testdata/sf0.1 python tools/scale_ab.py <tree>
"""
import json
import os
import shutil
import sys
import tempfile
import time

TREE = os.path.abspath(sys.argv[1])
sys.path.insert(0, TREE)
os.chdir(TREE)

#: the heaviest tier families (r11 sidecar walls: q358 51.9s, q310
#: 32.9s, q345 27.0s, q29 19.5s, q296 8.6s) — the set where a real
#: tier regression would land
HEAVY = [
    "q29_ngram_jaccard_pairs",
    "q296_incremental_lsh_dedup",
    "q310_copurchase_betweenness",
    "q345_doc_repetition_profile",
    "q358_store_catalog_endurance",
]

from owl_etl_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="scale-ab")
spark.sparkContext.setLogLevel("ERROR")

import bench as benchmod  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

work = tempfile.mkdtemp(prefix="scale_ab_")
try:
    t0 = time.perf_counter()
    benchmod._build_scale_tier(spark, sf_dir, 10, work)
    gen_s = round(time.perf_counter() - t0, 3)

    qs = entrymod.queries()
    for name in HEAVY:  # analyzer warm, as the headline protocol does
        qs[name](spark, work).schema

    timings = {}
    total = 0.0
    for name in HEAVY:
        t0 = time.perf_counter()
        n = qs[name](spark, work).count()
        dt = time.perf_counter() - t0
        timings[name.split("_")[0]] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "tree": TREE,
                "tier": "10x",
                "gen_s": gen_s,
                "total": round(total, 2),
                "queries": timings,
            }
        )
    )
finally:
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
