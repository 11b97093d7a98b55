#!/usr/bin/env python
"""Per-query job/stage profiler (guide §1: measure first).

Runs named registry queries in one warm session with the UI enabled,
forces each result exactly the way bench.py does (hash-force of every
column), and prints a per-job breakdown scraped from the UI REST API —
wall time, stage names, task time, shuffle read/write bytes, input
bytes — plus the gap between SQL-visible job time and the query's
wall-clock (= driver-side planning/codegen/materialize overhead).

Usage: python tools/profile_query.py name1 [name2 ...] [--repeat N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import pandas as pd  # noqa: F401  (pandas_udf hints resolve by name)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    os.environ["SPARK_UI"] = "true"
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = 2
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    from pyspark.sql import functions as F

    from audience_manager_platform_spark import registry
    from audience_manager_platform_spark.session import get_spark

    spark = get_spark("profile")
    queries = registry.queries()
    spark.range(1000).count()  # warm

    @F.pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(3200, numPartitions=32).select(
        _warm(F.col("id").cast("double"))
    ).count()

    app_id = spark.sparkContext.applicationId
    for name in args:
        fn = queries[name]
        for it in range(repeat):
            jobs_before = {j["jobId"] for j in _api(f"applications/{app_id}/jobs")}
            spark.sparkContext.setJobGroup(name, name)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t_plan = time.perf_counter() - t0
            df.select(F.xxhash64(F.struct(*df.columns)).alias("_h")).agg(
                F.count("*").alias("n"), F.expr("bit_xor(_h)")
            ).collect()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            time.sleep(0.3)
            jobs = [
                j
                for j in _api(f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            tot_job = 0.0
            rows = []
            for j in jobs:
                sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                try:
                    comp = time.strptime(
                        j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                    )
                    dur = time.mktime(comp) - time.mktime(sub) + (
                        int(j["completionTime"][20:23])
                        - int(j["submissionTime"][20:23])
                    ) / 1000.0
                except (KeyError, ValueError):
                    dur = float("nan")
                tot_job += dur
                rows.append(
                    (
                        j["jobId"],
                        dur,
                        j["numTasks"],
                        (j.get("description") or j["name"])[:90],
                    )
                )
            print(
                f"\n=== {name} run{it}: wall {wall:.2f}s  plan-construct "
                f"{t_plan:.2f}s  sum(job_wall) {tot_job:.2f}s  "
                f"njobs {len(jobs)}"
            )
            for jid, dur, nt, desc in rows:
                print(f"  job {jid:4d}  {dur:6.2f}s  {nt:5d}t  {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
