"""Per-job trace of one registry row via the local Spark UI REST API:
runs the row warm once, then lists every job it submitted with name,
duration, and task count — the targeting tool for driver-round-trip
removal. Usage: python scripts/jobtrace_r13.py <row>
"""
import json
import os
import sys
import time
import urllib.request


def main():
    from flechasdb_spark.queries import REGISTRY
    from flechasdb_spark.session import get_spark

    name = sys.argv[1]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="jobtrace_r13")
    sc = spark.sparkContext
    spark.read.parquet(f"{sf}/embeddings.parquet").count()
    fn = REGISTRY[name]
    fn(spark, sf).collect()  # warm-up
    sc.setJobGroup("traced", name)
    t0 = time.perf_counter()
    fn(spark, sf).collect()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    jobs = sorted(sc.statusTracker().getJobIdsForGroup("traced"))
    ui = sc.uiWebUrl
    app = sc.applicationId
    data = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs")
    )
    byid = {j["jobId"]: j for j in data}
    total = 0.0
    print(f"row={name} wall={wall:.3f}s jobs={len(jobs)}")
    for jid in jobs:
        j = byid.get(jid)
        if not j:
            continue
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        st = datetime.strptime(j["submissionTime"], fmt)
        ct = datetime.strptime(j["completionTime"], fmt)
        dur = (ct - st).total_seconds()
        total += dur
        print(
            f"  job {jid}: {dur*1000:7.0f}ms tasks={j['numTasks']:4d} "
            f"{j['name'][:110]}"
        )
    print(f"sum_job_time={total:.3f}s (gaps = driver-side work)")
    spark.stop()


if __name__ == "__main__":
    main()
