"""Job-level timeline for one query: runs the bench's timed region
(build + noop exec) with the Spark event log enabled and prints every
job's wall duration, gap from the previous job's end (serial scheduling
overhead / driver-side build time), and first-stage name.

Usage: python tools/joblog_query.py <query> [reps]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beacon_indexer_spark.plans.queries import QUERIES  # noqa: E402
from beacon_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    log_dir = "/tmp/bis_eventlog"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        app_name="bis-joblog",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["table_counts"](spark, sf_dir).collect()
    fn = QUERIES[name]
    # warm reps, then one marked rep
    for _ in range(max(0, reps - 1)):
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.sparkContext.setJobDescription("MARK")
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t_build = time.perf_counter() - t0
    df.write.mode("overwrite").format("noop").save()
    t_total = time.perf_counter() - t0
    spark.stop()

    cands = [p for p in glob.glob(f"{log_dir}/**", recursive=True) if os.path.isfile(p) and "events" in os.path.basename(p)]
    if not cands:
        cands = [p for p in glob.glob(f"{log_dir}/*") if os.path.isfile(p)]
    ev_file = sorted(cands)[-1]
    jobs: dict[int, dict] = {}
    with open(ev_file) as f:
        for line in f:
            e = json.loads(line)
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                desc = (e.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {
                    "start": e["Submission Time"],
                    "desc": desc,
                    "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                    "names": [s.get("Stage Name", "") for s in e.get("Stage Infos", [])],
                }
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"]
    marked = {k: v for k, v in jobs.items() if v.get("desc") == "MARK" and "end" in v}
    print(f"{name}: build={t_build:.3f}s total={t_total:.3f}s, {len(marked)} jobs in final rep")
    prev_end = None
    tsum = gsum = 0.0
    for jid in sorted(marked):
        j = marked[jid]
        dur = (j["end"] - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = j["end"]
        tsum += dur
        gsum += max(0.0, gap)
        first = j["names"][0][:80] if j["names"] else ""
        print(f"  job {jid:4d}  dur={dur:7.3f}s  gap={gap:7.3f}s  {first}")
    print(f"sum(job dur)={tsum:.3f}s  sum(gaps)={gsum:.3f}s")


if __name__ == "__main__":
    main()
