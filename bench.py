"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query executes fully via the no-op sink (plan runs end-to-end,
nothing collected to the driver).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from beacon_indexer_spark.plans.queries import QUERIES  # noqa: E402
from beacon_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bis-bench", master=f"local[{cpus}]")

    # warm the JVM + parquet footers + Python/Arrow workers once (not timed).
    # Subset runs may point at a partial directory (tools/
    # gen_scaled_testdata.py generates only the tables the subset reads),
    # where table_counts' all-table scan would fail — warm with the first
    # selected query instead.
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only_env:
        first = only_env.split(",")[0]
        QUERIES[first](spark, sf_dir).write.mode("overwrite").format("noop").save()
    else:
        QUERIES["table_counts"](spark, sf_dir).collect()
    import pandas as pd

    def _noop(batches):
        for pdf in batches:
            yield pdf

    n_workers = spark.sparkContext.defaultParallelism
    spark.range(0, n_workers * 8, numPartitions=n_workers).mapInPandas(
        _noop, "id long"
    ).collect()
    # steady-state warmup for the drift-canary baselines: the first few
    # timed queries otherwise carry residual JIT/codegen warmup in their
    # loop minima, which the end-of-run canary re-time then reads as
    # "drift" (r6 measured top_users loop-min 2x its end-min on a solo
    # box). Two untimed reps of each canary query settles codegen before
    # the loop starts timing.
    for cname in ("top_users", "events_hourly", "event_type_stats"):
        if not only_env or cname in only_env.split(","):
            if cname in QUERIES:
                for _ in range(2):
                    QUERIES[cname](spark, sf_dir).write.mode(
                        "overwrite"
                    ).format("noop").save()

    # min-of-N per query (default 4): this box shows ±35% run-to-run noise
    # on identical plans — at 2 reps noise masqueraded as regression on
    # eleven queries in round 3; the minimum is the standard steady-state
    # microbenchmark statistic and stays honest (every rep runs the full
    # plan through the no-op sink)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4"))
    # optional subset (comma-separated query names): scale measurements
    # (tools/gen_scaled_testdata.py + SCALE.md) time the expensive tail
    # at bigger SFs without paying for the full surface
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    selected = (
        {k: QUERIES[k] for k in only.split(",") if k} if only else QUERIES
    )
    timings: dict[str, float] = {}
    # every rep's raw time is reported alongside the min, so round-over-
    # round deltas can separate methodology (rep count, run-to-run noise)
    # from real plan change
    rep_times: dict[str, list[float]] = {}
    # per-rep 1-min loadavg sample: two rounds running, the driver's bench
    # run disagreed with quiet-box re-measurement (+7.6% r9, +11.6% r10,
    # both refuted) because cross-run ambient load is invisible to the
    # intra-run canary. A load trace lets the artifact adjudicate itself:
    # samples persistently above ~1.2x the core count mean the box was
    # running MORE than this bench, and round-over-round deltas from the
    # run are unreliable.
    rep_loads: dict[str, list[float]] = {}
    n_cores = os.cpu_count() or 8
    load_limit = 1.2 * n_cores
    load_samples: list[float] = []
    for name, fn in selected.items():
        rep_times[name] = []
        rep_loads[name] = []
        for _ in range(max(1, reps)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            rep_times[name].append(round(time.perf_counter() - t0, 4))
            load1 = os.getloadavg()[0]
            rep_loads[name].append(round(load1, 2))
            load_samples.append(load1)
        timings[name] = min(rep_times[name])

    # drift canary: re-time a few cheap, stable queries AFTER the full
    # loop and compare to their in-loop minima. Rounds 3 and 5 both saw
    # contended driver benches where untouched queries drifted ~1.3×
    # uniformly and environment noise masqueraded as plan regressions —
    # the canary separates the two: large first-vs-last drift on queries
    # whose plans never change means the RUN is contaminated, not the code
    canary_names = [
        n for n in ("top_users", "events_hourly", "event_type_stats")
        if n in selected
    ]
    canary: dict[str, dict[str, float]] = {}
    for name in canary_names:
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            selected[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            times.append(round(time.perf_counter() - t0, 4))
        end_min = min(times)
        loop_min = timings[name]
        canary[name] = {
            "loop_min": loop_min,
            "end_min": end_min,
            "drift": round(end_min / loop_min, 3) if loop_min > 0 else 1.0,
        }
    drift_vals = [c["drift"] for c in canary.values()]
    max_drift = max(drift_vals) if drift_vals else 1.0
    # contention flag: any canary SLOWER at run end than its in-loop min
    # means the box got busier mid-run (the r3/r5 driver-bench failure
    # mode) — round-over-round deltas from this run are unreliable.
    # End-faster-than-loop (drift < 1) is the JVM growing warmer over a
    # 100+-query session — ~0.7-0.95 on sub-second queries even solo
    # (measured) — so it gets its own informational flag, not the
    # contamination flag
    drift_flag = any(d > 1.2 for d in drift_vals)
    warmup_flag = any(d < 1 / 1.2 for d in drift_vals)

    total = round(sum(timings.values()), 4)
    # The headline MUST be the last stdout line and stay short enough for a
    # tail-buffer capture to parse (round 3's line carried the full per-rep
    # arrays inline and was truncated past parseability). Per-rep raw times
    # go to a side file + an earlier stdout line; the final line carries
    # 3-decimal mins only.
    # subset runs (SPARK_GRAFT_BENCH_ONLY) record to a side file so the
    # committed full-surface bench_reps.json can't be clobbered by a
    # scale-measurement run
    reps_name = "bench_reps_subset.json" if only else "bench_reps.json"
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), reps_name),
        "w",
    ) as f:
        json.dump(
            {
                "sf": sf,
                "n_reps": max(1, reps),
                "reps": rep_times,
                "rep_loads": rep_loads,
                "n_cores": n_cores,
                "load_limit": round(load_limit, 2),
                "load_max": round(max(load_samples), 2) if load_samples else 0.0,
                "load_flag": bool(
                    load_samples and max(load_samples) > load_limit
                ),
                "canary": canary,
                "canary_max_drift": max_drift,
                "canary_drift_flag": drift_flag,
                "canary_warmup_flag": warmup_flag,
            },
            f,
        )
    print(json.dumps({"reps": rep_times}))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf,
                "n_reps": max(1, reps),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
