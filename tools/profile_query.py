"""Per-query cost breakdown for the optimization rounds: where does a
bench second actually go at sf0.1?

For each named query (comma list in argv[1]) runs ITERS (default 3)
iterations of the bench's exact timed region — build (query function
call) + noop-sink execution — and reports the LAST iteration's split,
plus the job count of that iteration:

- build_s:  steady-state Python-side DataFrame construction, including
            any eager probe jobs the constructor runs
- exec_s:   steady-state noop-sink execution of the freshly built plan
- total_s:  build + exec (comparable to the bench's per-rep number)
- jobs:     Spark jobs launched during the last build+exec (broadcast
            jobs, checkpoint materialisations, probes — serial job
            latency is pure fixed overhead at sf0.1)

Usage: python tools/profile_query.py name1,name2,... [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beacon_indexer_spark.plans.queries import QUERIES  # noqa: E402
from beacon_indexer_spark.session import get_spark  # noqa: E402

DEFAULT = (
    "table_counts,top_users,pruned_scan_topk,"
    "dedup_cluster_size_dist,corpus_dup_rate_by_length,"
    "embedding_top_component,dedup_detector_agreement,"
    "doc_length_psi_drift,corpus_minhash_k_sweep,customer_spend_migration"
)


def main() -> None:
    names = (sys.argv[1] if len(sys.argv) > 1 else DEFAULT).split(",")
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="bis-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm like bench.py
    QUERIES["table_counts"](spark, sf_dir).collect()
    st = spark.sparkContext.statusTracker()

    print(f"{'query':42s} {'build':>7s} {'exec':>7s} {'total':>7s} {'jobs':>5s}")
    for name in names:
        fn = QUERIES[name]
        build = ex = 0.0
        jobs = 0
        for _ in range(iters):
            j0 = len(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            j1 = len(st.getJobIdsForGroup(None) or [])
            build, ex, jobs = t1 - t0, t2 - t1, j1 - j0
        print(f"{name:42s} {build:7.3f} {ex:7.3f} {build + ex:7.3f} {jobs:5d}")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
