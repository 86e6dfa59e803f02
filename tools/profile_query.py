"""Per-query cost breakdown for the optimization rounds: where does a
bench second actually go at sf0.1?

For each named query (comma list in argv[1], default a representative
sample) reports, from a warm JVM:

- build_s:   Python-side DataFrame construction (query function call)
- plan_s:    analysis + optimization + physical planning (explain cost)
- exec_s:    noop-sink execution of a freshly built plan
- jobs:      Spark jobs launched by the exec (probe/checkpoint jobs show
             up here — they are part of the timed region in bench.py)
- second_s:  a SECOND noop execution of another freshly built plan —
             separates one-time codegen/JIT cost from steady-state cost

Usage: python tools/profile_query.py [name1,name2,...]
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="bis-profile", master=f"local[{cpus}]")
    # warm like bench.py
    QUERIES["table_counts"](spark, sf_dir).collect()
    st = spark.sparkContext.statusTracker()

    print(f"{'query':42s} {'build':>7s} {'plan':>7s} {'exec':>7s} "
          f"{'jobs':>5s} {'second':>7s}")
    for name in names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        import contextlib
        import io

        with contextlib.redirect_stdout(io.StringIO()):
            df.explain("formatted")  # forces analysis+optimization+planning
        t2 = time.perf_counter()
        j0 = len(st.getJobIdsForGroup(None) or [])
        # rebuild so the probe jobs (run during construction) are charged
        # to build_s, and exec_s times a fresh plan like bench.py does
        sys.stdout.flush()
        t3 = time.perf_counter()
        df2 = fn(spark, sf_dir)
        df2.write.mode("overwrite").format("noop").save()
        t4 = time.perf_counter()
        j1 = len(st.getJobIdsForGroup(None) or [])
        df3 = fn(spark, sf_dir)
        df3.write.mode("overwrite").format("noop").save()
        t5 = time.perf_counter()
        print(
            f"{name:42s} {t1 - t0:7.3f} {t2 - t1:7.3f} {t4 - t3:7.3f} "
            f"{j1 - j0:5d} {t5 - t4:7.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
