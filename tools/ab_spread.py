"""Interleaved same-JVM A/B of the keyed-spread (`by=`) plans vs the
unspread baseline: for each named query, alternate
queries._SPREAD_BY_ENABLED False/True across N rep pairs of the bench's
exact timed region (build + noop sink) and report per-variant medians.
Interleaving inside ONE JVM cancels the JVM-aging noise that dominates
cross-process min-of-4 comparisons at sub-2 s query scale.

Usage: python tools/ab_spread.py name1,name2,... [pairs=5]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beacon_indexer_spark.plans import queries as Q  # noqa: E402
from beacon_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="bis-ab-spread", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    Q.QUERIES["table_counts"](spark, sf_dir).collect()

    def run(name: str, enabled: bool) -> float:
        Q._SPREAD_BY_ENABLED = enabled
        t0 = time.time()
        df = Q.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    print(f"{'query':42s} {'base':>7s} {'keyed':>7s} {'delta':>7s}")
    # try/finally: an exception mid-loop must not leave the module flag
    # False for a caller that imported Q and reuses it after this run
    try:
        for name in names:
            run(name, False); run(name, True)  # warm both plans
            base, keyed = [], []
            for _ in range(pairs):
                base.append(run(name, False))
                keyed.append(run(name, True))
            mb, mk = statistics.median(base), statistics.median(keyed)
            print(f"{name:42s} {mb:7.3f} {mk:7.3f} {mk-mb:+7.3f}")
    finally:
        Q._SPREAD_BY_ENABLED = True


if __name__ == "__main__":
    main()
