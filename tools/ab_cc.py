"""Interleaved same-JVM A/B of connected_components variants on the
LSH→CC spine queries: alternate operators.dedup._CC_BROADCAST_EXTRA_JUMPS
between two values (default 0 vs the module default) across N rep pairs
of the bench's exact timed region and report per-variant medians.
Interleaving inside ONE JVM cancels JVM-aging noise (the ab_spread.py
methodology, r12).

Usage: python tools/ab_cc.py name1,name2,... [pairs=5] [a=0] [b=2]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beacon_indexer_spark.operators import dedup as D  # noqa: E402
from beacon_indexer_spark.plans import queries as Q  # noqa: E402
from beacon_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    val_a = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    val_b = int(sys.argv[4]) if len(sys.argv) > 4 else D._CC_BROADCAST_EXTRA_JUMPS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="bis-ab-cc", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    Q.QUERIES["table_counts"](spark, sf_dir).collect()

    def run(name: str, jumps: int) -> float:
        D._CC_BROADCAST_EXTRA_JUMPS = jumps
        t0 = time.time()
        df = Q.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    default = D._CC_BROADCAST_EXTRA_JUMPS
    print(f"{'query':40s} {'j=' + str(val_a):>8s} {'j=' + str(val_b):>8s} {'delta':>7s}")
    try:
        for name in names:
            run(name, val_a); run(name, val_b)  # warm both plans
            ta, tb = [], []
            for _ in range(pairs):
                ta.append(run(name, val_a))
                tb.append(run(name, val_b))
            ma, mb = statistics.median(ta), statistics.median(tb)
            print(f"{name:40s} {ma:8.3f} {mb:8.3f} {mb-ma:+7.3f}")
    finally:
        D._CC_BROADCAST_EXTRA_JUMPS = default


if __name__ == "__main__":
    main()
