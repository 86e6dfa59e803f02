"""Streaming heavy-hitters monitor: a mergeable Misra–Gries (space-saving)
summary maintained across micro-batches.

The reference has nothing like this (its pipeline counts exactly in
ClickHouse); a training-data ingest loop needs the frequency read — "which
sources/keys dominate what I ingested so far" — continuously and in
bounded space, not as a post-hoc batch groupBy over the whole corpus. The
fourth streaming monitor family next to drift (drift.py), smoothing
(stateful.py holt_stream) and dedup (stateful.py dedup_stream).

Algorithm: the merge rule from Agarwal et al., "Mergeable Summaries"
(PODS'12) — Misra–Gries and space-saving are isomorphic, and MG summaries
merge by (1) summing counts key-wise, (2) subtracting the (capacity+1)-th
largest count d from every entry, (3) dropping non-positive entries. The
deterministic guarantee survives any merge tree:

    true_count - D  <=  cnt  <=  true_count        (D = sum of all d)

so every key with true frequency > D (in particular > N/(capacity+1)) is
GUARANTEED present. Per-entry `err` carries the key's own upper-bound
slack (true <= cnt + err); `d_total` is the global D, stamped on every
row so the summary is one self-contained relation.

Scale: per micro-batch the exact per-key counts are one map-side-combined
groupBy over the batch; the eviction threshold d is a top-(capacity+1)
TakeOrderedAndProject (map-side partial top-k per partition, one
(capacity+1)-row reduce — never a global ranking window, so the same code
is safe on the BATCH path where the merge frame is full key cardinality);
the subtract-and-drop is a narrow map under a one-row broadcast. State
lives in a parquet the
caller read-modify-writes inside foreachBatch; no arbitrary-cardinality
state store. In the no-eviction regime (d never > 0) the summary IS the
exact count table and matches the batch groupBy byte-for-byte
(tests/test_stateful_stream.py asserts both regimes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUMMARY_SCHEMA = "key string, cnt long, err long, d_total long"


def mg_merge(
    summary: DataFrame | None,
    batch: DataFrame,
    key_col: str,
    capacity: int,
) -> DataFrame:
    """Merge one micro-batch into a Misra–Gries summary of at most
    ``capacity`` keys. `summary` is a prior mg_merge result (or None for
    the first batch); `batch` is the raw micro-batch. Returns the new
    summary (key, cnt, err, d_total) — at most ``capacity`` rows, keys
    cast to string (monitor keys, not join keys)."""
    counts = batch.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    if summary is None:
        merged = counts.select(
            "key", "cnt", F.lit(0).cast("long").alias("err")
        )
        d0 = batch.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("__d0")
        )
    else:
        d0 = summary.agg(
            F.coalesce(F.max("d_total"), F.lit(0)).cast("long").alias("__d0")
        )
        # full outer key-merge: counts add; a key new to the summary may
        # have been evicted before with up to D_old undercount -> its err
        # starts at D_old (the deterministic upper-bound slack)
        merged = (
            summary.select("key", "cnt", "err")
            .withColumnRenamed("cnt", "__sc")
            .withColumnRenamed("err", "__se")
            .join(counts.withColumnRenamed("cnt", "__bc"), "key", "full_outer")
            .crossJoin(F.broadcast(d0))
            .select(
                "key",
                (
                    F.coalesce("__sc", F.lit(0)) + F.coalesce("__bc", F.lit(0))
                ).cast("long").alias("cnt"),
                F.when(F.col("__se").isNotNull(), F.col("__se"))
                .otherwise(F.col("__d0"))
                .cast("long")
                .alias("err"),
            )
        )
    # d = (capacity+1)-th largest count (0 when everything fits): subtract
    # from every entry, drop the non-positive — the PODS'12 merge step.
    # TakeOrderedAndProject (orderBy+limit), never a global row_number
    # window: the merged frame is summary ∪ batch-distinct, which on the
    # BATCH path is full key cardinality — a single-task window there is
    # the textbook scale-killer, while top-(capacity+1) is map-side.
    top = merged.orderBy(F.desc("cnt"), F.asc("key")).limit(capacity + 1)
    d = top.agg(
        F.coalesce(
            F.when(F.count(F.lit(1)) == capacity + 1, F.min("cnt")),
            F.lit(0),
        ).cast("long").alias("__d")
    )
    return (
        merged.crossJoin(F.broadcast(d))
        .crossJoin(F.broadcast(d0))
        .filter(F.col("cnt") > F.col("__d"))
        .select(
            "key",
            (F.col("cnt") - F.col("__d")).cast("long").alias("cnt"),
            (F.col("err") + F.col("__d")).cast("long").alias("err"),
            (F.col("__d0") + F.col("__d")).cast("long").alias("d_total"),
        )
    )


def heavy_hitters(summary: DataFrame, k: int = 10) -> DataFrame:
    """Top-k monitor view of an mg_merge summary: (rank, key, cnt_low,
    cnt_high) — cnt_low is the guaranteed lower bound, cnt_high = cnt +
    err the deterministic upper bound. Rank by lower bound, key asc
    tie-break (engine-stable)."""
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        summary.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("rank").cast("long").alias("rank"),
            "key",
            F.col("cnt").alias("cnt_low"),
            (F.col("cnt") + F.col("err")).cast("long").alias("cnt_high"),
        )
    )
