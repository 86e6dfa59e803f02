"""Mergeable distinct/frequency sketches: HyperLogLog and count-min.

The reference counts exactly in ClickHouse; a 100-TB ingest loop needs
bounded-state estimates it can MERGE — across partitions, across
micro-batches, across days — without re-scanning the corpus. Both
sketches here are merge-closed relations:

- HyperLogLog registers merge by per-register MAX (the merge is lossless:
  registers of the union == max of registers, so the streaming estimate is
  byte-identical to the batch one — tests assert exactly that).
- Count-min cells merge by per-cell SUM (again lossless vs one-shot).

Engine-determinism: hashes are the repo's salted md5-60bit family, the
HLL harmonic sum accumulates as Σ 2^(55-M) in a LONG (exact, order-free)
with ONE double division at the end, and count-min cells are exact
integer counts — a DuckDB oracle replays everything bit-for-bit
(plans/queries.py events_user_hll / events_type_countmin).

Scale: register/cell construction is a narrow map + a groupBy bounded by
m (HLL) or depth×width (count-min) — the shuffle moves sketch cells,
never corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beacon_indexer_spark.operators.dedup import _md5_long

HLL_M = 64  # registers (p = 6); md5-60bit leaves a 54-bit pattern
HLL_ALPHA_NUM = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M
HLL_POW = float(2 ** 55)

CM_DEPTH = 4
CM_WIDTH = 64


def hll_registers(batch: DataFrame, key_col: str, salt: int = 91) -> DataFrame:
    """(j, m) HLL registers of one batch: j = low-6-bit bucket of the
    salted md5-60bit hash, m = max leading-zero rank of the remaining
    54-bit pattern (w=0 reads rank 55). Missing registers are implicit
    zeros — `hll_estimate` densifies against the 64-row spine."""
    hashed = batch.select(
        _md5_long(F.col(key_col).cast("string"), salt).alias("__h")
    )
    return (
        hashed.select(
            (F.col("__h") % HLL_M).alias("j"),
            F.shiftright("__h", 6).alias("__w"),
        )
        .select(
            "j",
            F.when(F.col("__w") == 0, F.lit(55))
            .otherwise(F.lit(55) - F.length(F.bin("__w")))
            .cast("long")
            .alias("m"),
        )
        .groupBy("j")
        .agg(F.max("m").alias("m"))
    )


def hll_merge(summary: DataFrame | None, registers: DataFrame) -> DataFrame:
    """Merge a batch's registers into the running summary: per-register
    MAX — the lossless HLL merge (max of maxes == max of the union)."""
    if summary is None:
        return registers
    return (
        summary.unionByName(registers).groupBy("j").agg(F.max("m").alias("m"))
    )


def hll_estimate(summary: DataFrame) -> DataFrame:
    """One row (n_zero_registers, hll_estimate) from a register summary:
    the FFGM raw estimator with the small-range (linear counting)
    correction; harmonic sum as an exact integer Σ 2^(55-M)."""
    spine = summary.sparkSession.range(HLL_M).select(
        F.col("id").alias("j")
    )
    full = spine.join(summary, "j", "left").select(
        F.coalesce("m", F.lit(0)).cast("long").alias("m")
    )
    acc = full.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - m AS INT))"))
        .cast("long")
        .alias("__si"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_registers"),
    )
    raw = F.lit(HLL_ALPHA_NUM) / (
        F.col("__si").cast("double") / F.lit(HLL_POW)
    )
    est = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("n_zero_registers") > 0),
        F.lit(float(HLL_M))
        * F.log(
            F.lit(float(HLL_M)) / F.col("n_zero_registers").cast("double")
        ),
    ).otherwise(raw)
    return acc.select(
        "n_zero_registers", F.round(est, 4).alias("hll_estimate")
    )


BK_K = 256


def bottomk_sample(
    batch: DataFrame,
    value_col: str,
    id_col: str,
    k: int = BK_K,
    salt: int = 47,
) -> DataFrame:
    """(pri, value) bottom-k priority sample: the k rows whose salted
    md5(id) is smallest — a uniform k-row sample with NO RNG state
    (md5 order is a fixed total order on ids), gathered by a
    TakeOrderedAndProject (map-side partial top-k, never a global sort).
    Bottom-k is merge-closed: the k smallest of a union are the k
    smallest of the merged bottom-k's, so streaming accumulation is
    lossless (asserted in tests)."""
    pri = _md5_long(F.col(id_col).cast("string"), salt)
    return (
        batch.select(
            pri.alias("pri"),
            F.col(value_col).cast("double").alias("value"),
        )
        .orderBy(F.asc("pri"))
        .limit(k)
    )


def bottomk_merge(
    summary: DataFrame | None, sample: DataFrame, k: int = BK_K
) -> DataFrame:
    """Merge a batch's bottom-k into the running summary: union, dedup
    redelivered ids by priority, keep the k smallest — the lossless
    bottom-k merge."""
    if summary is None:
        return sample
    return (
        summary.unionByName(sample)
        .groupBy("pri")
        .agg(F.min("value").alias("value"))
        .orderBy(F.asc("pri"))
        .limit(k)
    )


def cm_cells(
    batch: DataFrame,
    key_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """(row, col, n) count-min cells of one batch: depth salted hash rows,
    width columns, exact integer counts. ONE md5 per (key, row) — rows
    are salt-indexed, so the sketch is engine-reproducible."""
    keyed = batch.select(F.col(key_col).cast("string").alias("__k")).select(
        "__k",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    return (
        keyed.select(
            "row",
            (
                _md5_long(
                    F.concat(
                        F.col("row").cast("string"), F.lit("|"), F.col("__k")
                    ),
                    23,
                )
                % width
            ).alias("col"),
        )
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cm_merge(summary: DataFrame | None, cells: DataFrame) -> DataFrame:
    """Merge batch cells into the running sketch: per-cell SUM (lossless
    vs a one-shot build over the union)."""
    if summary is None:
        return cells
    return (
        summary.unionByName(cells)
        .groupBy("row", "col")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def cm_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point estimates for `keys`: min over the depth cells each key
    hashes to — the count-min upper-bias guarantee (est >= true;
    est <= true + eps·N w.h.p.). The sketch is depth×width rows —
    broadcast; keys map narrowly onto (row, col) probes."""
    probes = keys.select(F.col(key_col).cast("string").alias("key")).select(
        "key",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select(
        "key",
        "row",
        (
            _md5_long(
                F.concat(F.col("row").cast("string"), F.lit("|"), F.col("key")),
                23,
            )
            % width
        ).alias("col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("cm_estimate"))
    )
