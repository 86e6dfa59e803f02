"""Distinct-count sketching (KMV — k minimum values).

Exact COUNT(DISTINCT x) shuffles every distinct value; at 100 TB the
distinct frame of a high-cardinality column (shingles, URLs, n-grams) is
itself terabytes. The KMV estimator [Bar-Yossef et al. 2002] keeps only
the k smallest hash values per group: if the kth smallest of a uniform
hash over D distinct values is h_k, then D ≈ (k-1) * H / h_k for hash
space [0, H).

Spark has `approx_count_distinct` (HLL++), but its binary sketch is not
reproducible across engines, so it can't be oracle-checked. This KMV is
md5-deterministic: the DuckDB oracle reproduces the estimate BIT FOR BIT,
and the same property makes pipeline reruns stable.

Scale design — the trick is getting the k minima WITHOUT shuffling all
distinct values: a narrow pre-filter `hash < H * prefilter` drops all but
~D*prefilter candidate rows before any shuffle (the k minima survive it
whenever D*prefilter >> k). Survivors are deduplicated and ranked with a
partitioned window — a frame ~D*prefilter rows, prefilter× cheaper than
the exact distinct. If a group has fewer than k survivors, every surviving
hash is below the cutoff, so the survivor count IS a distinct-sample
count and `n_survivors / prefilter` is the standard distinct-sampling
estimate — both branches are closed-form and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from beacon_indexer_spark.operators.dedup import _md5_long

# 60-bit hash space (md5 prefix via conv(); see dedup._md5_long)
_H = 2**60
_KMV_SALT = 7


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
    prefilter_denom: int = 16,
) -> DataFrame:
    """Per-group KMV distinct-count estimate over `key_col`.

    Returns (group, n_kept, kth_hash, distinct_est):
      - n_kept == k      → estimate (k-1) * H / h_k  (KMV proper)
      - n_kept <  k      → estimate n_kept * prefilter_denom (the cutoff
                           acted as a 1/prefilter_denom distinct-sample)
    Estimates are double arithmetic over exactly-agreed integers, so the
    oracle matches bit-for-bit. kth_hash is NULL on the sampling branch.
    """
    cutoff = _H // prefilter_denom
    surv = (
        df.select(
            F.col(group_col).alias("grp"),
            _md5_long(F.col(key_col).cast("string"), _KMV_SALT).alias("__h"),
        )
        .filter(F.col("__h") < F.lit(cutoff))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("__h")
    kept = surv.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= k
    )
    agg = kept.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__h").alias("__maxh"),
    )
    full = F.col("n_kept") == k
    kth = F.when(full, F.col("__maxh"))
    est = F.when(
        full,
        F.lit(float(k - 1)) * (F.lit(float(_H)) / F.col("__maxh").cast("double")),
    ).otherwise(F.col("n_kept").cast("double") * F.lit(float(prefilter_denom)))
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_kept").cast("long").alias("n_kept"),
        kth.cast("long").alias("kth_hash"),
        F.round(est, 4).alias("distinct_est"),
    )
