"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Distribution matching for training-data curation: score every raw document
by how much more likely its hashed n-gram features are under a TARGET
corpus (the distribution you want — wiki/books-like text) than under the
RAW corpus it came from, then resample the raw corpus in proportion to
those importance weights (Gumbel top-k). Fills the curation-pipeline slot
the quality/dedup/decontaminate/mixture operators don't: *selecting for a
target distribution* rather than filtering absolute quality.

All public method, re-expressed Spark-first:

- Features are HASHED n-gram counts (unigrams + bigrams → ``n_buckets``
  via the repo-standard salted md5-60 hash) — the DSIR paper's hashed
  generative model, chosen precisely because the bucket vocabulary is
  FIXED: every shuffle in the fit stage is bucket-bounded (≤ n_buckets
  rows), independent of corpus size.
- The bucket log-ratio table is ≤ n_buckets rows → broadcast to the
  per-doc scoring join; the per-doc weight is a sequential left-to-right
  fold over bucket-sorted contributions (engine-reproducible — the same
  determinism convention as every float reduction in this repo).
- The resampling verdict is Gumbel top-k with md5-derived uniforms: no
  RNG state, reproducible across engines and runs; the top-k is a
  TakeOrdered (distributed per-partition top-k + driver merge), never a
  global sort shuffle.

Scale shape at 100 TB: one (doc, bucket) shuffle bounded by docs ×
distinct-buckets-per-doc (≤ n_buckets), one ≤ n_buckets-row aggregation
per corpus, one broadcast join, one TakeOrdered. Nothing is all-pairs and
nothing carries the raw text past the feature explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beacon_indexer_spark.operators.dedup import _md5_long
from beacon_indexer_spark.operators.text import tokens, word_shingles

# fixed salts so Spark and the DuckDB oracle agree byte-for-byte
FEATURE_SALT = 7
GUMBEL_SALT = 11


def hashed_ngram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Per-document hashed n-gram feature counts: (id, bucket, cnt).

    Features are lowercase whitespace unigrams + space-joined bigrams,
    hashed into ``n_buckets`` via md5-60 (salt 7) mod n_buckets. One
    explode + one (id, bucket) groupBy — the shuffle rows are bounded by
    Σ min(doc_ngrams, n_buckets) per doc, and nothing downstream ever
    sees the n-gram strings again."""
    feats = F.concat(
        tokens(F.lower(F.col(text_col))),
        word_shingles(F.col(text_col), 2),
    )
    return (
        df.select(
            F.col(id_col).alias("id"), F.explode(feats).alias("__ng")
        )
        .select(
            "id", (_md5_long(F.col("__ng"), FEATURE_SALT) % n_buckets).alias("bucket")
        )
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def dsir_bucket_logratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = 256,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-bucket importance log-ratio ``log p_target(b) − log p_raw(b)``
    with add-``smoothing`` estimates over the fixed bucket vocabulary:
    (bucket, log_ratio). Missing buckets get the smoothed floor on the
    side they're missing from (full outer join over ≤ n_buckets rows).

    Every aggregate here is bucket-bounded: two ≤ n_buckets-row groupBys;
    the two single-row totals attach via broadcast crossJoin (the same
    one-row-constant move as `doc_unigram_logprob`), so no window and no
    global sort appears anywhere in the fit."""
    t = target_counts.groupBy("bucket").agg(
        F.sum("cnt").cast("double").alias("__c_t")
    )
    r = raw_counts.groupBy("bucket").agg(
        F.sum("cnt").cast("double").alias("__c_r")
    )
    tt = t.agg(F.sum("__c_t").alias("__T_t"))
    tr = r.agg(F.sum("__c_r").alias("__T_r"))
    s = float(smoothing)
    b = float(n_buckets)
    joined = (
        t.join(r, "bucket", "full_outer")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
    )
    log_p = F.log(
        (F.coalesce(F.col("__c_t"), F.lit(0.0)) + F.lit(s))
        / (F.col("__T_t") + F.lit(s * b))
    )
    log_q = F.log(
        (F.coalesce(F.col("__c_r"), F.lit(0.0)) + F.lit(s))
        / (F.col("__T_r") + F.lit(s * b))
    )
    return joined.select(
        "bucket", (log_p - log_q).alias("log_ratio")
    )


def dsir_log_weights(
    doc_counts: DataFrame, bucket_logratio: DataFrame
) -> DataFrame:
    """Per-document importance log-weight: (id, n_feat, log_weight) where
    ``log_weight = Σ_b cnt_b · log_ratio_b`` folded sequentially over
    bucket-sorted contributions (array_sort on the struct's leading
    ``bucket`` field → left-to-right F.aggregate), so the float sum is
    order-independent and engine-reproducible. The log-ratio side is
    ≤ n_buckets rows → broadcast."""
    contrib = doc_counts.join(F.broadcast(bucket_logratio), "bucket").select(
        "id",
        "cnt",
        F.struct(
            F.col("bucket").alias("b"),
            (F.col("cnt").cast("double") * F.col("log_ratio")).alias("x"),
        ).alias("__bx"),
    )
    per_doc = contrib.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_feat"),
        F.array_sort(F.collect_list("__bx")).alias("__bxs"),
    )
    folded = F.aggregate(
        F.col("__bxs"),
        F.lit(0.0).cast("double"),
        lambda acc, s: acc + s["x"],
    )
    return per_doc.select("id", "n_feat", folded.alias("log_weight"))


def gumbel_key(log_weight: Column, id_col: Column) -> Column:
    """Gumbel-max resampling key ``log w + g`` with ``g = −ln(−ln(u))``
    and ``u = (md5_60(id, salt 11) + 0.5) / 2^60`` — deterministic
    uniforms from the id, so the sample is reproducible with no RNG
    state and identical in the DuckDB oracle. Taking the top-k keys
    draws k documents without replacement with probability ∝ weight
    (the Gumbel top-k trick)."""
    u = (
        _md5_long(id_col.cast("string"), GUMBEL_SALT).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**60))
    return log_weight + -F.log(-F.log(u))


def dsir_resample(
    weights: DataFrame, keep_k: int, id_col: str = "id"
) -> DataFrame:
    """Importance-resampled keep verdict: (id, keep) — keep=true for the
    ``keep_k`` documents with the largest Gumbel keys. The top-k is an
    orderBy+limit (TakeOrderedAndProject: per-partition top-k, driver
    merge — no global sort shuffle) on (rounded key desc, id), a total
    order shared with the oracle; the flag attaches via a broadcast
    left-semi-shaped join on the ≤ keep_k winners."""
    keyed = weights.select(
        F.col(id_col).alias("id"),
        F.round(gumbel_key(F.col("log_weight"), F.col(id_col)), 6).alias(
            "__gk"
        ),
    )
    winners = (
        keyed.orderBy(F.desc("__gk"), F.asc("id"))
        .limit(keep_k)
        .select("id", F.lit(True).alias("keep"))
    )
    return (
        weights.withColumnRenamed(id_col, "id")
        .join(F.broadcast(winners), "id", "left")
        .select(
            "id", "n_feat", "log_weight",
            F.coalesce(F.col("keep"), F.lit(False)).alias("keep"),
        )
    )
