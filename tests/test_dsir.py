"""DSIR importance-resampling tests: a planted distribution shift must be
recovered (target-like docs get higher weights and dominate the keep set),
and the machinery must stay deterministic and bucket-bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from beacon_indexer_spark.operators import dsir as DS


def _corpus(spark):
    """60 docs: 30 'sciency' (target-like), 30 'spammy'. The target sample
    is a disjoint set of 10 extra sciency docs — so target vocabulary
    overlaps the sciency half and not the spammy half."""
    sci = "the experiment measured quantum decay rates in the detector array"
    spam = "click here buy now free prize winner claim your reward today"
    rows = []
    for i in range(30):
        rows.append((i, f"{sci} run {i % 5}"))
    for i in range(30, 60):
        rows.append((i, f"{spam} offer {i % 5}"))
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(1000 + i, f"{sci} trial {i % 3}") for i in range(10)],
        "doc_id long, text string",
    )
    return raw, tgt


def test_dsir_recovers_planted_shift(spark):
    raw, tgt = _corpus(spark)
    rc = DS.hashed_ngram_counts(raw, "doc_id", "text", n_buckets=128)
    tc = DS.hashed_ngram_counts(tgt, "doc_id", "text", n_buckets=128)
    lr = DS.dsir_bucket_logratio(tc, rc, n_buckets=128)
    w = DS.dsir_log_weights(rc, lr)
    rows = {r["id"]: r["log_weight"] for r in w.collect()}
    sci_w = [rows[i] for i in range(30)]
    spam_w = [rows[i] for i in range(30, 60)]
    # every sciency doc must outweigh every spammy doc
    assert min(sci_w) > max(spam_w)


def test_dsir_resample_keeps_target_like(spark):
    raw, tgt = _corpus(spark)
    rc = DS.hashed_ngram_counts(raw, "doc_id", "text", n_buckets=128)
    tc = DS.hashed_ngram_counts(tgt, "doc_id", "text", n_buckets=128)
    lr = DS.dsir_bucket_logratio(tc, rc, n_buckets=128)
    w = DS.dsir_log_weights(rc, lr)
    out = DS.dsir_resample(w, keep_k=20)
    kept = sorted(r["id"] for r in out.filter("keep").collect())
    assert len(kept) == 20
    # the gap is extreme, so Gumbel noise cannot flip the verdict: all
    # keepers come from the sciency half
    assert all(i < 30 for i in kept)
    # determinism: a second run keeps the identical set
    kept2 = sorted(
        r["id"]
        for r in DS.dsir_resample(w, keep_k=20).filter("keep").collect()
    )
    assert kept == kept2


def test_dsir_counts_shape(spark):
    raw, _ = _corpus(spark)
    rc = DS.hashed_ngram_counts(raw, "doc_id", "text", n_buckets=64)
    assert rc.columns == ["id", "bucket", "cnt"]
    assert rc.filter(
        (F.col("bucket") < 0) | (F.col("bucket") >= 64)
    ).count() == 0
    # k-token docs yield k unigrams + (k-1) bigrams = 2k-1 features:
    # sciency docs have 12 tokens (23 feats), spammy docs 13 (25 feats)
    n = {r["id"]: r["n"] for r in rc.groupBy("id").agg(F.sum("cnt").alias("n")).collect()}
    assert all(n[i] == 23 for i in range(30))
    assert all(n[i] == 25 for i in range(30, 60))


def test_dsir_logratio_bucket_bounded(spark):
    raw, tgt = _corpus(spark)
    rc = DS.hashed_ngram_counts(raw, "doc_id", "text", n_buckets=32)
    tc = DS.hashed_ngram_counts(tgt, "doc_id", "text", n_buckets=32)
    lr = DS.dsir_bucket_logratio(tc, rc, n_buckets=32)
    assert lr.count() <= 32
    # raw covers every target bucket here, so no null log-ratios
    assert lr.filter(F.col("log_ratio").isNull()).count() == 0


def test_streaming_dsir_gate_per_batch(spark, tmp_path):
    """DSIR composes with Structured Streaming: the bucket log-ratio
    table is FIT ONCE (target corpus vs a reference raw sample, both
    bounded) and FROZEN; each micro-batch then scores its documents
    against that table — a broadcast bucket join, O(batch) per batch —
    and admits only target-like docs. The streaming admission gate for
    distribution-matched ingest. Sciency docs must pass and spammy docs
    fail in whichever micro-batch they arrive."""
    import os
    import time

    sci = "the experiment measured quantum decay rates in the detector array"
    spam = "click here buy now free prize winner claim your reward today"

    tgt = spark.createDataFrame(
        [(1000 + i, f"{sci} trial {i % 3}") for i in range(10)],
        "doc_id long, text string",
    )
    ref_raw = spark.createDataFrame(
        [(2000 + i, f"{sci} run {i}") for i in range(5)]
        + [(2100 + i, f"{spam} offer {i}") for i in range(5)],
        "doc_id long, text string",
    )
    tc = DS.hashed_ngram_counts(tgt, "doc_id", "text", n_buckets=128)
    rc = DS.hashed_ngram_counts(ref_raw, "doc_id", "text", n_buckets=128)
    lr = DS.dsir_bucket_logratio(tc, rc, n_buckets=128).localCheckpoint()

    src = str(tmp_path / "stream_docs")
    os.makedirs(src, exist_ok=True)
    batch1 = [(1, f"{sci} sample one"), (2, f"{spam} sample one")]
    batch2 = [(3, f"{sci} sample two"), (4, f"{spam} sample two")]
    spark.createDataFrame(batch1, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    first = {
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    }
    spark.createDataFrame(batch2, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    later = time.time() + 5
    for f in os.listdir(src):
        p = os.path.join(src, f)
        if f.endswith(".parquet") and p not in first:
            os.utime(p, (later, later))

    verdicts = {}

    def gate(batch_df, batch_id):
        bc = DS.hashed_ngram_counts(batch_df, "doc_id", "text", n_buckets=128)
        w = DS.dsir_log_weights(bc, lr)
        for r in w.collect():
            verdicts[r["id"]] = r["log_weight"] > 0.0

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(gate).trigger(
        availableNow=True
    ).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    assert verdicts[1] is True and verdicts[3] is True
    assert verdicts[2] is False and verdicts[4] is False
