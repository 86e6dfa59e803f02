"""Streaming CurationRun.decision(): the per-micro-batch admit verdict
composes the three proven incremental paths (LSH band-key dedup,
substring decon vs a static eval-gram index, quality/split) and must
agree cross-batch with the one-shot batch operators — and, on corpora
without later-arriving-middleman chains, with CurationRun.decision()
itself."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.test_stateful_stream import _stream_batches


SCHEMA = "doc_id long, text string"

GOOD = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the long green field toward the distant river bank where "
    "tall trees grow beside clear water under a bright open sky with "
    "many soft white clouds drifting slowly past the quiet hills while "
    "birds sing clear songs from high branches above the warm ground."
)
EVAL = "held out benchmark passage alpha beta gamma delta epsilon zeta"


def _curation(spark, tmp_path, test_docs=None):
    from beacon_indexer_spark.streaming.curation import StreamingCuration

    return StreamingCuration(
        spark,
        band_index_path=str(tmp_path / "band_index"),
        test_docs=test_docs,
        gram_index_path=str(tmp_path / "gram_index") if test_docs is not None else None,
        decon_k=4,
        quality_threshold=0.5,
    )


def _run_stream(spark, tmp_path, batches, cur):
    src = str(tmp_path / "docs_raw")
    _stream_batches(spark, src, batches, SCHEMA)
    decisions: dict[int, dict] = {}

    def ingest(batch_df, batch_id):
        out = cur.ingest(batch_df, batch_id)
        for r in out.collect():
            decisions[r["doc_id"]] = r.asDict()

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(ingest)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return decisions


def test_streaming_decision_matches_batch_curation_run(spark, tmp_path):
    """End-to-end parity: stream a corpus (exact-copy duplicate clusters,
    a contaminated doc, a junk doc) in id order and the union of
    per-batch decisions must equal CurationRun.decision() column for
    column (dup_of standing in for cluster_id). Exact copies share ALL
    band keys, so online first-seen == batch CC min-id keep."""
    from beacon_indexer_spark.plans.pipeline import CurationRun

    rows = [
        (1, GOOD),
        (2, GOOD),                                   # copy of 1 (same batch)
        (3, "junk!!! ??? !!!"),                      # fails quality
        (4, GOOD + " unique suffix tokens here now"),
        (5, EVAL + " plus a wholly original continuation about rivers "
            "mountains valleys and forests that no other document in "
            "this corpus shares so the minhash bands stay distinct while "
            "the quality score clears threshold and the eval passage "
            "contaminates only a small fraction of the total tokens "
            "keeping the verdict at trim rather than drop for this "
            "document overall."),                    # contaminated (trim)
        (6, EVAL),                                   # fully contaminated (drop)
        (7, GOOD),                                   # copy of 1 (later batch)
        (8, "another entirely different document body with plenty of "
            "normal words repeated across a reasonably long span of "
            "text so the quality score clears the threshold easily and "
            "the document stands alone with no duplicate partner in the "
            "corpus at all which makes it a clean keep case for this "
            "test of the streaming curation decision pipeline overall."),
    ]
    batches = [rows[:3], rows[3:6], rows[6:]]
    test_docs = spark.createDataFrame([(1000, EVAL)], SCHEMA)
    cur = _curation(spark, tmp_path, test_docs=test_docs)
    streamed = _run_stream(spark, tmp_path, batches, cur)
    assert sorted(streamed) == [r[0] for r in rows]

    docs = spark.createDataFrame(rows, SCHEMA)
    batch = {
        r["doc_id"]: r.asDict()
        for r in CurationRun(
            docs, decon_k=4, quality_threshold=0.5, test_docs=test_docs
        ).decision().collect()
    }
    for did, brow in batch.items():
        srow = streamed[did]
        for col in (
            "keep", "q6", "q_pass", "split", "include",
            "contam_tokens", "contam_rate", "contam_verdict", "admit",
        ):
            assert srow[col] == brow[col], (did, col, srow[col], brow[col])
        # dup_of mirrors cluster_id under exact-copy clusters
        assert srow["dup_of"] == brow["cluster_id"], did
    # the scenario exercised every verdict path
    assert streamed[2]["keep"] == 0 and streamed[7]["keep"] == 0
    assert streamed[3]["q_pass"] == 0
    assert streamed[6]["contam_verdict"] == "drop" and streamed[6]["admit"] == 0
    assert streamed[5]["contam_verdict"] == "trim" and streamed[5]["admit"] == 1
    assert streamed[8]["admit"] == 1


def test_streaming_decision_per_batch_parity_with_one_shot_operators(
    spark, tmp_path
):
    """Per-batch parity (the substring-ingest pattern): each batch's
    dedup verdicts equal `incremental_duplicates` of the batch against
    the accumulated prior corpus, and each batch's contamination tokens
    equal one-shot `cross_corpus_contamination_spans` vs the eval set."""
    from beacon_indexer_spark.operators.dedup import (
        cross_corpus_contamination_spans,
        incremental_duplicates,
        minhash_band_keys,
    )

    rows1 = [(10, GOOD), (11, "some fresh standalone words " * 10)]
    rows2 = [(20, GOOD), (21, EVAL + " with extra context " + GOOD)]
    test_docs = spark.createDataFrame([(1000, EVAL)], SCHEMA)
    cur = _curation(spark, tmp_path, test_docs=test_docs)
    streamed = _run_stream(spark, tmp_path, [rows1, rows2], cur)

    # batch-2 dedup parity vs the one-shot incremental operator
    prior = spark.createDataFrame(rows1, SCHEMA)
    batch2 = spark.createDataFrame(rows2, SCHEMA)
    expect = {
        r["doc_id"]: (r["dup_of"], r["n_matches"])
        for r in incremental_duplicates(
            minhash_band_keys(prior, "doc_id", "text"),
            minhash_band_keys(batch2, "doc_id", "text"),
        ).collect()
    }
    assert streamed[20]["dup_of"] == expect[20][0] == 10
    for did in (20, 21):
        if did in expect:
            assert streamed[did]["dup_of"] == expect[did][0], did
            # streamed counts corpus matches PLUS earlier-id batch mates
            # (the within-batch extension the one-shot operator lacks)
            assert streamed[did]["n_matches"] >= expect[did][1], did
            assert streamed[did]["keep"] == 0, did
        else:
            assert streamed[did]["dup_of"] == did and streamed[did]["keep"] == 1

    # batch-2 contamination parity vs the one-shot decon operator
    spans = cross_corpus_contamination_spans(
        batch2, test_docs, "doc_id", "text", k=4
    ).groupBy("doc_id").agg(F.sum("n_tokens").alias("t")).collect()
    expect_contam = {r["doc_id"]: r["t"] for r in spans}
    assert streamed[21]["contam_tokens"] == expect_contam[21] > 0
    assert streamed[10]["contam_tokens"] == 0


def test_streaming_decision_no_decon_stage(spark, tmp_path):
    """Without an eval corpus every doc's verdict is 'keep' and admit
    reduces to include — the stage gates cleanly out."""
    cur = _curation(spark, tmp_path, test_docs=None)
    streamed = _run_stream(
        spark, tmp_path, [[(1, GOOD)], [(2, GOOD)]], cur
    )
    assert streamed[1]["contam_verdict"] == "keep"
    assert streamed[1]["admit"] == streamed[1]["include"] == 1
    assert streamed[2]["keep"] == 0 and streamed[2]["admit"] == 0
    assert streamed[2]["dup_of"] == 1


def test_decide_batch_is_pure_and_ingest_grows_index(spark, tmp_path):
    """decide_batch leaves the index untouched (idempotent re-runs);
    ingest appends EVERY doc's keys — a copy of a rejected duplicate
    still gets caught by the stored fingerprints."""
    cur = _curation(spark, tmp_path)
    b1 = spark.createDataFrame([(1, GOOD), (2, GOOD)], SCHEMA)
    d1 = cur.decide_batch(b1).collect()
    assert not os.path.isdir(cur.band_index_path)
    d1b = {r["doc_id"]: r["keep"] for r in cur.decide_batch(b1).collect()}
    assert d1b == {r["doc_id"]: r["keep"] for r in d1}
    cur.ingest(b1, 0)
    # doc 3 copies doc 2 (itself a rejected duplicate) — must be caught
    b2 = spark.createDataFrame([(3, GOOD)], SCHEMA)
    d2 = {r["doc_id"]: r.asDict() for r in cur.ingest(b2, 1).collect()}
    assert d2[3]["keep"] == 0 and d2[3]["dup_of"] == 1
