"""Scale-guard tests for dedup/similarity candidate generation: the
max_bucket overflow join and the ngram df-cap must bound per-bucket work
without changing results (overflow) / while bounding pair expansion (cap)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from beacon_indexer_spark.operators import dedup as D
from beacon_indexer_spark.operators import similarity as S


def _pairs(df):
    return sorted((r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect())


def test_pairs_from_buckets_overflow_equivalent(spark):
    # one huge bucket (60 ids) + several small ones; the capped plan routes
    # the huge bucket through the distributed join — pairs must be identical
    rows = [("hot", "k1", i) for i in range(60)]
    rows += [("b%d" % b, "k2", 1000 + b * 10 + i) for b in range(5) for i in range(3)]
    keyed = spark.createDataFrame(rows, "band string, key string, id long")
    plain = _pairs(D._pairs_from_buckets(keyed, "id", "band", "key", max_bucket=None))
    capped = _pairs(D._pairs_from_buckets(keyed, "id", "band", "key", max_bucket=10))
    assert plain == capped
    assert len(plain) == 60 * 59 // 2 + 5 * 3


def test_pairs_from_buckets_cap_above_sizes_is_noop(spark):
    rows = [("b", "k", i) for i in range(8)]
    keyed = spark.createDataFrame(rows, "band string, key string, id long")
    assert _pairs(
        D._pairs_from_buckets(keyed, "id", "band", "key", max_bucket=100)
    ) == _pairs(D._pairs_from_buckets(keyed, "id", "band", "key", max_bucket=None))


def _docs(spark, n=20):
    # every doc shares the universal prefix shingle; each also has a unique tail
    rows = [
        (i, "common shared prefix unique%d tail%d word%d" % (i, i, i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_df_cap_bounds_pair_expansion(spark):
    docs = _docs(spark, 20)
    # uncapped: the universal "common shared prefix" shingle blocks all
    # 20*19/2 pairs into one bucket
    uncapped = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.0, df_cap=None
    )
    assert uncapped.count() == 20 * 19 // 2
    # capped below the universal shingle's df: the stopword-like shingle is
    # dropped from blocking, no other shingle is shared -> no pairs at all
    capped = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.0, df_cap=10
    )
    assert capped.count() == 0
    # cap above every shingle's df: exact semantics preserved
    wide = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.0, df_cap=1000
    )
    assert _pairs(wide) == _pairs(uncapped)


def test_frequent_shingles_audit(spark):
    docs = _docs(spark, 20)
    dropped = D.frequent_shingles(docs, "doc_id", "text", df_cap=10).collect()
    assert {r["shingle"] for r in dropped} == {"common shared prefix"}
    assert dropped[0]["doc_freq"] == 20


def _vectors(spark, n=40, dim=16):
    def vec(i):
        h = hashlib.md5(b"v%d" % i).digest()
        return [float(b) / 255.0 for b in h[:dim]]

    return spark.createDataFrame(
        [(i, vec(i)) for i in range(n)], "vec_id long, embedding array<float>"
    )


def test_embedding_near_dupes_cap_is_semantics_preserving(spark):
    vecs = _vectors(spark)
    base = S.embedding_near_duplicates(
        vecs, dim=16, threshold=0.9, n_bits=8, bands=4, max_bucket=None
    )
    capped = S.embedding_near_duplicates(
        vecs, dim=16, threshold=0.9, n_bits=8, bands=4, max_bucket=3
    )
    got_base = sorted(map(repr, base.collect()))
    got_capped = sorted(map(repr, capped.collect()))
    assert got_base == got_capped
    assert len(got_base) > 0  # all-positive vectors: plenty of high-cos pairs


def test_embedding_near_dupes_no_unbounded_rows(spark):
    # the candidate plan must never aggregate vectors into a bucket row:
    # collect_set in the plan carries ids only (max_bucket=None keeps the
    # aggregation visible — the capped path hides it behind the checkpoint
    # boundary but builds the identical aggregation)
    vecs = _vectors(spark)
    plan = (
        S.embedding_near_duplicates(vecs, dim=16, n_bits=8, bands=4, max_bucket=None)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "collect_set" in plan
    assert "collect_set(embedding" not in plan
    assert "collect_list" not in plan
