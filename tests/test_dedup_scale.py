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


# ---------------------------------------------------------------------------
# round-4c operator scale guards
# ---------------------------------------------------------------------------

def test_kmv_scales_with_prefilter_not_corpus(spark):
    """The KMV shuffle is bounded by survivors (~distinct/denom), not rows:
    a 100k-row frame with 20k distinct values must keep the survivor
    frame ~20k/denom regardless of duplication factor."""
    from beacon_indexer_spark.operators.sketch import _H, _KMV_SALT, kmv_distinct
    from beacon_indexer_spark.operators.dedup import _md5_long

    df = spark.range(0, 100_000).select(
        (F.col("id") % 20_000).cast("string").alias("v"), F.lit("g").alias("grp")
    )
    cutoff = _H // 16
    survivors = (
        df.select(_md5_long(F.col("v"), _KMV_SALT).alias("h"))
        .filter(F.col("h") < cutoff)
        .distinct()
        .count()
    )
    assert survivors < 20_000 / 16 * 2  # ~1/16 of distincts, 2x head-room
    row = kmv_distinct(df, "v", "grp", k=64, prefilter_denom=16).collect()[0]
    assert 0.55 * 20_000 < row["distinct_est"] < 1.6 * 20_000


def test_pagerank_rounds_scale_with_edges_not_pairsq(spark):
    """A 5,000-edge random graph converges through fixed 3 iterations with
    rank mass conserved (integer truncation only loses < 100 units/node
    per round) — the O(|E|)-per-iteration contract."""
    import random

    from beacon_indexer_spark.operators.graph import PAGERANK_SCALE, pagerank

    rng = random.Random(7)
    edges = list({(rng.randrange(0, 800), rng.randrange(800, 1600)) for _ in range(5000)})
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = pagerank(pairs, iterations=3).collect()
    nodes = {r["node"] for r in got}
    assert len(nodes) == len(set(a for a, _ in edges) | set(b for _, b in edges))
    total = sum(r["rank_scaled"] for r in got)
    # mass ≈ |V|·S, shrunk only by floor-div truncation
    assert 0.98 * len(nodes) * PAGERANK_SCALE < total <= len(nodes) * PAGERANK_SCALE


def test_per_group_cap_hot_group(spark):
    """One group holding 90% of rows still yields exactly cap keeps and a
    full verdict frame (the hot-group degradation is one sorted task,
    not an error)."""
    from beacon_indexer_spark.operators.sampling import per_group_cap

    rows = [(i, "hot" if i < 9000 else "g%d" % (i % 7), float(i)) for i in range(10_000)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = per_group_cap(df, "grp", [F.desc("score"), F.asc("id")], cap=100)
    agg = {r["grp"]: r["kept"] for r in out.groupBy("grp").agg(
        F.sum("keep").alias("kept")).collect()}
    assert agg["hot"] == 100
    assert out.count() == 10_000
