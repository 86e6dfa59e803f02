"""Similarity-search operator tests: IVF path vs brute-force ground truth."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from beacon_indexer_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vectors(spark):
    """Deterministic 16-dim corpus: 4 well-separated clusters of 25 vectors
    (cluster axis + small deterministic jitter)."""
    rows = []
    for vid in range(100):
        cluster = vid % 4
        vec = [0.0] * 16
        for d in range(16):
            base = 1.0 if d // 4 == cluster else 0.0
            jitter = ((vid * 31 + d * 17) % 13 - 6) / 100.0
            vec[d] = base + jitter
        rows.append((vid, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_brute_force_topk_exact(vectors):
    queries = vectors.filter(F.col("vec_id") < 2)
    got = S.brute_force_topk(vectors, queries, k=5)
    rows = got.filter(F.col("query_id") == 0).orderBy("rank").collect()
    assert len(rows) == 5
    # nearest neighbors of query 0 (cluster 0) are cluster-0 members
    assert all(r["neighbor_id"] % 4 == 0 for r in rows)
    assert rows[0]["cos_sim"] >= rows[-1]["cos_sim"]
    assert rows[0]["neighbor_id"] != 0  # self excluded


def test_ivf_centroids_deterministic(vectors):
    c1 = S.ivf_centroids(vectors, k=8)
    c2 = S.ivf_centroids(vectors, k=8)
    assert [cid for cid, _ in c1] == list(range(8))
    assert c1 == c2


def test_ivf_assign_lists(vectors):
    cents = S.ivf_centroids(vectors, k=8)
    assigned = S.ivf_assign(vectors, cents, nprobe=2)
    per_vec = assigned.groupBy("vec_id").count().collect()
    assert all(r["count"] == 2 for r in per_vec)  # nprobe lists each
    n_lists = assigned.select("ivf_list").distinct().count()
    assert 1 < n_lists <= 8


def test_ivf_topk_recall_vs_bruteforce(vectors):
    queries = vectors.filter(F.col("vec_id") < 4)
    cents = S.ivf_centroids(vectors, k=8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(vectors, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(vectors, queries, cents, k=5, nprobe=4).collect()
    }
    # with clustered data and 4 probes of 8 lists, recall should be high
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8
    # scores for common pairs are identical (same cosine arithmetic)
    ivf_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in S.ivf_topk(vectors, queries, cents, k=5, nprobe=4).collect()
    }
    bf_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in S.brute_force_topk(vectors, queries, k=5).collect()
    }
    for pair in exact & approx:
        assert math.isclose(ivf_scores[pair], bf_scores[pair], rel_tol=0, abs_tol=0)


def test_lsh_topk_shapes(vectors):
    queries = vectors.filter(F.col("vec_id") == 0)
    got = S.lsh_topk(vectors, queries, dim=16, k=3, n_bits=4).collect()
    assert 0 < len(got) <= 3
    assert all(r["query_id"] == 0 and r["neighbor_id"] != 0 for r in got)


def test_quantize_roundtrip_error_bound(spark, vectors):
    from pyspark.sql import functions as F

    staged = vectors.select(
        "vec_id", "embedding", S.quantize_scale(F.col("embedding"), bits=8).alias("s")
    ).withColumn("q", S.quantize_codes(F.col("embedding"), F.col("s")))
    rows = staged.withColumn(
        "deq", S.dequantize_embedding(F.col("q"), F.col("s"))
    ).collect()
    for r in rows:
        assert all(-127 <= c <= 127 for c in r["q"])
        # reconstruction error bounded by half a quantization step
        for orig, back in zip(r["embedding"], r["deq"]):
            assert abs(orig - back) <= r["s"] / 2 + 1e-12
    # zero vector: scale 0, all-zero codes
    z = spark.createDataFrame([(0, [0.0] * 4)], "vec_id long, embedding array<double>")
    zr = (
        z.select("embedding", S.quantize_scale(F.col("embedding"), bits=8).alias("s"))
        .select("s", S.quantize_codes(F.col("embedding"), F.col("s")).alias("q"))
        .collect()[0]
    )
    assert zr["s"] == 0.0 and zr["q"] == [0, 0, 0, 0]


def test_lsh_topk_multiband_recall_dominates_single_bucket(vectors):
    """Banded probing (share ANY 4-bit band of 16) must recall at least as
    many true neighbors as one exact 16-bit bucket — and with clustered
    data it should be near-exact."""
    queries = vectors.filter(F.col("vec_id") < 4)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(vectors, queries, k=5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_topk(vectors, queries, dim=16, k=5, n_bits=16).collect()
    }
    banded = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_topk(
            vectors, queries, dim=16, k=5, n_bits=16, bands=4
        ).collect()
    }
    recall_single = len(exact & single) / len(exact)
    recall_banded = len(exact & banded) / len(exact)
    assert recall_banded >= recall_single
    assert recall_banded >= 0.8


def test_ivf_centroids_duplicate_ids_deterministic(spark):
    """Duplicate ids with DIFFERENT payloads (append-only lake reads) must
    resolve to one content-deterministic vector per id — the min-by-
    fingerprint winner — regardless of row order."""
    from beacon_indexer_spark.operators.similarity import ivf_centroids

    rows = [(1, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [2.0, 2.0]), (3, [3.0, 0.0])]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(rows[::-1], "vec_id long, embedding array<double>")
    ca = ivf_centroids(a, k=3)
    cb = ivf_centroids(b, k=3)
    assert [v for _, v in ca] == [v for _, v in cb]
    assert len(ca) == 3  # one row per id, never two copies of id=1
    seen = [tuple(v) for _, v in ca]
    assert len(set(seen)) == 3


def test_ivf_centroids_sample_is_shuffle_free(spark):
    """The unique-id common case must pick centroids without a corpus-wide
    distinct() exchange: the id sample is a 4k-oversampled TakeOrdered
    (zero shuffles) deduped on the driver."""
    from beacon_indexer_spark.operators.similarity import ivf_centroids

    rows = [(i, [float(i % 7), 1.0]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sample = (
        df.select(F.col("vec_id").alias("id"))
        .filter(F.col("id").isNotNull())
        .withColumn("__r", F.md5(F.col("id").cast("string")))
        .orderBy("__r")
        .limit(4 * 8)
    )
    plan = sample._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    cents = ivf_centroids(df, k=8)
    assert len(cents) == 8
    assert len({tuple(v) for _, v in cents}) <= 8


def test_ivf_centroids_heavy_duplication_fallback(spark):
    """Dup rate > 75% can exhaust the 4k oversample with < k distinct ids;
    the distinct() fallback must still deliver k distinct centroids, and
    the result must match what a unique-id frame of the same ids gives
    (determinism contract is md5-order over DISTINCT ids either way)."""
    import hashlib

    from beacon_indexer_spark.operators.similarity import ivf_centroids

    ids = list(range(10))
    # replicate the md5-smallest id enough to flood the 4k=16 oversample
    hot = min(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    rows = [(i, [float(i), 2.0]) for i in ids]
    rows += [(hot, [float(hot), 2.0])] * 64
    dup = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uniq = spark.createDataFrame(
        [(i, [float(i), 2.0]) for i in ids], "vec_id long, embedding array<double>"
    )
    cd = ivf_centroids(dup, k=4)
    cu = ivf_centroids(uniq, k=4)
    assert len(cd) == 4
    assert [v for _, v in cd] == [v for _, v in cu]


def test_ivf_centroids_degenerate_k_and_empty(spark):
    """k<=0 returns [] (k=0 once made the empty oversample look 'exactly
    truncated' and indexed oversample[-1] — ADVICE r6); an empty corpus
    with k>0 returns [] rather than erroring."""
    from beacon_indexer_spark.operators.similarity import ivf_centroids

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert ivf_centroids(df, k=0) == []
    assert ivf_centroids(df, k=-3) == []
    empty = df.filter(F.lit(False))
    assert ivf_centroids(empty, k=4) == []
