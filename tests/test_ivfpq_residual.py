"""Residual IVF-PQ (the FAISS ``IVFx,PQy`` layout) vs plain PQ at equal
bits: same m x k codebook budget, but codewords trained on within-list
residuals against kmeans-FITTED coarse centroids. Full-probe recall
isolates quantization quality from probe misses; the reconstruction-
error tests check the training claim directly (residual energy < corpus
energy => lower distortion). All corpora and trajectories are
deterministic (hash-generated vectors, md5 seeds, 6-decimal-rounded
Lloyd means) — no RNG, no flaky margins."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from beacon_indexer_spark.operators import similarity as S
from beacon_indexer_spark.operators.clustering import kmeans_centroids

SF_DIR = "/root/testdata/sf0.001"


def _h(*xs) -> float:
    d = hashlib.md5("-".join(map(str, xs)).encode()).digest()
    return int.from_bytes(d[:4], "big") / 2**32


@pytest.fixture(scope="module")
def clustered(spark):
    """The FAISS regime: 16 deterministic cluster centers in [0,1]^64,
    8 members each with small jitter — cluster displacement dominates
    within-cluster spread, and a k=8 codebook cannot cover 16 cluster
    patterns per subspace, so plain PQ pays the full corpus spread."""
    rows = []
    for vid in range(128):
        cl = vid % 16
        vec = [
            _h("c", cl, d) + (_h("j", vid, d) - 0.5) * 0.04
            for d in range(64)
        ]
        rows.append((vid, vec))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


def _rows(vectors) -> dict[int, list[float]]:
    return {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in vectors.collect()
    }


def _exact_l2_topk(
    data: dict[int, list[float]], query_ids: list[int], k: int = 5
) -> set[tuple[int, int]]:
    truth: set[tuple[int, int]] = set()
    for q in query_ids:
        qv = data[q]
        scored = sorted(
            (sum((x - y) ** 2 for x, y in zip(data[i], qv)), i)
            for i in data
            if i != q
        )
        truth.update((q, i) for _, i in scored[:k])
    return truth


def _recall(got, truth, n_q: int, k: int) -> float:
    pairs = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    return len(pairs & truth) / (n_q * k)


def _mse(data, cents, cbs, m, sub, residual: bool) -> float:
    """Encode->decode reconstruction MSE, replaying the engine's argmin
    (L2, ties to the smaller codeword index) in plain Python."""

    def nearest_cent(v):
        best = None
        for cid, c in cents:
            d2 = sum((x - y) ** 2 for x, y in zip(v, c))
            if best is None or d2 < best[0]:
                best = (d2, cid, c)
        return best[2]

    def pq_decode(v):
        out = []
        for s in range(m):
            seg = v[s * sub:(s + 1) * sub]
            best = min(
                range(len(cbs[s])),
                key=lambda j: (
                    sum((x - c) ** 2 for x, c in zip(seg, cbs[s][j])),
                    j,
                ),
            )
            out.extend(cbs[s][best])
        return out

    tot = 0.0
    for v in data.values():
        if residual:
            c = nearest_cent(v)
            dec = pq_decode([x - y for x, y in zip(v, c)])
            r = [y + d for y, d in zip(c, dec)]
        else:
            r = pq_decode(v)
        tot += sum((x - y) ** 2 for x, y in zip(v, r))
    return tot / len(data)


def test_residual_beats_plain_pq_recall_at_equal_bits(clustered):
    """Full probe (nprobe = n_lists) so both paths scan the whole corpus
    — the ONLY difference is what the m x k codebook describes (raw
    corpus spread vs within-list displacement). Measured on this fixed
    corpus: residual 0.800 vs plain 0.750 recall@5."""
    data = _rows(clustered)
    query_ids = list(range(12))
    truth = _exact_l2_topk(data, query_ids, k=5)
    queries = clustered.filter(F.col("vec_id") < 12)

    plain_cbs = S.pq_codebooks(clustered, "vec_id", "embedding", m=8, k=8)
    r_plain = _recall(
        S.pq_topk(clustered, queries, plain_cbs, "vec_id", "embedding", k=5),
        truth, 12, 5,
    )

    cents = kmeans_centroids(clustered, "vec_id", "embedding", k=16, iters=2)
    res_cbs = S.pq_residual_codebooks(
        clustered, cents, "vec_id", "embedding", m=8, k=8
    )
    r_res = _recall(
        S.ivfpq_residual_topk(
            clustered, queries, cents, res_cbs, "vec_id", "embedding",
            k=5, nprobe=16,
        ),
        truth, 12, 5,
    )
    assert r_res > r_plain, (r_res, r_plain)
    assert r_res >= 0.75, r_res


def test_residual_reconstruction_error_lower(clustered):
    """The training claim itself, on the clustered corpus: residual
    reconstruction MSE must be strictly lower (codewords describe small
    within-list displacements, not the full cross-cluster spread)."""
    data = _rows(clustered)
    cents = kmeans_centroids(clustered, "vec_id", "embedding", k=16, iters=2)
    plain_cbs = S.pq_codebooks(clustered, "vec_id", "embedding", m=8, k=8)
    res_cbs = S.pq_residual_codebooks(
        clustered, cents, "vec_id", "embedding", m=8, k=8
    )
    mse_plain = _mse(data, cents, plain_cbs, 8, 8, residual=False)
    mse_res = _mse(data, cents, res_cbs, 8, 8, residual=True)
    assert mse_res < mse_plain, (mse_res, mse_plain)


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_residual_dominates_on_real_embeddings(spark):
    """The query's own corpus and config (embeddings table, m=8, k=16,
    kmeans kc=8): both recall@5 and reconstruction MSE must dominate
    plain PQ at equal bits (measured: recall 0.140 vs 0.100, MSE 0.690
    vs 0.764 — deterministic for fixed data)."""
    vectors = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    data = _rows(vectors)
    query_ids = sorted(data)[:20]
    truth = _exact_l2_topk(data, query_ids, k=5)
    queries = vectors.filter(F.col("vec_id").isin(query_ids))

    plain_cbs = S.pq_codebooks(vectors, "vec_id", "embedding", m=8, k=16)
    r_plain = _recall(
        S.pq_topk(vectors, queries, plain_cbs, "vec_id", "embedding", k=5),
        truth, 20, 5,
    )
    cents = kmeans_centroids(vectors, "vec_id", "embedding", k=8, iters=2)
    res_cbs = S.pq_residual_codebooks(
        vectors, cents, "vec_id", "embedding", m=8, k=16
    )
    r_res = _recall(
        S.ivfpq_residual_topk(
            vectors, queries, cents, res_cbs, "vec_id", "embedding",
            k=5, nprobe=8,
        ),
        truth, 20, 5,
    )
    sub = len(next(iter(data.values()))) // 8
    mse_plain = _mse(data, cents, plain_cbs, 8, sub, residual=False)
    mse_res = _mse(data, cents, res_cbs, 8, sub, residual=True)
    assert r_res >= r_plain, (r_res, r_plain)
    assert mse_res < mse_plain, (mse_res, mse_plain)


def test_ivfpq_probe_restriction(clustered):
    """nprobe=2: every returned neighbor must live in one of the query's
    two nearest lists (the equi-join's whole point — only ~nprobe/k of
    the corpus is touched per query), and self-matches are excluded."""
    cents = kmeans_centroids(clustered, "vec_id", "embedding", k=16, iters=2)
    res_cbs = S.pq_residual_codebooks(
        clustered, cents, "vec_id", "embedding", m=8, k=8
    )
    queries = clustered.filter(F.col("vec_id") < 4)
    out = S.ivfpq_residual_topk(
        clustered, queries, cents, res_cbs, "vec_id", "embedding",
        k=5, nprobe=2,
    )
    lists = {
        r["vec_id"]: r["ivf_list"]
        for r in S.ivf_assign(clustered, cents, nprobe=1).collect()
    }
    probed: dict[int, set[int]] = {}
    for r in S.ivf_assign(queries, cents, nprobe=2).collect():
        probed.setdefault(r["vec_id"], set()).add(r["ivf_list"])
    rows = out.collect()
    assert rows, "nprobe=2 returned nothing"
    for r in rows:
        assert lists[r["neighbor_id"]] in probed[r["query_id"]]
        assert r["neighbor_id"] != r["query_id"]


def test_ivfpq_deterministic(clustered):
    cents = kmeans_centroids(clustered, "vec_id", "embedding", k=16, iters=2)
    res_cbs = S.pq_residual_codebooks(
        clustered, cents, "vec_id", "embedding", m=8, k=8
    )
    queries = clustered.filter(F.col("vec_id") < 2)

    def run():
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["adc_dist"])
            for r in S.ivfpq_residual_topk(
                clustered, queries, cents, res_cbs, "vec_id", "embedding",
                k=5, nprobe=2,
            ).collect()
        )

    assert run() == run()
