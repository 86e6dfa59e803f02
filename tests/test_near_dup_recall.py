"""Recall guard for banded embedding near-dup detection.

`embedding_near_duplicates` stays oracle-green no matter how the bands are
parameterized, because the DuckDB oracle mirrors the same bands — a recall
bug (bands too long / too few, dropping true near-dups) would be invisible
to the correctness gate. This test measures recall against NUMPY ground
truth on planted near-duplicate clusters.

Band math (random-hyperplane LSH): a pair at angle θ agrees on one sign
bit with p = 1 − θ/π; a band of r contiguous bits matches with p^r; with
b bands the pair is blocked (and then exactly scored) with
    P(candidate) = 1 − (1 − p^r)^b.
At the operator defaults (n_bits=16, bands=4 → r=4) and the planted
cosine ≈ 0.98 (θ ≈ 0.20, p ≈ 0.936):
    1 − (1 − 0.936⁴)^4 ≈ 0.9965
so expected recall ≈ 0.99+; the assertion uses 0.9 to absorb the planted
sample's variance. Precision is exactly 1.0 by construction — blocking
only gates WHICH pairs get scored; the cosine filter is exact.
"""

from __future__ import annotations

import math

import numpy as np

from beacon_indexer_spark.operators import similarity as S

DIM = 64
THRESHOLD = 0.95
N_CLUSTERS = 25
CLUSTER_SIZE = 3
# per-component noise; the noise VECTOR norm is NOISE*sqrt(DIM) ~= 0.12,
# giving member-member cosine ~= 1/(1+0.12^2) ~= 0.986
NOISE = 0.015


def _planted(seed: int = 42):
    rng = np.random.default_rng(seed)
    vecs = []
    for c in range(N_CLUSTERS):
        base = rng.standard_normal(DIM)
        base /= np.linalg.norm(base)
        for m in range(CLUSTER_SIZE):
            v = base + NOISE * rng.standard_normal(DIM)
            vecs.append(v / np.linalg.norm(v))
    # background vectors: random, essentially orthogonal at dim 64
    for _ in range(50):
        v = rng.standard_normal(DIM)
        vecs.append(v / np.linalg.norm(v))
    return np.asarray(vecs)


def _true_pairs(vecs: np.ndarray) -> set[tuple[int, int]]:
    sims = vecs @ vecs.T
    out = set()
    n = len(vecs)
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= THRESHOLD:
                out.add((i, j))
    return out


def test_embedding_near_dup_recall_vs_ground_truth(spark):
    vecs = _planted()
    truth = _true_pairs(vecs)
    assert len(truth) >= N_CLUSTERS * CLUSTER_SIZE * (CLUSTER_SIZE - 1) // 2 * 0.9

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    found = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_duplicates(
            df, dim=DIM, threshold=THRESHOLD, n_bits=16, bands=4
        ).collect()
    }

    # precision is exact: every emitted pair is cosine-verified
    assert found <= truth, f"false positives: {sorted(found - truth)[:5]}"

    recall = len(found & truth) / len(truth)
    # expected from the band formula at the planted angle: ~0.99
    theta = math.acos(0.98)
    p_bit = 1 - theta / math.pi
    expected = 1 - (1 - p_bit**4) ** 4
    assert expected > 0.95  # the parameterization itself must be sane
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9 (expected ~{expected:.3f})"


def test_embedding_near_dup_recall_wide_bands(spark):
    # the production/query parameterization (n_bits=32, bands=4 → 8-bit
    # band keys): 256 buckets per band keeps per-bucket pair counts
    # bounded at scale, and the band bound 1-(1-p^8)^4 ≈ 0.97 at the
    # planted cosine still clears the recall floor
    vecs = _planted(seed=11)
    truth = _true_pairs(vecs)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    found = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_duplicates(
            df, dim=DIM, threshold=THRESHOLD, n_bits=32, bands=4
        ).collect()
    }
    assert found <= truth, f"false positives: {sorted(found - truth)[:5]}"
    recall = len(found & truth) / len(truth)
    theta = math.acos(0.98)
    p_bit = 1 - theta / math.pi
    expected = 1 - (1 - p_bit**8) ** 4
    assert expected > 0.9
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9 (expected ~{expected:.3f})"


def test_band_split_preserves_bits(spark):
    # the banded keys must tile the exact sign-bit string: concatenating a
    # vector's band keys in band order reconstructs its full lsh_bucket
    vecs = _planted(seed=7)[:10]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    from pyspark.sql import functions as F

    staged = df.select(
        "vec_id", S.lsh_bucket("embedding", DIM, 16).alias("__bits")
    )
    rows = (
        staged.select(
            "vec_id",
            "__bits",
            F.explode(S.lsh_band_keys("__bits", 16, 4)).alias("bk"),
        )
        .orderBy("vec_id", "bk.band")
        .collect()
    )
    by_vec: dict[int, list[str]] = {}
    bits: dict[int, str] = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], []).append(r["bk"]["key"])
        bits[r["vec_id"]] = r["__bits"]
    for vid, keys in by_vec.items():
        assert "".join(keys) == bits[vid]
