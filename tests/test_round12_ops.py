"""Round-12 additions: two-level ANN recall floor on HOSTILE data —
non-separable (one heavy-tailed blob, no cluster structure) and
duplicate-heavy (the corpora `semantic_dedup` targets). The r11 parity
tests proved flat == two-level on separable clusters; this pins what the
two-level approximation COSTS where boundary reassignment actually moves
results, and asserts the floor recorded in SCALE.md (two-level recall@k
>= 0.9x flat recall@k against exact ground truth)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

RECALL_FLOOR = 0.9  # two-level recall@k must be >= 0.9x flat recall@k


def hostile_vectors(n=3000, dim=16, dup_frac=0.3, n_hubs=40, seed=20260816):
    """Deterministic hostile corpus: a single anisotropic Gaussian blob
    (NO separable cluster structure — every IVF list boundary cuts
    through dense data) with ``dup_frac`` of rows replaced by exact
    copies of ``n_hubs`` hub vectors (duplicate-heavy)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    scales = 1.0 + 2.0 * rng.random(dim)  # anisotropy, still one blob
    base = rng.standard_normal((n, dim)) * scales
    hubs = base[:n_hubs]
    n_dup = int(n * dup_frac)
    dup_rows = rng.integers(n_hubs, n, size=n_dup)
    base[dup_rows] = hubs[rng.integers(0, n_hubs, size=n_dup)]
    return [(int(i), [float(x) for x in base[i]]) for i in range(n)]


def _recall_at_k(result_rows, truth_rows):
    """Mean over queries of |approx top-k ∩ true top-k| / k."""
    truth: dict[int, set] = {}
    for r in truth_rows:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict[int, set] = {}
    for r in result_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    vals = [
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items() if t
    ]
    return sum(vals) / len(vals)


@pytest.fixture(scope="module")
def hostile(spark):
    vecs = spark.createDataFrame(
        hostile_vectors(), "vec_id long, embedding array<double>"
    ).localCheckpoint()
    qs = vecs.filter(F.col("vec_id") % 37 == 5).localCheckpoint()  # ~80 queries
    return vecs, qs


@pytest.fixture(scope="module")
def ground_truth(spark, hostile):
    from beacon_indexer_spark.operators.similarity import brute_force_topk

    vecs, qs = hostile
    return brute_force_topk(vecs, qs, k=10).collect()


def test_ivf_two_level_recall_floor_on_hostile_data(
    spark, hostile, ground_truth
):
    """ivf_topk with the two-level gate ON vs flat, both vs exact truth,
    on the blob+duplicates corpus with 64 lists (>= the 32-list gate).
    The documented approximation must cost <= 10% of flat's recall."""
    from beacon_indexer_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
    )

    vecs, qs = hostile
    cents = ivf_centroids(vecs, k=64)
    flat = ivf_topk(
        vecs, qs, cents, k=10, nprobe=4, hier_threshold=None
    ).collect()
    two = ivf_topk(
        vecs, qs, cents, k=10, nprobe=4, hier_threshold=32
    ).collect()
    r_flat = _recall_at_k(flat, ground_truth)
    r_two = _recall_at_k(two, ground_truth)
    # flat IVF itself is lossy here (non-separable data is the worst case
    # for coarse quantization) — the test pins the RELATIVE floor, and a
    # sanity absolute so a degenerate 0-recall pair can't pass trivially
    assert r_flat > 0.3, r_flat
    assert r_two >= RECALL_FLOOR * r_flat, (r_two, r_flat)


def test_ivfpq_two_level_recall_floor_on_hostile_data(
    spark, hostile, ground_truth
):
    """ivfpq_residual_topk behind the same gate, flat vs two-level, both
    measured against EXACT ground truth (direct top-k overlap between
    two quantized paths over-penalizes ADC rank shuffling near the PQ
    noise floor — ground-truth recall is what a user of the index
    experiences). Two-level must keep >= 90% of flat's recall."""
    from beacon_indexer_spark.operators.similarity import (
        ivf_centroids,
        ivfpq_residual_topk,
        pq_residual_codebooks,
    )

    vecs, qs = hostile
    cents = ivf_centroids(vecs, k=64)
    cbs = pq_residual_codebooks(vecs, cents, vec_col="embedding", m=8, k=16)
    flat = ivfpq_residual_topk(
        vecs, qs, cents, cbs, k=10, nprobe=4, hier_threshold=None
    ).collect()
    two = ivfpq_residual_topk(
        vecs, qs, cents, cbs, k=10, nprobe=4, hier_threshold=32
    ).collect()
    # exact L2 ground truth (PQ/ADC ranks by L2, while brute_force_topk's
    # truth is cosine — mismatched metrics on non-normalized data would
    # measure the METRIC gap, not the two-level gap)
    rows = hostile_vectors()
    mat = np.array([v for _, v in rows])
    qids = sorted({r["query_id"] for r in flat} | {r["query_id"] for r in two})
    truth = []
    for q in qids:
        d = ((mat - mat[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        for nid in np.argsort(d, kind="stable")[:10]:
            truth.append({"query_id": q, "neighbor_id": int(nid)})
    r_flat = _recall_at_k(flat, truth)
    r_two = _recall_at_k(two, truth)
    # absolute recall is LOW here by construction (~0.12 measured): on an
    # isotropic 16-D blob the 10th-to-30th-NN distance contrast is smaller
    # than the PQ quantization noise (md5-sampled codewords, 16 per 2-D
    # subspace), so ADC rank-shuffles candidates for flat and two-level
    # alike — the IVF candidate stage itself caps at ~0.65 (measured,
    # nprobe 4/64). The sanity bound only excludes a degenerate zero; the
    # RELATIVE floor is the claim under test.
    assert r_flat > 0.05, r_flat
    assert r_two >= RECALL_FLOOR * r_flat, (r_two, r_flat)


def test_semantic_dedup_two_level_verdict_stability_on_hostile_data(
    spark, hostile
):
    """semantic_dedup_keep on the duplicate-heavy blob: exact copies MUST
    land in the same coarse list under the two-level path (identical
    vectors share every distance), so every hub group still gets exactly
    one keeper — the dedup guarantee survives the approximation."""
    from beacon_indexer_spark.operators.similarity import semantic_dedup_keep

    vecs, _ = hostile
    out = semantic_dedup_keep(
        vecs, "vec_id", "embedding", k_clusters=64, threshold=0.999,
        hier_threshold=32,
    ).collect()
    assert len(out) == vecs.count()  # total verdict
    # group rows by their exact vector; every duplicated vector keeps one
    by_vec: dict = {}
    rows = {r["vec_id"]: r for r in out}
    for vid, emb in [(r["vec_id"], tuple(r["embedding"])) for r in vecs.collect()]:
        by_vec.setdefault(emb, []).append(vid)
    for emb, ids in by_vec.items():
        if len(ids) > 1:
            keepers = [i for i in ids if rows[i]["keep"]]
            assert len(keepers) == 1, (len(ids), len(keepers))


# --------------------------------------------- global_shuffle_order guard


def test_global_shuffle_order_rejects_non_power_of_16_buckets():
    """Hex-prefix bucketing only covers exactly 16^d values: 64 or 100
    buckets would leave prefixes with no offset entry (silent NULL
    shuffle_pos) — the constraint is validated, not papered over."""
    import pytest as _pytest

    from beacon_indexer_spark.operators.sampling import global_shuffle_order

    for bad in (0, 1, 8, 64, 100, 255, 4095):
        with _pytest.raises(ValueError, match="power of 16"):
            global_shuffle_order(None, "id", n_buckets=bad)


def test_global_shuffle_order_accepts_powers_of_16(spark):
    from beacon_indexer_spark.operators.sampling import global_shuffle_order

    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    out = global_shuffle_order(df, "id", n_buckets=16).collect()
    assert sorted(r["shuffle_pos"] for r in out) == list(range(50))


# --------------------------------------------- hashed linear classifier


def test_hashed_classifier_score_edges(spark):
    """Empty/whitespace docs get the defined zero verdict (n_tokens 0,
    score 0.0, 'keep'); scores are partitioning-invariant (narrow map +
    sequential fold); every weight is a multiple of 1/1024 so the mean
    of a single-token doc reproduces the token's exact weight."""
    from beacon_indexer_spark.operators.text import hashed_classifier_score

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello"), (4, "hello hello")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            hashed_classifier_score(df, "doc_id", "text").collect()}
    assert rows[1]["n_tokens"] == 0 and rows[1]["lin_score"] == 0.0
    assert rows[1]["label"] == "keep"
    assert rows[2]["n_tokens"] == 0
    # identical tokens -> identical mean regardless of count
    assert rows[3]["lin_score"] == rows[4]["lin_score"]
    # reported score is the 1e-6 floor-half-up rounding of an exact
    # k/1024 rational: recovering k and re-rounding must reproduce it
    import math

    k = round(rows[3]["lin_score"] * 1024)
    assert rows[3]["lin_score"] == math.floor(k / 1024 * 1e6 + 0.5) / 1e6
    # partitioning invariance
    one = {r["doc_id"]: r["lin_score"] for r in
           hashed_classifier_score(df.repartition(7), "doc_id", "text").collect()}
    assert one == {k: v["lin_score"] for k, v in rows.items()}
