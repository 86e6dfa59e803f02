"""Round-10 semantic_dedup scale redesign: two-level hierarchical coarse
assignment + within-cluster LSH pre-filter. Planted-scenario semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from beacon_indexer_spark.operators import similarity as S


def _vec(seed: float, dim: int = 64) -> list[float]:
    return [math.sin(seed * (i + 1)) for i in range(dim)]


def test_super_groups_partition_centroids():
    cents = [(i, _vec(i + 1.0)) for i in range(20)]
    groups = S.centroid_super_groups(cents, 4)
    assert set(groups) == {0, 1, 2, 3}
    all_members = [cid for g in groups.values() for cid, _ in g]
    assert sorted(all_members) == list(range(20))
    # each super-centroid lands in its own group (self-distance 0)
    for sid in range(4):
        assert sid in [cid for cid, _ in groups[sid]]
    # deterministic
    again = S.centroid_super_groups(cents, 4)
    assert {s: [c for c, _ in m] for s, m in groups.items()} == {
        s: [c for c, _ in m] for s, m in again.items()
    }


def test_two_level_assigns_centroid_vector_to_itself(spark):
    cents = [(i, _vec(i + 1.0)) for i in range(16)]
    rows = [(100 + i, v) for i, v in cents]
    df = spark.createDataFrame(rows, ["id", "__v"])
    out = {
        r.id: r.ivf_list
        for r in S.ivf_assign_two_level(df, cents, "__v", nprobe=1).collect()
    }
    # a vector identical to centroid j must land in list j (its super is
    # j's super, and within the group its own distance is exactly 0)
    for i in range(16):
        assert out[100 + i] == i


def test_semantic_dedup_prefilter_groups_planted_dupes(spark):
    base = _vec(7.0)
    eps = [x * 1.0001 for x in base]
    rows = (
        [(1, base), (2, list(base)), (3, eps)]
        + [(10 + i, _vec(100.0 + 13 * i)) for i in range(30)]
    )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = {
        r.vec_id: (r.group_id, r.keep)
        for r in S.semantic_dedup_keep(
            df, "vec_id", "embedding", k_clusters=4, threshold=0.95,
            prefilter_bits=48, prefilter_bands=6,
        ).collect()
    }
    # identical + epsilon-close vectors share one group, min id kept
    assert out[1] == (1, 1)
    assert out[2] == (1, 0)
    assert out[3] == (1, 0)
    # total verdict: every vector present
    assert len(out) == len(rows)


def test_semantic_dedup_hier_path_matches_flat_groups(spark):
    """With k >= hier_threshold the two-level path may reshape CLUSTERS,
    but planted duplicate pairs still land in one group — the contract
    that matters (identical vectors share every cluster assignment)."""
    rows = [(i, _vec(50.0 + 3.7 * i)) for i in range(40)]
    rows += [(1000, rows[5][1]), (1001, list(rows[5][1]))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = {
        r.vec_id: (r.group_id, r.keep)
        for r in S.semantic_dedup_keep(
            df, "vec_id", "embedding", k_clusters=36, threshold=0.95,
            prefilter_bits=48, prefilter_bands=6, hier_threshold=32,
        ).collect()
    }
    assert out[5] == (5, 1)
    assert out[1000] == (5, 0)
    assert out[1001] == (5, 0)
