"""Distributed k-means (Lloyd) over an embedding column.

The clustering step under topic bucketing, cluster-balanced sampling, and
SemDeDup-style curation at corpus scale. Spark-first shape — the same loop
MLlib's KMeans runs, expressed over DataFrames:

- seeds: the k corpus vectors with smallest md5(id) — a reproducible
  pseudo-random sample, no RNG state (the `ivf_centroids` move);
- assign: centroids ship as LITERALS into a narrow map (k·dim doubles —
  broadcast-by-value, no shuffle, no UDF), ranking by
  ||v−c||² = ||v||² − 2·v·c + ||c||², constant ||v||² dropped;
- update: posexplode + groupBy(cluster, pos) mean — a map-side-combined
  aggregation whose shuffle is bounded by k × dim, never corpus size;
  the driver collects only the k×dim centroid table per iteration.

Every float path is engine-deterministic (sequential left-to-right double
accumulation, centroid components rounded to 6 decimals between
iterations on BOTH engines) so the DuckDB oracle can replay the exact
iteration trajectory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beacon_indexer_spark.operators.similarity import ivf_assign, ivf_centroids


def kmeans_seed_centroids(
    vectors: DataFrame, id_col: str, vec_col: str, k: int
) -> list[tuple[int, list[float]]]:
    """Deterministic seeds: embeddings of the k ids with smallest md5(id),
    cluster ids 0..k-1 in that hash order — the SAME sampling contract as
    IVF coarse centroids, delegated so the two can never drift. Seed
    components stay EXACT (float32 → double is exact; the oracle reads
    the identical values from parquet) — only update means round."""
    return ivf_centroids(vectors, id_col=id_col, vec_col=vec_col, k=k)


def kmeans_update(
    assigned: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
) -> list[tuple[int, list[float]]]:
    """One centroid update: per-(cluster, pos) mean over members, rounded
    to 6 decimals (the cross-engine determinism contract). Clusters that
    captured no vectors keep their previous centroid."""
    rows = (
        assigned.select(
            F.col("ivf_list").alias("c"),
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("pos", "v"),
        )
        .groupBy("c", "pos")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    byc: dict[int, dict[int, float]] = {}
    for r in rows:
        byc.setdefault(int(r["c"]), {})[int(r["pos"])] = float(r["m"])
    out = []
    for cid, prev in centroids:
        got = byc.get(cid)
        if got is None:
            out.append((cid, prev))
        else:
            out.append((cid, [round(got[p], 6) for p in range(len(prev))]))
    return out


def kmeans_centroids(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> list[tuple[int, list[float]]]:
    """The trained centroid table itself (cid, components) after ``iters``
    Lloyd rounds from deterministic seeds — the reusable half of
    `kmeans_assign`, exposed so downstream operators (IVF lists over
    FITTED centroids, residual product quantization) can share one
    training pass instead of re-deriving it."""
    cents = kmeans_seed_centroids(vectors, id_col, vec_col, k)
    vecs = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"))
    for _ in range(iters):
        assigned = ivf_assign(vecs, cents, "__v", nprobe=1)
        cents = kmeans_update(assigned, "__v", cents)
    return cents


def kmeans_assign(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Lloyd's algorithm, ``iters`` update rounds from deterministic seeds,
    returning the final assignment (id, cluster). Nearest-centroid ties
    break toward the smaller cluster id (struct sort on (d2, cid) — the
    `ivf_assign` ranking). Driver traffic per iteration is one k×dim
    centroid table; everything else is narrow maps plus one bounded
    aggregation — the identical loop runs unchanged on a 1000-executor
    cluster, where per-iteration cost is one corpus scan.
    """
    cents = kmeans_centroids(vectors, id_col, vec_col, k=k, iters=iters)
    vecs = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"))
    final = ivf_assign(vecs, cents, "__v", nprobe=1)
    return final.select(
        F.col("id").cast("long").alias("id"),
        F.col("ivf_list").cast("long").alias("cluster"),
    )
