"""Similarity search over embedding columns (array<float>).

Two paths:

- brute-force cosine top-k — the exact baseline. All arithmetic is
  sequential left-to-right double accumulation over the array, which makes
  the result bit-reproducible across engines (the DuckDB oracle computes
  the identical sum) and across partitionings.
- LSH-bucketed (random hyperplane signs) — the scale path: queries only
  compare against vectors sharing a hash bucket, turning the O(N·Q) cross
  join into an equi-join. Hyperplanes are derived deterministically from
  md5 so no RNG state is shipped to executors.
- IVF-style coarse quantization (assign to nearest of k seed centroids,
  probe the closest `nprobe` lists) — centroids picked deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential double dot product — deterministic accumulation order."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    The query side is broadcast (queries ≪ corpus); the corpus is scanned
    once, map-side, and the global top-k per query uses a window over the
    (small) survivor set after a per-partition pre-filter is handled by
    TakeOrdered semantics of row_number + filter. Self-matches excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__vvec"))
    scored = (
        v.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qvec"), F.col("__vvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH (random-hyperplane) buckets
# ---------------------------------------------------------------------------

def _hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 — portable,
    no RNG object; component c of plane `bit` = ±1 by md5 parity."""
    import hashlib

    comps = []
    for c in range(dim):
        h = hashlib.md5(f"plane:{bit}:{c}".encode()).hexdigest()
        comps.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
    return comps


def lsh_bucket(vec: Column, dim: int, n_bits: int = 8) -> Column:
    """Sign-bit bucket key: n_bits-char string of 0/1 by hyperplane side."""
    bits = []
    for b in range(n_bits):
        # one array literal per plane (a per-component F.lit costs dim
        # py4j round-trips of driver-side plan construction)
        plane = F.lit(_hyperplane(dim, b))
        bits.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: compare only within matching sign-buckets.

    At 100 TB this replaces the corpus-wide scan with an equi-join on the
    bucket key (2^n_bits buckets); recall is tuned by lowering n_bits or
    probing multi-bucket (not implemented round 1).
    """
    vb = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__vvec"),
        lsh_bucket(F.col(vec_col), dim, n_bits).alias("__bucket"),
    )
    qb = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            lsh_bucket(F.col(vec_col), dim, n_bits).alias("__bucket"),
        )
    )
    scored = (
        vb.join(qb, "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qvec"), F.col("__vvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest coarse centroids
    (IVF inverted lists). Centroids ship as literals (they're small by
    construction); assignment is a narrow map — no shuffle."""
    scored = F.array(
        *[
            F.struct(
                (-dot(F.col(vec_col), F.lit(c)) * 2 + F.lit(_sq(c))).alias("d2"),
                F.lit(cid).alias("cid"),
            )
            for cid, c in centroids
        ]
    )
    # ||v - c||^2 = ||v||^2 - 2 v·c + ||c||^2; ||v||^2 constant per row →
    # ranking by (-2 v·c + ||c||^2) is exact nearest-centroid order
    ranked = F.slice(F.array_sort(scored), 1, nprobe)
    return vectors.withColumn(
        "__lists", F.transform(ranked, lambda s: s["cid"])
    ).withColumn("ivf_list", F.explode("__lists")).drop("__lists")


def _sq(c: list[float]) -> float:
    total = 0.0
    for x in c:
        total += x * x
    return total


def ivf_centroids(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 16,
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse centroids: the k corpus vectors whose md5(id) is
    smallest — a reproducible pseudo-random sample (no RNG state, no
    iteration; real IVF training would k-means these, which at 100 TB runs
    on a sampled subset anyway)."""
    rows = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("__r", F.md5(F.col("id").cast("string")))
        .orderBy("__r")
        .limit(k)
        .collect()
    )
    return [(i, [float(x) for x in r["v"]]) for i, r in enumerate(rows)]


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: score only corpus vectors whose inverted list
    matches one of the query's ``nprobe`` probed lists.

    The corpus is bucketed once (narrow); the join is an equi-join on
    ``ivf_list`` with the (small) probed query side broadcast — at 100 TB
    this scans ~nprobe/k_lists of the corpus per query instead of all of it.
    """
    vb = ivf_assign(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__vvec")),
        centroids, "__vvec", nprobe=1,
    )
    qb = F.broadcast(
        ivf_assign(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")),
            centroids, "__qvec", nprobe=nprobe,
        )
    )
    scored = (
        vb.join(qb, "ivf_list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("__qvec"), F.col("__vvec")).alias("cos_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))  # dedup multi-probe hits
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_duplicates(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    n_bits: int = 6,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, LSH-blocked: only pairs
    sharing a sign-bucket are scored (high-cosine pairs almost always share
    all sign bits). Output (id_a, id_b, cos_sim), id_a < id_b."""
    # per-vector norm computed ONCE here — per-pair work is then a single
    # dot product (norms recomputed per pair would triple the hot loop)
    vb = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("nrm"),
        lsh_bucket(F.col(vec_col), dim, n_bits).alias("bucket"),
    )
    # bucket-groupBy + in-bucket pair expansion: the n_bits dot-product
    # bucket signature is computed ONCE per vector (a self-join would
    # execute that branch twice) and the shuffle carries (bucket, id, vec)
    # exactly once. Struct sort is by id (first field, unique).
    items = F.col("__items")
    pairs = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + 2, F.size(items)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    denom = F.col("p.a.nrm") * F.col("p.b.nrm")
    return (
        vb.groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct("id", "vec", "nrm"))).alias("__items"))
        .filter(F.size("__items") > 1)
        .select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.when(denom > 0, dot(F.col("p.a.vec"), F.col("p.b.vec")) / denom)
            .otherwise(F.lit(0.0))
            .alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
