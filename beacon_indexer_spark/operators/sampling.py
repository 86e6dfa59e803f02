"""Deterministic sampling for training-data curation.

`df.sample()` is seed-dependent AND partitioning-dependent — rerunning a
curation pipeline after a repartition silently changes the sample. These
operators hash the row KEY instead: the same row is in or out of the
sample forever, across runs, partitionings, and engines (md5 arithmetic —
the DuckDB oracle reproduces the exact row set). The hash-uniform value is
also a stable priority, so samples are *nested*: the 10% sample is a
subset of the 20% sample — the property curriculum/ablation pipelines
need. Reference P6's modulo sampling filter (SURVEY §2.3) is the same
idea; this generalizes it to fractional rates and strata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from beacon_indexer_spark.operators.dedup import _md5_long

# million-bucket resolution: rates are exact multiples of 1e-6
_RES = 1_000_000


def sample_bucket(key: Column, salt: int = 1) -> Column:
    """Deterministic uniform bucket in [0, 1e6) from the row key."""
    return F.pmod(_md5_long(key.cast("string"), salt), F.lit(_RES))


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: int = 1
) -> DataFrame:
    """Keep ~rate of rows, chosen by key hash — deterministic, nested
    across rates, engine-portable. A narrow filter: no shuffle, no seed."""
    return df.filter(sample_bucket(F.col(key_col), salt) < int(rate * _RES))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 1,
) -> DataFrame:
    """Per-stratum rates (e.g. language rebalancing: keep 10% of English,
    100% of low-resource languages). Same nested-sample guarantee per
    stratum; strata not in ``rates`` get ``default_rate``."""
    threshold: Column = F.lit(int(default_rate * _RES))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(rate * _RES))
        ).otherwise(threshold)
    return df.filter(sample_bucket(F.col(key_col), salt) < threshold)


def split_assign(
    key: Column, fractions: list[tuple[str, float]], salt: int = 13
) -> Column:
    """Deterministic train/val/test split label from the row key.

    `fractions` is an ORDERED list of (name, fraction) summing to 1.0;
    the hash-bucket space is carved into consecutive ranges in that
    order, so the assignment is stable across runs, partitionings, and
    engines, and REFINABLE: shrinking 'train' from 0.9 to 0.8 only moves
    rows out of the boundary range — no row ever swaps between val and
    test. A narrow expression: no shuffle, no seed, no RNG state."""
    b = sample_bucket(key, salt)
    cum = 0.0
    expr: Column | None = None
    for name, frac in fractions[:-1]:
        cum += frac
        cond = b < int(round(cum * _RES))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = fractions[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(F.lit(last))


def per_group_cap(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    cap: int,
) -> DataFrame:
    """Per-group document cap (RefinedWeb-style domain balancing): rank
    rows within each group by `order_cols` (make the ordering total —
    include a unique id as the last key) and keep the first `cap`.

    Returns the input plus (rank, keep) — a total VERDICT per row, not a
    filtered frame, so callers can audit what the cap rejected. One
    partitioned window pass: the shuffle key is the group column; a
    pathologically hot group (one domain = half the corpus) degrades to
    one task sorting that group — mitigate upstream with a pre-filter
    on a cheap proxy (e.g. hash_sample within the hot group) before
    ranking, as with any top-k-per-key at scale."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    ranked = df.withColumn("rank", F.row_number().over(w))
    return ranked.withColumn("keep", (F.col("rank") <= cap).cast("int"))


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    train_rate: float = 0.9,
    salt: int = 7,
) -> DataFrame:
    """Near-duplicate-safe train/validation split: every member of a
    duplicate cluster is assigned by the hash of its CLUSTER id, so two
    near-copies can never straddle the split (the eval-leakage failure
    mode document-level hash splits silently allow). `clusters` is the
    connected-components output (node, cluster_id); unclustered docs
    coalesce to their own id — for them cluster-hash == doc-hash and the
    verdicts agree by construction. Output: (doc_id, cluster_id, split,
    naive_split, moved) where `moved`=1 marks docs the naive doc-hash
    split would have placed on the other side — the measured leakage
    surface.

    100-TB shape: one keyed left join against the cluster frame (probe-
    guarded broadcast upstream); both split verdicts are narrow md5
    column expressions — no extra shuffle beyond the join.
    """
    spine = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    joined = spine.join(clusters, "doc_id", "left")
    cid = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    cut = int(train_rate * _RES)
    split = F.when(
        sample_bucket(cid, salt) < cut, F.lit("train")
    ).otherwise(F.lit("val"))
    naive = F.when(
        sample_bucket(F.col("doc_id"), salt) < cut, F.lit("train")
    ).otherwise(F.lit("val"))
    return joined.select(
        "doc_id",
        cid.cast("long").alias("cluster_id"),
        split.alias("split"),
        naive.alias("naive_split"),
        (split != naive).cast("int").alias("moved"),
    )


def global_shuffle_order(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    salt: str = "shuf",
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic GLOBAL training order (the epoch shuffle a
    pretraining run executes): every row gets a total position in the
    md5-shuffled order plus its output shard — reproducible across runs
    and engines, no RNG state.

    The scale problem: a global ``row_number() OVER (ORDER BY hash)`` is
    an unpartitioned window — the whole corpus funnels through one task.
    The two-level form used here is the distributed global-rank idiom:

      1. bucket = the hash's first byte (hex prefix; bucket-major order
         IS hash order because hex chars sort lexicographically by
         value), a narrow map;
      2. per-bucket counts → cumulative OFFSETS. 256 rows — bounded
         driver-side state (the ivf-centroid precedent), shipped back as
         a literal map;
      3. rank WITHIN each bucket (a partitioned window over ~1/256 of
         the corpus per partition) + the bucket's offset = the exact
         global position.

    Returns (id, shuffle_pos, shard): shuffle_pos is the dense 0-based
    global rank, shard = shuffle_pos % n_shards (round-robin striping,
    so every shard sees a uniform sample of the shuffled stream — the
    property distributed data loaders need from an epoch shuffle).

    ``n_buckets`` must be a power of 16: the bucket is the hash's hex
    prefix, whose lexicographic order IS hash order only when every
    prefix value maps to a bucket. A non-power-of-16 count would leave
    prefix values with no offset entry (NULL positions), and folding
    them with a modulo would break the bucket-major = hash-order
    invariant the global rank depends on — so the constraint is
    validated, not papered over."""
    if n_buckets < 16 or (n_buckets & (n_buckets - 1)) or (
        n_buckets.bit_length() - 1
    ) % 4:
        raise ValueError(
            f"n_buckets must be a power of 16 (16, 256, 4096, ...), "
            f"got {n_buckets}: the hex-prefix bucket derivation only "
            f"covers exactly 16^d values"
        )
    h = F.md5(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    n_hex = len(f"{n_buckets - 1:x}")
    staged = df.select(
        F.col(id_col),
        h.alias("__h"),
        F.conv(F.substring(h, 1, n_hex), 16, 10).cast("int").alias("__b"),
    )
    counts = {
        r["__b"]: r["cnt"]
        for r in staged.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets: list = []
    acc = 0
    for b in range(n_buckets):
        offsets.extend([F.lit(b), F.lit(acc)])
        acc += counts.get(b, 0)
    off = F.element_at(F.create_map(*offsets), F.col("__b"))
    w = Window.partitionBy("__b").orderBy("__h", id_col)
    pos = (F.row_number().over(w) - 1 + off).cast("long")
    return staged.select(
        id_col,
        pos.alias("shuffle_pos"),
        (pos % n_shards).cast("long").alias("shard"),
    )


def curriculum_interleave(
    df: DataFrame,
    id_col: str,
    order_col: str,
    group_col: str,
) -> DataFrame:
    """Curriculum ordering with round-robin source interleaving: within
    each group (source/domain) rows rank by ``order_col`` DESC (best
    first — quality-paced curriculum), and the global loader key strides
    groups round-robin (position = within_rank · n_groups + group_index)
    so consecutive training batches always mix domains instead of
    draining one source at a time — the anti-hot-spotting property a
    multi-domain loader needs.

    Positions are strided, not dense: after a short group exhausts, its
    slots go unused (harmless for an ordering key, and keeping the
    stride exact makes the order reproducible and engine-checkable).

    Scale shape: ONE group-partitioned window (never global); the group
    index comes from the sorted distinct group list — bounded
    driver-side state (domains are dozens, the ivf-centroid precedent)
    shipped back as a literal map."""
    groups = sorted(
        r["g"]
        for r in df.select(F.col(group_col).alias("g")).distinct().collect()
    )
    n = len(groups)
    idx_entries: list = []
    for i, g in enumerate(groups):
        idx_entries.extend([F.lit(g), F.lit(i)])
    gi = F.element_at(F.create_map(*idx_entries), F.col(group_col))
    w = Window.partitionBy(group_col).orderBy(
        F.desc("__ord"), F.asc(id_col)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(group_col),
            F.col(order_col).alias("__ord"),
        )
        .withColumn("src_rank", (F.row_number().over(w) - 1).cast("long"))
        .select(
            id_col,
            group_col,
            F.col("__ord").alias(order_col),
            "src_rank",
            (F.col("src_rank") * n + gi).cast("long").alias("curriculum_pos"),
        )
    )
