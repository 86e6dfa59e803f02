"""Deduplication operators for training-data pipelines.

Five families, all shuffle-aware for the 100 TB case:

- exact:      hash-groupBy on a content fingerprint (one shuffle, map-side
              partial agg; the shuffle carries (hash, id) pairs only).
- minhash:    shingle → k minhash signatures → LSH banding → bucket join.
              Candidate generation never compares all pairs: docs meet only
              inside a band bucket.
- simhash:    64-bit majority-vote fingerprint; near-dups share band keys.
- ngram jaccard: exact Jaccard over shingle sets for candidate pairs —
              used as the verify stage after LSH, or standalone at small
              scale.
- embedding:  cosine near-dup (see operators/similarity.py for ANN).

Every hash is derived from md5 so results are engine-portable (the DuckDB
oracle computes identical signatures) and cluster-deterministic (no
JVM-hash-seed dependence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beacon_indexer_spark.operators.text import fingerprint, word_shingles

# 15 hex chars = 60 bits — fits signed 64-bit exactly, both engines.
_HEX_PREFIX_LEN = 15


def _md5_long(c: Column, salt: int) -> Column:
    """Deterministic 60-bit integer hash of a string, salted: engine-portable
    (md5 + base-16 conv exist in Spark and DuckDB)."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), c))
    return F.conv(F.substring(h, 1, _HEX_PREFIX_LEN), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of identical (normalized) content: one row per duplicated
    fingerprint with the member ids and the keeper (min id).

    Scale: the groupBy shuffles only (fingerprint, id); text never moves.
    """
    fp = df.select(F.col(id_col).cast("long").alias(id_col), fingerprint(text_col).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(id_col).alias("keep_id"),
            F.array_sort(F.collect_list(id_col)).alias("member_ids"),
        )
        .filter(F.col("n_members") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row (min id) per identical-content group — the dedup'd
    corpus. Implemented as latest-wins on (fingerprint) with version=-id."""
    fp = df.withColumn("__fp", fingerprint(text_col))
    w_keep = (
        fp.groupBy("__fp").agg(F.min(F.col(id_col)).alias(id_col))
    )
    return df.join(w_keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, shingle_n: int = 3
) -> DataFrame:
    """(id, sig_0..sig_{k-1}) — min over shingles of k salted hashes.

    Computed without exploding: min-over-array per hash is a pure expression,
    so the stage is a narrow map (no shuffle at all). Docs shorter than one
    shingle get signature -1 (their own bucket family).
    """
    sh = word_shingles(text_col, shingle_n)
    cols = [F.col(id_col).cast("long").alias(id_col)]

    def salted(salt: int):
        # closure factory: a default-arg lambda would become arity-2 and
        # receive the element index as its second argument
        return lambda s: _md5_long(s, salt)

    for i in range(k):
        mins = F.array_min(F.transform(sh, salted(i)))
        cols.append(F.coalesce(mins, F.lit(-1)).alias(f"sig_{i}"))
    return df.select(*cols)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via LSH banding.

    k signatures split into `bands` bands of k/bands rows; docs sharing any
    band key are candidates. The self-join is an equi-join on the band key —
    shuffles only (band_key, id); at 100 TB the hot path is band-bucket skew,
    mitigated by AQE skew-join (enabled in session defaults).
    """
    assert k % bands == 0, "k must divide evenly into bands"
    rows_per_band = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k, shingle_n)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws(",", *parts)).alias("key"))
        )
    keyed = sigs.select(
        id_col, F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify stage)
# ---------------------------------------------------------------------------

def shingle_sets(df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct shingle sets."""
    return (
        df.select(
            F.col(id_col).cast("long").alias(id_col),
            F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("shingle"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over n-gram shingle sets for pairs above
    `threshold`. Without `candidates`, pairs are generated by joining on
    shared shingles (blocking on content, never a cross join); with
    `candidates` (e.g. LSH output), only those pairs are scored.

    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = shingle_sets(df, id_col, text_col, shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document as a 16-hex-char string.

    Per token: 64 bits of md5(token)[:16]. Per bit: majority vote (+1/-1)
    across tokens. Pure expressions over arrays — a narrow map stage, no
    shuffle, no UDF: for each of 16 hex digits we sum per-token nibble bits
    and reassemble a hex digit.
    """
    from beacon_indexer_spark.operators.text import tokens

    tk = F.array_distinct(tokens(F.lower(F.col(text_col))))
    hashes = F.transform(tk, lambda t: F.substring(F.md5(t), 1, 16))

    def nib_at(pos: int):
        return lambda h: F.conv(F.substring(h, pos, 1), 16, 10).cast("int")

    def vote(bit: int):
        return lambda acc, v: acc + F.when(F.floor(v / bit) % 2 == 1, 1).otherwise(-1)

    digits = []
    for pos in range(1, 17):  # hex digit positions in the md5 prefix
        nib = F.transform(hashes, nib_at(pos))
        bits = []
        for bit in (8, 4, 2, 1):
            votes = F.aggregate(nib, F.lit(0), vote(bit))
            bits.append(F.when(votes > 0, F.lit(1)).otherwise(F.lit(0)))
        digit_val = bits[0] * 8 + bits[1] * 4 + bits[2] * 2 + bits[3]
        digits.append(F.lower(F.conv(digit_val.cast("string"), 10, 16)))
    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.concat(*digits).alias("simhash"),
    )


def simhash_candidates(
    df: DataFrame, id_col: str, text_col: str, bands: int = 4
) -> DataFrame:
    """Near-dup candidates: docs sharing any of `bands` contiguous simhash
    segments (Hamming-ball blocking). Same join shape as minhash LSH."""
    sh = simhash(df, id_col, text_col)
    seg = 16 // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("simhash", b * seg + 1, seg).alias("key"),
        )
        for b in range(bands)
    ]
    keyed = sh.select(id_col, F.explode(F.array(*band_cols)).alias("bk")).select(
        id_col, "bk.band", "bk.key"
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
