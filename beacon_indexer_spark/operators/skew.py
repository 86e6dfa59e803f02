"""Skew mitigation: salted joins for hot keys.

AQE's skew-join handles most cases (enabled in session defaults); explicit
salting remains the tool when a single join key dominates so heavily that
even split shuffle blocks overload their readers (e.g. joining events
against a dimension where one user_id is 30% of the table).

Pattern: the skewed (large) side gets a pseudo-random salt in [0, n); the
small side is replicated n ways with every salt; the join key becomes
(key, salt), spreading each hot key over n reducers. Join RESULTS are
independent of which salt a row gets — only the routing changes — so a
nondeterministic salt source is safe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the small side replicated
    ``n_salts``×. The small side grows n× (keep it genuinely small or
    broadcastable); each hot key's rows spread over n shuffle partitions."""
    assert _SALT not in skewed.columns and _SALT not in small.columns
    left = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    right = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, [*on, _SALT], how).drop(_SALT)


def salted_group_count(
    df: DataFrame, keys: Sequence[str], n_salts: int = 16
) -> DataFrame:
    """Two-phase count for heavily skewed group keys: partial count per
    (key, salt) then final sum per key. Spark's hash aggregate already does
    map-side partial aggregation — this adds an extra reduce tier for the
    case where even one reducer per key is too much (extreme cardinality
    skew with huge per-key state)."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("count"))
