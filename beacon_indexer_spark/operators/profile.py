"""Table profiling (data-quality summary, Deequ/Great-Expectations shape).

One row per profiled column: row count, null count, distinct count, and
min/max rendered as strings. The pipeline use is drift detection on raw
feeds — a nullable-spike or cardinality collapse in an upstream export is
caught here before it poisons a training mix.

Scale design: two aggregation passes, both hash-aggregable.
(1) count/nulls/min/max: ONE expand-free pass over the table (map-side
combined). (2) distinct counts: the naive form — COUNT(DISTINCT c) for
every column in one agg — makes Catalyst plan a #cols× Expand feeding
SortAggregates (string-typed agg buffers can't use the hash aggregate),
which sorts #cols·N rows: measured 3.5 s on 150k rows. Instead the
columns unpivot to (col, value) pairs and dedup via groupBy — both
stages HashAggregate, partial-combined before the (col, value) shuffle.
That shuffle is the exact-distinct cost (inherent to an exact answer);
for estimate-grade profiling of ultra-high-cardinality columns swap in
operators/sketch.py `kmv_distinct`, whose prefiltered shuffle is
denom× smaller.

Columns are profiled as given: pre-cast floating/timestamp columns to
DECIMAL/date upstream so both engines render min/max identically. The
string cast in the distinct pass is injective for such columns, so
cardinalities are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _distinct_key(df: DataFrame, c: str) -> "F.Column":
    """String key for the distinct pass that stays INJECTIVE per type:
    plain casts collide for nested/binary values (['a, b'] and ['a','b']
    both render '[a, b]'), so arrays/maps/structs go through to_json and
    binary through base64 — a cardinality profiler must never undercount
    the cardinality it exists to watch."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        MapType,
        StructType,
    )

    dt = df.schema[c].dataType
    if isinstance(dt, (ArrayType, MapType, StructType)):
        # to_json(struct(NULL)) renders '{}', not NULL — keep nulls null
        # so the distinct pass's isNotNull filter still skips them
        return F.when(
            F.col(c).isNull(), F.lit(None).cast("string")
        ).otherwise(F.to_json(F.struct(F.col(c).alias("v"))))
    if isinstance(dt, BinaryType):
        return F.base64(F.col(c))
    return F.col(c).cast("string")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile `cols` of `df`; returns (col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value), one row per column, min/max as
    strings."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __null_{c}, __min_{c}, __max_{c}" for c in cols
    )
    base = row.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(col_name, n_nulls, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    )
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        _distinct_key(df, c).alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.c", "s.v")
    nd = (
        pairs.filter(F.col("v").isNotNull())  # COUNT(DISTINCT) skips nulls
        .distinct()
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .withColumnRenamed("c", "col_name")
        .select("col_name", "__nd")
    )
    return base.join(F.broadcast(nd), "col_name", "left").select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.coalesce(F.col("n_nulls"), F.lit(0)).cast("long").alias("n_nulls"),
        F.coalesce(F.col("__nd"), F.lit(0)).cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def check_constraints(df: DataFrame, rules: list[tuple[str, "F.Column"]]) -> DataFrame:
    """Deequ-style data-quality gate: each rule is (name, row-level
    boolean Column); returns one report row per rule —
    (rule, n_rows, n_violations, passed) — from ONE aggregation pass
    (map-side combined; adding a rule adds a column, never a scan).
    A NULL predicate result counts as a violation (unknown ≠ verified)."""
    if not rules:
        raise ValueError("check_constraints requires at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, pred) in enumerate(rules):
        aggs.append(
            F.sum(F.when(pred, 0).otherwise(1)).alias(f"__v{i}")
        )
    row = df.agg(*aggs)
    stacked = ", ".join(f"'{name}', __v{i}" for i, (name, _) in enumerate(rules))
    return row.select(
        F.expr(f"stack({len(rules)}, {stacked}) AS (rule, n_violations)"),
        F.col("__n").alias("n_rows"),
    ).select(
        "rule",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).cast("int").alias("passed"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Uniqueness constraint in the same report shape: violations =
    n_rows − n_distinct(key). A single-distinct aggregate (two-stage,
    no Expand) — union the result with `check_constraints` output for
    one combined report."""
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct(*[F.col(c) for c in cols]).alias("__nd"),
    )
    return agg.select(
        F.lit(name).alias("rule"),
        F.col("__n").cast("long").alias("n_rows"),
        (F.col("__n") - F.col("__nd")).cast("long").alias("n_violations"),
        (F.col("__n") == F.col("__nd")).cast("int").alias("passed"),
    )
