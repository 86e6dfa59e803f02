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


def _ref(df: DataFrame, c: str) -> "F.Column":
    """EXACT-name column reference: both ``F.col`` and ``df[...]`` parse
    dots as struct-path access, so a literal column name must be
    backtick-quoted (internal backticks doubled, per the SQL identifier
    rule). Fails fast with the schema's own KeyError if absent."""
    df.schema[c]
    return F.col("`" + c.replace("`", "``") + "`")


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
            _ref(df, c).isNull(), F.lit(None).cast("string")
        ).otherwise(F.to_json(F.struct(_ref(df, c).alias("v"))))
    if isinstance(dt, BinaryType):
        return F.base64(_ref(df, c))
    return _ref(df, c).cast("string")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile `cols` of `df`; returns (col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value), one row per column, min/max as
    strings.

    Injection-safe for ARBITRARY column names (quotes, commas, spaces,
    dots — reachable via the CLI `maintain profile --table/--columns`
    on any lake table): names are resolved via `_ref`'s backtick-quoted
    exact match (never ``F.col``'s dotted-path parse), aggregate aliases are
    POSITIONAL (``__null_{i}``), and the wide→long unpivot is an
    explode of Column-API structs whose name field is ``F.lit(c)`` —
    no user string is ever spliced into SQL text. A name absent from
    the frame raises the schema lookup's own error."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(_ref(df, c).isNull().cast("long")).alias(f"__null_{i}"),
            F.min(_ref(df, c)).cast("string").alias(f"__min_{i}"),
            F.max(_ref(df, c)).cast("string").alias(f"__max_{i}"),
        ]
    row = df.agg(*aggs)
    base = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"__null_{i}").alias("n_nulls"),
                        F.col(f"__min_{i}").alias("min_value"),
                        F.col(f"__max_{i}").alias("max_value"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("__s"),
        F.col("__n").alias("n_rows"),
    ).select(
        F.col("__s.col_name").alias("col_name"),
        F.col("__s.n_nulls").alias("n_nulls"),
        F.col("__s.min_value").alias("min_value"),
        F.col("__s.max_value").alias("max_value"),
        "n_rows",
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
    A NULL predicate result counts as a violation (unknown ≠ verified).
    Rule names are emitted as ``F.lit`` struct fields, never spliced
    into SQL text — a quote or comma in a name cannot break the plan."""
    if not rules:
        raise ValueError("check_constraints requires at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, pred) in enumerate(rules):
        aggs.append(
            F.sum(F.when(pred, 0).otherwise(1)).alias(f"__v{i}")
        )
    row = df.agg(*aggs)
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(f"__v{i}").alias("n_violations"),
                    )
                    for i, (name, _) in enumerate(rules)
                ]
            )
        ).alias("__s"),
        F.col("__n").alias("n_rows"),
    ).select(
        F.col("__s.rule").alias("rule"),
        F.col("__s.n_violations").alias("n_violations"),
        "n_rows",
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
