"""Table profiling (data-quality summary, Deequ/Great-Expectations shape).

One row per profiled column: row count, null count, distinct count, and
min/max rendered as strings. The pipeline use is drift detection on raw
feeds — a nullable-spike or cardinality collapse in an upstream export is
caught here before it poisons a training mix.

Scale design: ONE aggregation pass produces every metric (Spark compiles
the multi-count-distinct into a single Expand + two-stage aggregate with
map-side partial merge — ~#cols× row replication, each replica one narrow
column, far cheaper than #cols separate scans). The wide one-row result is
then unpivoted driver-free with `stack`. Columns are profiled as given:
pre-cast floating/timestamp columns to DECIMAL/formatted strings upstream
if the caller needs engine-portable min/max rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile `cols` of `df` in one aggregation pass; returns
    (col_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    with one row per profiled column, min/max as strings."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(col_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.coalesce(F.col("n_nulls"), F.lit(0)).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )
