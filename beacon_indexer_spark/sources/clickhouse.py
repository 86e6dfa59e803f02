"""Optional ClickHouse sink (reference K1-K4, ``src/services/clickhouse.py``
in /root/reference).

The Parquet lake is the primary store (the reference's own second backend);
ClickHouse becomes a *sink option* via Spark's JDBC writer. What survives
of the reference's 700-line insert machinery:

- **type normalization** (``clickhouse.py:452-475``): bools → UInt8 ints,
  nested dict/struct → JSON strings, naive datetimes. Here these are
  explicit column casts applied *once*, JVM-side, instead of per-row Python.
- **per-table batch sizing** (``transformer.py:14-21``: transactions 100,
  attestations 500, validators 5000, default 10000) → JDBC ``batchsize``.
- **bounded write concurrency** (semaphore(4), ``transformer.py:86``) →
  ``numPartitions`` coalesce hint.

Everything else (row chunking, 64MB flush, 128MB large-row RowBinary
fallback, connection pooling) is the JDBC driver's / ClickHouse server's
job. The JDBC driver jar is not shipped in this environment — the writer
raises a clear error if the class is missing; the option/normalization
logic is fully testable without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference src/services/transformer.py:14-21
WRITE_BATCH_ROWS = {
    "transactions": 100,
    "attestations": 500,
    "validators": 5000,
}
DEFAULT_BATCH_ROWS = 10_000
MAX_CONCURRENT_WRITES = 4  # reference semaphore(4)

JDBC_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def normalize_for_clickhouse(df: DataFrame) -> DataFrame:
    """Cast columns the way the reference's row normalizer does
    (``clickhouse.py:452-475``): booleans → 0/1 ints (UInt8), structs and
    maps → JSON strings. Arrays of primitives pass through (the ClickHouse
    JDBC driver handles Array types natively)."""
    out = df
    for field in df.schema.fields:
        dt = field.dataType
        if isinstance(dt, T.BooleanType):
            out = out.withColumn(field.name, F.col(field.name).cast("int"))
        elif isinstance(dt, (T.StructType, T.MapType)):
            out = out.withColumn(field.name, F.to_json(F.col(field.name)))
    return out


def clickhouse_jdbc_options(
    url: str,
    table: str,
    user: str = "default",
    password: str = "",
    database: str = "beacon",
    batch_rows: int | None = None,
    settings: dict[str, str] | None = None,
) -> dict[str, str]:
    """JDBC writer options with the reference's operational tuning."""
    opts = {
        "url": url if url.startswith("jdbc:") else f"jdbc:clickhouse://{url}/{database}",
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": JDBC_DRIVER,
        "batchsize": str(batch_rows or WRITE_BATCH_ROWS.get(table, DEFAULT_BATCH_ROWS)),
        "isolationLevel": "NONE",  # ClickHouse has no transactions
    }
    for k, v in (settings or {}).items():
        opts[k] = v
    return opts


def read_clickhouse(
    spark,
    table_or_query: str,
    url: str,
    partition_column: str | None = "slot",
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **kw,
) -> DataFrame:
    """Optional ClickHouse *scan* (reference S11,
    ``src/services/clickhouse.py:411-428``): parameterized query → DataFrame
    via JDBC, range-partitioned on ``slot`` so the read parallelizes instead
    of streaming through one connection."""
    opts = clickhouse_jdbc_options(url, table_or_query, **kw)
    reader = spark.read.format("jdbc").options(**opts)
    if partition_column and lower_bound is not None and upper_bound is not None:
        reader = reader.options(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return reader.load()


def _require_driver(spark) -> None:
    try:
        spark._jvm.java.lang.Class.forName(JDBC_DRIVER)  # noqa: SLF001
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "ClickHouse JDBC driver not on the Spark classpath — add "
            "com.clickhouse:clickhouse-jdbc via spark.jars.packages to use "
            "the ClickHouse sink (Parquet lake is the primary store)"
        ) from e


def plan_clickhouse_write(df: DataFrame, table: str, url: str, **kw):
    """Build the EXACT DataFrameWriter the sink will ``.save()`` —
    normalization, coalesce bound, format, full option dict, and mode —
    without executing it. This is the jar-less contract-test seam: the
    container ships no ClickHouse JDBC jar, so tests intercept the
    returned writer's ``save`` and assert the option dict instead of
    round-tripping through a server (tests/test_cli_sink.py). Everything
    up to the JDBC handshake is covered; the handshake itself (driver
    class, server DDL) is the documented untested boundary (README)."""
    opts = clickhouse_jdbc_options(url, table, **kw)
    writer = (
        normalize_for_clickhouse(df)
        .coalesce(MAX_CONCURRENT_WRITES)
        .write.format("jdbc")
        .options(**opts)
        .mode("append")
    )
    return writer, opts


def write_clickhouse(df: DataFrame, table: str, url: str, **kw) -> None:
    """Append ``df`` into a ClickHouse table. Normalizes types, bounds
    write parallelism to the reference's 4 concurrent inserts."""
    _require_driver(df.sparkSession)
    writer, _ = plan_clickhouse_write(df, table, url, **kw)
    writer.save()
