"""Parquet lake: the engine's primary store.

Layout matches the reference's own Parquet backend
(``src/services/parquet_storage.py:30-43,91-109`` in /root/reference):
``{base}/{table}/date=YYYY-MM-DD/part-*.parquet`` — hive-style daily
partitions derived from ``slot_timestamp``, every row stamped with
``inserted_at``. Non-slot config tables (``genesis``/``specs``) are
unpartitioned single-row tables.

Semantics (reference ReplacingMergeTree, SURVEY §1.3):
- **append-only**: every write appends; duplicate keys across writes are
  expected (re-fetch, re-transform, re-org).
- **latest-wins on read**: ``read_latest`` applies the ``latest()`` dedup on
  the table's declared key/version — the FINAL-read analogue.
- **repair = partition overwrite**: ``overwrite_date_partitions`` replaces
  only the affected daily partitions (dynamic partitionOverwriteMode),
  standing in for the reference's ``ALTER TABLE ... DELETE`` + mutation
  throttle (``src/services/maintenance.py:207-275``) with a plain
  idempotent write.
- **compaction**: ``compact`` rewrites a table's partitions keeping only the
  latest version per key — the background-merge analogue, run explicitly.

Scale notes: daily partitions keep each overwrite bounded (~7k slots/day);
writes sort within partitions by slot so parquet row-group min/max stats
make slot-range predicates prune at the row-group level, which is what the
reference's ``ORDER BY (slot, ...)`` sparse index buys it.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beacon_indexer_spark.config import ForkSchedule
from beacon_indexer_spark.functions.core import latest, slot_timestamp
from beacon_indexer_spark.schemas.raw import RAW_KEY, RAW_TABLES, RAW_VERSION
from beacon_indexer_spark.schemas.structured import STRUCTURED_TABLES

_UNPARTITIONED = {"genesis", "specs", "raw_genesis", "raw_specs", "time_helpers"}


def compact_manifest(spark: SparkSession, path: str, keys: list[str],
                     version: str, schema) -> None:
    """Latest-wins rewrite for a control manifest (ledger / progress): the
    append-per-status-change model accumulates one tiny file per transition
    — this collapses the directory to current state in one file. Same
    tmp-swap discipline as :meth:`ParquetLake.compact` (never overwrite a
    path while reading it)."""
    import shutil

    from beacon_indexer_spark.functions.core import latest

    if not os.path.isdir(path):
        return
    df = spark.read.schema(schema).parquet(path)
    deduped = latest(df, keys, version, method="window")
    tmp = path + "__compact_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    deduped.coalesce(1).write.mode("overwrite").parquet(tmp)
    old = path + "__pre_compact"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


class ParquetSink:
    """Structured-table writer into the Parquet lake (default backend)."""

    def __init__(self, lake: "ParquetLake"):
        self.lake = lake

    def write(self, table: str, df: DataFrame, mode: str = "append") -> None:
        self.lake.write(table, df, mode=mode)


class ClickHouseSink:
    """Structured-table writer into ClickHouse via JDBC. Always appends —
    ClickHouse's ReplacingMergeTree is the upsert (repair overwrites become
    version-winning inserts, reference SURVEY §1.3), so ``mode`` is
    accepted for interface parity and ignored."""

    def __init__(self, url: str, **kw):
        self.url = url
        self.kw = kw

    def write(self, table: str, df: DataFrame, mode: str = "append") -> None:
        from beacon_indexer_spark.sources.clickhouse import write_clickhouse

        write_clickhouse(df, table, self.url, **self.kw)


def make_sink(kind: str, lake: "ParquetLake", clickhouse_url: str | None = None, **kw):
    """Storage-backend selection (reference
    ``src/services/storage_factory.py:4-13``): 'parquet' | 'clickhouse'."""
    if kind == "parquet":
        return ParquetSink(lake)
    if kind == "clickhouse":
        if not clickhouse_url:
            raise ValueError("clickhouse sink requires --clickhouse-url")
        return ClickHouseSink(clickhouse_url, **kw)
    raise ValueError(f"unknown sink {kind!r} (expected parquet|clickhouse)")


def table_key_version(table: str) -> tuple[list[str], str]:
    """Dedup key + latest-wins version column for any table in the lake."""
    if table in STRUCTURED_TABLES:
        spec = STRUCTURED_TABLES[table]
        return list(spec.keys), spec.version
    if table in RAW_TABLES:
        return list(RAW_KEY if table not in _UNPARTITIONED else ("payload_hash",)), RAW_VERSION
    raise KeyError(f"unknown table {table!r}")


class ParquetLake:
    def __init__(self, spark: SparkSession, base_dir: str, schedule: ForkSchedule):
        self.spark = spark
        self.base_dir = base_dir
        self.schedule = schedule

    def path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def drop(self, table: str) -> bool:
        """Remove a table directory entirely. Returns True if it existed.

        Used by report-style writers (e.g. ``curate``) to clear stale
        outputs from a previous run that the current run did not request,
        so downstream readers can't pair a fresh manifest with an old
        report table."""
        p = self.path(table)
        if not os.path.isdir(p):
            return False
        shutil.rmtree(p)
        return True

    # -- write ------------------------------------------------------------

    def _prepare(self, df: DataFrame) -> DataFrame:
        """Stamp the storage columns the reference's writer adds
        (parquet_storage.py:75-109): slot_timestamp (if absent), date
        partition, inserted_at."""
        if "slot" in df.columns and "slot_timestamp" not in df.columns:
            df = df.withColumn(
                "slot_timestamp",
                slot_timestamp(
                    "slot", self.schedule.genesis_time, self.schedule.seconds_per_slot
                ),
            )
        if "slot_timestamp" in df.columns:
            df = df.withColumn("date", F.to_date("slot_timestamp"))
        # stamp only when absent: a frame that CARRIES its stamp (compact
        # rewrite, replayed batch) keeps it — restamping would make
        # storage maintenance look like fresh data to watermark-based
        # consumers (refresh_rollup) and force spurious full rebuilds
        if "inserted_at" in df.columns:
            return df
        return df.withColumn(
            "inserted_at", F.lit(datetime.now(timezone.utc)).cast("timestamp")
        )

    def write(self, table: str, df: DataFrame, mode: str = "append") -> None:
        df = self._prepare(df)
        writer = df.write.mode(mode)
        if "date" in df.columns and table not in _UNPARTITIONED:
            # sortWithinPartitions(slot): row-group stats → slot-range pruning
            sort_keys = [c for c in ("slot",) if c in df.columns]
            if sort_keys:
                df = df.sortWithinPartitions(*sort_keys)
                writer = df.write.mode(mode)
            writer = writer.partitionBy("date")
        writer.parquet(self.path(table))
        # a partitioned write of 0 rows leaves a schema-less directory (only
        # _SUCCESS) that breaks subsequent reads. Checked AFTER the write —
        # a pre-write isEmpty() would execute part of the input job (e.g.
        # the HTTP fetch stage) twice.
        target = self.path(table)
        has_data = any(
            f.endswith(".parquet")
            for _, _, files in os.walk(target)
            for f in files
        )
        if not has_data:
            import shutil

            shutil.rmtree(target, ignore_errors=True)

    def overwrite_date_partitions(self, table: str, df: DataFrame) -> None:
        """Repair path: replace exactly the daily partitions present in
        ``df`` (requires spark.sql.sources.partitionOverwriteMode=dynamic,
        set by session.get_spark)."""
        self.write(table, df, mode="overwrite")

    # -- read -------------------------------------------------------------

    def read(self, table: str) -> DataFrame:
        """Raw append-only read — duplicates (re-orgs, re-transforms)
        included. Most callers want :meth:`read_latest`."""
        return self.spark.read.parquet(self.path(table))

    def read_latest(self, table: str, slot_range: tuple[int, int] | None = None) -> DataFrame:
        """FINAL-semantics read: latest version per table key, optional
        slot-range pushdown applied *before* the dedup shuffle."""
        df = self.read(table)
        if slot_range is not None and "slot" in df.columns:
            lo, hi = slot_range
            df = df.filter((F.col("slot") >= lo) & (F.col("slot") <= hi))
        keys, version = table_key_version(table)
        return latest(df, keys, version)

    # -- maintenance ------------------------------------------------------

    def compact(self, table: str) -> None:
        """Rewrite the table keeping only the latest version per key — the
        ReplacingMergeTree background-merge analogue, run explicitly.

        Writes to a temp sibling directory and swaps it in: overwriting the
        path being read relies on cache retention, and a mid-write cache
        eviction or executor loss would recompute lineage from files the
        overwrite is concurrently deleting — destroying the table."""
        import shutil

        tmp = ParquetLake(self.spark, self.base_dir + "__compact_tmp", self.schedule)
        if os.path.isdir(tmp.path(table)):
            shutil.rmtree(tmp.path(table))
        # keep inserted_at: compaction is physical maintenance, not new
        # data — preserving stamps keeps it invisible to watermark readers
        deduped = self.read_latest(table).drop("date")
        tmp.write(table, deduped, mode="overwrite")
        old = self.path(table) + "__pre_compact"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(self.path(table), old)
        os.rename(tmp.path(table), self.path(table))
        shutil.rmtree(old)

    def write_bucketed(
        self,
        table: str,
        df: DataFrame,
        bucket_cols: list[str],
        num_buckets: int = 32,
        sort_cols: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Hash-bucketed external table for CO-LOCATED joins/aggregations:
        pre-shuffles `df` by `bucket_cols` at WRITE time so every later
        equi-join or groupBy on that key between same-bucketed tables
        runs with ZERO Exchange — at 100 TB the shuffle of a fact⋈fact
        join is paid once at ingest instead of per query (the classic
        bucketed-warehouse layout; optional per-bucket sort additionally
        enables sort-merge joins without a runtime sort).

        The explicit `repartition(num_buckets, keys)` before the write
        makes each task hold exactly one bucket → ONE file per bucket,
        not tasks×buckets small files. Bucket metadata lives in the
        session catalog (`saveAsTable` with an explicit path = external
        table); in production point the session at a shared metastore so
        the layout outlives the session — the data files themselves are
        plain parquet either way, readable (bucket-blind) by any reader.
        """
        writer = (
            df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
            .write.mode(mode)
            .format("parquet")
            .option("path", self.path(table))
            .bucketBy(num_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(table)

    def read_bucketed(self, table: str) -> DataFrame:
        """Catalog read that preserves bucket metadata (a bare
        `spark.read.parquet(path)` sees the same rows but loses the
        co-location guarantee and re-shuffles on join)."""
        return self.spark.table(table)

    def refresh_rollup(
        self,
        source_table: str,
        rollup_table: str,
        agg_fn,
        dates: list | None = None,
    ) -> dict:
        """Incrementally maintain a derived daily aggregate: recompute ONLY
        the date partitions whose source data changed since the rollup was
        last built, and dynamically overwrite exactly those partitions —
        the C9 partition-overwrite repair path applied to materialized
        rollups, so a 10-year rollup over a 100 TB fact table refreshes in
        O(changed days), never a full rebuild.

        Change detection compares the source's per-date
        ``max(inserted_at)`` against the ``source_watermark`` column the
        rollup itself carries (stamped from the SOURCE rows each refresh
        — never from the rollup's own write time, which would silently
        skip a source append that lands, or carries an earlier clock
        stamp, while a refresh is mid-flight). New source versions bump
        the watermark, so re-orgs and re-transforms re-trigger their
        day. The watermark frames are one row per day — the only driver
        materialization, bounded like the control-plane manifests; the
        source-side watermark scan reads one timestamp column per
        refresh (columnar scan, map-side combined — swap in a writer-
        maintained manifest if even that is too hot).

        ``agg_fn``: callable mapping the latest-version rows of the
        affected days to the rollup frame; its output MUST carry the
        ``date`` column (the partition key being overwritten). The
        written rollup gains a ``source_watermark`` column.
        """
        raw_src = self.read(source_table)
        src_w = raw_src.groupBy("date").agg(
            F.max("inserted_at").alias("source_watermark")
        )
        if dates is None:
            if self.exists(rollup_table):
                roll_w = self.read(rollup_table).groupBy("date").agg(
                    F.max("source_watermark").alias("__rw")
                )
                changed = src_w.join(roll_w, "date", "left").filter(
                    F.col("__rw").isNull()
                    | (F.col("source_watermark") > F.col("__rw"))
                )
            else:
                changed = src_w
            dates = [r["date"] for r in changed.select("date").collect()]
        if not dates:
            return {"refreshed_dates": []}
        keys, version = table_key_version(source_table)
        affected = latest(raw_src.filter(F.col("date").isin(list(dates))), keys, version)
        out = agg_fn(affected)
        if "date" not in out.columns:
            raise ValueError("rollup agg_fn output must keep the 'date' column")
        out = out.join(F.broadcast(src_w), "date", "left")
        self.overwrite_date_partitions(rollup_table, out)
        return {"refreshed_dates": sorted(str(d) for d in dates)}

    def table_stats(self, table: str) -> dict:
        """count / min(slot) / max(slot) health check (reference A1,
        ``src/services/loader.py:349-374``)."""
        df = self.read(table)
        if "slot" not in df.columns:
            return {"table": table, "rows": df.count(), "min_slot": None, "max_slot": None}
        row = df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("slot").alias("min_slot"),
            F.max("slot").alias("max_slot"),
        ).collect()[0]
        return {"table": table, "rows": row["rows"],
                "min_slot": row["min_slot"], "max_slot": row["max_slot"]}
