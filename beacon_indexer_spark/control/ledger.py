"""Work-queue ledger + progress manifest (reference control plane, SURVEY §2.11).

The reference coordinates work through two ClickHouse tables —
``load_state_chunks`` (claim/complete ledger, C1-C4) and
``transformer_progress`` (transform ranges, C6-C8) — with status updates as
ReplacingMergeTree INSERTs read back through FINAL
(``src/services/clickhouse.py:206-238``, ``migrations/004_state_tables.sql``).

In Spark the *scheduler* replaces claim/worker logic; what survives is the
**manifest**: which (loader, slot-range) chunks are loaded, which are
transformed, where the gaps are. We keep the identical append-only +
latest-wins model over Parquet so the ledger itself is idempotent and
re-org-safe:

- ``mark(...)`` appends status rows (pending→claimed→completed|failed);
- readers dedup on ``chunk_id`` keeping max ``updated_at`` — the FINAL read;
- discovery queries are anti-joins, not mutations.

Scale notes: the ledger is tiny (one row per 1000-slot chunk — ~10M slots →
~10k rows), so every join against it broadcasts. Gap analysis anti-joins a
generated ``spark.range`` against the *distinct* slots actually present —
the distinct is a map-side-combined agg on the already-pruned slot column.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beacon_indexer_spark.functions.core import last_slot_of_day, latest
from beacon_indexer_spark.schemas.raw import LOAD_STATE_CHUNKS, TRANSFORMER_PROGRESS

PENDING, CLAIMED, COMPLETED, FAILED = "pending", "claimed", "completed", "failed"
PROCESSING = "processing"


def _now() -> datetime:
    return datetime.now(timezone.utc)


def _read_or_empty(spark: SparkSession, path: str, schema) -> DataFrame:
    """Manifest read that treats a never-written manifest as empty."""
    import os

    if not os.path.isdir(path):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(path)


# ---------------------------------------------------------------------------
# chunk generation (reference C1, src/services/loader.py:487-758)
# ---------------------------------------------------------------------------

def chunk_id(loader_name: str, start_slot: int, end_slot: int) -> str:
    """Deterministic chunk identity — same range → same id, so re-planning
    is idempotent (the reference uses uuid4 + dedup-by-range; deterministic
    ids make the dedup structural)."""
    return f"{loader_name}_{start_slot}_{end_slot}"


def generate_chunks(
    spark: SparkSession,
    start_slot: int,
    end_slot: int,
    chunk_size: int,
    loader_name: str,
    completed: DataFrame | None = None,
) -> DataFrame:
    """Partition [start_slot, end_slot] into CHUNK_SIZE-aligned pending
    chunks, floor-aligning the start (reference behavior) and skipping
    ranges already completed (anti-join on the cached completed set,
    reference ``src/services/loader.py:492-528``)."""
    aligned_start = (start_slot // chunk_size) * chunk_size
    ids = spark.range(aligned_start, end_slot + 1, chunk_size).select(
        F.col("id").alias("start_slot"),
        F.least(F.col("id") + chunk_size - 1, F.lit(end_slot)).alias("end_slot"),
    )
    now = F.lit(_now()).cast("timestamp")
    chunks = ids.select(
        F.concat_ws("_", F.lit(loader_name), "start_slot", "end_slot").alias("chunk_id"),
        "start_slot",
        "end_slot",
        F.lit(loader_name).alias("loader_name"),
        F.lit(PENDING).alias("status"),
        F.lit(None).cast("string").alias("worker_id"),
        now.alias("created_at"),
        now.alias("updated_at"),
    )
    if completed is not None:
        chunks = chunks.join(
            F.broadcast(completed.select("start_slot", "end_slot", "loader_name")),
            ["start_slot", "end_slot", "loader_name"],
            "left_anti",
        )
    return chunks


def daily_slots(
    spark: SparkSession,
    start_slot: int,
    end_slot: int,
    genesis_time: int,
    seconds_per_slot: int,
) -> DataFrame:
    """Validator daily-snapshot targets: the last slot of each UTC day in
    range (reference P9, ``src/loaders/validators.py:116-149``) — a pure
    column predicate over a generated range, no driver loop."""
    return (
        spark.range(start_slot, end_slot + 1)
        .select(F.col("id").alias("slot"))
        .filter(last_slot_of_day("slot", genesis_time, seconds_per_slot))
    )


# ---------------------------------------------------------------------------
# ledger (append-only + latest-wins, reference C2/C3)
# ---------------------------------------------------------------------------

class ChunkLedger:
    """``load_state_chunks`` as an append-only Parquet manifest."""

    TABLE = "load_state_chunks"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def append(self, df: DataFrame) -> None:
        df.select([f.name for f in LOAD_STATE_CHUNKS.fields]).write.mode("append").parquet(
            self.path
        )

    def mark(
        self, chunks: DataFrame, status: str, worker_id: str | None = None
    ) -> None:
        """Status transition = INSERT of a new version row (reference
        ``src/services/clickhouse.py:206-238``)."""
        self.append(
            chunks.withColumn("status", F.lit(status))
            .withColumn("worker_id", F.lit(worker_id).cast("string"))
            .withColumn("updated_at", F.lit(_now()).cast("timestamp"))
        )

    def current(self) -> DataFrame:
        """FINAL read: latest status row per chunk_id."""
        raw = _read_or_empty(self.spark, self.path, LOAD_STATE_CHUNKS)
        return latest(raw, ["chunk_id"], "updated_at", method="window")

    def with_status(self, status: str) -> DataFrame:
        return self.current().filter(F.col("status") == status)

    def counts(self) -> DataFrame:
        """Grouped chunk counts (reference A2/A3 overview,
        ``src/services/clickhouse.py:240-284``)."""
        return (
            self.current()
            .groupBy("loader_name")
            .agg(
                F.count(F.lit(1)).alias("total"),
                *[
                    F.sum(F.when(F.col("status") == s, 1).otherwise(0)).alias(s)
                    for s in (PENDING, CLAIMED, COMPLETED, FAILED)
                ],
            )
        )

    def debug_counts(self) -> dict:
        """Raw (append-only) vs FINAL (latest-wins) row counts — the
        reference's duplicate-awareness check (``scripts/chunks.py:99-136``:
        counting without FINAL overstates; the delta is the un-compacted
        version history, normal for the append model)."""
        raw = _read_or_empty(self.spark, self.path, LOAD_STATE_CHUNKS).count()
        return {"raw_rows": raw, "final_rows": self.current().count()}

    def stale_claimed(self, timeout: timedelta = timedelta(minutes=30)) -> DataFrame:
        """Chunks claimed longer than ``timeout`` ago with no newer status —
        the stuck-worker inspection (reference ``scripts/chunks.py`` +
        maintenance stale handling). Read through current() so a completed
        re-claim doesn't false-positive (the FINAL trap)."""
        cutoff = _now() - timeout
        return self.current().filter(
            (F.col("status") == CLAIMED) & (F.col("updated_at") < F.lit(cutoff))
        )

    def compact(self) -> None:
        """Collapse the append-only ledger to current state — the control-
        plane small-file hygiene pass (run alongside table compaction)."""
        from beacon_indexer_spark.sources.storage import compact_manifest

        compact_manifest(
            self.spark, self.path, ["chunk_id"], "updated_at", LOAD_STATE_CHUNKS
        )

    def reset(
        self,
        statuses: tuple[str, ...] = (CLAIMED, FAILED),
        slot_range: tuple[int, int] | None = None,
        loaders: tuple[str, ...] | None = None,
    ) -> int:
        """Reset chunks to pending (reference C11,
        ``src/services/maintenance.py:669-715``); returns count reset."""
        cur = self.current().filter(F.col("status").isin(*statuses))
        if slot_range is not None:
            cur = cur.filter(
                (F.col("start_slot") >= slot_range[0]) & (F.col("end_slot") <= slot_range[1])
            )
        if loaders is not None:
            cur = cur.filter(F.col("loader_name").isin(*loaders))
        n = cur.count()
        if n:
            self.mark(cur, PENDING)
        return n


class ProgressManifest:
    """``transformer_progress`` as an append-only Parquet manifest."""

    TABLE = "transformer_progress"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def record(
        self,
        raw_table: str,
        start_slot: int,
        end_slot: int,
        status: str,
        processed_count: int = 0,
        failed_count: int = 0,
        error_message: str | None = None,
    ) -> None:
        self.record_many(
            [(raw_table, start_slot, end_slot, status, processed_count,
              failed_count, error_message)]
        )

    def record_many(
        self, rows: list[tuple[str, int, int, str, int, int, str | None]]
    ) -> None:
        """Batch progress append: N status rows in ONE parquet file —
        the small-file guard for batched transforms and stale resets
        (one file per row would accumulate thousands of tiny manifests)."""
        if not rows:
            return
        now = _now()
        stamped = [(*r, now) for r in rows]
        self.spark.createDataFrame(
            stamped, TRANSFORMER_PROGRESS
        ).coalesce(1).write.mode("append").parquet(self.path)

    def current(self) -> DataFrame:
        raw = _read_or_empty(self.spark, self.path, TRANSFORMER_PROGRESS)
        return latest(
            raw, ["raw_table_name", "start_slot", "end_slot"], "processed_at",
            method="window",
        )

    def completed_ranges(self, raw_table: str) -> DataFrame:
        return self.current().filter(
            (F.col("raw_table_name") == raw_table) & (F.col("status") == COMPLETED)
        )

    def reset_stale(self, timeout: timedelta = timedelta(minutes=30)) -> int:
        """processing >timeout → failed, at job start (reference C7,
        ``src/services/transformer.py:104-129``)."""
        cutoff = _now() - timeout
        stale = self.current().filter(
            (F.col("status") == PROCESSING) & (F.col("processed_at") < F.lit(cutoff))
        )
        rows = stale.collect()
        self.record_many(
            [
                (r["raw_table_name"], r["start_slot"], r["end_slot"], FAILED,
                 0, 0, "stale processing reset")
                for r in rows
            ]
        )
        return len(rows)

    def failed_ranges(self, limit: int = 5) -> DataFrame:
        """Most recent failed transform ranges with error messages
        (reference ``scripts/transformer_status.py:40-55``)."""
        return (
            self.current()
            .filter(F.col("status") == FAILED)
            .orderBy(F.desc("processed_at"))
            .limit(limit)
        )

    def recent(self, limit: int = 10) -> DataFrame:
        """Most recent progress activity, FINAL-read (reference
        ``scripts/transformer_status.py:57-80``)."""
        return self.current().orderBy(F.desc("processed_at")).limit(limit)

    def compact(self) -> None:
        """Collapse the append-only progress manifest to current state."""
        from beacon_indexer_spark.sources.storage import compact_manifest

        compact_manifest(
            self.spark, self.path, ["raw_table_name", "start_slot", "end_slot"],
            "processed_at", TRANSFORMER_PROGRESS,
        )

    def stats(self) -> DataFrame:
        """Transform progress rollup (reference A4/A6,
        ``src/services/transformer.py:630-641``)."""
        return (
            self.current()
            .groupBy("raw_table_name")
            .agg(
                F.sum(F.when(F.col("status") == COMPLETED, 1).otherwise(0)).alias("completed"),
                F.sum(F.when(F.col("status") == FAILED, 1).otherwise(0)).alias("failed"),
                F.max(F.when(F.col("status") == COMPLETED, F.col("end_slot"))).alias(
                    "max_completed_slot"
                ),
                F.sum("processed_count").alias("total_processed"),
                F.sum("failed_count").alias("total_failed_rows"),
            )
        )


# ---------------------------------------------------------------------------
# work discovery & integrity (reference J1/J2/C6/C8)
# ---------------------------------------------------------------------------

def untransformed_chunks(
    loaded: DataFrame, progress: DataFrame, raw_table: str, limit: int | None = 50
) -> DataFrame:
    """Completed load chunks FOR THE LOADER THAT FEEDS ``raw_table`` not yet
    transformed — the J1 anti-join (``src/services/transformer.py:240-262``),
    ordered by start_slot. Chunks of other loaders must not match: a range
    loaded only by e.g. the validators loader is not raw_blocks work."""
    loader_name = raw_table.removeprefix("raw_")
    done = progress.filter(
        (F.col("raw_table_name") == raw_table) & (F.col("status") == COMPLETED)
    ).select("start_slot", "end_slot")
    todo = (
        loaded.filter(
            (F.col("status") == COMPLETED) & (F.col("loader_name") == loader_name)
        )
        .select("start_slot", "end_slot", "loader_name")
        .join(F.broadcast(done), ["start_slot", "end_slot"], "left_anti")
        .orderBy("start_slot")
    )
    return todo.limit(limit) if limit else todo


def integrity_check(ledger: ChunkLedger, progress: ProgressManifest, raw_table: str) -> dict:
    """Failed chunks + loaded-but-untransformed report (reference C8,
    ``src/services/maintenance.py:577-667``)."""
    cur = ledger.current()
    failed = cur.filter(F.col("status") == FAILED).count()
    untrans = untransformed_chunks(cur, progress.current(), raw_table, limit=None).count()
    return {"failed_chunks": failed, "untransformed_chunks": untrans}


# ---------------------------------------------------------------------------
# gap analysis (reference J3/C12, scripts/maintenance.py:87-150)
# ---------------------------------------------------------------------------

def find_gaps(raw: DataFrame, start_slot: int, end_slot: int) -> DataFrame:
    """Missing slots in [start_slot, end_slot]: generated sequence
    anti-joined against the slots present. Returns DataFrame(slot)."""
    spark = raw.sparkSession
    expected = spark.range(start_slot, end_slot + 1).select(F.col("id").alias("slot"))
    present = raw.select(F.col("slot").cast("long").alias("slot")).filter(
        (F.col("slot") >= start_slot) & (F.col("slot") <= end_slot)
    )
    return expected.join(present, "slot", "left_anti")


def gap_report(raw: DataFrame, start_slot: int, end_slot: int, sample: int = 20) -> dict:
    """A5 + J3: expected vs distinct-actual counts, % missing, sample
    missing slots (GROUP_CONCAT analogue, reference A7)."""
    expected = end_slot - start_slot + 1
    actual = (
        raw.filter((F.col("slot") >= start_slot) & (F.col("slot") <= end_slot))
        .agg(F.count_distinct("slot").alias("n"))
        .collect()[0]["n"]
    )
    missing = expected - actual
    sample_slots = [
        r["slot"] for r in find_gaps(raw, start_slot, end_slot).orderBy("slot").limit(sample).collect()
    ] if missing else []
    return {
        "expected": expected,
        "actual": actual,
        "missing": missing,
        "missing_pct": round(100.0 * missing / expected, 4) if expected else 0.0,
        "sample_missing": sample_slots,
    }
