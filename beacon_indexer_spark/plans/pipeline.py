"""End-to-end batch pipeline: raw lake → transform → structured lake.

The Spark shape of the reference's ``transform run`` lifecycle (SURVEY §3.2):
discovery (anti-join) → range read (latest-wins) → parse projections →
parallel table writes → progress record. Steps that were processes/asyncio
in the reference collapse into one Spark job per chunk range; the repair
entry point (reference ``maintain fix``, ``src/services/maintenance.py:77-138``)
becomes re-transform + dynamic partition overwrite.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

from beacon_indexer_spark.config import ForkSchedule
from beacon_indexer_spark.control.ledger import (
    COMPLETED,
    FAILED,
    ProgressManifest,
    untransformed_chunks,
)
from beacon_indexer_spark.plans.transform import TRANSFORMS, transform_blocks
from beacon_indexer_spark.schemas.structured import RAW_TO_STRUCTURED
from beacon_indexer_spark.sources.storage import ParquetLake


def transform_tables(
    raw: DataFrame,
    raw_table: str,
    schedule: ForkSchedule,
    tables: list[str] | None = None,
    insert_version: int | None = None,
) -> dict[str, DataFrame]:
    """Uniform transform entry: any raw table → {structured_table: df}."""
    if raw_table == "raw_blocks":
        return transform_blocks(raw, schedule, tables=tables, insert_version=insert_version)
    fn = TRANSFORMS[raw_table]
    name = RAW_TO_STRUCTURED[raw_table][0]
    if tables is not None and name not in tables:
        return {}
    return {name: fn(raw, schedule, insert_version=insert_version)}


class BeaconPipeline:
    def __init__(
        self,
        lake: ParquetLake,
        progress: ProgressManifest | None = None,
        tables: dict[str, list[str]] | None = None,
    ):
        self.lake = lake
        self.schedule = lake.schedule
        self.progress = progress
        self.allow = tables or {}  # raw_table → allowed structured tables (P8)

    def transform_range(
        self, raw_table: str, start_slot: int, end_slot: int, mode: str = "append"
    ) -> dict[str, int]:
        """Transform one chunk range and write every structured table it
        feeds. Returns {table: rows_written}. Any failure marks the whole
        range failed (reference semantics, transformer.py:299-302)."""
        counts: dict[str, int] = {}
        outs = None
        try:
            raw = self.lake.read_latest(raw_table, (start_slot, end_slot)).drop("date")
            outs = transform_tables(
                raw,
                raw_table,
                self.schedule,
                tables=self.allow.get(raw_table),
                insert_version=time.time_ns(),
            )
            for name, df in outs.items():
                # cache around write+count: otherwise the progress count
                # re-executes the whole parse for every table
                df = df.cache()
                try:
                    self.lake.write(name, df, mode=mode)
                    counts[name] = df.count()
                finally:
                    df.unpersist()
            if self.progress:
                self.progress.record(
                    raw_table, start_slot, end_slot, COMPLETED,
                    processed_count=sum(counts.values()),
                )
            return counts
        except Exception as e:  # noqa: BLE001 — record then re-raise
            if self.progress:
                self.progress.record(
                    raw_table, start_slot, end_slot, FAILED, error_message=str(e)[:500]
                )
            raise
        finally:
            # release the shared cached parse frame (transform_blocks)
            if outs is not None and hasattr(outs, "unpersist"):
                outs.unpersist()

    def transform_pending(self, ledger_current: DataFrame, raw_table: str, limit: int = 50):
        """Discovery + execution: the reference's transform-batch loop body."""
        if self.progress is None:
            raise ValueError("transform_pending requires a ProgressManifest")
        todo = untransformed_chunks(
            ledger_current, self.progress.current(), raw_table, limit=limit
        ).collect()
        results = []
        for row in todo:
            results.append(
                (row["start_slot"], row["end_slot"],
                 self.transform_range(raw_table, row["start_slot"], row["end_slot"]))
            )
        return results

    def repair_range(self, raw_table: str, start_slot: int, end_slot: int) -> dict[str, int]:
        """Re-transform a range and overwrite only the affected daily
        partitions — the DELETE-free repair (reference C9→ SURVEY §4)."""
        return self.transform_range(raw_table, start_slot, end_slot, mode="overwrite")
