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
from beacon_indexer_spark.sources.storage import ParquetLake, ParquetSink


def _coalesce_ranges(
    ranges: list[tuple[int, int]]
) -> list[list[tuple[int, int]]]:
    """Group sorted chunk ranges into runs of contiguous ranges
    (end + 1 == next start). Each run becomes one merged transform job."""
    runs: list[list[tuple[int, int]]] = []
    for r in sorted(ranges):
        if runs and runs[-1][-1][1] + 1 == r[0]:
            runs[-1].append(r)
        else:
            runs.append([r])
    return runs


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
        sink=None,
    ):
        self.lake = lake
        self.schedule = lake.schedule
        self.progress = progress
        self.allow = tables or {}  # raw_table → allowed structured tables (P8)
        # storage-backend selection (reference storage_factory.py:4-13):
        # raw always lives in the lake; structured output goes to the sink
        self.sink = sink if sink is not None else ParquetSink(lake)

    def transform_range(
        self,
        raw_table: str,
        start_slot: int,
        end_slot: int,
        mode: str = "append",
        record_ranges: list[tuple[int, int]] | None = None,
    ) -> dict[str, int]:
        """Transform one chunk range and write every structured table it
        feeds. Returns {table: rows_written}. Any failure marks the whole
        range failed (reference semantics, transformer.py:299-302).

        ``record_ranges`` records progress per constituent chunk while the
        transform itself runs as ONE Spark job over the merged range — the
        batched-discovery path (at 100× chunk counts, per-chunk job launch
        overhead dominates; the merged job keeps discovery granularity
        intact because completion rows still match chunk boundaries).
        """
        from beacon_indexer_spark import observability as O

        counts: dict[str, int] = {}
        outs = None
        ranges = record_ranges or [(start_slot, end_slot)]
        t0 = time.monotonic()
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
                    self.sink.write(name, df, mode=mode)
                    counts[name] = df.count()
                    O.METRICS.inc("beacon_indexer_rows_written_total",
                                  {"table": name}, counts[name])
                finally:
                    df.unpersist()
            if self.progress:
                total = sum(counts.values())
                # merged runs attribute the row total to the first chunk so
                # stats() sums stay exact without a per-chunk recount
                self.progress.record_many(
                    [
                        (raw_table, s, e, COMPLETED, total if i == 0 else 0, 0, None)
                        for i, (s, e) in enumerate(ranges)
                    ]
                )
            O.METRICS.inc("beacon_indexer_chunks_total",
                          {"loader": raw_table, "status": COMPLETED}, len(ranges))
            O.METRICS.observe("beacon_indexer_chunk_duration_seconds",
                              time.monotonic() - t0,
                              {"loader": raw_table, "operation": "transform"},
                              buckets=O.CHUNK_DURATION_BUCKETS)
            return counts
        except Exception as e:  # noqa: BLE001 — record then re-raise
            if self.progress:
                self.progress.record_many(
                    [(raw_table, s, e, FAILED, 0, 0, str(e)[:500]) for s, e in ranges]
                )
            O.METRICS.inc("beacon_indexer_transform_failures_total",
                          {"loader": raw_table})
            raise
        finally:
            # release the shared cached parse frame (transform_blocks)
            if outs is not None and hasattr(outs, "unpersist"):
                outs.unpersist()

    def transform_pending(self, ledger_current: DataFrame, raw_table: str, limit: int = 50):
        """Discovery + execution: the reference's transform-batch loop body.

        Contiguous pending chunks coalesce into one merged `transform_range`
        job per run (progress still recorded per chunk) — N adjacent chunks
        cost one Spark job + one write per table instead of N.
        """
        if self.progress is None:
            raise ValueError("transform_pending requires a ProgressManifest")
        todo = untransformed_chunks(
            ledger_current, self.progress.current(), raw_table, limit=limit
        ).collect()
        results = []
        for run_ranges in _coalesce_ranges([(r["start_slot"], r["end_slot"]) for r in todo]):
            s, e = run_ranges[0][0], run_ranges[-1][1]
            counts = self.transform_range(
                raw_table, s, e, record_ranges=run_ranges
            )
            results.append((s, e, counts))
        return results

    def repair_range(self, raw_table: str, start_slot: int, end_slot: int) -> dict[str, int]:
        """Re-transform a range and overwrite only the affected daily
        partitions — the DELETE-free repair (reference C9→ SURVEY §4)."""
        return self.transform_range(raw_table, start_slot, end_slot, mode="overwrite")
