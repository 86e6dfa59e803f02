"""Realtime head-follow loop (reference C5, ``src/services/loader.py:44-118``).

The reference's "streaming" is a polling micro-batch loop: poll the head
every 6s, hold back ``REALTIME_SLOT_DELAY`` slots as a re-org lateness
guard, and process only *complete* CHUNK_SIZE-aligned windows — a tumbling
window over the slot clock with a completeness check. We keep exactly that
shape as a driver loop that triggers the batch fetch + transform pipeline
per closed window; the lake's idempotent append + latest-wins dedup gives
at-least-once fetches exactly-once *effect* (late re-fetches collapse on
payload_hash, re-orgs version-win on retrieved_at — SURVEY §2.12).
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable
from dataclasses import dataclass, field

from beacon_indexer_spark.config import EngineConfig, ForkSchedule
from beacon_indexer_spark.control.ledger import FAILED
from beacon_indexer_spark.plans.pipeline import BeaconPipeline
from beacon_indexer_spark.plans.transform import TRANSFORMS
from beacon_indexer_spark.sources.beacon_api import (
    BeaconAPI,
    BeaconAPIError,
    LOADERS,
    LoaderSpec,
    fetch_slots_local,
)
from beacon_indexer_spark.sources.storage import ParquetLake


def _is_last_slot_of_day(slot: int, schedule: ForkSchedule) -> bool:
    day = 86400
    t1 = schedule.slot_to_timestamp(slot) // day
    t2 = schedule.slot_to_timestamp(slot + 1) // day
    return t1 != t2


@dataclass
class RealtimeLoop:
    api: BeaconAPI
    lake: ParquetLake
    pipeline: BeaconPipeline
    config: EngineConfig = field(default_factory=EngineConfig)
    loaders: tuple[str, ...] | None = None
    sleep: Callable[[float], None] = _time.sleep
    start_slot: int | None = None  # where to start if the lake is empty
    _cursor: int | None = field(default=None, init=False)  # next window start

    def _next_window_start(self) -> int:
        """Resume point, in preference order: the in-loop cursor (advances
        even when a window's tail slots are empty — a max-raw-slot-only
        resume would floor back and livelock on an empty final slot), the
        progress manifest's max completed range, then max raw slot + 1,
        chunk-floor-aligned (reference ``src/services/loader.py:66-79``)."""
        cs = self.config.chunk_size
        if self._cursor is not None:
            return self._cursor
        candidates: list[int] = []
        if self.pipeline.progress is not None:
            from pyspark.sql import functions as F

            row = (
                self.pipeline.progress.current()
                .filter(F.col("status") == "completed")
                .agg(F.max("end_slot").alias("mx"))
                .collect()
            )
            if row and row[0]["mx"] is not None:
                candidates.append(((row[0]["mx"] + 1) // cs) * cs)
        if self.lake.exists("raw_blocks"):
            mx = self.lake.table_stats("raw_blocks")["max_slot"]
            if mx is not None:
                candidates.append(((mx + 1) // cs) * cs)
        if candidates:
            return max(candidates)
        base = self.start_slot if self.start_slot is not None else 0
        return (base // cs) * cs

    def _loader_slots(self, spec: LoaderSpec, ws: int, we: int) -> list[int]:
        sched = self.lake.schedule
        slots = range(ws, we + 1)
        if spec.daily and self.config.validators_daily_mode:
            return [s for s in slots if _is_last_slot_of_day(s, sched)]
        return list(slots)

    def process_window(self, ws: int, we: int) -> dict[str, int]:
        """Fetch + load + transform one closed window. Returns rows-written
        per raw table. A loader failure records FAILED progress and
        re-raises (chunk fails loudly, reference base.py:99-100)."""
        from beacon_indexer_spark import observability as O

        sched = self.lake.schedule
        counts: dict[str, int] = {}
        names = self.loaders or self.config.enabled_loaders
        for name in names:
            spec = LOADERS[name]
            try:
                rows = fetch_slots_local(
                    self.api, spec, self._loader_slots(spec, ws, we), sched
                )
            except BeaconAPIError:
                O.METRICS.inc("beacon_indexer_chunks_total",
                              {"loader": name, "status": "failed"})
                if self.pipeline.progress:
                    self.pipeline.progress.record(
                        spec.raw_table, ws, we, FAILED, error_message="fetch failed"
                    )
                raise
            O.METRICS.inc("beacon_indexer_chunks_total",
                          {"loader": name, "status": "completed"})
            O.METRICS.inc("beacon_indexer_fetch_rows_total",
                          {"loader": name}, len(rows))
            O.METRICS.set_gauge("beacon_indexer_highest_raw_slot", we,
                                {"loader": name})
            if rows:
                df = self.lake.spark.createDataFrame(
                    [(r["slot"], r["payload"], r["payload_hash"], r["retrieved_at"])
                     for r in rows],
                    "slot long, payload string, payload_hash string, retrieved_at timestamp",
                )
                self.lake.write(spec.raw_table, df)
            counts[spec.raw_table] = len(rows)
            if rows and spec.raw_table in TRANSFORMS:
                self.pipeline.transform_range(spec.raw_table, ws, we)
        return counts

    def run(self, max_iterations: int | None = None) -> int:
        """Poll-process loop; returns number of windows processed.
        ``max_iterations`` bounds the loop for tests/one-shot catch-up."""
        cs = self.config.chunk_size
        processed = 0
        iters = 0
        while max_iterations is None or iters < max_iterations:
            iters += 1
            try:
                head = self.api.get_head_slot()
                if head is None:
                    self.sleep(self.config.poll_interval_s)
                    continue
                from beacon_indexer_spark import observability as O

                O.METRICS.set_gauge("beacon_indexer_chain_head_slot", head)
                target = head - self.config.realtime_slot_delay
                ws = self._next_window_start()
                we = ws + cs - 1
                if we > target:  # window not complete yet
                    self.sleep(self.config.poll_interval_s)
                    continue
                self.process_window(ws, we)
                self._cursor = we + 1  # advance even if tail slots were empty
                processed += 1
            except BeaconAPIError:
                self.sleep(self.config.error_sleep_s)
        return processed
