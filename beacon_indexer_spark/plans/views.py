"""SQL surface: register the lake as temp views so users query with
``spark.sql`` exactly like the reference's ClickHouse users query SQL
(docs/CLICKHOUSE_GUIDE.md in /root/reference).

``register_views`` exposes every existing lake table two ways:
- ``<table>_raw`` — the append-only history (all versions);
- ``<table>`` — FINAL semantics (latest-wins per table key), which is what
  every documented analytics query expects.

The FINAL views are lazy DataFrames — registering costs nothing; each query
plans the dedup into itself, and Catalyst pushes query filters below the
view boundary into the scan.
"""

from __future__ import annotations

from beacon_indexer_spark.schemas.raw import RAW_TABLES
from beacon_indexer_spark.schemas.structured import STRUCTURED_TABLES
from beacon_indexer_spark.sources.storage import ParquetLake

# the reference's documented analytics, runnable verbatim via spark.sql
# after register_views (CLICKHOUSE_GUIDE.md:275-388 shapes)
DOCUMENTED_SQL: dict[str, str] = {
    "recent_blocks": """
        SELECT slot, proposer_index, version, slot_timestamp
        FROM blocks ORDER BY slot DESC LIMIT 10
    """,
    "fork_distribution": """
        SELECT version, COUNT(*) AS block_count
        FROM blocks GROUP BY version ORDER BY block_count DESC, version
    """,
    "top_proposers": """
        SELECT proposer_index, COUNT(*) AS blocks_proposed
        FROM blocks GROUP BY proposer_index
        ORDER BY blocks_proposed DESC, proposer_index LIMIT 20
    """,
    "network_health_hourly": """
        SELECT date_trunc('hour', slot_timestamp) AS hour,
               COUNT(*) AS blocks_per_hour,
               COUNT(DISTINCT proposer_index) AS active_validators
        FROM blocks GROUP BY 1 ORDER BY hour
    """,
    "fork_transitions": """
        SELECT version, MIN(slot) AS first_slot, MAX(slot) AS last_slot,
               COUNT(*) AS total_blocks, MIN(slot_timestamp) AS activation_time
        FROM blocks GROUP BY version ORDER BY first_slot
    """,
}


def register_views(lake: ParquetLake, tables: list[str] | None = None) -> list[str]:
    """Register ``<t>_raw`` (history) and ``<t>`` (latest-wins) temp views
    for every lake table that exists. Returns the registered view names."""
    candidates = tables or [*RAW_TABLES, *STRUCTURED_TABLES]
    registered: list[str] = []
    for t in candidates:
        if not lake.exists(t):
            continue
        lake.read(t).createOrReplaceTempView(f"{t}_raw")
        lake.read_latest(t).createOrReplaceTempView(t)
        registered.extend([f"{t}_raw", t])
    return registered
