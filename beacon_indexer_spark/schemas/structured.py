"""Structured-table registry: dedup keys + version column per table.

Mirrors the reference's ReplacingMergeTree ORDER BY keys (SURVEY §1.3):
readers apply ``latest(df, keys, version)`` to get FINAL semantics. The
``insert_version`` column is stamped at transform time (one value per batch).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TableSpec:
    name: str
    keys: tuple[str, ...]
    version: str = "insert_version"
    source_raw: str = "raw_blocks"


STRUCTURED_TABLES: dict[str, TableSpec] = {
    t.name: t
    for t in [
        TableSpec("blocks", ("slot",)),
        TableSpec("attestations", ("slot", "attestation_index", "committee_index")),
        TableSpec("deposits", ("slot", "deposit_index")),
        TableSpec("voluntary_exits", ("slot", "exit_index")),
        TableSpec("proposer_slashings", ("slot", "slashing_index")),
        TableSpec("attester_slashings", ("slot", "slashing_index")),
        TableSpec("sync_aggregates", ("slot",)),
        TableSpec("execution_payloads", ("slot", "block_number")),
        TableSpec("transactions", ("slot", "transaction_index")),
        TableSpec("withdrawals", ("slot", "withdrawal_index")),
        TableSpec("bls_changes", ("slot", "change_index")),
        TableSpec("blob_commitments", ("slot", "commitment_index")),
        TableSpec("blob_sidecars", ("slot", "blob_index"), source_raw="raw_blob_sidecars"),
        TableSpec("execution_requests", ("slot",)),
        TableSpec("validators", ("slot", "validator_index"), source_raw="raw_validators"),
        TableSpec("rewards", ("slot", "proposer_index"), source_raw="raw_rewards"),
        TableSpec(
            "pending_consolidations",
            ("slot", "queue_index"),
            source_raw="raw_pending_consolidations",
        ),
        TableSpec(
            "pending_deposits", ("slot", "queue_index"), source_raw="raw_pending_deposits"
        ),
        TableSpec(
            "pending_partial_withdrawals",
            ("slot", "queue_index"),
            source_raw="raw_pending_partial_withdrawals",
        ),
        TableSpec(
            "data_column_sidecars",
            ("slot", "column_index"),
            source_raw="raw_data_column_sidecars",
        ),
    ]
}

# which raw table feeds which structured tables (parser allow-list, reference P8)
RAW_TO_STRUCTURED: dict[str, list[str]] = {}
for spec in STRUCTURED_TABLES.values():
    RAW_TO_STRUCTURED.setdefault(spec.source_raw, []).append(spec.name)
