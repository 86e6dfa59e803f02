"""``from_json`` payload schemas — the fork-superset block schema plus the
per-endpoint state schemas.

Shape contracts follow the beacon API responses the reference stores
verbatim (see /root/repo/FIXTURES.md §B and reference
src/parsers/fork_base.py:86-139 and subclasses). Integer-ish fields are
**decimal strings** in the API (sometimes "0x..."), so every numeric field is
declared StringType here and parsed with ``safe_int_col`` at projection time
— exactly the reference's safe_int tolerance.

One superset schema covers phase0→fulu: ``from_json`` yields null for
absent later-fork fields, so a mixed-fork batch parses in a single pass and
fork differences become conditional projections (SURVEY §2.10 X15/X16).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType(), True)


def _arr_s(name: str) -> T.StructField:
    return T.StructField(name, T.ArrayType(T.StringType()), True)


CHECKPOINT = T.StructType([_s("epoch"), _s("root")])

ATTESTATION_DATA = T.StructType(
    [_s("slot"), _s("index"), _s("beacon_block_root"),
     T.StructField("source", CHECKPOINT), T.StructField("target", CHECKPOINT)]
)

ATTESTATION = T.StructType(
    [_s("aggregation_bits"), _s("committee_bits"),
     T.StructField("data", ATTESTATION_DATA), _s("signature")]
)

DEPOSIT = T.StructType(
    [
        _arr_s("proof"),
        T.StructField(
            "data",
            T.StructType(
                [_s("pubkey"), _s("withdrawal_credentials"), _s("amount"), _s("signature")]
            ),
        ),
    ]
)

VOLUNTARY_EXIT = T.StructType(
    [
        T.StructField("message", T.StructType([_s("epoch"), _s("validator_index")])),
        _s("signature"),
    ]
)

BLOCK_HEADER = T.StructType(
    [_s("slot"), _s("proposer_index"), _s("parent_root"), _s("state_root"), _s("body_root")]
)

SIGNED_HEADER = T.StructType(
    [T.StructField("message", BLOCK_HEADER), _s("signature")]
)

PROPOSER_SLASHING = T.StructType(
    [
        T.StructField("signed_header_1", SIGNED_HEADER),
        T.StructField("signed_header_2", SIGNED_HEADER),
    ]
)

INDEXED_ATTESTATION = T.StructType(
    [
        _arr_s("attesting_indices"),
        T.StructField("data", ATTESTATION_DATA),
        _s("signature"),
    ]
)

ATTESTER_SLASHING = T.StructType(
    [
        T.StructField("attestation_1", INDEXED_ATTESTATION),
        T.StructField("attestation_2", INDEXED_ATTESTATION),
    ]
)

SYNC_AGGREGATE = T.StructType([_s("sync_committee_bits"), _s("sync_committee_signature")])

WITHDRAWAL = T.StructType([_s("index"), _s("validator_index"), _s("address"), _s("amount")])

EXECUTION_PAYLOAD = T.StructType(
    [
        _s("parent_hash"), _s("fee_recipient"), _s("state_root"), _s("receipts_root"),
        _s("logs_bloom"), _s("prev_randao"), _s("block_number"), _s("gas_limit"),
        _s("gas_used"), _s("timestamp"), _s("extra_data"), _s("base_fee_per_gas"),
        _s("block_hash"),
        _arr_s("transactions"),
        T.StructField("withdrawals", T.ArrayType(WITHDRAWAL)),          # Capella+
        _s("blob_gas_used"), _s("excess_blob_gas"),                     # Deneb+
    ]
)

BLS_CHANGE = T.StructType(
    [
        T.StructField(
            "message",
            T.StructType(
                [_s("validator_index"), _s("from_bls_pubkey"), _s("to_execution_address")]
            ),
        ),
        _s("signature"),
    ]
)

ETH1_DATA = T.StructType([_s("deposit_root"), _s("deposit_count"), _s("block_hash")])

# Electra execution requests: kept as typed arrays so counts/JSON are exact.
DEPOSIT_REQUEST = T.StructType(
    [_s("pubkey"), _s("withdrawal_credentials"), _s("amount"), _s("signature"), _s("index")]
)
WITHDRAWAL_REQUEST = T.StructType(
    [_s("source_address"), _s("validator_pubkey"), _s("amount")]
)
CONSOLIDATION_REQUEST = T.StructType(
    [_s("source_address"), _s("source_pubkey"), _s("target_pubkey")]
)

EXECUTION_REQUESTS = T.StructType(
    [
        T.StructField("deposits", T.ArrayType(DEPOSIT_REQUEST)),
        T.StructField("withdrawals", T.ArrayType(WITHDRAWAL_REQUEST)),
        T.StructField("consolidations", T.ArrayType(CONSOLIDATION_REQUEST)),
    ]
)

BLOCK_BODY = T.StructType(
    [
        _s("randao_reveal"),
        T.StructField("eth1_data", ETH1_DATA),
        _s("graffiti"),
        T.StructField("attestations", T.ArrayType(ATTESTATION)),
        T.StructField("deposits", T.ArrayType(DEPOSIT)),
        T.StructField("voluntary_exits", T.ArrayType(VOLUNTARY_EXIT)),
        T.StructField("proposer_slashings", T.ArrayType(PROPOSER_SLASHING)),
        T.StructField("attester_slashings", T.ArrayType(ATTESTER_SLASHING)),
        T.StructField("sync_aggregate", SYNC_AGGREGATE),                 # Altair+
        T.StructField("execution_payload", EXECUTION_PAYLOAD),           # Bellatrix+
        T.StructField("bls_to_execution_changes", T.ArrayType(BLS_CHANGE)),  # Capella+
        _arr_s("blob_kzg_commitments"),                                  # Deneb+
        T.StructField("execution_requests", EXECUTION_REQUESTS),         # Electra+
    ]
)

# /eth/v2/beacon/blocks/{slot} response (fork superset)
BLOCK_PAYLOAD = T.StructType(
    [
        _s("version"),
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField(
                        "message",
                        T.StructType(
                            [
                                _s("slot"),
                                _s("proposer_index"),
                                _s("parent_root"),
                                _s("state_root"),
                                T.StructField("body", BLOCK_BODY),
                            ]
                        ),
                    ),
                    _s("signature"),
                ]
            ),
        ),
    ]
)

# body fields each structured table's projection reads (schema pruning):
# parsing a narrow allow-list batch skips the unrequested JSON subtrees
# entirely — at scale the transactions/attestations arrays dominate payload
# bytes, so a deposits-only re-transform shouldn't tokenize them into rows.
_BODY_DEPS: dict[str, list[str]] = {
    "attestations": ["attestations"],
    "deposits": ["deposits"],
    "voluntary_exits": ["voluntary_exits"],
    "proposer_slashings": ["proposer_slashings"],
    "attester_slashings": ["attester_slashings"],
    "sync_aggregates": ["sync_aggregate"],
    "execution_payloads": ["execution_payload"],
    "transactions": ["execution_payload"],
    "withdrawals": ["execution_payload"],
    "bls_changes": ["bls_to_execution_changes"],
    "blob_commitments": ["blob_kzg_commitments"],
    "execution_requests": ["execution_requests"],
}


def block_payload_schema(tables: set[str] | None = None) -> T.StructType:
    """Fork-superset block schema pruned to the body fields the requested
    tables project. ``None`` or a list containing ``blocks`` (which reads
    every count) returns the full superset."""
    if tables is None or "blocks" in tables:
        return BLOCK_PAYLOAD
    needed: set[str] = set()
    for t in tables:
        needed.update(_BODY_DEPS.get(t, []))
    body = T.StructType([f for f in BLOCK_BODY.fields if f.name in needed])
    message = T.StructType(
        [
            _s("slot"),
            _s("proposer_index"),
            _s("parent_root"),
            _s("state_root"),
            T.StructField("body", body),
        ]
    )
    return T.StructType(
        [
            _s("version"),
            T.StructField(
                "data",
                T.StructType([T.StructField("message", message), _s("signature")]),
            ),
        ]
    )


# /eth/v1/beacon/states/{id}/validators
VALIDATOR_ENTRY = T.StructType(
    [
        _s("index"),
        _s("balance"),
        _s("status"),
        T.StructField(
            "validator",
            T.StructType(
                [
                    _s("pubkey"), _s("withdrawal_credentials"), _s("effective_balance"),
                    T.StructField("slashed", T.BooleanType(), True),
                    _s("activation_eligibility_epoch"), _s("activation_epoch"),
                    _s("exit_epoch"), _s("withdrawable_epoch"),
                ]
            ),
        ),
    ]
)

VALIDATORS_PAYLOAD = T.StructType(
    [T.StructField("data", T.ArrayType(VALIDATOR_ENTRY))]
)

# /eth/v1/beacon/rewards/blocks/{slot} — data is a single dict
REWARDS_PAYLOAD = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [
                    _s("proposer_index"), _s("total"), _s("attestations"),
                    _s("sync_aggregate"), _s("proposer_slashings"), _s("attester_slashings"),
                ]
            ),
        )
    ]
)

# pending queues (Electra+)
PENDING_CONSOLIDATIONS_PAYLOAD = T.StructType(
    [T.StructField("data", T.ArrayType(T.StructType([_s("source_index"), _s("target_index")])))]
)

PENDING_DEPOSITS_PAYLOAD = T.StructType(
    [
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType(
                    [_s("pubkey"), _s("withdrawal_credentials"), _s("amount"),
                     _s("signature"), _s("slot")]  # "slot" = deposit_slot
                )
            ),
        )
    ]
)

PENDING_PARTIAL_WITHDRAWALS_PAYLOAD = T.StructType(
    [
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType([_s("validator_index"), _s("amount"), _s("withdrawable_epoch")])
            ),
        )
    ]
)

# /eth/v1/debug/beacon/data_column_sidecars/{slot} (Fulu)
DATA_COLUMN_SIDECAR = T.StructType(
    [
        _s("index"),
        _arr_s("column"),
        _arr_s("kzg_commitments"),
        _arr_s("kzg_proofs"),
        T.StructField(
            "signed_block_header",
            T.StructType([T.StructField("message", BLOCK_HEADER), _s("signature")]),
        ),
    ]
)

DATA_COLUMN_SIDECARS_PAYLOAD = T.StructType(
    [T.StructField("data", T.ArrayType(DATA_COLUMN_SIDECAR))]
)

# blob sidecars (Deneb, separate feed)
BLOB_SIDECAR = T.StructType(
    [
        _s("index"),
        _s("blob"),
        _s("kzg_commitment"),
        _s("kzg_proof"),
        T.StructField(
            "signed_block_header",
            T.StructType([T.StructField("message", BLOCK_HEADER), _s("signature")]),
        ),
    ]
)

BLOB_SIDECARS_PAYLOAD = T.StructType(
    [T.StructField("data", T.ArrayType(BLOB_SIDECAR))]
)

# foundation endpoints
GENESIS_PAYLOAD = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [_s("genesis_time"), _s("genesis_validators_root"), _s("genesis_fork_version")]
            ),
        )
    ]
)

SPECS_PAYLOAD = T.StructType(
    [T.StructField("data", T.MapType(T.StringType(), T.StringType()))]
)
