"""Beacon-API fixture payloads (shapes per /root/repo/FIXTURES.md §B)."""

from __future__ import annotations

import datetime as dt
import json

from beacon_indexer_spark.functions.core import payload_hash

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def raw_row(slot: int, data: dict | str, retrieved_at: dt.datetime | None = None, **extra):
    """Envelope exactly like the fetch layer produces: canonical JSON payload
    + 16-hex payload_hash + retrieved_at version."""
    if isinstance(data, str):  # pre-serialized (e.g. malformed) payload
        payload, ph = data, "deadbeefdeadbeef"
    else:
        payload = json.dumps(data, sort_keys=True, separators=(",", ":"))
        ph = payload_hash(data)
    return {
        "slot": slot,
        "payload": payload,
        "payload_hash": ph,
        "retrieved_at": retrieved_at or T0,
        **extra,
    }


def block_payload(
    slot: int,
    version: str = "deneb",
    proposer: int = 12345,
    n_attestations: int = 1,
    with_exec: bool | None = None,
    with_sync: bool | None = None,
    with_requests: bool = False,
) -> dict:
    if with_exec is None:
        with_exec = version not in ("phase0", "altair")
    if with_sync is None:
        with_sync = version != "phase0"
    body = {
        "randao_reveal": "0x" + "aa" * 96,
        "graffiti": "0x" + "67" * 32,
        "eth1_data": {
            "deposit_root": "0x" + "11" * 32,
            "deposit_count": "567",
            "block_hash": "0x" + "22" * 32,
        },
        "attestations": [
            {
                "aggregation_bits": "0xffff",
                "data": {
                    "slot": str(slot - 1),
                    "index": str(i),
                    "beacon_block_root": "0x" + "33" * 32,
                    "source": {"epoch": "281249", "root": "0x" + "44" * 32},
                    "target": {"epoch": "281250", "root": "0x" + "55" * 32},
                },
                "signature": "0x" + "66" * 96,
            }
            for i in range(n_attestations)
        ],
        "deposits": [
            {
                "proof": ["0x" + "77" * 32, "0x" + "88" * 32],
                "data": {
                    "pubkey": "0x" + "99" * 48,
                    "withdrawal_credentials": "0x" + "00" * 32,
                    "amount": "32000000000",
                    "signature": "0x" + "aa" * 96,
                },
            }
        ],
        "voluntary_exits": [
            {
                "message": {"epoch": "281000", "validator_index": "777"},
                "signature": "0x" + "bb" * 96,
            }
        ],
        "proposer_slashings": [
            {
                "signed_header_1": {
                    "message": {
                        "slot": str(slot),
                        "proposer_index": "42",
                        "parent_root": "0x" + "cc" * 32,
                        "state_root": "0x" + "dd" * 32,
                        "body_root": "0x" + "ee" * 32,
                    },
                    "signature": "0x" + "ff" * 96,
                },
                "signed_header_2": {
                    "message": {
                        "slot": str(slot),
                        "proposer_index": "42",
                        "parent_root": "0x" + "c1" * 32,
                        "state_root": "0x" + "d1" * 32,
                        "body_root": "0x" + "e1" * 32,
                    },
                    "signature": "0x" + "f1" * 96,
                },
            }
        ],
        "attester_slashings": [
            {
                "attestation_1": {
                    "attesting_indices": ["1", "2", "3"],
                    "data": {
                        "slot": str(slot - 2),
                        "index": "0",
                        "beacon_block_root": "0x" + "ab" * 32,
                        "source": {"epoch": "100", "root": "0x" + "ac" * 32},
                        "target": {"epoch": "101", "root": "0x" + "ad" * 32},
                    },
                    "signature": "0x" + "ae" * 96,
                },
                "attestation_2": {
                    "attesting_indices": ["2", "3", "4"],
                    "data": {
                        "slot": str(slot - 2),
                        "index": "0",
                        "beacon_block_root": "0x" + "ba" * 32,
                        "source": {"epoch": "100", "root": "0x" + "bc" * 32},
                        "target": {"epoch": "101", "root": "0x" + "bd" * 32},
                    },
                    "signature": "0x" + "be" * 96,
                },
            }
        ],
    }
    if with_sync:
        body["sync_aggregate"] = {
            "sync_committee_bits": "0x" + "ff" * 64,  # 512 bits set
            "sync_committee_signature": "0x" + "cd" * 96,
        }
    if with_exec:
        body["execution_payload"] = {
            "parent_hash": "0x" + "01" * 32,
            "fee_recipient": "0x" + "02" * 20,
            "state_root": "0x" + "03" * 32,
            "receipts_root": "0x" + "04" * 32,
            "logs_bloom": "0x" + "00" * 256,
            "prev_randao": "0x" + "05" * 32,
            "block_number": "18000000",
            "gas_limit": "30000000",
            "gas_used": "12345678",
            "timestamp": "1700000000",
            "extra_data": "0x",
            "base_fee_per_gas": "7000000000",
            "block_hash": "0x" + "06" * 32,
            "transactions": ["0x02f871aabb", "0x02f871ccdd"],
        }
        if version in ("capella", "deneb", "electra", "fulu"):
            body["execution_payload"]["withdrawals"] = [
                {
                    "index": "100",
                    "validator_index": "555",
                    "address": "0x" + "07" * 20,
                    "amount": "1234567",
                }
            ]
            body["bls_to_execution_changes"] = [
                {
                    "message": {
                        "validator_index": "888",
                        "from_bls_pubkey": "0x" + "08" * 48,
                        "to_execution_address": "0x" + "09" * 20,
                    },
                    "signature": "0x" + "0a" * 96,
                }
            ]
        if version in ("deneb", "electra", "fulu"):
            body["execution_payload"]["blob_gas_used"] = "131072"
            body["execution_payload"]["excess_blob_gas"] = "0"
            body["blob_kzg_commitments"] = ["0x" + "0b" * 48, "0x" + "0c" * 48]
    if with_requests and version in ("electra", "fulu"):
        body["execution_requests"] = {
            "deposits": [
                {
                    "pubkey": "0x" + "0d" * 48,
                    "withdrawal_credentials": "0x" + "0e" * 32,
                    "amount": "32000000000",
                    "signature": "0x" + "0f" * 96,
                    "index": "1",
                }
            ],
            "withdrawals": [],
            "consolidations": [],
        }
    return {
        "version": version,
        "data": {
            "message": {
                "slot": str(slot),
                "proposer_index": str(proposer),
                "parent_root": "0x" + "10" * 32,
                "state_root": "0x" + "20" * 32,
                "body": body,
            },
            "signature": "0x" + "30" * 96,
        },
    }


VALIDATORS_PAYLOAD = {
    "data": [
        {
            "index": "0",
            "balance": "32000000000",
            "status": "active_ongoing",
            "validator": {
                "pubkey": "0x" + "40" * 48,
                "withdrawal_credentials": "0x00" + "50" * 31,
                "effective_balance": "32000000000",
                "slashed": False,
                "activation_eligibility_epoch": "0",
                "activation_epoch": "0",
                "exit_epoch": "18446744073709551615",
                "withdrawable_epoch": "18446744073709551615",
            },
        },
        {
            "index": "1",
            "balance": "31000000000",
            "status": "exited_slashed",
            "validator": {
                "pubkey": "0x" + "41" * 48,
                "withdrawal_credentials": "0x01" + "51" * 31,
                "effective_balance": "31000000000",
                "slashed": True,
                "activation_eligibility_epoch": "1",
                "activation_epoch": "2",
                "exit_epoch": "3",
                "withdrawable_epoch": "4",
            },
        },
    ]
}

REWARDS_PAYLOAD = {
    "data": {
        "proposer_index": "12345",
        "total": "45000000",
        "attestations": "40000000",
        "sync_aggregate": "3000000",
        "proposer_slashings": "0",
        "attester_slashings": "0",
    }
}

PENDING_CONSOLIDATIONS_PAYLOAD = {"data": [{"source_index": "100", "target_index": "200"}]}

PENDING_DEPOSITS_PAYLOAD = {
    "data": [
        {
            "pubkey": "0xabc123",
            "withdrawal_credentials": "0x0200deadbeef",
            "amount": "1000000000",
            "signature": "0xsig",
            "slot": "27400000",
        }
    ]
}

PENDING_PARTIAL_WITHDRAWALS_PAYLOAD = {
    "data": [
        {"validator_index": "5001", "amount": "50000000", "withdrawable_epoch": "1500000"}
    ]
}

DATA_COLUMN_SIDECARS_PAYLOAD = {
    "data": [
        {
            "index": "2",
            "column": ["0xaaaa", "0xbbbb"],
            "kzg_commitments": ["0x11", "0x22"],
            "kzg_proofs": ["0x33"],
            "signed_block_header": {
                "message": {
                    "slot": "27435008",
                    "proposer_index": "42",
                    "body_root": "0xabc",
                }
            },
        }
    ]
}
