"""Analytics library tests over fixture-transformed structured tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beacon_indexer_spark.config import GNOSIS
from beacon_indexer_spark.plans import analytics as A
from beacon_indexer_spark.plans.transform import (
    transform_blocks,
    transform_pending_consolidations,
    transform_rewards,
    transform_validators,
)
from beacon_indexer_spark.schemas.raw import raw_envelope
from tests import fixtures as FX

SLOT0 = 27_000_000
N = 24


def _raw_df(spark, rows):
    return spark.createDataFrame(rows, schema=raw_envelope())


@pytest.fixture(scope="module")
def tables(spark):
    """24 deneb blocks + 2 electra, proposers cycling 0..3; rewards for the
    first 10 slots; validators snapshots at two slots."""
    rows = [
        FX.raw_row(SLOT0 + i, FX.block_payload(SLOT0 + i, proposer=i % 4))
        for i in range(N)
    ]
    rows += [
        FX.raw_row(27_500_000 + i, FX.block_payload(27_500_000 + i, version="electra",
                                                    proposer=9))
        for i in range(2)
    ]
    out = transform_blocks(_raw_df(spark, rows), GNOSIS, insert_version=1)
    reward_rows = [
        FX.raw_row(SLOT0 + i, {"data": {
            "proposer_index": str(i % 4), "total": str(1000 + i),
            "attestations": "900", "sync_aggregate": "100",
            "proposer_slashings": "0", "attester_slashings": "0"}})
        for i in range(10)
    ]
    out["rewards"] = transform_rewards(_raw_df(spark, reward_rows), GNOSIS,
                                       insert_version=1)
    val_rows = [FX.raw_row(SLOT0, FX.VALIDATORS_PAYLOAD),
                FX.raw_row(SLOT0 + 100, FX.VALIDATORS_PAYLOAD)]
    out["validators"] = transform_validators(_raw_df(spark, val_rows), GNOSIS,
                                             insert_version=1)
    for name in ("blocks", "rewards", "withdrawals", "blob_commitments",
                 "execution_payloads", "sync_aggregates", "validators"):
        out[name] = out[name].cache()
    return out


def test_recent_blocks(tables):
    got = A.recent_blocks(tables["blocks"], n=5).collect()
    assert [r["slot"] for r in got] == [27_500_001, 27_500_000,
                                       SLOT0 + 23, SLOT0 + 22, SLOT0 + 21]


def test_fork_distribution(tables):
    got = {r["version"]: r["block_count"] for r in
           A.fork_distribution(tables["blocks"]).collect()}
    assert got == {"deneb": N, "electra": 2}


def test_top_proposers(tables):
    got = A.top_proposers(tables["blocks"], n=3).collect()
    # proposers 0..3 each propose 6 of 24 deneb blocks; tie-break by index
    assert (got[0]["proposer_index"], got[0]["blocks_proposed"]) == (0, 6)
    assert [r["proposer_index"] for r in got] == [0, 1, 2, 3][:3]


def test_blob_commitment_check(tables):
    got = A.blob_commitment_check(tables["blocks"], tables["blob_commitments"],
                                  n=5).collect()
    assert all(r["blob_kzg_commitments_count"] == 2 == r["actual_commitments"]
               for r in got)


def test_withdrawals_daily(tables):
    got = A.withdrawals_daily(tables["blocks"], tables["withdrawals"]).collect()
    assert sum(r["total_withdrawals"] for r in got) == N + 2
    assert all(r["avg_amount"] == 1_234_567.0 for r in got)


def test_execution_daily(tables):
    got = A.execution_daily(tables["blocks"], tables["execution_payloads"]).collect()
    assert sum(r["blocks_with_execution"] for r in got) == N + 2
    assert all(r["avg_gas_used"] == 12_345_678.0 for r in got)


def test_proposer_rewards(tables):
    got = A.proposer_rewards(tables["blocks"], tables["rewards"],
                             min_blocks=6).collect()
    # proposers 0/1: 6 deneb blocks each, rewards on 2-3 of them
    by_p = {(r["proposer_index"], r["version"]): r for r in got}
    assert (0, "deneb") in by_p and by_p[(0, "deneb")]["blocks"] == 6
    # proposer 9 has only 2 blocks → filtered by HAVING
    assert not any(p == 9 for p, _ in by_p)


def test_network_health_hourly(tables):
    got = A.network_health_hourly(tables["blocks"]).collect()
    # 24 deneb blocks * 5s = 120s → single hour bucket (plus electra bucket)
    assert sum(r["blocks_per_hour"] for r in got) == N + 2
    first = got[0]
    assert first["active_validators"] == 4
    assert first["graffiti_rate"] == 1.0  # fixture graffiti is 66 chars


def test_fork_transitions(tables):
    got = A.fork_transitions(tables["blocks"]).collect()
    assert [(r["version"], r["first_slot"], r["total_blocks"]) for r in got] == [
        ("deneb", SLOT0, N), ("electra", 27_500_000, 2),
    ]


def test_latest_validator_state(tables):
    got = A.latest_validator_state(tables["validators"]).collect()
    assert len(got) == 2  # one row per validator_index
    assert all(r["slot"] == SLOT0 + 100 for r in got)


def test_sync_participation_daily(tables):
    got = A.sync_participation_daily(tables["sync_aggregates"]).collect()
    assert all(r["avg_participation"] == 512.0 for r in got)


def test_queue_snapshot_diff(spark):
    q1 = {"data": [{"source_index": "1", "target_index": "10"},
                   {"source_index": "2", "target_index": "20"},
                   {"source_index": "3", "target_index": "30"}]}
    q2 = {"data": [{"source_index": "2", "target_index": "20"}]}
    queue = transform_pending_consolidations(
        _raw_df(spark, [FX.raw_row(100, q1), FX.raw_row(200, q2)]), GNOSIS,
        insert_version=1,
    )
    applied = A.queue_snapshot_diff(queue, "source_index", 100, 200).collect()
    # entries 1 and 3 left the queue between snapshots = applied
    assert sorted(r["source_index"] for r in applied) == [1, 3]
    assert all(r["applied_by_slot"] == 200 for r in applied)


def test_attestation_inclusion_delay(tables):
    got = A.attestation_inclusion_delay(tables["attestations"]).collect()
    # fixture attestations always reference slot-1 → delay 1 everywhere
    assert all(r["avg_delay"] == 1.0 and r["max_delay"] == 1 for r in got)
    assert sum(r["n_attestations"] for r in got) == 26
