"""Validators state-snapshot at reference production scale.

The reference's documented OOM pain point is the per-state validators
response: ~400k entries in ONE payload (reference src/config.py:59-65
sizes its batch memory around it; src/services/clickhouse.py:478-533 adds
a large-row fallback just for this table). This test pushes one payload of
400,000 entries through `transform_validators` and asserts exact row
count plus spot values — the explode + codegen path must stream it inside
the test-session driver heap and a CI-friendly time budget.
"""

from __future__ import annotations

import datetime as dt

from beacon_indexer_spark.config import MAINNET
from beacon_indexer_spark.plans import transform as T
from beacon_indexer_spark.schemas.raw import raw_envelope

N = 400_000
FAR_FUTURE = "18446744073709551615"


def _payload_json(n: int) -> str:
    # hand-rolled serialization: json.dumps on a 400k-entry object tree
    # costs more than the Spark parse being tested
    parts = []
    for i in range(n):
        exited = i % 1000 == 999
        parts.append(
            '{"index":"%d","balance":"%d","status":"%s","validator":{'
            '"pubkey":"0x%096x","withdrawal_credentials":"0x%064x",'
            '"effective_balance":"32000000000","slashed":%s,'
            '"activation_eligibility_epoch":"0","activation_epoch":"1",'
            '"exit_epoch":"%s","withdrawable_epoch":"%s"}}'
            % (
                i,
                32_000_000_000 + i,
                "exited_slashed" if exited else "active_ongoing",
                i,
                i,
                "true" if exited else "false",
                "123456" if exited else FAR_FUTURE,
                "123712" if exited else FAR_FUTURE,
            )
        )
    return '{"data":[' + ",".join(parts) + "]}"


def test_validators_400k_single_payload(spark):
    payload = _payload_json(N)
    assert len(payload) > 100 * 1024 * 1024  # genuinely reference-scale
    row = {
        "slot": 9_000_000,
        "payload": payload,
        "payload_hash": "deadbeefdeadbeef",
        "retrieved_at": dt.datetime(2024, 1, 1),
    }
    raw = spark.createDataFrame([row], schema=raw_envelope())
    # checkpoint so the three assertion actions below don't each re-parse
    # the 170 MB payload — the parse+explode under test still runs in full
    # (this is the materializing action)
    out = T.transform_validators(raw, MAINNET, insert_version=7).localCheckpoint()

    assert out.count() == N

    from pyspark.sql import functions as F

    agg = out.select(
        F.sum("balance").alias("bal"),
        F.sum("slashed").alias("n_slashed"),
        F.min("validator_index").alias("lo"),
        F.max("validator_index").alias("hi"),
    ).collect()[0]
    assert agg["bal"] == N * 32_000_000_000 + N * (N - 1) // 2
    assert agg["n_slashed"] == N // 1000
    assert (agg["lo"], agg["hi"]) == (0, N - 1)

    spot = {
        r["validator_index"]: r.asDict()
        for r in out.filter(
            F.col("validator_index").isin(0, 999, N - 1)
        ).collect()
    }
    assert spot[0]["status"] == "active_ongoing"
    assert spot[0]["exit_epoch"] == T.MAX_LONG  # FAR_FUTURE clamped
    assert spot[0]["pubkey"] == "0x" + "0" * 96
    assert spot[999]["status"] == "exited_slashed"
    assert spot[999]["slashed"] == 1
    assert spot[999]["exit_epoch"] == 123456
    assert spot[N - 1]["balance"] == 32_000_000_000 + N - 1
    assert spot[N - 1]["insert_version"] == 7
