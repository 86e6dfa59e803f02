"""Property-based tests (hypothesis): column expressions vs Python oracles.

One Spark job per property batch: hypothesis generates the cases, a single
DataFrame evaluates the expression over all of them, results compare
against pure-Python reference implementations element-wise.
"""

from __future__ import annotations

import hashlib
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from beacon_indexer_spark.functions.core import (
    canonical_json,
    hex_byte_length,
    hex_to_long,
    payload_hash,
    popcount_hex,
    slot_timestamp,
)

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

hex_strings = st.text(alphabet="0123456789abcdef", min_size=0, max_size=130)


@settings(**_SETTINGS)
@given(st.lists(hex_strings, min_size=1, max_size=30), st.booleans())
def test_popcount_matches_python(spark, hexes, prefix):
    vals = [("0x" + h if prefix else h) for h in hexes]
    df = spark.createDataFrame([(v,) for v in vals], "h string")
    got = [r["p"] for r in df.select(popcount_hex("h").alias("p")).collect()]
    expect = [bin(int(h or "0", 16)).count("1") if h else 0 for h in hexes]
    assert got == expect


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=2**60), min_size=1, max_size=30),
       st.sampled_from(["hex", "dec"]))
def test_hex_to_long_matches_python(spark, nums, form):
    vals = [hex(n) if form == "hex" else str(n) for n in nums]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r["v"] for r in df.select(hex_to_long("s").alias("v")).collect()]
    assert got == nums


@settings(**_SETTINGS)
@given(st.lists(hex_strings, min_size=1, max_size=30))
def test_hex_byte_length_matches_python(spark, hexes):
    vals = ["0x" + h for h in hexes]
    df = spark.createDataFrame([(v,) for v in vals], "h string")
    got = [r["n"] for r in df.select(hex_byte_length("h").alias("n")).collect()]
    # len/2 with the .5 of odd-length strings truncated by the long cast
    assert got == [int(len(h) / 2) for h in hexes]


@settings(**_SETTINGS)
@given(st.dictionaries(st.text(max_size=8), st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(max_size=12),
    st.booleans(),
    st.none(),
), max_size=6))
def test_payload_hash_contract(payload):
    """Canonical hash matches an independent sorted-compact serialization."""
    expect = hashlib.sha256(
        json.dumps(payload, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()[:16]
    assert payload_hash(payload) == expect
    assert canonical_json(payload) == json.dumps(
        payload, sort_keys=True, separators=(",", ":")
    )


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=50_000_000), min_size=1,
                max_size=30),
       st.integers(min_value=1, max_value=60),
       st.integers(min_value=10**9, max_value=2 * 10**9))
def test_slot_timestamp_matches_python(spark, slots, spb, genesis):
    df = spark.createDataFrame([(s,) for s in slots], "slot long")
    got = [
        int(r["t"].timestamp())
        for r in df.select(
            slot_timestamp("slot", genesis, spb).alias("t")
        ).collect()
    ]
    assert got == [genesis + s * spb for s in slots]


# ---------------------------------------------------------------------------
# round-4c deterministic curation ops
# ---------------------------------------------------------------------------

def _py_bucket(key: str, salt: int) -> int:
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=10**12),
                min_size=1, max_size=40, unique=True))
def test_split_assign_matches_python_bucketing(spark, ids):
    """split_assign is pure md5-bucket arithmetic: the Python oracle
    reproduces every label; rows never change split across partitionings."""
    from beacon_indexer_spark.operators.sampling import split_assign

    fracs = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    lab = split_assign(F.col("id"), fracs, salt=13)
    got = {r["id"]: r["s"] for r in df.select("id", lab.alias("s")).collect()}

    def py_label(i: int) -> str:
        b = _py_bucket(str(i), 13)
        if b < 800_000:
            return "train"
        if b < 900_000:
            return "val"
        return "test"

    assert got == {i: py_label(i) for i in ids}


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                min_size=1, max_size=60),
       st.integers(min_value=2, max_value=9))
def test_kmv_multiplicity_invariance(spark, values, reps):
    """The KMV sketch depends only on the distinct value SET: replicating
    every row `reps` times changes nothing (n_kept, kth hash, estimate)."""
    from beacon_indexer_spark.operators.sketch import kmv_distinct

    a = spark.createDataFrame([(v, "g") for v in values], "v string, grp string")
    b = spark.createDataFrame(
        [(v, "g") for v in values for _ in range(reps)], "v string, grp string"
    )
    ra = {tuple(r) for r in kmv_distinct(a, "v", "grp", k=8).collect()}
    rb = {tuple(r) for r in kmv_distinct(b, "v", "grp", k=8).collect()}
    assert ra == rb
