"""Scalar/utility function surface (SURVEY §2.9) — all pure column
expressions unless noted; no row-at-a-time Python UDFs in hot paths."""

from beacon_indexer_spark.functions.core import (
    canonical_json,
    hex_byte_length,
    hex_to_long,
    latest,
    payload_hash,
    payload_hash_col,
    popcount_hex,
    slot_timestamp,
    last_slot_of_day,
    safe_int_col,
    safe_str_col,
)

__all__ = [
    "canonical_json",
    "hex_byte_length",
    "hex_to_long",
    "latest",
    "payload_hash",
    "payload_hash_col",
    "popcount_hex",
    "slot_timestamp",
    "last_slot_of_day",
    "safe_int_col",
    "safe_str_col",
]
