"""Skew-mitigation operator tests: salted results must equal unsalted."""

from __future__ import annotations

from pyspark.sql import functions as F

from beacon_indexer_spark.operators import skew as K


def _skewed(spark):
    # 900 rows of one hot key + 100 spread keys
    rows = [(1, i) for i in range(900)] + [(k, k) for k in range(2, 102)]
    return spark.createDataFrame(rows, "key long, payload long")


def test_salted_join_equals_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(1, 50)], "key long, label string"
    )
    plain = left.join(right, "key").select("key", "payload", "label")
    salted = K.salted_join(left, right, ["key"], n_salts=8).select(
        "key", "payload", "label"
    )
    assert sorted(map(repr, plain.collect())) == sorted(map(repr, salted.collect()))
    assert salted.count() == 900 + 48  # hot key + keys 2..49


def test_salted_join_left_outer(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([(1, "hot")], "key long, label string")
    out = K.salted_join(left, right, ["key"], n_salts=4, how="left")
    assert out.count() == 1000
    assert out.filter(F.col("label").isNull()).count() == 100


def test_salted_group_count(spark):
    df = _skewed(spark)
    got = {r["key"]: r["count"] for r in K.salted_group_count(df, ["key"]).collect()}
    assert got[1] == 900
    assert all(got[k] == 1 for k in range(2, 102))
