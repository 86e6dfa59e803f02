"""Unit tests for the round-4c operators: PII redaction, split assignment,
per-group caps, the KMV distinct sketch, inverted postings, and table
profiling."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from beacon_indexer_spark.operators.profile import profile_columns
from beacon_indexer_spark.operators.sampling import (
    per_group_cap,
    sample_bucket,
    split_assign,
)
from beacon_indexer_spark.operators.sketch import kmv_distinct
from beacon_indexer_spark.operators.text import (
    build_postings,
    pii_counts,
    redact_pii,
)


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

def test_redact_pii_masks_all_categories(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org today"),
            (2, "server 192.168.0.1 and backup 10.0.0.255"),
            (3, "call 555-0142 or 555-9999 now"),
            (4, "clean text with no identifiers at all"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["red"] for r in df.select("id", redact_pii("text").alias("red")).collect()}
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "server <IP> and backup <IP>"
    assert out[3] == "call <PHONE> or <PHONE> now"
    assert out[4] == "clean text with no identifiers at all"


def test_pii_counts_per_category(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io and c@d.net from 1.2.3.4 tel 555-1234")], "id long, text string"
    )
    cnt = pii_counts("text")
    row = df.select(
        cnt["email"].alias("e"), cnt["ip"].alias("i"), cnt["phone"].alias("p")
    ).collect()[0]
    assert (row["e"], row["i"], row["p"]) == (2, 1, 1)


# ---------------------------------------------------------------------------
# split assignment
# ---------------------------------------------------------------------------

def test_split_assign_fractions_and_determinism(spark):
    df = spark.range(0, 5000).select(F.col("id"))
    lab = split_assign(F.col("id"), [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    counts = {
        r["split"]: r["n"]
        for r in df.select(lab.alias("split")).groupBy("split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    # deterministic: identical on rerun regardless of partitioning
    again = {
        r["split"]: r["n"]
        for r in df.repartition(7).select(lab.alias("split")).groupBy("split")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert again == counts


def test_split_assign_is_refinable(spark):
    """Shrinking the first split only moves boundary rows into the NEXT
    range: a row labeled by a later split under the wide plan keeps a
    later-or-equal label under the narrow plan (no val/test swaps)."""
    df = spark.range(0, 2000)
    wide = split_assign(F.col("id"), [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    narrow = split_assign(F.col("id"), [("train", 0.6), ("val", 0.3), ("test", 0.1)])
    rows = df.select(wide.alias("w"), narrow.alias("n")).collect()
    # anything 'train' under narrow must be 'train' under wide (0.6 < 0.8);
    # anything 'test' under wide must be 'test' under narrow (cum 0.9 equal)
    for r in rows:
        if r["n"] == "train":
            assert r["w"] == "train"
        if r["w"] == "test":
            assert r["n"] == "test"


# ---------------------------------------------------------------------------
# per-group cap
# ---------------------------------------------------------------------------

def test_per_group_cap_verdicts(spark):
    rows = [(i, "g%d" % (i % 3), float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = per_group_cap(df, "grp", [F.desc("score"), F.asc("id")], cap=5)
    got = out.collect()
    assert len(got) == 60  # verdict for every row, nothing dropped
    per = {}
    for r in got:
        per.setdefault(r["grp"], []).append(r)
    for grp, rs in per.items():
        kept = [r for r in rs if r["keep"] == 1]
        assert len(kept) == 5
        # kept rows are exactly ranks 1..5, the top scores
        assert sorted(r["rank"] for r in kept) == [1, 2, 3, 4, 5]
        worst_kept = min(r["score"] for r in kept)
        best_dropped = max((r["score"] for r in rs if r["keep"] == 0), default=-1.0)
        assert worst_kept >= best_dropped


# ---------------------------------------------------------------------------
# KMV sketch
# ---------------------------------------------------------------------------

def test_kmv_estimate_accuracy_kmv_branch(spark):
    # 4000 distinct values, duplicated: estimate from 64 minima should land
    # within ~3/sqrt(k) ≈ 38% of truth (md5 is effectively uniform)
    df = spark.range(0, 8000).select(
        (F.col("id") % 4000).cast("string").alias("v"), F.lit("g").alias("grp")
    )
    row = kmv_distinct(df, "v", "grp", k=64, prefilter_denom=16).collect()[0]
    assert row["n_kept"] == 64
    assert row["kth_hash"] is not None
    assert 0.6 * 4000 < row["distinct_est"] < 1.5 * 4000


def test_kmv_sampling_branch_small_domain(spark):
    # 40 distinct values << k·denom: the cutoff keeps ~40/16 survivors and
    # the estimate falls back to n_kept * denom
    df = spark.range(0, 400).select(
        (F.col("id") % 40).cast("string").alias("v"), F.lit("g").alias("grp")
    )
    rows = kmv_distinct(df, "v", "grp", k=64, prefilter_denom=16).collect()
    if not rows:  # all 40 hashes may fall above the cutoff — legal outcome
        return
    row = rows[0]
    assert row["n_kept"] < 64
    assert row["kth_hash"] is None
    assert row["distinct_est"] == row["n_kept"] * 16.0


def test_kmv_duplicates_do_not_inflate(spark):
    # same distinct set, wildly different multiplicities → same sketch
    a = spark.range(0, 1000).select(
        (F.col("id") % 500).cast("string").alias("v"), F.lit("g").alias("grp")
    )
    b = spark.range(0, 50000).select(
        (F.col("id") % 500).cast("string").alias("v"), F.lit("g").alias("grp")
    )
    ra = kmv_distinct(a, "v", "grp", k=32).collect()[0]
    rb = kmv_distinct(b, "v", "grp", k=32).collect()[0]
    assert ra["distinct_est"] == rb["distinct_est"]
    assert ra["kth_hash"] == rb["kth_hash"]


# ---------------------------------------------------------------------------
# postings
# ---------------------------------------------------------------------------

def test_build_postings_counts_and_caps(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha"),
            (2, "beta gamma"),
            (3, "Alpha beta"),
            (4, "delta"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in build_postings(docs, max_postings=2).collect()}
    assert out["alpha"]["df_docs"] == 2  # lowercased: docs 1, 3
    assert out["alpha"]["tf_total"] == 3  # two in doc 1, one in doc 3
    assert out["alpha"]["postings"] == "1,3"
    assert out["beta"]["df_docs"] == 3
    assert out["beta"]["postings"] == "1,2"  # capped at 2 smallest ids
    assert out["beta"]["truncated"] == 1
    assert out["delta"]["postings"] == "4"
    assert out["delta"]["truncated"] == 0


# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------

def test_profile_columns_metrics(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, None, 2.5), (3, "y", None), (4, "x", 9.0)],
        "k long, s string, v double",
    )
    out = {r["col_name"]: r for r in profile_columns(df, ["k", "s", "v"]).collect()}
    assert set(out) == {"k", "s", "v"}
    for r in out.values():
        assert r["n_rows"] == 4
    assert out["k"]["n_nulls"] == 0 and out["k"]["n_distinct"] == 4
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "4"
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] == "x" and out["s"]["max_value"] == "y"
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 2


# ---------------------------------------------------------------------------
# integer PageRank
# ---------------------------------------------------------------------------

def _naive_pagerank(edges, iters=3, S=10**12, d=85):
    """Reference integer PageRank on an undirected pair list."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    r = {v: S for v in adj}
    for _ in range(iters):
        contrib = {v: 0 for v in adj}
        for u, nbrs in adj.items():
            share = r[u] // len(nbrs)
            for v in nbrs:
                contrib[v] += share
        r = {v: ((100 - d) * S + d * c) // 100 for v, c in contrib.items()}
    return r


def test_pagerank_matches_naive(spark):
    from beacon_indexer_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(pairs, iterations=3).collect()}
    assert got == _naive_pagerank(edges)


def test_pagerank_hub_outranks_leaf(spark):
    from beacon_indexer_spark.operators.graph import pagerank

    # star: node 0 connected to 1..6 — the hub must dominate
    edges = [(0, i) for i in range(1, 7)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(pairs, iterations=3).collect()}
    assert got[0] > max(v for k, v in got.items() if k != 0)
    assert got == _naive_pagerank(edges)


def test_pagerank_empty_graph(spark):
    from beacon_indexer_spark.operators.graph import pagerank

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert pagerank(pairs, iterations=2).collect() == []


# ---------------------------------------------------------------------------
# fuzzy name pairs
# ---------------------------------------------------------------------------

def test_fuzzy_name_pairs_blocked_levenshtein(spark):
    from beacon_indexer_spark.operators.dedup import fuzzy_name_pairs

    df = spark.createDataFrame(
        [
            (1, "small ring", "b1"),
            (2, "small rings", "b1"),   # dist 1, same block
            (3, "small ring", "b2"),    # identical name, DIFFERENT block
            (4, "giant cog", "b1"),     # same block key col but name far
            (5, "small rinx", "b1"),    # dist 1 to #1, 2 to #2
        ],
        "id long, name string, blk string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_name_pairs(df, "id", "name", ["blk"], max_dist=3).collect()
    }
    assert out == {(1, 2): 1, (1, 5): 1, (2, 5): 2}


# ---------------------------------------------------------------------------
# constraint checks
# ---------------------------------------------------------------------------

def test_check_constraints_report(spark):
    from beacon_indexer_spark.operators.profile import check_constraints, check_unique

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -1.0), (2, "b", None), (4, "c", 2.0)],
        "k long, s string, v double",
    )
    rules = [
        ("s_not_null", F.col("s").isNotNull()),
        ("v_positive", F.col("v") > 0),  # NULL v must count as violation
        ("k_small", F.col("k") < 100),
    ]
    rep = {r["rule"]: r for r in check_constraints(df, rules).collect()}
    assert rep["s_not_null"]["n_violations"] == 1 and rep["s_not_null"]["passed"] == 0
    assert rep["v_positive"]["n_violations"] == 2  # -1.0 and NULL
    assert rep["k_small"]["n_violations"] == 0 and rep["k_small"]["passed"] == 1
    for r in rep.values():
        assert r["n_rows"] == 4
    uniq = check_unique(df, ["k"], "k_unique").collect()[0]
    assert uniq["n_violations"] == 1 and uniq["passed"] == 0  # k=2 twice


def test_profile_distinct_injective_for_nested_and_binary(spark):
    from beacon_indexer_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, ["a, b"], bytearray(b"\x00\x01")),
         (2, ["a", "b"], bytearray(b"\x00")),
         (3, None, None)],
        "k long, arr array<string>, bin binary",
    )
    out = {r["col_name"]: r for r in profile_columns(df, ["arr", "bin"]).collect()}
    # ['a, b'] and ['a','b'] stringify identically — to_json keeps them apart
    assert out["arr"]["n_distinct"] == 2
    assert out["arr"]["n_nulls"] == 1
    assert out["bin"]["n_distinct"] == 2
    assert out["bin"]["n_nulls"] == 1


def test_check_constraints_rejects_empty_rules(spark):
    import pytest as _pytest

    from beacon_indexer_spark.operators.profile import check_constraints

    df = spark.range(3)
    with _pytest.raises(ValueError):
        check_constraints(df, [])


def test_ivf_centroids_caps_at_k_with_duplicate_ids(spark):
    from beacon_indexer_spark.operators.similarity import ivf_centroids

    rows = [(i % 6, [float(i), 1.0]) for i in range(12)]  # every id twice
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_centroids(df, k=4)
    assert len(cents) == 4
    assert [c[0] for c in cents] == [0, 1, 2, 3]


def test_profile_hostile_column_and_rule_names(spark):
    """Column names with quotes, commas, spaces, hyphens, and dots —
    reachable via `maintain profile --table/--columns` on arbitrary lake
    tables — must profile correctly; no user string reaches SQL text."""
    from beacon_indexer_spark.operators.profile import (
        check_constraints,
        profile_columns,
    )

    hostile = ["it's, tricky", "a.b c-d", "stack(1, 'x')"]
    df = spark.createDataFrame(
        [(1, "x", 2.0), (None, "y", 3.0), (2, None, None)],
        "`it's, tricky` long, `a.b c-d` string, `stack(1, 'x')` double",
    )
    out = {r["col_name"]: r for r in profile_columns(df, hostile).collect()}
    assert set(out) == set(hostile)
    assert out["it's, tricky"]["n_nulls"] == 1
    assert out["it's, tricky"]["n_distinct"] == 2
    assert out["a.b c-d"]["min_value"] == "x"
    assert out["stack(1, 'x')"]["max_value"] == "3.0"

    rep = {
        r["rule"]: r
        for r in check_constraints(
            df, [("quote ' comma, paren)", df["it's, tricky"].isNotNull())]
        ).collect()
    }
    assert rep["quote ' comma, paren)"]["n_violations"] == 1

    import pytest as _pytest

    with _pytest.raises(KeyError):
        profile_columns(df, ["no_such_column"])
