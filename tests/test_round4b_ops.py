"""Unit tests for the round-4b operators: nearest-in-time join, winnowing
fingerprints/pairs, and distributed k-means."""

from __future__ import annotations

import hashlib
import random
import re

from pyspark.sql import functions as F

from beacon_indexer_spark.operators import dedup as D
from beacon_indexer_spark.operators import relational as R
from beacon_indexer_spark.operators.clustering import kmeans_assign
from beacon_indexer_spark.operators.text import winnow_fingerprints


# ---------------------------------------------------------------------------
# nearest join
# ---------------------------------------------------------------------------

def test_nearest_join_directions_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 10, "b"), (2, 100, "c"), (3, 100, "d")],
        "k long, lts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 90, 7), (1, 110, 8), (1, 12, 9),
         (2, 100, 1), (2, 100, 2)],
        "k long, rts long, rid long",
    )
    out = {
        (r["k"], r["lts"]): (r["rid"], r["nearest_ts"])
        for r in R.nearest_join(
            left, right, ["k"], "lts", "rts", tiebreak="rid"
        ).collect()
    }
    # equal distance 10 both directions → backward (earlier, rts=90) wins
    assert out[(1, 100)] == (7, 90)
    # forward-only nearest (12 is 2 away, 90 is 80 away)
    assert out[(1, 10)] == (9, 12)
    # same-ts rights collapse to max tiebreak before matching
    assert out[(2, 100)] == (2, 100)
    # no right rows for the key
    assert out[(3, 100)] == (None, None)


def test_nearest_join_matches_naive(spark):
    rnd = random.Random(23)
    rows_l = [(i % 5, rnd.randrange(0, 400), i) for i in range(250)]
    rows_r = [(i % 5, rnd.randrange(0, 400), 1000 + i) for i in range(250)]
    left = spark.createDataFrame(rows_l, "k long, lts long, lid long")
    right = spark.createDataFrame(rows_r, "k long, rts long, rid long")

    # collapse rights per (k, ts) to max rid, then nearest by
    # (abs distance, earlier ts)
    best = {}
    for rk, rts, rid in rows_r:
        cur = best.get((rk, rts))
        best[(rk, rts)] = max(cur, rid) if cur is not None else rid

    def naive(lk, lts):
        cands = [
            (abs(rts - lts), rts, rid)
            for (rk, rts), rid in best.items()
            if rk == lk
        ]
        if not cands:
            return (None, None)
        d, rts, rid = min(cands)
        return (rid, rts)

    got = {
        r["lid"]: (r["rid"], r["nearest_ts"])
        for r in R.nearest_join(
            left, right, ["k"], "lts", "rts", tiebreak="rid"
        ).collect()
    }
    assert len(got) == len(rows_l)
    for lk, lts, lid in rows_l:
        assert got[lid] == naive(lk, lts), (lk, lts, lid)


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------

def _naive_winnow(text: str, n: int = 3, w: int = 4) -> set[int]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    if len(toks) < n:
        return set()
    hs = [
        int(
            hashlib.md5(("w:" + " ".join(toks[i:i + n])).encode()).hexdigest()[:15],
            16,
        )
        for i in range(len(toks) - n + 1)
    ]
    m = max(len(hs) - w + 1, 1)
    return {min(hs[j:j + w]) for j in range(m)}


def test_winnow_fingerprints_match_naive(spark):
    rnd = random.Random(7)
    words = ["spark", "join", "scan", "agg", "row", "table", "the", "a"]
    docs = [
        (i, " ".join(rnd.choice(words) for _ in range(rnd.randrange(0, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, "doc_id", "text", n=3, w=4).collect():
        got.setdefault(r["id"], set()).add(r["fingerprint"])
    for i, text in docs:
        assert got.get(i, set()) == _naive_winnow(text), (i, text)


def test_winnow_pairs_find_planted_passage(spark):
    rnd = random.Random(13)
    words = [f"tok{i}" for i in range(200)]
    passage = " ".join(rnd.choice(words) for _ in range(30))

    def noise(n):
        return " ".join(rnd.choice(words) for _ in range(n))

    docs = [
        (0, noise(40) + " " + passage + " " + noise(40)),
        (1, noise(35) + " " + passage + " " + noise(50)),
    ] + [(i, noise(120)) for i in range(2, 30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.winnow_pairs(
            df, "doc_id", "text", n=3, w=4, min_shared=5, df_cap=1000
        ).collect()
    }
    assert (0, 1) in pairs
    # the planted pair must dominate: no unrelated doc pair reaches the
    # same shared-fingerprint count at min_shared=5 over random noise
    shared = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in D.winnow_pairs(
            df, "doc_id", "text", n=3, w=4, min_shared=1, df_cap=1000
        ).collect()
    }
    top = max(shared, key=shared.get)
    assert top == (0, 1)


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------

def _naive_kmeans(ids, vecs, k=4, iters=2):
    order = sorted(
        range(len(ids)), key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest()
    )
    cents = [[float(x) for x in vecs[order[c]]] for c in range(k)]

    def assign_all(cents):
        out = {}
        for i, v in zip(ids, vecs):
            best = None
            for cid, c in enumerate(cents):
                dot = 0.0
                for a, b in zip(v, c):
                    dot += float(a) * b
                sq = 0.0
                for b in c:
                    sq += b * b
                d2 = (-dot) * 2 + sq
                if best is None or (d2, cid) < best[0]:
                    best = ((d2, cid), cid)
            out[i] = best[1]
        return out

    for _ in range(iters):
        asg = assign_all(cents)
        sums = {c: [0.0] * len(vecs[0]) for c in range(k)}
        cnt = {c: 0 for c in range(k)}
        for i, v in zip(ids, vecs):
            c = asg[i]
            cnt[c] += 1
            for p, x in enumerate(v):
                sums[c][p] += float(x)
        for c in range(k):
            if cnt[c]:
                cents[c] = [round(sums[c][p] / cnt[c], 6) for p in range(len(cents[c]))]
    return assign_all(cents)


def test_kmeans_matches_naive_lloyd(spark):
    rnd = random.Random(5)
    ids = list(range(60))
    vecs = [[rnd.uniform(-1, 1) for _ in range(8)] for _ in ids]
    df = spark.createDataFrame(
        [(i, v) for i, v in zip(ids, vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        r["id"]: r["cluster"]
        for r in kmeans_assign(df, "vec_id", "embedding", k=4, iters=2).collect()
    }
    want = _naive_kmeans(ids, vecs, k=4, iters=2)
    assert got == want
    assert len(set(got.values())) > 1  # actually clusters, not one blob


def test_nearest_join_null_right_ts_dropped(spark):
    left = spark.createDataFrame([(1, 100, "a")], "k long, lts long, tag string")
    right = spark.createDataFrame(
        [(1, None, 7), (1, 50, 8)], "k long, rts long, rid long"
    )
    out = R.nearest_join(left, right, ["k"], "lts", "rts", tiebreak="rid").collect()
    # the null-ts right row must never surface as a match
    assert [(r["rid"], r["nearest_ts"]) for r in out] == [(8, 50)]
    only_null = spark.createDataFrame([(1, None, 7)], "k long, rts long, rid long")
    out2 = R.nearest_join(left, only_null, ["k"], "lts", "rts", tiebreak="rid").collect()
    assert [(r["rid"], r["nearest_ts"]) for r in out2] == [(None, None)]


def test_nearest_join_no_tiebreak_is_deterministic(spark):
    left = spark.createDataFrame([(1, 100)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 100, "x"), (1, 100, "y")], "k long, rts long, payload string"
    )
    # without a tiebreak the max-md5(serialized payload) row wins — a
    # deterministic total order that also covers non-orderable payloads
    want = max(
        ["x", "y"],
        key=lambda v: hashlib.md5(f'{{"payload":"{v}"}}'.encode()).hexdigest(),
    )
    for _ in range(3):
        out = R.nearest_join(left, right, ["k"], "lts", "rts").collect()
        assert [r["payload"] for r in out] == [want]


def test_asof_join_null_right_ts_dropped(spark):
    left = spark.createDataFrame([(1, 100)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, None, 7)], "k long, rts long, rid long"
    )
    out = R.asof_join(left, right, ["k"], "lts", "rts", tiebreak="rid").collect()
    assert [(r["rid"], r["asof_ts"]) for r in out] == [(None, None)]


def test_counted_pairs_overflow_join_same_counts(spark):
    rnd = random.Random(3)
    rows = []
    # one giant bucket (key 0, 40 members) + normal buckets
    for i in range(40):
        rows.append((i, 0))
    for i in range(60):
        rows.append((rnd.randrange(50), 1 + rnd.randrange(20)))
    keyed = spark.createDataFrame(rows, "id long, fingerprint long").distinct()
    base = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in D._counted_pairs_from_buckets(
            keyed, "id", "fingerprint", max_bucket=None
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in D._counted_pairs_from_buckets(
            keyed, "id", "fingerprint", max_bucket=8
        ).collect()
    }
    assert base == capped and len(base) > 100
