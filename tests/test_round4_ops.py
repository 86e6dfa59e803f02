"""Round-4 operator tests: exact-Hamming verify, quantized ANN, pack stats,
corpus/source rollups."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from beacon_indexer_spark.operators import dedup as D
from beacon_indexer_spark.operators import similarity as S
from beacon_indexer_spark.operators import text as X


# ---------------------------------------------------------------------------
# hamming_hex
# ---------------------------------------------------------------------------

def test_hamming_hex_matches_python_popcount(spark):
    rnd = random.Random(4)
    rows = [
        (i, f"{rnd.getrandbits(64):016x}", f"{rnd.getrandbits(64):016x}")
        for i in range(50)
    ]
    rows.append((50, "0" * 16, "f" * 16))  # max distance 64
    rows.append((51, "deadbeefdeadbeef", "deadbeefdeadbeef"))  # distance 0
    df = spark.createDataFrame(rows, "i long, a string, b string")
    got = {
        r["i"]: r["h"]
        for r in df.select("i", D.hamming_hex("a", "b").alias("h")).collect()
    }
    for i, a, b in rows:
        assert got[i] == bin(int(a, 16) ^ int(b, 16)).count("1"), (a, b)


def test_simhash_hamming_pairs_contract(spark):
    # the operator's contract: output == banded candidates, scored by the
    # TRUE 64-bit Hamming distance, filtered to <= max_dist. Cross-checked
    # in python from the collected simhashes/candidates; identical docs
    # must appear at distance 0.
    rnd = random.Random(12)
    vocab = [f"tok{i}" for i in range(60)]
    rows = [(i, " ".join(rnd.sample(vocab, 25))) for i in range(1, 30)]
    rows.append((30, rows[0][1]))  # exact duplicate of doc 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = {r["doc_id"]: r["simhash"]
          for r in D.simhash(docs, "doc_id", "text").collect()}
    cands = {(r["id_a"], r["id_b"])
             for r in D.simhash_candidates(docs, "doc_id", "text").collect()}
    max_dist = 20
    expected = {}
    for a, b in cands:
        h = bin(int(sh[a], 16) ^ int(sh[b], 16)).count("1")
        if h <= max_dist:
            expected[(a, b)] = h

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_hamming_pairs(
            docs, "doc_id", "text", max_dist=max_dist
        ).collect()
    }
    assert got == expected
    assert got[(1, 30)] == 0  # exact duplicate blocked + scored at 0


# ---------------------------------------------------------------------------
# quantized_topk
# ---------------------------------------------------------------------------

def test_quantized_topk_matches_numpy_reference(spark):
    rnd = random.Random(9)
    dim, n, k = 8, 20, 3
    vecs = {i: [rnd.uniform(-1, 1) for _ in range(dim)] for i in range(n)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = S.quantized_topk(df, df.filter(F.col("vec_id") < 2), k=k)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["q_sim"], 9))
        for r in out.collect()
    }

    def codes(v):
        scale = max(abs(x) for x in v) / 127.0
        if scale <= 0:
            return [0] * dim, 0
        q = [int(math.floor(x / scale + 0.5)) for x in v]
        return q, sum(x * x for x in q)

    for qid in (0, 1):
        qq, qn = codes(vecs[qid])
        scored = []
        for nid, v in vecs.items():
            if nid == qid:
                continue
            vq, vn = codes(v)
            s = (
                sum(a * b for a, b in zip(vq, qq)) / math.sqrt(vn * qn)
                if vn * qn > 0
                else 0.0
            )
            scored.append((-s, nid))
        scored.sort()
        for rank, (negs, nid) in enumerate(scored[:k], start=1):
            assert got[(qid, rank)] == (nid, round(-negs, 9)), (qid, rank)


def test_quantized_topk_tracks_exact_on_planted_clusters(spark):
    # int8 quantization error is far below planted cluster separation, so
    # the quantized top-1 must be a same-cluster member
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = []
    for c in range(10):
        base = rng.standard_normal(32)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + 0.01 * rng.standard_normal(32)
            vecs.append(v / np.linalg.norm(v))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = S.quantized_topk(df, df.filter(F.col("vec_id") < 6), k=1)
    for r in out.collect():
        assert r["neighbor_id"] // 3 == r["query_id"] // 3
        assert r["q_sim"] > 0.95


# ---------------------------------------------------------------------------
# chunk_windows
# ---------------------------------------------------------------------------

def test_chunk_windows_matches_naive(spark):
    rnd = random.Random(7)
    rows = [
        (i, " ".join(f"t{j}" for j in range(rnd.choice([0, 1, 5, 10, 11, 25, 40]))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    W, S_ = 10, 6
    got = {
        (r["id"], r["chunk_idx"]): (r["chunk_tokens"], r["chunk_text"])
        for r in X.chunk_windows(docs, "doc_id", "text", window=W, stride=S_).collect()
    }
    expected = {}
    for i, text in rows:
        toks = text.split()
        n = len(toks)
        if n == 0:
            continue
        k = 1 if n <= W else -((n - W) // -S_) + 1
        for c in range(k):
            piece = toks[c * S_ : c * S_ + W]
            expected[(i, c)] = (len(piece), " ".join(piece))
    assert got == expected
    # overlap property: consecutive chunks share window-stride tokens
    full = [(i, t) for i, t in rows if len(t.split()) > W][0]
    toks = full[1].split()
    assert got[(full[0], 0)][1].split()[S_:] == got[(full[0], 1)][1].split()[: W - S_]


def test_chunk_windows_null_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one two")],
        "doc_id long, text string",
    )
    got = X.chunk_windows(docs, "doc_id", "text", window=4, stride=4).collect()
    assert {r["id"] for r in got} == {4}
    assert got[0]["chunk_text"] == "one two"


# ---------------------------------------------------------------------------
# ngram containment
# ---------------------------------------------------------------------------

def test_containment_catches_embedded_doc_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon zeta"
    host = short + " " + " ".join(f"fill{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, host), (3, "unrelated words only here")],
        "doc_id long, text string",
    )
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in D.ngram_containment_pairs(
            docs, "doc_id", "text", threshold=0.9
        ).collect()
    }
    # every shingle of the short doc appears in the host -> containment 1.0
    assert cont[(1, 2)] == 1.0
    # symmetric jaccard on the same pair is tiny (host has ~60 extra
    # shingles) and misses it at any near-dup threshold
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.0
        ).collect()
    }
    assert jac[(1, 2)] < 0.1


# ---------------------------------------------------------------------------
# pack_stats
# ---------------------------------------------------------------------------

def test_pack_stats_matches_naive(spark):
    rnd = random.Random(6)
    rows = [
        (i, " ".join("w" for _ in range(rnd.randrange(1, 30))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["pack_id"]: (r["n_docs"], r["n_tokens"], r["utilization"])
        for r in X.pack_stats(docs, "doc_id", "text", capacity=64).collect()
    }
    prefix = 0
    expected: dict[int, list[int]] = {}
    for i, text in rows:
        nt = len(text.split())
        pid = prefix // 64
        d = expected.setdefault(pid, [0, 0])
        d[0] += 1
        d[1] += nt
        prefix += nt
    assert set(got) == set(expected)
    for pid, (nd, nt) in expected.items():
        assert got[pid] == (nd, nt, round(nt / 64, 6)), pid


# ---------------------------------------------------------------------------
# label centroids / outliers
# ---------------------------------------------------------------------------

def test_label_centroids_match_numpy(spark):
    import numpy as np

    rnd = random.Random(7)
    rows = [
        (i, f"l{i % 3}", [rnd.uniform(-1, 1) for _ in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    got = S.label_centroids(df, "embedding", "label").collect()
    by_label = {}
    for _, lab, v in rows:
        by_label.setdefault(lab, []).append(v)
    for r in got:
        exp = np.mean(np.array(by_label[r["label"]]), axis=0)[r["pos"]]
        assert math.isclose(r["centroid"], round(exp, 6), abs_tol=2e-6)
        assert r["n_vecs"] == len(by_label[r["label"]])


def test_label_outliers_finds_planted_outlier(spark):
    # cluster tight around +1; one planted vector at -1 must rank 1
    rnd = random.Random(9)
    rows = [
        (i, "a", [1.0 + rnd.uniform(-0.01, 0.01) for _ in range(8)])
        for i in range(20)
    ]
    rows.append((99, "a", [-1.0] * 8))
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    got = S.label_outliers(df, "vec_id", "embedding", "label", k=2).collect()
    top = [r for r in got if r["rank"] == 1]
    assert len(top) == 1 and top[0]["vec_id"] == 99
    # distance sanity: planted outlier ~ sqrt(8 * 4) = ~5.6 from centroid
    assert top[0]["l2_dist"] > 5.0


# ---------------------------------------------------------------------------
# funnel ordering semantics
# ---------------------------------------------------------------------------

def test_funnel_requires_stage_order(spark, tmp_path):
    from datetime import datetime, timezone

    def ts(m):
        return datetime(2024, 1, 1, 0, m, tzinfo=timezone.utc)

    rows = [
        # u1 converts fully in order
        (1, ts(1), 1, "view", 1.0, "{}"),
        (2, ts(2), 1, "click", 1.0, "{}"),
        (3, ts(3), 1, "purchase", 1.0, "{}"),
        # u2 clicks BEFORE viewing: click/purchase must not count
        (4, ts(2), 2, "click", 1.0, "{}"),
        (5, ts(3), 2, "view", 1.0, "{}"),
        # u3 views then purchases without click: stops at stage 1
        (6, ts(1), 3, "view", 1.0, "{}"),
        (7, ts(2), 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")
    from beacon_indexer_spark.plans.queries import QUERIES

    got = {r["event_type"]: r for r in QUERIES["events_funnel"](spark, sf).collect()}
    assert got["view"]["n_users"] == 3
    assert got["click"]["n_users"] == 1
    assert got["purchase"]["n_users"] == 1
    assert got["click"]["conv_rate"] == round(1 / 3, 6)


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------

def test_semantic_dedup_groups_planted_near_identical(spark):
    rnd = random.Random(21)
    base = [rnd.uniform(-1, 1) for _ in range(16)]
    far = [-x for x in base]
    rows = []
    # 3 near-identical copies of `base` (ids 1,2,3) + 2 copies of `far`
    # (ids 10,11) + noise vectors
    for i in (1, 2, 3):
        rows.append((i, [x + rnd.uniform(-1e-4, 1e-4) for x in base]))
    for i in (10, 11):
        rows.append((i, [x + rnd.uniform(-1e-4, 1e-4) for x in far]))
    for i in range(100, 110):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in S.semantic_dedup_keep(
        df, "vec_id", "embedding", k_clusters=4, threshold=0.99
    ).collect()}
    assert len(out) == len(rows)  # total verdict: every vector appears
    assert out[1]["keep"] == 1 and out[2]["keep"] == 0 and out[3]["keep"] == 0
    assert out[2]["group_id"] == 1 and out[3]["group_id"] == 1
    assert out[10]["keep"] == 1 and out[11]["group_id"] == 10
    # singletons keep themselves
    assert all(out[i]["keep"] == 1 and out[i]["group_id"] == i
               for i in range(100, 110))


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------

def test_pq_encode_matches_numpy_argmin(spark):
    import numpy as np

    rnd = random.Random(31)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cbs = S.pq_codebooks(df, "vec_id", "embedding", m=4, k=8)
    got = {r["vec_id"]: r["pq_code"]
           for r in S.pq_encode(df, cbs, "vec_id", "embedding").collect()}
    cb = np.array(cbs)  # (m, k, sub)
    for vid, v in rows:
        vv = np.array(v).reshape(4, 4)
        for s in range(4):
            d2 = ((cb[s] - vv[s]) ** 2).sum(axis=1)
            assert got[vid][s] == int(d2.argmin()), (vid, s)


def test_pq_topk_approximates_exact_neighbors(spark):
    # PQ ADC top-k must rank a planted near-identical vector first:
    # quantization error is bounded by codeword spacing, and identical
    # vectors share codes so their ADC distance is minimal.
    rnd = random.Random(33)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    rows.append((99, [x + 1e-6 for x in rows[0][1]]))  # near-copy of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cbs = S.pq_codebooks(df, "vec_id", "embedding", m=4, k=8)
    qs = df.filter("vec_id = 0")
    out = S.pq_topk(df, qs, cbs, "vec_id", "embedding", k=3).collect()
    top1 = [r for r in out if r["rank"] == 1][0]
    assert top1["neighbor_id"] == 99
    # ADC distance to a same-code vector is the QUERY's own quantization
    # residual d(q, recon(q)) — strictly positive, but still the minimum
    # over the corpus (every other vector's reconstruction is farther)
    assert 0.0 < top1["adc_dist"] <= min(r["adc_dist"] for r in out)
