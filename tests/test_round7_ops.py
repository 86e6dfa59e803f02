"""Planted-scenario tests for the round-7 wave-2 queries: min-cost
supplier per part (TPC-H Q2 shape as a grouped argmin), monthly promo
revenue share (Q14 shape), and the EWMA daily-volume anomaly screen."""

from __future__ import annotations

from datetime import datetime

from beacon_indexer_spark.plans.queries import QUERIES


def _plant(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_part_cheapest_supplier_argmin_and_tiebreak(spark, tmp_path):
    # part 1: supp 20 wins on unit price (5.0 < 10.0);
    # part 2: exact price tie (7.0) -> lower suppkey (5) wins;
    # zero-quantity rows are excluded before the division
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1, 10, 100.0, 10.0),
            (1, 20, 50.0, 10.0),
            (2, 30, 14.0, 2.0),
            (2, 5, 70.0, 10.0),
            (2, 99, 1.0, 0.0),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_quantity double",
    )
    _plant(
        spark, tmp_path, "supplier",
        [(5, "S5"), (10, "S10"), (20, "S20"), (30, "S30"), (99, "S99")],
        "s_suppkey long, s_name string",
    )
    out = {
        r["partkey"]: (r["best_unit_price"], r["suppkey"], r["s_name"])
        for r in QUERIES["part_cheapest_supplier"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {1: (5.0, 20, "S20"), 2: (7.0, 5, "S5")}


def test_part_promo_revenue_share(spark, tmp_path):
    _plant(
        spark, tmp_path, "part",
        [(1, "PROMO"), (2, "STANDARD")],
        "p_partkey long, p_type string",
    )
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1, datetime(1995, 1, 10, 12), 100.0, 0.0),
            (2, datetime(1995, 1, 20, 12), 100.0, 0.5),
            (2, datetime(1995, 2, 5, 12), 40.0, 0.0),
        ],
        "l_partkey long, l_shipdate timestamp, l_extendedprice double, l_discount double",
    )
    out = {
        r["month"]: (
            r["promo_revenue"],
            r["total_revenue"],
            r["promo_share_pct"],
            r["n_items"],
        )
        for r in QUERIES["part_promo_revenue"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "1995-01": (100.0, 150.0, 66.666667, 2),
        # a month with no promo items reports 0, not null
        "1995-02": (0.0, 40.0, 0.0, 1),
    }


def test_events_ewma_anomaly_recurrence_and_flags(spark, tmp_path):
    # daily counts 10, 10, 30, 4:
    #   day1: prior null (seed), never a spike
    #   day2: prior 10.0, ratio 1.0 -> calm; e2 stays 10
    #   day3: prior 10.0, ratio 3.0 -> spike; e3 = .3*30 + .7*10 = 16
    #   day4: prior 16.0, ratio 0.25 -> dip flagged
    rows = []
    counts = {1: 10, 2: 10, 3: 30, 4: 4}
    eid = 0
    for day, n in counts.items():
        for i in range(n):
            rows.append((eid, datetime(2024, 3, day, 8 + (i % 12))))
            eid += 1
    _plant(spark, tmp_path, "events", rows, "event_id long, ts timestamp")
    out = {
        r["day"]: (r["n_events"], r["ewma_prior"], r["ratio"], r["is_spike"])
        for r in QUERIES["events_ewma_anomaly"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "2024-03-01": (10, None, None, 0),
        "2024-03-02": (10, 10.0, 1.0, 0),
        "2024-03-03": (30, 10.0, 3.0, 1),
        "2024-03-04": (4, 16.0, 0.25, 1),
    }


def test_embedding_fisher_separation_planted(spark, tmp_path):
    # dim0 separates labels (means 0.1 vs 1.1, tiny within) -> fisher 25;
    # dim1 has identical per-label distributions -> fisher 0
    _plant(
        spark, tmp_path, "embeddings",
        [
            (1, [0.0, 0.0], 0),
            (2, [0.2, 1.0], 0),
            (3, [1.0, 0.0], 1),
            (4, [1.2, 1.0], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    out = {
        r["dim"]: (r["n_labels"], r["fisher"])
        for r in QUERIES["embedding_fisher_separation"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {0: (2, 25.0), 1: (2, 0.0)}


def test_simhash_bit_balance_matches_signature_popcounts(spark, tmp_path):
    # the 64 per-position ones-counts must exactly reproduce the bits of
    # the corpus signatures (independently decoded in python)
    _plant(
        spark, tmp_path, "documents",
        [
            (1, "alpha beta gamma delta"),
            (2, "epsilon zeta eta theta iota"),
            (3, "alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    from beacon_indexer_spark.operators import dedup as D
    from beacon_indexer_spark.plans.queries import _t

    sigs = [
        r["simhash"]
        for r in D.simhash(
            _t(spark, str(tmp_path), "documents"), "doc_id", "text"
        ).collect()
    ]
    expected = [0] * 64
    for h in sigs:
        v = int(h, 16)
        for p in range(64):
            expected[p] += (v >> (63 - p)) & 1
    out = {
        r["bit_pos"]: (r["n_docs"], r["n_ones"], r["ones_share"])
        for r in QUERIES["simhash_bit_balance"](spark, str(tmp_path)).collect()
    }
    assert len(out) == 64
    for p in range(64):
        assert out[p] == (3, expected[p], round(expected[p] / 3, 6)), p


def test_customer_pareto_coverage_exact_crossing(spark, tmp_path):
    # revenues 40, 30, 30 (multiple orders per customer sum first):
    # 40 < 80% of 100, 40+30 = 70 < 80, +30 = 100 >= 80 -> 3 customers,
    # exercising the partial-group ceiling division on a TIED group
    _plant(
        spark, tmp_path, "orders",
        [
            (1, 25.0), (1, 15.0),   # cust 1 -> 40
            (2, 30.0),              # cust 2 -> 30
            (3, 30.0),              # cust 3 -> 30
        ],
        "o_custkey long, o_totalprice double",
    )
    [r] = QUERIES["customer_pareto_coverage"](spark, str(tmp_path)).collect()
    assert (
        r["n_customers"],
        r["total_revenue"],
        r["n_customers_80"],
        r["pct_customers_80"],
    ) == (3, 100.0, 3, 100.0)


def test_customer_pareto_coverage_top_heavy(spark, tmp_path):
    # 60, 25, 15: top-2 cover 85% -> n80 = 2 of 3
    _plant(
        spark, tmp_path, "orders",
        [(1, 60.0), (2, 25.0), (3, 15.0)],
        "o_custkey long, o_totalprice double",
    )
    [r] = QUERIES["customer_pareto_coverage"](spark, str(tmp_path)).collect()
    assert (r["n_customers_80"], r["pct_customers_80"]) == (2, 66.666667)


def test_doc_oov_rate_head_vocabulary(spark, tmp_path):
    # 16 head words (count 2 in source A) + 3 rare words only in source B:
    # the top-16 head is exactly the h-words, so A is fully covered and
    # B's OOV mass is its 3 rare occurrences out of 4 tokens
    head_words = [f"h{i:02d}" for i in range(16)]
    _plant(
        spark, tmp_path, "documents",
        [
            (1, " ".join(head_words), "A"),
            (2, " ".join(head_words), "A"),
            (3, "h00 r1 r2 r3", "B"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in QUERIES["doc_oov_rate"](spark, str(tmp_path)).collect()
    }
    assert out == {"A": (32, 0, 0.0), "B": (4, 3, 0.75)}


def test_events_type_audience_overlap_jaccard(spark, tmp_path):
    # u1:{buy,click} u2:{click} u3:{buy,view} ->
    # (buy,click): common 1 of union 3; (buy,view): 1 of 2; click-view: none
    rows = [
        (1, datetime(2024, 1, 1, 1), 1, "buy"),
        (2, datetime(2024, 1, 1, 2), 1, "click"),
        (3, datetime(2024, 1, 1, 3), 2, "click"),
        (4, datetime(2024, 1, 1, 4), 3, "buy"),
        (5, datetime(2024, 1, 1, 5), 3, "view"),
        (6, datetime(2024, 1, 1, 6), 3, "buy"),  # dup (user,type) collapses
    ]
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        (r["type_a"], r["type_b"]): (r["n_common_users"], r["user_jaccard"])
        for r in QUERIES["events_type_audience_overlap"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        ("buy", "click"): (1, round(1 / 3, 6)),
        ("buy", "view"): (1, 0.5),
    }


def test_corpus_zipf_fit_matches_reference_fold(spark, tmp_path):
    # counts a:8 b:4 c:2 d:1 -> expected OLS replicated with the SAME
    # rank-ordered sequential accumulation the query folds with
    import math

    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    _plant(
        spark, tmp_path, "documents",
        [(1, text)], "doc_id long, text string",
    )
    counts = [8.0, 4.0, 2.0, 1.0]
    sx = sy = sxx = sxy = syy = 0.0
    for r, c in enumerate(counts, start=1):
        x, y = math.log(float(r)), math.log(c)
        sx += x
        sy += y
        sxx += x * x
        sxy += x * y
        syy += y * y
    k = float(len(counts))
    cov, vx, vy = k * sxy - sx * sy, k * sxx - sx * sx, k * syy - sy * sy
    [r] = QUERIES["corpus_zipf_fit"](spark, str(tmp_path)).collect()
    assert r["n_terms"] == 4
    assert r["zipf_slope"] == round(cov / vx, 6)
    assert r["intercept"] == round((sy - cov / vx * sx) / k, 6)
    assert r["r2"] == round(cov * cov / (vx * vy), 6)
    assert r["zipf_slope"] < 0 and 0 < r["r2"] <= 1


def test_embedding_dim_quantiles_discrete_ranks(spark, tmp_path):
    # dim0: 0.1..1.0 -> p01 = first value, p50 = 5th, p99 = last;
    # dim1: constant -> all quantiles equal
    _plant(
        spark, tmp_path, "embeddings",
        [(i, [i / 10.0, 0.5], 0) for i in range(1, 11)],
        "vec_id long, embedding array<double>, label int",
    )
    out = {
        r["dim"]: (r["n"], r["p01"], r["p50"], r["p99"])
        for r in QUERIES["embedding_dim_quantiles"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        0: (10, 0.1, 0.5, 1.0),
        1: (10, 0.5, 0.5, 0.5),
    }


def test_orders_interarrival_dist_bands(spark, tmp_path):
    # cust 1: gaps 0d, 3d, 37d, 160d; cust 2: single order -> no gap
    _plant(
        spark, tmp_path, "orders",
        [
            (1, 1, datetime(2024, 1, 1, 12)),
            (2, 1, datetime(2024, 1, 1, 15)),
            (3, 1, datetime(2024, 1, 4, 9)),
            (4, 1, datetime(2024, 2, 10, 9)),
            (5, 1, datetime(2024, 7, 19, 9)),
            (6, 2, datetime(2024, 5, 5, 5)),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    out = {
        r["gap_band"]: (r["n_gaps"], r["share"])
        for r in QUERIES["orders_interarrival_dist"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        "0d": (1, 0.25),
        "1-7d": (1, 0.25),
        "31-90d": (1, 0.25),
        "90d+": (1, 0.25),
    }


def test_doc_prefix_dup_rate_shared_heads(spark, tmp_path):
    # docs 1,2 share the 8-token head (different tails, different source);
    # doc 3 unique -> A: 2 docs both dup in head terms? doc1 dup, doc3 not
    head = "t1 t2 t3 t4 t5 t6 t7 t8"
    _plant(
        spark, tmp_path, "documents",
        [
            (1, head + " tail one", "A"),
            (2, head + " completely different tail", "B"),
            (3, "unique text with its own words here now", "A"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["source"]: (r["n_docs"], r["n_prefix_dup"], r["prefix_dup_rate"])
        for r in QUERIES["doc_prefix_dup_rate"](spark, str(tmp_path)).collect()
    }
    assert out == {"A": (2, 1, 0.5), "B": (1, 1, 1.0)}


def test_events_funnel_conversion_lag_quantiles(spark, tmp_path):
    # lags 30, 90, 600 min; u4 purchased BEFORE viewing (excluded);
    # u5 never purchased -> n=3, p50=90, p90=p99=600
    t0 = datetime(2024, 6, 1, 10, 0)

    def at(minutes):
        from datetime import timedelta

        return t0 + timedelta(minutes=minutes)

    rows = [
        (1, t0, 1, "view"), (2, at(30), 1, "purchase"),
        (3, t0, 2, "view"), (4, at(90), 2, "purchase"),
        (5, t0, 3, "view"), (6, at(600), 3, "purchase"),
        (7, at(5), 4, "purchase"), (8, at(10), 4, "view"),
        (9, t0, 5, "view"),
    ]
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    [r] = QUERIES["events_funnel_conversion_lag"](
        spark, str(tmp_path)
    ).collect()
    assert (
        r["n_conversions"], r["p50_minutes"], r["p90_minutes"], r["p99_minutes"]
    ) == (3, 90, 600, 600)


def test_embedding_intrinsic_dim_matches_reference(spark, tmp_path):
    # replicate the TwoNN estimate in python with the SAME cosine fold
    # order and 1e-9 quantization the query uses
    import math

    angles = [0.0, 0.2, 0.5, 0.9]
    vecs = [(i, [math.cos(a), math.sin(a)], 0) for i, a in enumerate(angles)]
    _plant(
        spark, tmp_path, "embeddings", vecs,
        "vec_id long, embedding array<double>, label int",
    )

    def cos(u, v):
        dot = 0.0
        for x, y in zip(u, v):
            dot = dot + x * y
        nu = 0.0
        for x in u:
            nu = nu + x * x
        nv = 0.0
        for y in v:
            nv = nv + y * y
        return dot / (math.sqrt(nu) * math.sqrt(nv))

    s, n_valid = 0.0, 0
    for qi, (_, qv, _l) in enumerate(vecs):
        sims = sorted(
            (
                (-cos(qv, vv), ni)
                for ni, vv, _x in vecs
                if ni != qi
            )
        )
        r1 = round((1.0 - (-sims[0][0])) * 1e9)
        r2 = round((1.0 - (-sims[1][0])) * 1e9)
        if r1 > 0 and r2 >= r1:
            n_valid += 1
            s += math.log(r2 / r1)
    expected = round((n_valid - 1) / s, 6)
    [r] = QUERIES["embedding_intrinsic_dim"](spark, str(tmp_path)).collect()
    assert r["n_valid"] == n_valid == 4
    assert r["intrinsic_dim"] == expected
    # a circle arc is a 1-D manifold; the estimate must sit near 1
    assert 0.5 < r["intrinsic_dim"] < 2.5


def test_source_js_divergence_identity_and_symmetry(spark, tmp_path):
    # identical distributions -> JSD exactly 0; a disjoint-vocab source
    # diverges from both by the same amount (grid smoothing is symmetric)
    _plant(
        spark, tmp_path, "documents",
        [
            (1, "alpha beta gamma", "A"),
            (2, "alpha beta gamma", "B"),
            (3, "delta epsilon zeta", "C"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["source_a"], r["source_b"]): (r["n_terms"], r["jsd"])
        for r in QUERIES["source_js_divergence"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert out[("A", "B")] == (6, 0.0)
    assert out[("A", "C")] == out[("B", "C")]
    assert out[("A", "C")][1] > 0


def test_embedding_quant_sweep_exact_errors(spark, tmp_path):
    # one vector [1.0, 0.5]: int8 reconstructs 0.5 as 64/127; int2
    # (qmax=1) collapses it to 1.0 -> err 0.5. Expected values replicate
    # the engine's floor(x/s + .5) rounding exactly
    import math

    _plant(
        spark, tmp_path, "embeddings",
        [(1, [1.0, 0.5], 0)],
        "vec_id long, embedding array<double>, label int",
    )

    def err(bits):
        qmax = float(2 ** (bits - 1) - 1)
        s = 1.0 / qmax
        worst = 0.0
        for x in (1.0, 0.5):
            r = math.floor(x / s + 0.5) * s
            worst = max(worst, abs(x - r))
        return round(round(worst * 1e9) / 1e9, 6)

    out = {
        r["bits"]: (r["n_vectors"], r["mean_max_err"], r["worst_err"])
        for r in QUERIES["embedding_quant_sweep"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {8, 4, 2}
    for b in (8, 4, 2):
        assert out[b] == (1, err(b), err(b)), b
    assert out[2][2] == 0.5  # int2 collapses 0.5 -> 1.0
    assert out[8][2] < 0.005


def test_dedup_detector_agreement_composes_pipelines(spark, tmp_path):
    # expected agreement computed from the two operator outputs directly
    base = "the quick brown fox jumps over the lazy dog again and again"
    _plant(
        spark, tmp_path, "documents",
        [
            (1, base),
            (2, base),
            (3, base + " with a small tail change here"),
            (4, "completely unrelated content about shuffle partitions"),
            (5, "another standalone document with unique words only"),
        ],
        "doc_id long, text string",
    )
    from beacon_indexer_spark.operators import dedup as D
    from beacon_indexer_spark.plans.queries import (
        _MINHASH_BANDS, _MINHASH_K, _t,
    )

    docs = _t(spark, str(tmp_path), "documents")
    mh = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_candidates(
            docs, "doc_id", "text", k=_MINHASH_K, bands=_MINHASH_BANDS,
            shingle_n=3,
        ).collect()
    }
    hp = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_hamming_pairs(
            docs, "doc_id", "text", max_dist=3
        ).collect()
    }
    [r] = QUERIES["dedup_detector_agreement"](spark, str(tmp_path)).collect()
    assert r["n_minhash"] == len(mh)
    assert r["n_hamming"] == len(hp)
    assert r["n_both"] == len(mh & hp)
    assert r["agreement_jaccard"] == round(len(mh & hp) / len(mh | hp), 6)
    assert (1, 2) in (mh & hp)  # exact dup caught by both


def test_corpus_bigram_cond_entropy_closed_form(spark, tmp_path):
    # "a b a b a": unigrams a:3 b:2 (T=5); bigrams "a b":2 "b a":2 (T=4)
    import math

    _plant(
        spark, tmp_path, "documents",
        [(1, "a b a b a")], "doc_id long, text string",
    )
    h_uni = math.log(5) - (3 * math.log(3) + 2 * math.log(2)) / 5
    h_big = math.log(4) - (2 * math.log(2) + 2 * math.log(2)) / 4
    [r] = QUERIES["corpus_bigram_cond_entropy"](spark, str(tmp_path)).collect()
    assert (r["n_unigrams"], r["n_bigrams"]) == (2, 2)
    assert r["h_unigram"] == round(h_uni, 6)
    assert r["h_bigram"] == round(h_big, 6)
    assert r["cond_entropy"] == round(h_big - h_uni, 6)


def test_embedding_knn_label_agreement_planted(spark, tmp_path):
    # angular clusters: {0°,5°} labeled 0, {80°,85°} split 1/0 ->
    # label 0 queries agree 2/3 (v3's NN is v2, label 1); label 1 never
    import math

    vecs = [
        (0, 0.0, 0), (1, 5.0, 0), (2, 80.0, 1), (3, 85.0, 0),
    ]
    _plant(
        spark, tmp_path, "embeddings",
        [
            (i, [math.cos(math.radians(a)), math.sin(math.radians(a))], l)
            for i, a, l in vecs
        ],
        "vec_id long, embedding array<double>, label int",
    )
    out = {
        r["label"]: (r["n_queries"], r["n_agree"], r["agree_rate"])
        for r in QUERIES["embedding_knn_label_agreement"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {0: (3, 2, round(2 / 3, 6)), 1: (1, 0, 0.0)}


def test_corpus_minhash_k_sweep_exact_dups_zero_error(spark, tmp_path):
    # exact duplicates: every signature prefix matches AND exact jaccard
    # is 1 -> error exactly 0 at every k; singletons form no pairs
    base = "the quick brown fox jumps over the lazy dog again and again"
    _plant(
        spark, tmp_path, "documents",
        [
            (1, base),
            (2, base),
            (3, "entirely different words live in this document here"),
            (4, "yet another unrelated corpus member with its own text"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["k"]: (r["n_pairs"], r["mean_abs_err"])
        for r in QUERIES["corpus_minhash_k_sweep"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {2, 4, 8}
    for k in (2, 4, 8):
        assert out[k] == (1, 0.0), k


def test_events_session_depth_dist_bands(spark, tmp_path):
    # user 1: sessions of 1, 3, 12 events (gaps > 30 min between);
    # user 2: one session of 5 -> one session per band, share 0.25 each
    from datetime import timedelta

    t0 = datetime(2024, 4, 1, 9, 0)
    rows, eid = [], 0

    def sess(user, start, n):
        nonlocal eid, rows
        for i in range(n):
            rows.append((eid, start + timedelta(minutes=i), user, "view"))
            eid += 1

    sess(1, t0, 1)
    sess(1, t0 + timedelta(hours=2), 3)
    sess(1, t0 + timedelta(hours=5), 12)
    sess(2, t0, 5)
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        r["depth_band"]: (r["n_sessions"], r["share"])
        for r in QUERIES["events_session_depth_dist"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        "1": (1, 0.25), "2-4": (1, 0.25), "5-9": (1, 0.25), "10+": (1, 0.25),
    }


def test_doc_embedding_quality_norm_corr_planted(spark, tmp_path):
    # quality values come from the operator; the correlation math is
    # replicated in python over the same 1e-6 quantization
    import math

    docs = [
        (1, "short", 0.5),
        (2, "a noticeably longer document with several proper words", 1.0),
        (3, "an even longer and fairly reasonable document with many "
            "plain words that lift the length component higher", 1.5),
    ]
    _plant(
        spark, tmp_path, "documents",
        [(i, t) for i, t, _ in docs], "doc_id long, text string",
    )
    _plant(
        spark, tmp_path, "embeddings",
        [(i, [n, 0.0], 0) for i, _, n in docs],
        "vec_id long, embedding array<double>, label int",
    )
    from beacon_indexer_spark.operators import text as X
    from pyspark.sql import functions as F

    qvals = {
        r["doc_id"]: r["q"]
        for r in spark.createDataFrame(
            [(i, t) for i, t, _ in docs], "doc_id long, text string"
        ).select("doc_id", X.quality_score("text").alias("q")).collect()
    }
    xs = [round(qvals[i] * 1e6) for i, _, _ in docs]
    ys = [round(n * 1e6) for _, _, n in docs]
    n = float(len(xs))
    sx, sy = sum(xs) / 1e6, sum(ys) / 1e6
    sxx = sum(x * x for x in xs) / 1e12
    syy = sum(y * y for y in ys) / 1e12
    sxy = sum(x * y for x, y in zip(xs, ys)) / 1e12
    num = n * sxy - sx * sy
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    [r] = QUERIES["doc_embedding_quality_norm_corr"](
        spark, str(tmp_path)
    ).collect()
    assert r["n_docs"] == 3
    assert r["quality_norm_corr"] == round(num / den, 6)

    # degenerate: constant quality -> zero variance -> NULL, not NaN
    _plant(
        spark, tmp_path / "flat", "documents",
        [(1, "same text here"), (2, "same text here")],
        "doc_id long, text string",
    )
    _plant(
        spark, tmp_path / "flat", "embeddings",
        [(1, [1.0, 0.0], 0), (2, [2.0, 0.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    [r2] = QUERIES["doc_embedding_quality_norm_corr"](
        spark, str(tmp_path / "flat")
    ).collect()
    # zero x-variance: exact-math den is 0 (NULL), but the double
    # conversion can leave den as positive dust giving 0/den = 0.0 —
    # both engines compute the IDENTICAL expression, so either way the
    # oracle agrees; assert the degenerate result is null-or-zero, never
    # NaN or a spurious correlation
    assert r2["quality_norm_corr"] in (None, 0.0)


def test_corpus_head_coverage_curve_partial_head(spark, tmp_path):
    # 12 terms with counts 12..1: top-10 covers 75 of 78 occurrences
    words = []
    for i in range(12):
        words += [f"t{i:02d}"] * (12 - i)
    _plant(
        spark, tmp_path, "documents",
        [(1, " ".join(words))], "doc_id long, text string",
    )
    out = {
        r["k"]: (r["n_terms"], r["n_occurrences"], r["coverage"])
        for r in QUERIES["corpus_head_coverage_curve"](
            spark, str(tmp_path)
        ).collect()
    }
    total = sum(range(1, 13))
    top10 = sum(range(3, 13))
    assert out[10] == (10, top10, round(top10 / total, 6))
    assert out[100] == (12, total, 1.0)
    assert out[1000] == (12, total, 1.0)


def test_user_value_deciles_uniform(spark, tmp_path):
    # users 1..10 with LTV d dollars -> decile d boundary = d, cum_users
    # = d, cum share = triangular(d)/55
    rows = [(u, datetime(2024, 1, 1, 8), u, "buy", float(u)) for u in range(1, 11)]
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {
        r["decile"]: (r["boundary_value"], r["cum_users"], r["cum_value_share"])
        for r in QUERIES["user_value_deciles"](spark, str(tmp_path)).collect()
    }
    assert len(out) == 10
    for d in range(1, 11):
        tri = d * (d + 1) / 2
        assert out[d] == (float(d), d, round(tri / 55, 6)), d


def test_events_conversion_by_first_touch_planted(spark, tmp_path):
    rows = [
        (1, datetime(2024, 1, 1, 1), 1, "view"),
        (2, datetime(2024, 1, 1, 2), 1, "purchase"),
        (3, datetime(2024, 1, 2, 1), 2, "view"),
        (4, datetime(2024, 1, 2, 2), 2, "click"),
        (5, datetime(2024, 1, 3, 1), 3, "purchase"),
    ]
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        r["first_type"]: (r["n_users"], r["n_converted"], r["conversion_rate"])
        for r in QUERIES["events_conversion_by_first_touch"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {"view": (2, 1, 0.5), "purchase": (1, 1, 1.0)}


def test_dedup_lsh_bucket_stats_exact_trio(spark, tmp_path):
    # three identical docs share every band bucket -> each of the 4
    # bands reports one colliding bucket of size 3 (= 3 candidate pairs)
    base = "the quick brown fox jumps over the lazy dog again and again"
    _plant(
        spark, tmp_path, "documents",
        [
            (1, base), (2, base), (3, base),
            (4, "entirely different words live in this document here"),
            (5, "yet another unrelated corpus member with its own text"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["band"]: (r["n_colliding_buckets"], r["max_bucket"], r["n_candidate_pairs"])
        for r in QUERIES["dedup_lsh_bucket_stats"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for band, stats in out.items():
        assert stats[1] >= 3 and stats[2] >= 3, (band, stats)
        # the exact-dup trio contributes one size->=3 bucket per band
        assert stats[0] >= 1


def test_embedding_residual_energy_identical_vectors(spark, tmp_path):
    # identical vectors: every centroid equals the vector, residuals are
    # exactly zero, and all mass lands in one list (cid tiebreak)
    _plant(
        spark, tmp_path, "embeddings",
        [(i, [0.6, 0.8], 0) for i in range(10)],
        "vec_id long, embedding array<double>, label int",
    )
    rows = QUERIES["embedding_residual_energy"](spark, str(tmp_path)).collect()
    assert sum(r["n_vectors"] for r in rows) == 10
    for r in rows:
        assert r["residual_energy_share"] == 0.0


def test_embedding_mean_pairwise_cosine_gram_identity(spark, tmp_path):
    # [1,0], [0,1], [1,0]: ordered-pair cosines sum to 2 -> mean 2/6
    _plant(
        spark, tmp_path, "embeddings",
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0), (3, [1.0, 0.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    [r] = QUERIES["embedding_mean_pairwise_cosine"](
        spark, str(tmp_path)
    ).collect()
    assert r["n_vectors"] == 3
    assert r["mean_pairwise_cosine"] == 0.333333


def test_doc_length_lognormal_fit_geometric(spark, tmp_path):
    # token counts 2, 4, 8: mu = 2 ln 2, fitted median = 4 = actual ->
    # ratio exactly 1; sigma = sqrt(2/3) ln 2. Expected values replicate
    # the query's 1e-9 quantization
    import math

    _plant(
        spark, tmp_path, "documents",
        [(1, "w " * 2), (2, "w " * 4), (3, "w " * 8)],
        "doc_id long, text string",
    )
    lis = [round(math.log(t) * 1e9) for t in (2, 4, 8)]
    n = 3.0
    mu = sum(lis) / 1e9 / n
    var = sum(l * l for l in lis) / 1e18 / n - mu * mu
    [r] = QUERIES["doc_length_lognormal_fit"](spark, str(tmp_path)).collect()
    assert r["n_docs"] == 3
    assert r["mu_log"] == round(mu, 6)
    assert r["sigma_log"] == round(math.sqrt(var), 6)
    assert r["actual_median"] == 4
    assert r["fitted_median"] == round(math.exp(mu), 6)
    assert r["median_ratio"] == round(4 / math.exp(mu), 6)


def test_events_value_hour_anova_closed_form(spark, tmp_path):
    # hour 1: values 1,3; hour 2: values 5,7 ->
    # between 16, within 4, F = (16/1)/(4/2) = 8, eta^2 = 0.8
    rows = [
        (1, datetime(2024, 1, 1, 1, 5), 1, "b", 1.0),
        (2, datetime(2024, 1, 1, 1, 25), 1, "b", 3.0),
        (3, datetime(2024, 1, 1, 2, 5), 2, "b", 5.0),
        (4, datetime(2024, 1, 1, 2, 25), 2, "b", 7.0),
    ]
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    [r] = QUERIES["events_value_hour_anova"](spark, str(tmp_path)).collect()
    assert (r["n_events"], r["n_hours"]) == (4, 2)
    assert r["f_stat"] == 8.0
    assert r["eta_sq"] == 0.8

    # degenerate: zero within-variance -> F null, eta exactly 1
    rows2 = [
        (1, datetime(2024, 1, 1, 1, 5), 1, "b", 1.0),
        (2, datetime(2024, 1, 1, 1, 25), 1, "b", 1.0),
        (3, datetime(2024, 1, 1, 2, 5), 2, "b", 3.0),
        (4, datetime(2024, 1, 1, 2, 25), 2, "b", 3.0),
    ]
    _plant(
        spark, tmp_path / "flat", "events", rows2,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    [r2] = QUERIES["events_value_hour_anova"](
        spark, str(tmp_path / "flat")
    ).collect()
    assert r2["f_stat"] is None
    assert r2["eta_sq"] == 1.0


def test_events_periodicity_autocorr_perfect_period(spark, tmp_path):
    # hourly volumes repeat exactly every 24h -> autocorr exactly 1;
    # counts vary within the day so variance is nonzero
    from datetime import timedelta

    t0 = datetime(2024, 2, 1, 0, 0)
    rows, eid = [], 0
    for day in range(3):
        for hour in range(24):
            n = 1 + (hour % 4)  # varying within-day profile
            for i in range(n):
                rows.append((eid, t0 + timedelta(days=day, hours=hour, minutes=i)))
                eid += 1
    _plant(spark, tmp_path, "events", rows, "event_id long, ts timestamp")
    [r] = QUERIES["events_periodicity_autocorr"](spark, str(tmp_path)).collect()
    assert r["n_hour_pairs"] == 48  # 72 hours, 48 have a t+24 partner
    assert r["autocorr_24h"] == 1.0


def test_events_new_vs_returning_split(spark, tmp_path):
    # day1: users 1,2 debut (all new); day2: user 1 returns (2 events),
    # user 3 debuts (1 event) -> new share 1/3
    rows = [
        (1, datetime(2024, 5, 1, 9), 1, "view"),
        (2, datetime(2024, 5, 1, 10), 2, "view"),
        (3, datetime(2024, 5, 2, 9), 1, "view"),
        (4, datetime(2024, 5, 2, 10), 1, "click"),
        (5, datetime(2024, 5, 2, 11), 3, "view"),
    ]
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        r["day"]: (r["n_events"], r["n_new_user_events"], r["new_share"])
        for r in QUERIES["events_new_vs_returning"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "2024-05-01": (2, 2, 1.0),
        "2024-05-02": (3, 1, round(1 / 3, 6)),
    }


def test_orders_basket_value_corr_perfect_linear(spark, tmp_path):
    # total price exactly 10 * line count -> correlation exactly 1
    _plant(
        spark, tmp_path, "lineitem",
        [(1, 1), (2, 1), (2, 2), (3, 1), (3, 2), (3, 3)],
        "l_orderkey long, l_linenumber int",
    )
    _plant(
        spark, tmp_path, "orders",
        [(1, 10.0), (2, 20.0), (3, 30.0)],
        "o_orderkey long, o_totalprice double",
    )
    [r] = QUERIES["orders_basket_value_corr"](spark, str(tmp_path)).collect()
    assert r["n_orders"] == 3
    assert r["lines_value_corr"] == 1.0


def test_doc_lang_length_chisq_independence_and_bias(spark, tmp_path):
    # perfectly balanced table -> chi-sq exactly 0; skewed -> positive
    short, long_ = "w " * 5, "w " * 100
    _plant(
        spark, tmp_path, "documents",
        [
            (1, short, "en"), (2, long_, "en"),
            (3, short, "de"), (4, long_, "de"),
        ],
        "doc_id long, text string, lang string",
    )
    [r] = QUERIES["doc_lang_length_chisq"](spark, str(tmp_path)).collect()
    assert (r["n_docs"], r["n_cells"], r["chi_sq"]) == (4, 4, 0.0)

    # en only short, de only long -> maximal dependence: chi-sq = N = 4
    _plant(
        spark, tmp_path / "skew", "documents",
        [
            (1, short, "en"), (2, short, "en"),
            (3, long_, "de"), (4, long_, "de"),
        ],
        "doc_id long, text string, lang string",
    )
    [r2] = QUERIES["doc_lang_length_chisq"](
        spark, str(tmp_path / "skew")
    ).collect()
    assert r2["chi_sq"] == 4.0


def test_events_repeat_purchase_curve_survival(spark, tmp_path):
    # purchase counts: u1 -> 1, u2 -> 3, u3 -> 5:
    # k=1: 3/3, k=2: 2/3, k=3: 2/3, k=4: 1/3, k=5: 1/3
    rows, eid = [], 0
    for u, n in ((1, 1), (2, 3), (3, 5)):
        for i in range(n):
            rows.append((eid, datetime(2024, 1, 1 + i, 9), u, "purchase"))
            eid += 1
    rows.append((eid, datetime(2024, 1, 1, 9), 4, "view"))  # never purchases
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        r["k"]: (r["n_users"], r["share_of_purchasers"])
        for r in QUERIES["events_repeat_purchase_curve"](
            spark, str(tmp_path)
        ).collect()
    }
    third = round(1 / 3, 6)
    assert out == {
        1: (3, 1.0), 2: (2, round(2 / 3, 6)), 3: (2, round(2 / 3, 6)),
        4: (1, third), 5: (1, third),
    }


def test_source_signature_terms_lift_ranking(spark, tmp_path):
    # 'blockchain' dominates source A and is rare in B -> A's top term;
    # the shared filler word has lift ~0 and must not outrank it
    filler = " ".join(["the"] * 10)
    _plant(
        spark, tmp_path, "documents",
        [
            (1, ("blockchain " * 8) + filler, "A"),
            (2, ("recipes " * 8) + filler, "B"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["source"], r["rank"]): (r["term"], r["n_occurrences"])
        for r in QUERIES["source_signature_terms"](spark, str(tmp_path)).collect()
    }
    assert out[("A", 1)] == ("blockchain", 8)
    assert out[("B", 1)] == ("recipes", 8)


def test_embedding_knn_confusion_matrix(spark, tmp_path):
    # angular clusters {0°,5°} label 0, {80°} label 1, {85°} label 0:
    # row 0: (0,0)x2 + (0,1)x1; row 1: (1,0)x1
    import math

    vecs = [(0, 0.0, 0), (1, 5.0, 0), (2, 80.0, 1), (3, 85.0, 0)]
    _plant(
        spark, tmp_path, "embeddings",
        [
            (i, [math.cos(math.radians(a)), math.sin(math.radians(a))], l)
            for i, a, l in vecs
        ],
        "vec_id long, embedding array<double>, label int",
    )
    out = {
        (r["query_label"], r["nn_label"]): (r["n_pairs"], r["row_share"])
        for r in QUERIES["embedding_knn_confusion"](spark, str(tmp_path)).collect()
    }
    assert out == {
        (0, 0): (2, round(2 / 3, 6)),
        (0, 1): (1, round(1 / 3, 6)),
        (1, 0): (1, 1.0),
    }


def test_supplier_latency_outliers_flags_slow_vendor(spark, tmp_path):
    # 20 one-day shipments spread over suppliers 1-4, supplier 9 ships
    # in 30 days -> global p90 = 1, only supplier 9 exceeds it by > 2
    li, oid = [], 0
    orders = []
    for i in range(20):
        li.append((oid, 1 + (i % 4), datetime(2024, 1, 2, 12)))
        orders.append((oid, datetime(2024, 1, 1, 12)))
        oid += 1
    for _ in range(2):
        li.append((oid, 9, datetime(2024, 1, 31, 12)))
        orders.append((oid, datetime(2024, 1, 1, 12)))
        oid += 1
    _plant(
        spark, tmp_path, "lineitem", li,
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    _plant(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_orderdate timestamp",
    )
    _plant(
        spark, tmp_path, "supplier",
        [(k, f"S{k}") for k in (1, 2, 3, 4, 9)],
        "s_suppkey long, s_name string",
    )
    rows = QUERIES["supplier_latency_outliers"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r["suppkey"], r["s_name"], r["n_items"]) == (9, "S9", 2)
    assert (r["p90_days"], r["global_p90_days"]) == (30, 1)


def test_corpus_split_half_jsd_identical_halves(spark, tmp_path):
    # even/odd halves carry identical text -> JSD exactly 0
    _plant(
        spark, tmp_path, "documents",
        [
            (0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
            (2, "epsilon zeta eta theta"), (3, "epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    [r] = QUERIES["corpus_split_half_jsd"](spark, str(tmp_path)).collect()
    assert r["n_terms"] == 8
    assert r["split_half_jsd"] == 0.0


def test_events_weekend_lift_planted(spark, tmp_path):
    # Sat 2024-06-01: 6 events in 2 hours (3/hr); Mon 2024-06-03: 4
    # events in 4 hours (1/hr) -> lift 3.0
    rows, eid = [], 0
    for h, n in ((9, 3), (10, 3)):
        for i in range(n):
            rows.append((eid, datetime(2024, 6, 1, h, i), 1, "view"))
            eid += 1
    for h in (9, 10, 11, 12):
        rows.append((eid, datetime(2024, 6, 3, h, 0), 2, "view"))
        eid += 1
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    [r] = QUERIES["events_weekend_lift"](spark, str(tmp_path)).collect()
    assert (r["n_weekend_events"], r["n_weekday_events"]) == (6, 4)
    assert (r["weekend_per_hour"], r["weekday_per_hour"]) == (3.0, 1.0)
    assert r["weekend_lift"] == 3.0


def test_doc_token_length_profile_shares(spark, tmp_path):
    _plant(
        spark, tmp_path, "documents",
        [(1, "a bb bb ccc")], "doc_id long, text string",
    )
    out = {
        r["token_len"]: (r["n_occurrences"], r["share"])
        for r in QUERIES["doc_token_length_profile"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {1: (1, 0.25), 2: (2, 0.5), 3: (1, 0.25)}


def test_part_type_price_premium_planted(spark, tmp_path):
    # PROMO mean 30, STANDARD mean 10, corpus mean 20 -> +50% / -50%
    _plant(
        spark, tmp_path, "part",
        [(1, "PROMO", 30.0), (2, "STANDARD", 10.0)],
        "p_partkey long, p_type string, p_retailprice double",
    )
    out = {
        r["p_type"]: (r["n_parts"], r["avg_price"], r["premium_pct"])
        for r in QUERIES["part_type_price_premium"](spark, str(tmp_path)).collect()
    }
    assert out == {"PROMO": (1, 30.0, 50.0), "STANDARD": (1, 10.0, -50.0)}
