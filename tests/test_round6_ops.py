"""Planted-scenario tests for the round-6 wave-5 operators: cross-source
duplicate leakage matrix, length-curriculum phases, centroid similarity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from beacon_indexer_spark.operators import dedup as D
from beacon_indexer_spark.operators import similarity as S
from beacon_indexer_spark.operators import text as X


def test_pair_attribute_matrix_counts(spark):
    # docs 1,2 in web; 3,4 in books. Pairs: (1,2) within web,
    # (1,3) web-books, (2,3) web-books -> two cells.
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "id_a long, id_b long"
    )
    attrs = spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, "books"), (4, "books")],
        "doc_id long, source string",
    )
    out = {
        (r["attr_a"], r["attr_b"]): (r["n_pairs"], r["n_docs"])
        for r in D.pair_attribute_matrix(pairs, attrs).collect()
    }
    assert out == {
        ("web", "web"): (1, 2),         # pair (1,2); docs {1,2}
        ("books", "web"): (2, 3),       # pairs (1,3),(2,3); docs {1,2,3}
    }


def test_pair_attribute_matrix_orders_attrs(spark):
    # attr ordering is normalized (least, greatest) regardless of which
    # side of the pair carries which source
    pairs = spark.createDataFrame([(9, 5)], "id_a long, id_b long")
    attrs = spark.createDataFrame(
        [(9, "a_src"), (5, "z_src")], "doc_id long, source string"
    )
    [r] = D.pair_attribute_matrix(pairs, attrs).collect()
    assert (r["attr_a"], r["attr_b"]) == ("a_src", "z_src")


def test_curriculum_phases_orders_by_length(spark):
    docs = spark.createDataFrame(
        [(i, "w " * i, "s") for i in range(1, 9)],
        "doc_id long, text string, source string",
    )
    rows = {
        r["id"]: (r["n_tokens"], r["phase"])
        for r in X.curriculum_phases(docs, n_phases=4).collect()
    }
    # 8 docs, 4 phases -> 2 per phase, shortest first
    assert rows == {
        1: (1, 1), 2: (2, 1), 3: (3, 2), 4: (4, 2),
        5: (5, 3), 6: (6, 3), 7: (7, 4), 8: (8, 4),
    }


def test_curriculum_phases_stratified_by_group(spark):
    # each source gets its own ranking: a long doc in a short-doc source
    # still lands in that source's top phase
    docs = spark.createDataFrame(
        [(1, "w", "a"), (2, "w w", "a"), (3, "w " * 50, "b"), (4, "w " * 60, "b")],
        "doc_id long, text string, source string",
    )
    rows = {
        r["id"]: r["phase"]
        for r in X.curriculum_phases(docs, n_phases=2).collect()
    }
    assert rows == {1: 1, 2: 2, 3: 1, 4: 2}


def test_curriculum_phase_deterministic_tiebreak(spark):
    # equal token counts -> phase decided by doc_id, stable across runs
    docs = spark.createDataFrame(
        [(i, "x y z", "s") for i in (7, 3, 5, 1)],
        "doc_id long, text string, source string",
    )
    rows = {
        r["id"]: r["phase"]
        for r in X.curriculum_phases(docs, n_phases=4).collect()
    }
    assert rows == {1: 1, 3: 2, 5: 3, 7: 4}


def test_centroid_similarity_exact(spark):
    # label 0 centroid = (1,0); label 1 centroid = (0,1); label 2 = (1,1)/sqrt2
    rows = [
        (0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 1),
        (3, [1.0, 1.0], 2),
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {
        (r["label_a"], r["label_b"]): r["cos_sim"]
        for r in S.centroid_similarity(vecs).collect()
    }
    assert out[(0, 1)] == 0.0
    assert math.isclose(out[(0, 2)], round(1 / math.sqrt(2), 6), abs_tol=1e-6)
    assert math.isclose(out[(1, 2)], round(1 / math.sqrt(2), 6), abs_tol=1e-6)
    assert len(out) == 3


def test_leakage_safe_split_cluster_atomic(spark):
    # docs 1..4; cluster {1,2} -> both get the SAME split (hash of cluster
    # id 1); singletons hash their own id
    docs = spark.createDataFrame([(i,) for i in range(1, 5)], "doc_id long")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long"
    )
    from beacon_indexer_spark.operators import sampling as SP

    rows = {r["doc_id"]: r for r in SP.leakage_safe_split(docs, clusters).collect()}
    assert rows[1]["split"] == rows[2]["split"]
    assert rows[1]["cluster_id"] == rows[2]["cluster_id"] == 1
    # singleton verdicts agree with naive by construction
    for i in (3, 4):
        assert rows[i]["split"] == rows[i]["naive_split"]
        assert rows[i]["moved"] == 0
    # doc 1 is the cluster min -> cluster hash == its own hash
    assert rows[1]["moved"] == 0


def test_char_entropy_values(spark):
    import math as m

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], "doc_id long, text string"
    )
    rows = {r["id"]: r for r in X.char_entropy(docs).collect()}
    assert rows[1]["entropy"] == 0.0 and rows[1]["n_chars"] == 4
    assert m.isclose(rows[2]["entropy"], round(m.log(2), 6), abs_tol=1e-6)
    assert m.isclose(rows[3]["entropy"], round(m.log(4), 6), abs_tol=1e-6)


def test_code_likeness_separates_code_from_prose(spark):
    code = "def f(x):\n    if x > 0:\n        return x + 1\n    else:\n        return {}"
    prose = "the quiet afternoon settled over the harbor as boats drifted home"
    docs = spark.createDataFrame(
        [(1, code), (2, prose)], "doc_id long, text string"
    )
    rows = {r["id"]: r for r in X.code_likeness(docs).collect()}
    assert rows[1]["is_code"] == 1 and rows[1]["kw_hits"] >= 3
    assert rows[2]["is_code"] == 0 and rows[2]["kw_hits"] == 0
    assert rows[2]["symbol_ratio"] == 0.0


def test_code_likeness_empty_text(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    [r] = X.code_likeness(docs).collect()
    assert (r["symbol_ratio"], r["is_code"]) == (0.0, 0)


def test_standardize_dims_exact(spark):
    # dim0 values {1, 3}: mean 2, std_pop 1 -> z = {-1, +1};
    # dim1 constant -> sd = 0 -> z = 0
    vecs = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [3.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {(r["id"], r["pos"]): r["z"] for r in S.standardize_dims(vecs, k=2).collect()}
    assert rows[(0, 0)] == -1.0 and rows[(1, 0)] == 1.0
    assert rows[(0, 1)] == 0.0 and rows[(1, 1)] == 0.0


def test_standardize_dims_prunes_to_k(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    out = S.standardize_dims(vecs, k=2).collect()
    assert sorted(r["pos"] for r in out) == [0, 1]


def test_lexical_diversity_flags_template(spark):
    docs = spark.createDataFrame(
        [(1, "buy now " * 50), (2, "each word here is fully distinct")],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in X.lexical_diversity(docs).collect()}
    assert rows[1]["n_types"] == 2 and rows[1]["ttr"] == 0.02
    assert rows[2]["ttr"] == 1.0


def test_heaps_curve_first_bucket_only(spark):
    # bucket 0: docs 0-1 (terms a b c); bucket 1: docs 2-3 (terms b c d)
    # -> cum_vocab 3 then 4; cum_tokens 4 then 8
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "b c"), (2, "b c"), (3, "c d")],
        "doc_id long, text string",
    )
    rows = {
        r["bucket"]: (r["cum_tokens"], r["cum_vocab"])
        for r in X.heaps_law_curve(docs, bucket_docs=2).collect()
    }
    assert rows == {0: (4, 3), 1: (8, 4)}


def test_dim_covariance_topk_finds_coupled_dims(spark):
    # dims 0 and 1 move together (cov 1), dim 2 is constant (cov 0 with all)
    vecs = spark.createDataFrame(
        [(0, [1.0, 1.0, 5.0]), (1, [3.0, 3.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    out = S.dim_covariance_topk(vecs, k=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["pos_i"], r["pos_j"], r["cov"]) == (0, 1, 1.0)


def test_cooccurrence_lift_exact(spark):
    from beacon_indexer_spark.operators import relational as R

    # 4 users: u1 {a,b}, u2 {a,b}, u3 {a}, u4 {c}
    # P(a)=3/4, P(b)=2/4, P(ab)=2/4 -> lift(ab) = (2*4)/(3*2) = 4/3
    rows = [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c"),
        (1, "a"),  # duplicate event must not change set semantics
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        (r["item_a"], r["item_b"]): (r["n_groups_both"], r["lift"])
        for r in R.cooccurrence_lift(df, "user_id", "event_type").collect()
    }
    assert out == {("a", "b"): (2, round(4 / 3, 6))}


def test_lsh_precision_bands_exact_dup_in_band_1(spark):
    # identical docs -> jaccard 1.0 -> floor(10*j)/10 = 1.0 band (its own
    # band, not merged into 0.9) — the exact-dup mass is visible separately
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta", "s", "en", 36) for i in range(4)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["jaccard_band"]: r for r in QUERIES["doc_lsh_precision_audit"](spark, d).collect()}
    assert list(out) == [1.0]
    assert out[1.0]["n_pairs"] == 6 and out[1.0]["mean_jaccard"] == 1.0


def test_langid_margin_flags_code_switch(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os

    # doc 1: pure English markers; doc 2: half English / half Spanish
    docs = spark.createDataFrame(
        [
            (1, "the and of the with that this from the and", "s", "en", 40),
            (2, "the and of with los las que por una del", "s", "en", 40),
            (3, "zzz qqq xxx", "s", "en", 11),  # no markers -> und, purity 0
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        rows = {r["doc_id"]: r for r in QUERIES["doc_langid_margin"](spark, d).collect()}
    assert rows[1]["is_mixed"] == 0 and rows[1]["purity"] == 1.0
    assert rows[2]["is_mixed"] == 1 and rows[2]["purity"] < 1.0
    assert rows[3]["pred_lang"] == "und" and rows[3]["purity"] == 0.0


def test_dau_wau_trailing_window(spark):
    from pyspark.sql import functions as F
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os, datetime

    # user 1 active day 1 and day 5; user 2 active day 5.
    # day5: dau=2; wau (day -6..day5) = {1,2} = 2 -> stickiness 1.0
    # day1: dau=1, wau={1} -> 1.0
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "a", 1.0, "{}"),
        (2, base + datetime.timedelta(days=4), 1, "a", 1.0, "{}"),
        (3, base + datetime.timedelta(days=4), 2, "a", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["day"]: r for r in QUERIES["events_dau_wau"](spark, d).collect()}
    assert out["2024-01-01"]["dau"] == 1 and out["2024-01-01"]["wau"] == 1
    assert out["2024-01-05"]["dau"] == 2 and out["2024-01-05"]["wau"] == 2
    assert out["2024-01-05"]["stickiness"] == 1.0


def test_cohort_ltv_triangle(spark):
    from pyspark.sql import functions as F
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os, datetime

    # cust 1 first-orders in Jan, orders again in Mar (age 2);
    # cust 2 first-orders in Mar (its own cohort, age 0)
    rows = [
        (1, 1, datetime.datetime(2024, 1, 5), 100.0),
        (2, 1, datetime.datetime(2024, 3, 9), 50.0),
        (3, 2, datetime.datetime(2024, 3, 1), 70.0),
    ]
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    with tempfile.TemporaryDirectory() as d:
        o.write.parquet(os.path.join(d, "orders.parquet"))
        out = {
            (r["cohort"], r["age_months"]): (r["n_orders"], float(r["revenue"]), float(r["cum_revenue"]))
            for r in QUERIES["orders_cohort_ltv"](spark, d).collect()
        }
    assert out[("2024-01", 0)] == (1, 100.0, 100.0)
    assert out[("2024-01", 2)] == (1, 50.0, 150.0)   # cumulative
    assert out[("2024-03", 0)] == (1, 70.0, 70.0)


def test_aqp_estimate_scales_sample(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os, datetime

    # 1000 events of one type: the 5% hash sample estimate must land
    # within a loose band of the exact count and be internally consistent
    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, base, i % 7, "click", 1.0, "{}") for i in range(1000)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        [r] = QUERIES["events_aqp_estimate"](spark, d).collect()
    assert r["exact_count"] == 1000
    assert r["est_count"] % 20 == 0            # scaled by 1/rate
    assert abs(r["est_count"] - 1000) <= 400   # loose CI for n=1000, p=.05
    assert abs(r["rel_err"] - abs(r["est_count"] - 1000) / 1000) < 1e-9


def test_hhi_monopoly_is_one(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os

    li = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 50.0), (3, 20, 30.0), (4, 21, 30.0)],
        "l_orderkey long, l_suppkey long, l_extendedprice double",
    )
    sup = spark.createDataFrame(
        [(10, 0), (20, 1), (21, 1)], "s_suppkey long, s_nationkey long"
    )
    nat = spark.createDataFrame(
        [(0, "MONO"), (1, "DUO")], "n_nationkey long, n_name string"
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        sup.write.parquet(os.path.join(d, "supplier.parquet"))
        nat.write.parquet(os.path.join(d, "nation.parquet"))
        out = {r["nation"]: r for r in QUERIES["supplier_concentration_hhi"](spark, d).collect()}
    assert out["MONO"]["hhi"] == 1.0 and out["MONO"]["n_suppliers"] == 1
    assert out["DUO"]["hhi"] == 0.5 and out["DUO"]["n_suppliers"] == 2


def test_source_overlap_jaccard_exact(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os

    # web vocab {a,b,c}; books vocab {b,c,d}: common 2, union 4 -> 0.5
    docs = spark.createDataFrame(
        [(1, "a b c", "web", "en", 5), (2, "b c d", "books", "en", 5)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        [r] = QUERIES["corpus_source_overlap"](spark, d).collect()
    assert (r["source_a"], r["source_b"]) == ("books", "web")
    assert r["n_common_terms"] == 2 and r["vocab_jaccard"] == 0.5


def test_benford_digit_extraction(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os, datetime

    base = datetime.datetime(2024, 1, 1)
    # values 1.00, 12.34, 190.0 -> cents 100, 1234, 19000 -> digit 1 x3;
    # 0.5 -> cents 50 -> digit 5; zero/negative excluded
    rows = [
        (1, base, 1, "a", 1.00, "{}"),
        (2, base, 1, "a", 12.34, "{}"),
        (3, base, 1, "a", 190.0, "{}"),
        (4, base, 1, "a", 0.50, "{}"),
        (5, base, 1, "a", 0.0, "{}"),
        (6, base, 1, "a", -3.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["first_digit"]: r for r in QUERIES["events_value_benford"](spark, d).collect()}
    assert out[1]["n"] == 3 and out[1]["share"] == 0.75
    assert out[5]["n"] == 1 and out[5]["share"] == 0.25
    assert set(out) == {1, 5}


def test_markov_transitions_rows_normalize(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os, datetime

    b = datetime.datetime(2024, 1, 1)
    dt = datetime.timedelta
    # user 1: a -> b -> a -> c ; user 2: b -> a
    rows = [
        (1, b, 1, "a", 1.0, "{}"), (2, b + dt(minutes=1), 1, "b", 1.0, "{}"),
        (3, b + dt(minutes=2), 1, "a", 1.0, "{}"), (4, b + dt(minutes=3), 1, "c", 1.0, "{}"),
        (5, b, 2, "b", 1.0, "{}"), (6, b + dt(minutes=1), 2, "a", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            (r["prev_type"], r["next_type"]): (r["n"], r["prob"])
            for r in QUERIES["events_markov_transitions"](spark, d).collect()
        }
    # from 'a': -> b once, -> c once (prob 0.5 each); from 'b': -> a twice (1.0)
    assert out[("a", "b")] == (1, 0.5) and out[("a", "c")] == (1, 0.5)
    assert out[("b", "a")] == (2, 1.0)


def test_len_quality_corr_sign(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os

    # longer docs score higher under the length component -> corr > 0
    docs = spark.createDataFrame(
        [(i, "word " * (10 * (i + 1)), "s", "en", 50) for i in range(10)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        [r] = QUERIES["doc_len_quality_corr"](spark, d).collect()
    assert r["n_docs"] == 10 and r["len_quality_corr"] > 0.5


def test_gini_extremes(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os, datetime

    b = datetime.datetime(2024, 1, 1)

    def _write(rows, d):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).write.parquet(os.path.join(d, "events.parquet"))

    # perfectly equal: 4 users x 5 events -> gini 0
    with tempfile.TemporaryDirectory() as d:
        _write([(i, b, i % 4, "a", 1.0, "{}") for i in range(20)], d)
        [r] = QUERIES["events_user_gini"](spark, d).collect()
    assert r["n_users"] == 4 and r["gini"] == 0.0

    # concentrated: user 0 has 97 events, three users have 1 each
    with tempfile.TemporaryDirectory() as d:
        rows = [(i, b, 0, "a", 1.0, "{}") for i in range(97)]
        rows += [(100 + u, b, u, "a", 1.0, "{}") for u in (1, 2, 3)]
        _write(rows, d)
        [r] = QUERIES["events_user_gini"](spark, d).collect()
    assert r["gini"] > 0.7


def test_price_regression_exact_line(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os

    # y = 2x + 3 exactly -> slope 2, intercept 3
    p = spark.createDataFrame(
        [(i, f"part{i}", "B1", "t", i, 2.0 * i + 3.0) for i in range(1, 6)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    with tempfile.TemporaryDirectory() as d:
        p.write.parquet(os.path.join(d, "part.parquet"))
        [r] = QUERIES["part_price_regression"](spark, d).collect()
    assert (r["slope"], r["intercept"], r["n_parts"]) == (2.0, 3.0, 5)


def test_daily_volume_anomaly_flags_spike(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    import tempfile, os, datetime

    b = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 9 calm days of 10 events, one day of 100
    for day in range(9):
        for _ in range(10):
            rows.append((eid, b + datetime.timedelta(days=day), 1, "a", 1.0, "{}")); eid += 1
    for _ in range(100):
        rows.append((eid, b + datetime.timedelta(days=9), 1, "a", 1.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["day"]: r for r in QUERIES["events_daily_volume_anomaly"](spark, d).collect()}
    # MAD of [10x9, 100] is 0 -> robust_z null, no flags (degenerate calm corpus)
    # spike detection needs spread; use the abs_dev channel instead
    assert out["2024-01-10"]["abs_dev"] == 90 and out["2024-01-01"]["abs_dev"] == 0
    assert out["2024-01-10"]["median"] == 10


def test_keep_policy_bias_detects_short_kept(spark):
    from beacon_indexer_spark.plans.queries import QUERIES
    from beacon_indexer_spark.operators import dedup as DD
    import tempfile, os

    # cluster {1,2}: doc 1 (kept, min id) is SHORTER than doc 2
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base, "s", "en", 1), (2, base + " extra", "s", "en", 1),
         (3, "totally different unique content right here", "s", "en", 1)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        [r] = QUERIES["doc_keep_policy_bias"](spark, d).collect()
    assert r["n_clusters"] == 1
    assert r["avg_tokens_dropped"] > r["avg_tokens_kept"]
    assert r["frac_dropped_longer"] == 1.0
