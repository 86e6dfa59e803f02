"""Planted-scenario tests for round-8 additions, starting with the
ADVICE-r7 closures: the funnel-lag empty-input shape and the oracle
gate's negative-zero-safe row sort key."""

from __future__ import annotations

from datetime import datetime

from beacon_indexer_spark.plans.queries import QUERIES


def _plant(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_events_funnel_conversion_lag_zero_conversions(spark, tmp_path):
    """A corpus with views but zero view->purchase conversions must return
    ZERO rows (matching the oracle's GROUP BY tot.n shape), not one
    all-NULL global-agg row (ADVICE r7)."""
    t0 = datetime(2024, 6, 1, 10, 0)
    rows = [
        (1, t0, 1, "view"),
        (2, t0, 2, "view"),
        (3, t0, 3, "click"),
    ]
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = QUERIES["events_funnel_conversion_lag"](spark, str(tmp_path))
    assert out.count() == 0


def test_part_bracket_revenue_disjunctive_predicates(spark, tmp_path):
    """Q19-shape brackets: each (brand, size, quantity) conjunct must be
    honored, a row matching no bracket is dropped, and revenue is the
    discounted DECIMAL-exact sum."""
    _plant(
        spark, tmp_path, "part",
        [
            (1, "Brand#12", 5),    # small bracket (size 1..10)
            (2, "Brand#12", 40),   # size out of range -> no bracket
            (3, "Brand#23", 15),   # medium bracket
            (4, "Brand#15", 25),   # large bracket
            (5, "Brand#99", 5),    # brand matches nothing
        ],
        "p_partkey long, p_brand string, p_size int",
    )
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1, 5.0, 100.0, 0.10),   # small: qty 1..11 -> 90.00
            (1, 12.0, 100.0, 0.10),  # qty out of small range -> dropped
            (2, 5.0, 100.0, 0.0),    # part size off-bracket -> dropped
            (3, 15.0, 200.0, 0.50),  # medium -> 100.00
            (4, 25.0, 300.0, 0.0),   # large -> 300.00
            (4, 5.0, 300.0, 0.0),    # qty below large range -> dropped
            (5, 5.0, 100.0, 0.0),    # unknown brand -> dropped
        ],
        "l_partkey long, l_quantity double, l_extendedprice double,"
        " l_discount double",
    )
    out = {
        r["bracket"]: (r["n_items"], r["revenue"])
        for r in QUERIES["part_bracket_revenue"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "small": (1, 90.0),
        "medium": (1, 100.0),
        "large": (1, 300.0),
    }


def test_customer_sales_opportunity_mean_and_anti_join(spark, tmp_path):
    """Q22 shape: mean positive balance = (100+300)/2 = 200; customers
    above it AND without orders survive; negative balances never enter
    the mean; a customer with orders is anti-joined away."""
    _plant(
        spark, tmp_path, "customer",
        [
            (1, "BUILDING", 100.0),   # below mean
            (2, "BUILDING", 300.0),   # above mean, has an order -> dropped
            (3, "MACHINERY", 250.0),  # above mean, no orders -> kept
            (4, "MACHINERY", -50.0),  # negative: excluded from mean, below it
        ],
        "c_custkey long, c_mktsegment string, c_acctbal double",
    )
    _plant(
        spark, tmp_path, "orders",
        [(10, 2)],
        "o_orderkey long, o_custkey long",
    )
    rows = QUERIES["customer_sales_opportunity"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r["c_mktsegment"], r["n_customers"], r["total_acctbal"]) == (
        "MACHINERY", 1, 250.0
    )


def test_orders_with_returns_by_priority_semi_join(spark, tmp_path):
    """Q4 shape: an order counts ONCE however many returned lines it has;
    priorities with zero returns still appear with rate 0."""
    _plant(
        spark, tmp_path, "orders",
        [(1, "1-URGENT"), (2, "1-URGENT"), (3, "5-LOW"), (4, "5-LOW")],
        "o_orderkey long, o_orderpriority string",
    )
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1, "R"), (1, "R"),  # two returned lines, one order
            (2, "N"),
            (3, "A"), (4, "A"),
        ],
        "l_orderkey long, l_returnflag string",
    )
    out = {
        r["o_orderpriority"]: (
            r["n_orders"], r["n_with_returns"], r["return_rate_pct"]
        )
        for r in QUERIES["orders_with_returns_by_priority"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        "1-URGENT": (2, 1, 50.0),
        "5-LOW": (2, 0, 0.0),
    }


def test_nation_trade_flow_directions_and_filters(spark, tmp_path):
    """Q7 shape: both shipping directions appear as separate rows,
    same-nation trade is excluded, and ship years outside 1995-1996
    are pruned."""
    _plant(spark, tmp_path, "nation",
           [(1, "NATION_1"), (2, "NATION_2"), (3, "NATION_3")],
           "n_nationkey int, n_name string")
    _plant(spark, tmp_path, "supplier",
           [(10, 1), (20, 2), (30, 3)],
           "s_suppkey long, s_nationkey int")
    _plant(spark, tmp_path, "customer",
           [(100, 1), (200, 2)],
           "c_custkey long, c_nationkey int")
    _plant(spark, tmp_path, "orders",
           [(1000, 100), (2000, 200)],
           "o_orderkey long, o_custkey long")
    _plant(
        spark, tmp_path, "lineitem",
        [
            # supp N1 -> cust N2: 100 * (1-0) = 100
            (2000, 10, datetime(1995, 3, 1), 100.0, 0.0),
            # supp N2 -> cust N1: 200 * (1-0.5) = 100
            (1000, 20, datetime(1996, 3, 1), 200.0, 0.5),
            # same nation (N1 -> N1): excluded
            (1000, 10, datetime(1995, 3, 1), 999.0, 0.0),
            # year out of range: excluded
            (2000, 10, datetime(1994, 3, 1), 999.0, 0.0),
            # supplier nation outside the pair: excluded
            (2000, 30, datetime(1995, 3, 1), 999.0, 0.0),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp,"
        " l_extendedprice double, l_discount double",
    )
    out = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]):
            (r["n_items"], r["revenue"])
        for r in QUERIES["nation_trade_flow"](spark, str(tmp_path)).collect()
    }
    assert out == {
        ("NATION_1", "NATION_2", 1995): (1, 100.0),
        ("NATION_2", "NATION_1", 1996): (1, 100.0),
    }


def test_nation_market_share_numerator_denominator(spark, tmp_path):
    """Q8 shape: denominator is ALL supplier revenue into EUROPE
    customers; numerator only NATION_3 suppliers; non-EUROPE customers
    never enter either."""
    _plant(spark, tmp_path, "region",
           [(1, "EUROPE"), (2, "ASIA")],
           "r_regionkey int, r_name string")
    _plant(spark, tmp_path, "nation",
           [(1, "NATION_1", 1), (3, "NATION_3", 1), (5, "NATION_5", 2)],
           "n_nationkey int, n_name string, n_regionkey int")
    _plant(spark, tmp_path, "supplier",
           [(10, 3), (20, 1)],
           "s_suppkey long, s_nationkey int")
    _plant(spark, tmp_path, "customer",
           [(100, 1), (200, 5)],  # 100 in EUROPE, 200 in ASIA
           "c_custkey long, c_nationkey int")
    _plant(spark, tmp_path, "orders",
           [(1000, 100, datetime(1995, 6, 1)),
            (2000, 200, datetime(1995, 6, 1))],
           "o_orderkey long, o_custkey long, o_orderdate timestamp")
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1000, 10, 60.0, 0.0),   # NATION_3 supp -> EUROPE cust
            (1000, 20, 40.0, 0.0),   # NATION_1 supp -> EUROPE cust
            (2000, 10, 999.0, 0.0),  # ASIA customer: excluded entirely
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double,"
        " l_discount double",
    )
    [r] = QUERIES["nation_market_share"](spark, str(tmp_path)).collect()
    assert (r["o_year"], r["nation_revenue"], r["market_revenue"],
            r["mkt_share_pct"]) == (1995, 60.0, 100.0, 60.0)


def test_part_basket_pairs_dedup_and_lift(spark, tmp_path):
    """Basket pairs: duplicate lines of the same part in one order count
    ONCE; lift = n_pair * n_orders / (m_a * m_b)."""
    _plant(
        spark, tmp_path, "lineitem",
        [
            # order 1: parts {1, 2} (part 1 twice -> dedup)
            (1, 1), (1, 1), (1, 2),
            # order 2: parts {1, 2, 3}
            (2, 1), (2, 2), (2, 3),
            # order 3: part {3} alone -> no pair
            (3, 3),
        ],
        "l_orderkey long, l_partkey long",
    )
    rows = QUERIES["part_basket_pairs"](spark, str(tmp_path)).collect()
    out = {(r["part_a"], r["part_b"]): (r["n_pair"], r["lift"]) for r in rows}
    # marginals: m1=2, m2=2, m3=2; n_orders=3
    # (1,2): n=2 -> lift 2*3/(2*2)=1.5 ; (1,3) and (2,3): n=1 -> 0.75
    assert out == {
        (1, 2): (2, 1.5),
        (1, 3): (1, 0.75),
        (2, 3): (1, 0.75),
    }
    # deterministic ordering: support desc, then (part_a, part_b)
    assert [(r["part_a"], r["part_b"]) for r in rows] == [
        (1, 2), (1, 3), (2, 3)
    ]


def test_events_hill_tail_index_closed_form(spark, tmp_path):
    """Hill alpha on planted e^k purchase values: with values
    {e^3, e^2, e^1, e^0} the threshold is e^0 = 1 and the log-ratio sum
    is 3 + 2 + 1 = 6, so alpha = 3/6 = 0.5 exactly."""
    import math

    t0 = datetime(2024, 6, 1)
    rows = [
        (1, t0, 1, "purchase", math.exp(3)),
        (2, t0, 1, "purchase", math.exp(2)),
        (3, t0, 1, "purchase", math.exp(1)),
        (4, t0, 1, "purchase", 1.0),
        (5, t0, 1, "view", 999.0),        # wrong type: excluded
        (6, t0, 1, "purchase", 0.0),      # non-positive: excluded
    ]
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    [r] = QUERIES["events_hill_tail_index"](spark, str(tmp_path)).collect()
    assert (r["n_tail"], r["x_threshold"], r["hill_alpha"]) == (3, 1.0, 0.5)


def test_corpus_token_gini_closed_form(spark, tmp_path):
    """Token counts {a:3, b:1, c:1}: ranks ascending give
    s1 = 1*1 + 2*1 + 3*3 = 12, gini = 2*12/(3*5) - 4/3 = 0.266667."""
    _plant(
        spark, tmp_path, "documents",
        [(1, "a a a b"), (2, "c")],
        "doc_id long, text string",
    )
    [r] = QUERIES["corpus_token_gini"](spark, str(tmp_path)).collect()
    assert (r["vocab_size"], r["total_tokens"]) == (3, 5)
    assert r["gini"] == round(2 * 12 / (3 * 5) - 4 / 3, 6)


def test_embedding_silhouette_separated_clusters(spark, tmp_path):
    """Two orthogonal 2-point clusters: every point has a = 0 (own-label
    twin identical) and b = 1 (cosine distance to the other axis), so
    s = 1 for all; a single-member label has no own-label distance and
    is excluded."""
    _plant(
        spark, tmp_path, "embeddings",
        [
            (0, [1.0, 0.0], 0),
            (1, [1.0, 0.0], 0),
            (2, [0.0, 1.0], 1),
            (3, [0.0, 1.0], 1),
            (4, [0.6, 0.8], 2),  # singleton label: excluded
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r["label"]: (r["n_points"], r["mean_silhouette"])
        for r in QUERIES["embedding_silhouette"](spark, str(tmp_path)).collect()
    }
    assert out == {0: (2, 1.0), 1: (2, 1.0)}


def test_embedding_knn_radius_orthogonal_plant(spark, tmp_path):
    """Sample point e1 with one exact duplicate and five orthogonal
    corpus vectors: NN distances are (0, 1, 1, 1, 1, 1), so the 5th-NN
    radius is exactly 1.0; corpus ids >= 100 never enter the sample."""

    def e(i):
        v = [0.0] * 6
        v[i] = 1.0
        return v

    rows = [(0, e(0), 0)]  # the only sampled point
    rows += [(200 + k, e(k + 1), 0) for k in range(5)]  # orthogonal corpus
    rows += [(205, e(0), 0)]  # exact duplicate -> distance 0 is rank 1
    _plant(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    [r] = QUERIES["embedding_knn_radius"](spark, str(tmp_path)).collect()
    assert (r["label"], r["n_points"], r["mean_radius"], r["min_radius"],
            r["max_radius"]) == (0, 1, 1.0, 1.0, 1.0)


def test_source_embedding_centroids_orthogonal_sources(spark, tmp_path):
    """Centroids: srcA = mean of two e1 vectors, srcB = e2, srcC = e1.
    cos(A,B) = 0, cos(A,C) = 1, cos(B,C) = 0; pairs are emitted once
    with source_a < source_b."""
    _plant(
        spark, tmp_path, "documents",
        [(1, "srcA"), (2, "srcA"), (3, "srcB"), (4, "srcC")],
        "doc_id long, source string",
    )
    _plant(
        spark, tmp_path, "embeddings",
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [0.0, 1.0], 0),
            (4, [1.0, 0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        (r["source_a"], r["source_b"]): r["centroid_cosine"]
        for r in QUERIES["source_embedding_centroids"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        ("srcA", "srcB"): 0.0,
        ("srcA", "srcC"): 1.0,
        ("srcB", "srcC"): 0.0,
    }


def test_events_value_cusum_level_shift(spark, tmp_path):
    """Daily purchase totals (1, 1, 1, 5): mean 2, cusum peaks at day 3
    with |prefix - d*mean| = 3, direction negative (running below the
    mean before the jump)."""
    rows = [
        (1, datetime(2024, 6, 1, 10), 1, "purchase", 1.0),
        (2, datetime(2024, 6, 2, 10), 1, "purchase", 1.0),
        (3, datetime(2024, 6, 3, 10), 1, "purchase", 1.0),
        (4, datetime(2024, 6, 4, 10), 1, "purchase", 5.0),
        (5, datetime(2024, 6, 2, 11), 1, "view", 99.0),  # excluded
    ]
    _plant(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    [r] = QUERIES["events_value_cusum"](spark, str(tmp_path)).collect()
    assert (r["n_days"], r["changepoint_day"], r["max_abs_cusum"],
            r["direction"]) == (4, "2024-06-03", 3.0, -1)


def test_oracle_gate_sort_key_negative_zero_and_tiebreak():
    """_row_sort_key must (a) give -0.0 and 0.0 the same key so a
    -1e-10 vs +1e-10 engine disagreement can't flip row order, and
    (b) tie-break equal 1e-6-rounded keys by full precision so rows
    separated by more than the compare tolerance sort deterministically
    (ADVICE r7)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.run_oracle_gate import _row_sort_key

    neg = _row_sort_key([("f", -1e-10)])
    pos = _row_sort_key([("f", 1e-10)])
    # lead and rounded components identical; the tie component may differ
    # (full precision) but the rounded key must not
    assert neg[0] == pos[0] and neg[1] == pos[1]
    assert "-0.0" not in neg[1]

    # rows equal at 1e-6 rounding but separated by > compare tolerance:
    # full-precision tie-break orders them, same way in both engines
    a = _row_sort_key([("f", 1.0000001)])
    b = _row_sort_key([("f", 1.0000004)])
    assert a[1] == b[1]  # tie at the rounded key
    assert a < b  # resolved by the full-precision component

    # non-floats still lead and dominate
    x = _row_sort_key([("s", "a"), ("f", 9.9)])
    y = _row_sort_key([("s", "b"), ("f", 0.1)])
    assert x < y
