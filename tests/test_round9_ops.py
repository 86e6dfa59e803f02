"""Planted-scenario tests for round-9 additions: the remaining classic
TPC-H join-decorrelation shapes (Q21 multi-EXISTS, Q13 count-of-counts
over a left outer, Q12 conditional sums, Q15 max-attach with ties)."""

from __future__ import annotations

from datetime import datetime

from beacon_indexer_spark.plans.queries import QUERIES


def _plant(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_supplier_wait_fault_only_sole_late_multi_supplier(spark, tmp_path):
    """Q21 semantics: a supplier is faulted for an order only when the
    order is finished ('F'), has another supplier, and NO other supplier
    was late; two late lineitems by the same supplier on one order count
    that order ONCE."""
    d0 = datetime(1995, 1, 1)
    late = datetime(1995, 6, 1)     # 151 days > 60
    ontime = datetime(1995, 1, 15)  # 14 days
    _plant(
        spark, tmp_path, "orders",
        [
            (1, d0, "F"),  # supp1 late, supp2 on-time -> fault supp1
            (2, d0, "F"),  # both late -> nobody
            (3, d0, "F"),  # single supplier -> nobody
            (4, d0, "O"),  # not finished -> excluded
            (5, d0, "F"),  # supp1 late TWICE, supp3 on-time -> one fault
        ],
        "o_orderkey long, o_orderdate timestamp, o_orderstatus string",
    )
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1, 1, late), (1, 2, ontime),
            (2, 1, late), (2, 2, late),
            (3, 1, late),
            (4, 1, late), (4, 2, ontime),
            (5, 1, late), (5, 1, late), (5, 3, ontime),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    _plant(
        spark, tmp_path, "supplier",
        [(1, "Supplier#1"), (2, "Supplier#2"), (3, "Supplier#3")],
        "s_suppkey long, s_name string",
    )
    rows = QUERIES["supplier_wait_fault"](spark, str(tmp_path)).collect()
    assert [(r["s_name"], r["numwait"]) for r in rows] == [("Supplier#1", 2)]


def test_customer_order_count_dist_includes_zero_bucket(spark, tmp_path):
    """Q13 semantics: customers whose only orders are filtered out AND
    customers with no orders at all both land in the c_count=0 bucket —
    the left-outer null-group shape an inner join would drop."""
    d0 = datetime(1995, 1, 1)
    _plant(
        spark, tmp_path, "customer",
        [(1,), (2,), (3,), (4,)],
        "c_custkey long",
    )
    _plant(
        spark, tmp_path, "orders",
        [
            (10, 1, "3-MEDIUM", d0),
            (11, 1, "5-LOW", d0),
            (12, 1, "1-URGENT", d0),   # filtered -> not counted
            (13, 2, "1-URGENT", d0),   # cust2's ONLY order -> c_count 0
            (14, 4, "2-HIGH", d0),
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string,"
        " o_orderdate timestamp",
    )
    rows = QUERIES["customer_order_count_dist"](spark, str(tmp_path)).collect()
    assert [(r["c_count"], r["custdist"]) for r in rows] == [
        (0, 2), (2, 1), (1, 1),
    ]


def test_lineitem_shipmode_priority_buckets_and_window(spark, tmp_path):
    """Q12 semantics: latency buckets split at 30/365 days, the 1996 ship
    window prunes rows outside it, and the CASE sums split high vs low
    priority per line (not per order)."""
    _plant(
        spark, tmp_path, "orders",
        [
            (1, datetime(1996, 1, 1), "1-URGENT"),
            (2, datetime(1995, 3, 1), "4-NOT SPECIFIED"),
        ],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1, datetime(1996, 1, 20)),   # 19d  -> FAST, high
            (1, datetime(1996, 8, 1)),    # 213d -> REGULAR, high
            (2, datetime(1996, 3, 5)),    # 370d -> SLOW, low
            (2, datetime(1996, 2, 1)),    # 337d -> REGULAR, low
            (1, datetime(1997, 2, 1)),    # outside window -> dropped
            (2, datetime(1995, 12, 31)),  # outside window -> dropped
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    rows = QUERIES["lineitem_shipmode_priority"](spark, str(tmp_path)).collect()
    assert [
        (r["ship_speed"], r["high_line_count"], r["low_line_count"])
        for r in rows
    ] == [("FAST", 1, 0), ("REGULAR", 1, 1), ("SLOW", 0, 1)]


def test_top_revenue_supplier_exact_tie_kept(spark, tmp_path):
    """Q15 semantics: the decimal-exact revenue equality keeps BOTH tied
    max suppliers (100.00 each via different price/discount splits), the
    sub-max supplier is excluded, and out-of-window lines don't count."""
    inwin = datetime(1996, 2, 1)
    outwin = datetime(1996, 6, 1)
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1, inwin, 100.0, 0.00),   # supp1: 100.00
            (2, inwin, 200.0, 0.50),   # supp2: 100.00 (exact tie)
            (3, inwin, 99.0, 0.00),    # supp3: 99.00 -> below max
            (1, outwin, 500.0, 0.00),  # outside window -> ignored
        ],
        "l_suppkey long, l_shipdate timestamp, l_extendedprice double,"
        " l_discount double",
    )
    _plant(
        spark, tmp_path, "supplier",
        [(1, "Supplier#1"), (2, "Supplier#2"), (3, "Supplier#3")],
        "s_suppkey long, s_name string",
    )
    rows = QUERIES["top_revenue_supplier"](spark, str(tmp_path)).collect()
    assert [(r["s_suppkey"], r["s_name"], r["total_revenue"]) for r in rows] \
        == [(1, "Supplier#1", 100.0), (2, "Supplier#2", 100.0)]


def test_customer_untapped_balance_planted(spark, tmp_path):
    """Q22 semantics: above-positive-average balance AND no URGENT order.
    A (rich, no urgent) is reported; B (rich, has urgent) is anti-joined
    away; C (below average) and D (negative balance) never qualify."""
    d0 = datetime(1995, 1, 1)
    _plant(
        spark, tmp_path, "customer",
        [
            (1, "A", 7, 100.0, "BUILDING"),
            (2, "B", 7, 100.0, "BUILDING"),
            (3, "C", 8, 1.0, "AUTOMOBILE"),
            (4, "D", 8, -50.0, "AUTOMOBILE"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    _plant(
        spark, tmp_path, "orders",
        [
            (10, 2, d0, "1-URGENT"),
            (11, 1, d0, "5-LOW"),  # A has an order, just not urgent
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    rows = QUERIES["customer_untapped_balance"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["c_nationkey"], r["n_customers"], r["total_acctbal"]) == (7, 1, 100.0)


def test_mmr_selection_diversifies(spark, tmp_path):
    """MMR must trade relevance for diversity: with a clone-cluster of
    high-relevance near-duplicates and a spread of diverse moderates,
    plain top-5 keeps the clones while MMR keeps the most relevant clone
    and pulls in diverse picks — mean intra-set similarity must drop."""
    dim = 8

    def unit(v):
        n = sum(x * x for x in v) ** 0.5
        return [x / n for x in v]

    q = [1.0] + [0.0] * (dim - 1)
    rows = [(0, q)]
    # 1..6: a clone CLUSTER tilted off the query axis (rel ~0.8, intra
    # ~1.0 — more similar to each other than to the query, the regime
    # MMR exists for)
    for i in range(1, 7):
        v = [0.0] * dim
        v[0] = 0.8
        v[dim - 1] = 0.6 + 0.001 * i
        rows.append((i, unit(v)))
    # 7..12: diverse moderates — slightly less relevant (rel ~0.75),
    # mutually near-orthogonal side axes
    for i in range(7, 13):
        v = [0.0] * dim
        v[0] = 0.75
        v[1 + (i - 7)] = 0.66
        rows.append((i, unit(v)))
    _plant(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<double>",
    )
    sel = {
        r["sel_order"]: r["doc_id"]
        for r in QUERIES["embedding_mmr_rerank"](spark, str(tmp_path)).collect()
    }
    assert len(sel) == 5
    data = {vid: v for vid, v in rows}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    # rank 1 is the plain most-relevant candidate
    best = max((cos(data[i], q), -i) for i in range(1, 13))
    assert sel[1] == -best[1]
    plain5 = [-i for _, i in sorted(
        ((cos(data[i], q), -i) for i in range(1, 13)), reverse=True)[:5]]

    def mean_pair_sim(ids):
        ids = list(ids)
        sims = [
            cos(data[a], data[b])
            for ai, a in enumerate(ids) for b in ids[ai + 1:]
        ]
        return sum(sims) / len(sims)

    assert mean_pair_sim(sel.values()) < mean_pair_sim(plain5) - 0.1
    # diversity picks actually happened: not all selections are clones
    assert any(d >= 7 for d in sel.values())


def test_interval_overlap_join_edges(spark):
    """Claim-bucket dedup and boundary semantics: overlapping pairs are
    emitted EXACTLY once even when both intervals span many shared
    buckets; touching endpoints (inclusive) overlap; disjoint intervals
    never pair; containment pairs once."""
    from beacon_indexer_spark.operators.relational import interval_overlap_join

    left = spark.createDataFrame(
        [
            (1, 0, 10_000),       # spans 3 buckets (w=3600)
            (2, 20_000, 20_010),  # disjoint from everything on the right
            (3, 50_000, 90_000),  # long interval, contains r30
        ],
        "lid long, s_a long, e_a long",
    )
    right = spark.createDataFrame(
        [
            (10, 9_000, 12_000),   # overlaps lid=1 across shared buckets
            (20, 10_000, 10_500),  # touches lid=1 exactly at e_a=10000
            (30, 60_000, 61_000),  # contained in lid=3
            (40, 30_000, 30_100),  # disjoint
        ],
        "rid long, s_b long, e_b long",
    )
    rows = interval_overlap_join(
        left, right, "s_a", "e_a", "s_b", "e_b", bucket=3600
    ).collect()
    pairs = sorted((r["lid"], r["rid"]) for r in rows)
    assert pairs == [(1, 10), (1, 20), (3, 30)]
    assert len(pairs) == len(set(pairs))  # claim-bucket dedup: no dupes
