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
