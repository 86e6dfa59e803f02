"""Planted-scenario tests for round-10 additions: TPC-H Q11 (group-HAVING
vs global scalar) and Q20 (nested semi-join + correlated threshold) over
the deterministically derived partsupp."""

from __future__ import annotations

from datetime import datetime

from beacon_indexer_spark.plans.queries import QUERIES


def _plant(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / f"{name}.parquet")
    )


def _base_dims(spark, tmp_path):
    _plant(
        spark, tmp_path, "nation",
        [(3, "NATION_3", 0), (7, "NATION_7", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


def test_q20_excludes_pairs_without_1996_rows(spark, tmp_path):
    """The correlated subquery over an empty set is NULL -> pair excluded,
    even though its availqty would beat a zero threshold. Supplier 1's
    only small-part pair shipped in 1995; supplier 2's shipped tiny
    quantities in 1996 (threshold beaten -> included)."""
    _base_dims(spark, tmp_path)
    _plant(
        spark, tmp_path, "supplier",
        [(1, "Supplier#1", 3, 0.0), (2, "Supplier#2", 3, 0.0),
         (3, "Supplier#3", 7, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    _plant(
        spark, tmp_path, "part",
        [(10, "small ring", "B", "T", 1, 1.0),
         (11, "big ring", "B", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    d95, d96 = datetime(1995, 6, 1), datetime(1996, 6, 1)
    _plant(
        spark, tmp_path, "lineitem",
        [
            # supplier 1: small part, 1995 only -> excluded (NULL threshold)
            (1, 10, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", d95),
            # supplier 2: small part, 1996, tiny qty -> included
            (2, 10, 2, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d96),
            # supplier 3: wrong nation -> filtered by nation
            (3, 10, 3, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d96),
            # supplier 2 again but big part -> part filter drops it
            (4, 11, 2, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d96),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    out = QUERIES["supplier_excess_capacity"](spark, str(tmp_path)).collect()
    assert [(r.s_suppkey, r.s_name) for r in out] == [(2, "Supplier#2")]


def test_q20_threshold_is_strict_half(spark, tmp_path):
    """availqty > qty/2 must be strict and exact: derived availqty for
    (part, supp) = (p*7 + s*13) % 9999 + 1. Pick keys so availqty is
    known, then plant 1996 quantity exactly 2*availqty (excluded) vs
    2*availqty - 1 (included: 2*avail > qty)."""
    _base_dims(spark, tmp_path)
    _plant(
        spark, tmp_path, "supplier",
        [(0, "S0", 3, 0.0), (1, "S1", 3, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    _plant(
        spark, tmp_path, "part",
        [(1, "small bolt", "B", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    d96 = datetime(1996, 3, 1)
    avail_s0 = (1 * 7 + 0 * 13) % 9999 + 1  # 8
    avail_s1 = (1 * 7 + 1 * 13) % 9999 + 1  # 21
    _plant(
        spark, tmp_path, "lineitem",
        [
            # qty == 2*availqty -> NOT included (strict >)
            (1, 1, 0, 1, float(2 * avail_s0), 1.0, 0.0, 0.0, "N", "O", d96),
            # qty == 2*availqty - 1 -> included
            (2, 1, 1, 1, float(2 * avail_s1 - 1), 1.0, 0.0, 0.0, "N", "O", d96),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    out = QUERIES["supplier_excess_capacity"](spark, str(tmp_path)).collect()
    assert [r.s_suppkey for r in out] == [1]


def test_q11_having_vs_global_total(spark, tmp_path):
    """Only groups above total/10000 survive; with two parts where one
    holds ~all the value, the tiny one must drop. Uses nation-7
    suppliers only — a nation-3 supplier's rows must not count."""
    _base_dims(spark, tmp_path)
    _plant(
        spark, tmp_path, "supplier",
        [(0, "S0", 7, 0.0), (1, "S1", 3, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    d = datetime(1996, 1, 1)
    # pairs: (100, s0) dominant value; (200, s0) tiny value would need
    # crafted keys — instead plant MANY pairs for part 100 and one for
    # part 200, then assert only relative membership via the oracle rule
    rows = []
    ok = 1
    for p in range(100, 120):
        rows.append((ok, p, 0, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d)); ok += 1
    rows.append((ok, 200, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d))
    _plant(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    out = QUERIES["partsupp_value_concentration"](spark, str(tmp_path)).collect()
    got = {r.ps_partkey: r.value for r in out}
    # part 200's pair is nation-3 -> contributes nothing; all 20 nation-7
    # parts clear total/10000 (each ~5% of total)
    assert 200 not in got
    assert set(got) == set(range(100, 120))
    # exact value check for one part: availqty * cost_cents / 100
    p, s = 100, 0
    avail = (p * 7 + s * 13) % 9999 + 1
    cents = (p * 31 + s * 17) % 90000 + 10000
    assert got[100] == avail * cents / 100


def test_q16_not_in_excludes_complaint_suppliers(spark, tmp_path):
    """A supplier with negative balance must not count anywhere, and the
    brand/type/size filters must drop non-qualifying parts."""
    _base_dims(spark, tmp_path)
    _plant(
        spark, tmp_path, "supplier",
        [(0, "S0", 3, 10.0), (1, "S1", 3, -5.0), (2, "S2", 3, 1.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    _plant(
        spark, tmp_path, "part",
        [
            (1, "x", "Brand#2", "LARGE", 3, 1.0),    # qualifies
            (2, "x", "Brand#1", "LARGE", 3, 1.0),    # brand excluded
            (3, "x", "Brand#2", "PROMO", 3, 1.0),    # type excluded
            (4, "x", "Brand#2", "LARGE", 2, 1.0),    # size excluded
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    from datetime import datetime
    d = datetime(1996, 1, 1)
    rows = []
    ok = 1
    for pk in (1, 2, 3, 4):
        for sk in (0, 1, 2):
            rows.append((ok, pk, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d))
            ok += 1
    _plant(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    out = QUERIES["part_supplier_counts"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # suppliers 0 and 2 qualify; supplier 1 (negative balance) excluded
    assert (r.p_brand, r.p_type, r.p_size, r.supplier_cnt) == (
        "Brand#2", "LARGE", 3, 2
    )


def test_q9_profit_is_revenue_minus_supplycost(spark, tmp_path):
    """One gear line: profit = extprice*(1-disc) - cost_cents*qty/100,
    grouped under the SUPPLIER's nation and the ORDER year."""
    _base_dims(spark, tmp_path)
    _plant(
        spark, tmp_path, "supplier",
        [(2, "S2", 7, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    _plant(
        spark, tmp_path, "part",
        [(5, "hot gear", "Brand#2", "LARGE", 3, 1.0),
         (6, "red bolt", "Brand#2", "LARGE", 3, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    from datetime import datetime
    _plant(
        spark, tmp_path, "orders",
        [(1, datetime(1997, 5, 1), "F"), (2, datetime(1998, 2, 1), "F")],
        "o_orderkey long, o_orderdate timestamp, o_orderstatus string",
    )
    _plant(
        spark, tmp_path, "lineitem",
        [
            (1, 5, 2, 1, 3.0, 200.0, 0.1, 0.0, "N", "O", datetime(1997, 5, 2)),
            (2, 6, 2, 1, 3.0, 200.0, 0.1, 0.0, "N", "O", datetime(1998, 2, 2)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    out = QUERIES["nation_product_profit"](spark, str(tmp_path)).collect()
    # only the gear part (5) counts; nation is the supplier's (NATION_7)
    assert len(out) == 1
    r = out[0]
    cents = (5 * 31 + 2 * 17) % 90000 + 10000
    expect = 200.0 * 0.9 - cents * 3 / 100
    assert (r.nation, r.o_year) == ("NATION_7", 1997)
    assert abs(r.sum_profit - expect) < 1e-9


def test_kmv_jaccard_estimates_known_overlap(spark):
    """Two synthetic key sets with exact Jaccard 1/3 (A=1..2000,
    B=1001..3000, |inter|=1000, |union|=3000): the k=64 KMV estimate
    must be deterministic and land within the ~1/sqrt(k) band."""
    from beacon_indexer_spark.operators.sketch import kmv_jaccard

    rows = [("a", i) for i in range(1, 2001)] + [
        ("b", i) for i in range(1001, 3001)
    ]
    df = spark.createDataFrame(rows, "grp string, key long")
    r1 = kmv_jaccard(df, "key", "grp", "a", "b", k=64).collect()[0]
    r2 = kmv_jaccard(df, "key", "grp", "a", "b", k=64).collect()[0]
    assert r1 == r2  # md5-deterministic
    assert r1.n_kept == 64
    assert abs(r1.jaccard_est - 1 / 3) < 0.2
    assert 0.5 * 3000 < r1.union_est < 2.0 * 3000
    assert r1.inter_est == round(r1.jaccard_est * r1.union_est, 4)
