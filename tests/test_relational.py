"""Hand-computed checks of the TPC-H-shaped relational operators on
tiny frames (the sf0.01 oracle run covers them at scale)."""

from datetime import datetime

from pyspark.sql import functions as F

from myodish_peak_analysis_spark.operators.relational import (
    nation_revenue,
    pricing_summary,
    segment_revenue_topk,
)

LI_SCHEMA = (
    "l_orderkey long, l_suppkey long, l_quantity double, "
    "l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp_ntz"
)


def _li(spark, rows):
    return spark.createDataFrame(rows, LI_SCHEMA)


def test_pricing_summary_exact_arithmetic(spark):
    d = datetime(1997, 1, 1)
    late = datetime(1999, 1, 1)  # after the 1998-09-02 cutoff -> excluded
    li = _li(
        spark,
        [
            (1, 1, 2.0, 10.00, 0.10, 0.05, "A", "F", d),
            (1, 1, 3.0, 20.00, 0.00, 0.08, "A", "F", d),
            (2, 1, 1.0, 5.00, 0.05, 0.00, "R", "O", d),
            (3, 1, 9.0, 99.00, 0.01, 0.01, "A", "F", late),
        ],
    )
    out = {(r.l_returnflag, r.l_linestatus): r for r in pricing_summary(li).collect()}
    af = out[("A", "F")]
    assert af.count_order == 2
    assert af.sum_qty == 5.0
    assert af.sum_base_price == 30.0
    # 10*0.9 + 20*1.0 = 29.0 ; charge 10*0.9*1.05 + 20*1.0*1.08 = 31.05
    assert af.sum_disc_price == 29.0
    assert af.sum_charge == 31.05
    assert af.avg_qty == 2.5 and af.avg_price == 15.0 and af.avg_disc == 0.05
    assert ("R", "O") in out and ("A", "F") in out and len(out) == 2


def test_segment_topk_deterministic_ties(spark):
    d_old = datetime(1998, 1, 1)
    d_ship = datetime(1998, 6, 1)
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "BUILDING"), (3, "MACHINERY")],
        "c_custkey long, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, d_old), (11, 2, d_old), (12, 3, d_old)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz",
    )
    li = _li(
        spark,
        [
            # orders 10 and 11 have IDENTICAL revenue -> tie broken by key
            (10, 1, 1.0, 100.00, 0.00, 0.00, "N", "O", d_ship),
            (11, 1, 1.0, 100.00, 0.00, 0.00, "N", "O", d_ship),
            (12, 1, 1.0, 999.00, 0.00, 0.00, "N", "O", d_ship),  # wrong segment
        ],
    )
    got = segment_revenue_topk(cust, orders, li, k=2).collect()
    assert [(r.o_orderkey, r.revenue) for r in got] == [(10, 100.0), (11, 100.0)]
    # epoch day of 1998-01-01
    assert got[0].o_orderdate_day == (datetime(1998, 1, 1) - datetime(1970, 1, 1)).days


def test_nation_revenue_local_supplier_only(spark):
    d = datetime(1996, 6, 1)
    nation = spark.createDataFrame(
        [(0, "N_A", 2), (1, "N_B", 2), (2, "N_C", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame(
        [(2, "ASIA"), (0, "AFRICA")], "r_regionkey int, r_name string"
    )
    cust = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2)], "c_custkey long, c_nationkey int"
    )
    supplier = spark.createDataFrame(
        [(7, 0), (8, 1)], "s_suppkey long, s_nationkey int"
    )
    orders = spark.createDataFrame(
        [(10, 1, d), (11, 2, d), (12, 3, d)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz",
    )
    li = _li(
        spark,
        [
            (10, 7, 1.0, 50.00, 0.00, 0.00, "N", "O", d),  # cust N_A, supp N_A: counts
            (10, 8, 1.0, 70.00, 0.00, 0.00, "N", "O", d),  # supp N_B != cust N_A: no
            (11, 8, 1.0, 30.00, 0.50, 0.00, "N", "O", d),  # cust N_B, supp N_B: 15.0
            (12, 7, 1.0, 99.00, 0.00, 0.00, "N", "O", d),  # cust N_C not in ASIA
        ],
    )
    out = {
        r.n_name: r.revenue
        for r in nation_revenue(cust, orders, li, supplier, nation, region).collect()
    }
    assert out == {"N_A": 50.0, "N_B": 15.0}


def test_large_order_customers_having_and_topk(spark):
    from myodish_peak_analysis_spark.operators.relational import (
        large_order_customers,
    )

    cust = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "c_custkey long, c_name string"
    )
    orders = spark.createDataFrame(
        [(10, 1, "2024-01-01", 500.0), (20, 2, "2024-01-02", 900.0),
         (30, 1, "2024-01-03", 100.0)],
        "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
    li = spark.createDataFrame(
        # order 10: qty 7 (qualifies with min_qty=5); order 20: qty 6;
        # order 30: qty 4 (filtered by HAVING)
        [(10, 3.0), (10, 4.0), (20, 6.0), (30, 4.0)],
        "l_orderkey long, l_quantity double",
    )
    out = large_order_customers(cust, orders, li, min_qty=5, k=2).collect()
    # top-k by total_price desc: order 20 (900) then order 10 (500)
    assert [(r.o_orderkey, r.c_name, r.total_qty) for r in out] == [
        (20, "bob", 6.0),
        (10, "alice", 7.0),
    ]


def test_cheapest_supplier_correlated_min(spark):
    from myodish_peak_analysis_spark.operators.relational import (
        cheapest_supplier_per_part,
    )

    li = spark.createDataFrame(
        # part 1: supp 10 sells at 2.00/unit, supp 20 at 1.00/unit (min);
        # part 2: single qualifying supplier; supp 30's part-1 line is
        # filtered by min_lines=2
        [
            (1, 10, 4.0, 2.0), (1, 10, 2.0, 1.0),
            (1, 20, 2.0, 2.0), (1, 20, 1.0, 1.0),
            (1, 30, 9.0, 1.0),
            (2, 10, 6.0, 2.0), (2, 10, 3.0, 1.0),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_quantity double",
    )
    part = spark.createDataFrame(
        [(1, "widget"), (2, "gadget")], "p_partkey long, p_name string"
    )
    supp = spark.createDataFrame(
        [(10, "acme"), (20, "bolt"), (30, "corp")], "s_suppkey long, s_name string"
    )
    out = {r.p_partkey: r for r in cheapest_supplier_per_part(li, part, supp).collect()}
    assert out[1].s_suppkey == 20 and out[1].unit_price == 1.0
    assert out[2].s_suppkey == 10 and out[2].unit_price == 3.0  # 9.0 / 3 units


def test_nation_pair_volume_routes_both_nation_roles(spark):
    from myodish_peak_analysis_spark.operators.relational import (
        nation_pair_volume,
    )

    d96, d97 = datetime(1996, 3, 1), datetime(1997, 3, 1)
    nation = spark.createDataFrame(
        [(0, "N_A", 0), (1, "N_B", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    supplier = spark.createDataFrame(
        [(7, 0), (8, 1)], "s_suppkey long, s_nationkey int"
    )
    cust = spark.createDataFrame(
        [(1, 1), (2, 0)], "c_custkey long, c_nationkey int"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 2)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [
            # supp N_A -> cust N_B, 1996: 100 * (1-0.10) = 90.0
            (10, 7, 100.00, 0.10, d96),
            # supp N_B -> cust N_B, 1996: 50.0
            (10, 8, 50.00, 0.00, d96),
            # supp N_A -> cust N_B, 1997: separate year group
            (10, 7, 10.00, 0.00, d97),
            # supp N_A -> cust N_A: 20.0
            (11, 7, 20.00, 0.00, d96),
            # outside the date range: dropped
            (10, 7, 999.00, 0.00, datetime(1995, 1, 1)),
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp_ntz",
    )
    out = {
        (r.supp_nation, r.cust_nation, r.ship_year): (r.volume, r.n_lines)
        for r in nation_pair_volume(li, orders, cust, supplier, nation).collect()
    }
    assert out == {
        ("N_A", "N_B", 1996): (90.0, 1),
        ("N_B", "N_B", 1996): (50.0, 1),
        ("N_A", "N_B", 1997): (10.0, 1),
        ("N_A", "N_A", 1996): (20.0, 1),
    }


def test_promo_revenue_by_month_share(spark):
    from myodish_peak_analysis_spark.operators.relational import (
        promo_revenue_by_month,
    )

    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")], "p_partkey long, p_type string"
    )
    li = spark.createDataFrame(
        [
            # Jan 2024: promo 30.0 of total 100.0 -> 30%
            (1, 30.00, 0.00, datetime(2024, 1, 5)),
            (2, 70.00, 0.00, datetime(2024, 1, 25)),
            # Feb 2024: all promo, with a discount: 50*(1-0.5)=25.0
            (1, 50.00, 0.50, datetime(2024, 2, 10)),
        ],
        "l_partkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp_ntz",
    )
    out = {
        r.ship_month_day: (r.promo_revenue, r.total_revenue, r.promo_pct)
        for r in promo_revenue_by_month(li, part).collect()
    }
    jan = (datetime(2024, 1, 1) - datetime(1970, 1, 1)).days
    feb = (datetime(2024, 2, 1) - datetime(1970, 1, 1)).days
    assert out == {jan: (30.0, 100.0, 30.0), feb: (25.0, 25.0, 100.0)}


def test_brand_disjunction_branch_predicates(spark):
    from myodish_peak_analysis_spark.operators.relational import (
        brand_disjunction_revenue,
    )

    part = spark.createDataFrame(
        [
            (1, "Brand#12", 3),   # branch 1 (size 1-5)
            (2, "Brand#12", 9),   # size outside branch 1 -> never matches
            (3, "Brand#23", 8),   # branch 2 (size 1-10)
            (4, "Brand#34", 12),  # branch 3 (size 1-15)
            (5, "Brand#99", 1),   # brand in no branch
        ],
        "p_partkey long, p_brand string, p_size int",
    )
    li = spark.createDataFrame(
        [
            (1, 5.0, 100.00, 0.00),   # brand12 qty 1-11: counts (100)
            (1, 20.0, 999.00, 0.00),  # qty outside branch 1: dropped
            (2, 5.0, 999.00, 0.00),   # part size disqualified: dropped
            (3, 15.0, 200.00, 0.50),  # brand23 qty 10-20: counts (100)
            (3, 5.0, 999.00, 0.00),   # qty below branch 2: dropped
            (4, 30.0, 40.00, 0.00),   # brand34 qty 20-36: counts (40)
            (5, 5.0, 999.00, 0.00),   # brand not in any branch: dropped
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double",
    )
    out = {
        r.p_brand: (r.revenue, r.n_lines)
        for r in brand_disjunction_revenue(li, part).collect()
    }
    assert out == {
        "Brand#12": (100.0, 1),
        "Brand#23": (100.0, 1),
        "Brand#34": (40.0, 1),
    }


def test_parts_never_returned_anti_join(spark):
    from myodish_peak_analysis_spark.operators.relational import (
        parts_never_returned,
    )

    part = spark.createDataFrame(
        [
            (1, "Brand#1", 5),  # bulk return -> excluded
            (2, "Brand#1", 5),  # only a small return -> kept
            (3, "Brand#2", 7),  # never returned at all -> kept
            (4, "Brand#2", 7),  # never ordered -> excluded (no EXISTS)
        ],
        "p_partkey long, p_brand string, p_size int",
    )
    li = spark.createDataFrame(
        [
            (1, "R", 45.0),
            (2, "R", 10.0),
            (2, "N", 50.0),  # bulk but not returned
            (3, "N", 50.0),
        ],
        "l_partkey long, l_returnflag string, l_quantity double",
    )
    out = {
        (r.p_brand, r.p_size): r.n_parts
        for r in parts_never_returned(li, part, min_qty=40.0).collect()
    }
    assert out == {("Brand#1", 5): 1, ("Brand#2", 7): 1}
