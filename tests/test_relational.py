"""Relational analytics operator tests on tiny in-memory frames (the
oracle gate covers the full parquet tables; these pin the semantics)."""

import datetime

from accumulo_wikisearch_spark.operators.relational import (
    customer_order_distribution,
    order_priority_count,
    pricing_summary,
    small_quantity_revenue,
    top_customers_by_segment,
)

TS = datetime.datetime


def test_pricing_summary_cents_and_cutoff(spark):
    li = spark.createDataFrame(
        [
            (1, 2.0, 10.005, 0.0, "A", "F", TS(1996, 1, 1)),
            (2, 3.0, 20.00, 0.5, "A", "F", TS(1996, 1, 2)),
            (3, 1.0, 99.99, 0.0, "A", "F", TS(1999, 1, 1)),  # past cutoff
        ],
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    )
    r = pricing_summary(li).collect()
    assert len(r) == 1
    row = r[0]
    assert row["sum_qty"] == 5
    # 10.005*100 rounds half-up to 1001; 20.0 → 2000
    assert row["sum_base_cents"] == 1001 + 2000
    assert row["sum_disc_cents"] == 1001 + 1000
    assert row["count_order"] == 2


def test_order_priority_semi_join(spark):
    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", TS(1996, 2, 1)),
            (2, "1-URGENT", TS(1996, 2, 2)),  # no lineitems → dropped
            (3, "5-LOW", TS(1995, 1, 1)),  # out of window
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp_ntz",
    )
    li = spark.createDataFrame([(1,), (1,), (3,)], "l_orderkey long")
    got = {r["o_orderpriority"]: r["order_count"] for r in order_priority_count(orders, li).collect()}
    # order 1 counted ONCE despite two lineitems (semi-join, not inner)
    assert got == {"1-URGENT": 1}


def test_top_customers_rank_and_ties(spark):
    orders = spark.createDataFrame(
        [(10, 5.0), (10, 5.0), (20, 10.0), (30, 10.0), (40, 1.0)],
        "o_custkey long, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(10, "SEG"), (20, "SEG"), (30, "SEG"), (40, "SEG")],
        "c_custkey long, c_mktsegment string",
    )
    rows = top_customers_by_segment(orders, cust, k=3).collect()
    ranked = sorted((r["rank"], r["c_custkey"]) for r in rows)
    # 10 and 20 and 30 tie at 1000 cents; tie-break ascending custkey
    assert ranked == [(1, 10), (2, 20), (3, 30)]


def test_customer_order_distribution_counts_zero_order_customers(spark):
    cust = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(100, 1), (101, 1), (102, 2)], "o_orderkey long, o_custkey long"
    )
    got = {r["c_count"]: r["custdist"] for r in customer_order_distribution(cust, orders).collect()}
    # customer 3 has no orders → bucket 0 exists (left outer, count of non-null)
    assert got == {2: 1, 1: 1, 0: 1}


def test_small_quantity_revenue_exact_threshold(spark):
    # part 1: quantities 1, 10, 10 → avg 7, qty < avg/5 = 1.4 → only qty=1
    # (exact form: 5*qty*cnt < sum_qty → 5*1*3=15 < 21 ✓; 5*10*3=150 ✗)
    li = spark.createDataFrame(
        [(1, 1.0, 10.0), (1, 10.0, 10.0), (1, 10.0, 10.0), (2, 1.0, 99.0)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    part = spark.createDataFrame([(1, "Brand#4"), (2, "Brand#9")], "p_partkey long, p_brand string")
    r = small_quantity_revenue(li, part, brand="Brand#4").collect()[0]
    assert r["n_items"] == 1 and r["small_qty_rev_cents"] == 1000


def test_nation_trade_volume_both_directions_only(spark):
    from accumulo_wikisearch_spark.operators.relational import nation_trade_volume

    nation = spark.createDataFrame(
        [(1, "NATION_1"), (2, "NATION_2"), (3, "NATION_3")],
        "n_nationkey long, n_name string",
    )
    supplier = spark.createDataFrame(
        [(100, 1), (200, 2), (300, 3)], "s_suppkey long, s_nationkey long"
    )
    customer = spark.createDataFrame(
        [(10, 2), (20, 1), (30, 3)], "c_custkey long, c_nationkey long"
    )
    orders = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [
            # supp N1 → cust N2: kept
            (1, 100, 10.0, 0.0, TS(1996, 6, 1)),
            # supp N2 → cust N1: kept (reverse direction)
            (2, 200, 20.0, 0.0, TS(1997, 6, 1)),
            # supp N3 → cust N3: dropped (neither nation)
            (3, 300, 40.0, 0.0, TS(1996, 6, 1)),
            # out of ship window: dropped
            (1, 100, 80.0, 0.0, TS(1999, 6, 1)),
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp_ntz",
    )
    rows = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue_cents"]
        for r in nation_trade_volume(li, orders, customer, supplier, nation).collect()
    }
    assert rows == {
        ("NATION_1", "NATION_2", 1996): 1000,
        ("NATION_2", "NATION_1", 1997): 2000,
    }


def test_large_orders_threshold_and_customer(spark):
    from accumulo_wikisearch_spark.operators.relational import large_orders

    li = spark.createDataFrame(
        [(1, 150.0), (1, 100.0), (2, 150.0)],
        "l_orderkey long, l_quantity double",
    )
    orders = spark.createDataFrame(
        [(1, 10, TS(1996, 1, 2), 33.335), (2, 10, TS(1996, 1, 3), 5.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz, o_totalprice double",
    )
    cust = spark.createDataFrame([(10, "Cust#10")], "c_custkey long, c_name string")
    rows = large_orders(li, orders, cust).collect()
    # only order 1 crosses 200 total quantity; 150-qty order 2 is below
    assert len(rows) == 1
    r = rows[0]
    assert (r["orderkey"], r["sum_qty"], r["order_date"]) == (1, 250, "1996-01-02")
    assert r["total_cents"] == 3334  # round-half-up of 3333.5
    assert r["c_name"] == "Cust#10"


def test_disjunctive_revenue_or_of_ands(spark):
    from accumulo_wikisearch_spark.operators.relational import disjunctive_revenue

    part = spark.createDataFrame(
        [(1, "SMALL", 5), (2, "MEDIUM", 15), (3, "LARGE", 40)],
        "p_partkey long, p_type string, p_size int",
    )
    li = spark.createDataFrame(
        [
            (1, 10.0, 10.0, 0.0),   # SMALL size 5 qty 10: kept
            (1, 20.0, 100.0, 0.0),  # SMALL qty 20 > 15: dropped
            (2, 25.0, 20.0, 0.5),   # MEDIUM size 15 qty 25: kept
            (3, 30.0, 999.0, 0.0),  # LARGE size 40 > 30: dropped
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double",
    )
    r = disjunctive_revenue(li, part).collect()[0]
    assert (r["revenue_cents"], r["n_items"]) == (1000 + 1000, 2)
