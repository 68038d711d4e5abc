"""General relational analytics over the warehouse tables — the engine's
join / aggregation / window surface, shaped after classic decision-support
queries (scan-heavy agg, multi-way join with broadcast dims, semi-join
EXISTS, per-group window top-k).

The reference has no user-level joins or grouping (SURVEY.md §2.6); these
operators are part of the engine's declared Spark-native extension surface,
alongside the dedup/ANN/text operators.

Scale notes, per query:
- ``pricing_summary``: single scan of the fact table, filter pushed to
  parquet, partial (map-side) aggregation; output cardinality = #(flag ×
  status). The canonical 100 TB-friendly shape.
- ``revenue_by_nation``: fact ⋈ facts shuffle on orderkey; all dimension
  joins (customer→nation→region) are broadcasts — no shuffle for dims.
- ``order_priority_count``: EXISTS via left-semi join, shuffle on orderkey
  only; counts aggregate map-side.
- ``top_customers_by_segment``: groupBy shuffle then a window over small
  per-segment groups; rank cutoff prunes before the final projection.

Monetary aggregates are integer cents (``round(x*100)::BIGINT`` per row
before summing) so results are hash-exact across Spark and DuckDB — double
summation order would otherwise differ in the last ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.session import tune_runtime

# warehouse timestamps load as TIMESTAMP_NTZ; date bounds become NTZ
# literals so comparisons stay pushdown-eligible


def _ts(date_str: str) -> F.Column:
    return F.lit(date_str).cast("timestamp_ntz")


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_runtime(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Per (returnflag, linestatus) rollup of shipped lineitems (Q1 shape)."""
    return (
        lineitem.where(F.col("l_shipdate") <= _ts(cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_cents"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    from_date: str = "1996-01-01",
    to_date: str = "1997-01-01",
) -> DataFrame:
    """Revenue per nation for one region and order-date year (Q5 shape).

    Dimension chain region→nation→customer broadcast-joined; the only
    shuffle is lineitem ⋈ orders on orderkey.
    """
    dims = (
        customer.join(
            F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
        )
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .where(F.col("r_name") == region_name)
        .select("c_custkey", "n_name")
    )
    ords = orders.where(
        (F.col("o_orderdate") >= _ts(from_date))
        & (F.col("o_orderdate") < _ts(to_date))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select(
            "l_orderkey",
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev_cents"
            ),
        )
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.sum("rev_cents").alias("revenue_cents"))
    )


def order_priority_count(
    orders: DataFrame,
    lineitem: DataFrame,
    from_date: str = "1996-01-01",
    to_date: str = "1996-04-01",
) -> DataFrame:
    """Orders per priority that have ≥1 lineitem (EXISTS → left-semi, Q4 shape)."""
    ords = orders.where(
        (F.col("o_orderdate") >= _ts(from_date))
        & (F.col("o_orderdate") < _ts(to_date))
    )
    with_items = ords.join(
        lineitem.select(F.col("l_orderkey").alias("o_orderkey")),
        "o_orderkey",
        "left_semi",
    )
    return with_items.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


def top_customers_by_segment(
    orders: DataFrame, customer: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k customers by total order value within each market segment
    (groupBy + rank window; deterministic tie-break on custkey)."""
    totals = (
        orders.select("o_custkey", _cents(F.col("o_totalprice")).alias("cents"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("total_cents"), F.count("*").alias("n_orders"))
    )
    ranked = totals.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        totals["o_custkey"] == customer["c_custkey"],
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_cents"), F.asc("c_custkey")
    )
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "c_mktsegment",
            "c_custkey",
            "total_cents",
            "n_orders",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pricing_rollup(lineitem: DataFrame) -> DataFrame:
    """Hierarchical subtotals over (returnflag, linestatus) via ROLLUP —
    grand total + per-flag subtotals + leaf groups in one pass (one shuffle;
    Spark expands grouping sets map-side). ``lvl`` = GROUPING_ID so the
    subtotal rows are distinguishable from genuine NULL keys."""
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("count_order"),
        F.grouping_id().cast("int").alias("lvl"),
    )


def pricing_cube(lineitem: DataFrame) -> DataFrame:
    """All 2^k grouping-set combinations over (returnflag, linestatus)."""
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("count_order"),
        F.grouping_id().cast("int").alias("lvl"),
    )


def supplier_volume(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Shipped quantity per supplier nation — fact scan with two broadcast
    dimension hops (supplier → nation), no fact shuffle before the agg."""
    dims = supplier.join(
        F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"]
    ).select("s_suppkey", "n_name")
    return (
        lineitem.select("l_suppkey", F.col("l_quantity").cast("long").alias("qty"))
        .join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(F.sum("qty").alias("sum_qty"), F.count("*").alias("n_items"))
    )


def brand_volume(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Revenue cents and item count per part brand (fact ⋈ broadcast dim)."""
    return (
        lineitem.select(
            "l_partkey", _cents(F.col("l_extendedprice")).alias("cents")
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(F.sum("cents").alias("revenue_cents"), F.count("*").alias("n_items"))
    )


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    from_date: str = "1996-01-01",
    to_date: str = "1998-01-01",
) -> DataFrame:
    """Bilateral trade volume between two nations by ship year (Q7 shape):
    revenue where the supplier sits in one nation and the customer in the
    other, in either direction.

    Supplier and customer dimension chains (each ⋈ nation) broadcast; the
    only fact shuffle is lineitem ⋈ orders on orderkey. The either-direction
    predicate evaluates after both broadcasts — a 4-way join with exactly
    one exchange, which is the shape that survives 100 TB."""
    nats = F.broadcast(
        nation.where(F.col("n_name").isin(nation_a, nation_b)).select(
            "n_nationkey", "n_name"
        )
    )
    supp = supplier.join(
        nats, supplier["s_nationkey"] == nats["n_nationkey"]
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        nats, customer["c_nationkey"] == nats["n_nationkey"]
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    l = lineitem.where(
        (F.col("l_shipdate") >= _ts(from_date)) & (F.col("l_shipdate") < _ts(to_date))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("int").alias("l_year"),
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        l.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev").alias("revenue_cents"))
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_3",
    region_name: str = "ASIA",
    part_type: str = "PROMO",
) -> DataFrame:
    """One nation's share of a region's market for one part type, by order
    year (Q8 shape). Share is reported as an integer (numerator_cents,
    denominator_cents) pair rather than a float ratio — divisions differ
    in the last ulp across engines, sums of cents never do.

    part (filtered) / supplier⋈nation / customer⋈nation⋈region all
    broadcast; the fact shuffle is lineitem ⋈ orders on orderkey."""
    p = F.broadcast(
        part.where(F.col("p_type") == part_type).select("p_partkey")
    )
    supp = F.broadcast(
        supplier.join(
            F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"]
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = F.broadcast(
        customer.join(
            F.broadcast(nation.alias("n2")),
            customer["c_nationkey"] == F.col("n2.n_nationkey"),
        )
        .join(F.broadcast(region), F.col("n2.n_regionkey") == region["r_regionkey"])
        .where(F.col("r_name") == region_name)
        .select("c_custkey")
    )
    o = orders.select("o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("o_year"))
    return (
        lineitem.select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == target_nation, F.col("rev")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("nation_rev_cents"),
            F.sum("rev").alias("total_rev_cents"),
        )
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    from_date: str = "1997-09-01",
    to_date: str = "1997-10-01",
) -> DataFrame:
    """Promotional revenue share for one ship month (Q14 shape): integer
    (promo_cents, total_cents) instead of the float percentage. One
    broadcast dim join over a month-pruned fact scan — the parquet reader
    sees the shipdate range as a pushed filter."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= _ts(from_date))
            & (F.col("l_shipdate") < _ts(to_date))
        )
        .select(
            "l_partkey",
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("promo_rev_cents"),
            F.sum("rev").alias("total_rev_cents"),
        )
    )


def large_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_qty: int = 200,
) -> DataFrame:
    """Orders whose total lineitem quantity exceeds a threshold, with their
    customer (Q18 shape). The HAVING-filtered groupBy output is small, so
    it re-joins orders on the SAME orderkey partitioning (no second
    exchange under AQE) and the customer dim broadcasts."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > min_qty)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            _cents(F.col("o_totalprice")).alias("total_cents"),
            "sum_qty",
        )
    )


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Revenue under an OR-of-ANDs part/lineitem predicate (Q19 shape).
    Catalyst extracts the common ``p_partkey = l_partkey`` equi-condition
    so the broadcast hash join carries only the residual disjunction —
    the classic test that disjunctive predicates don't degrade a join to
    nested-loop."""
    j = lineitem.select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    ).join(
        F.broadcast(part.select("p_partkey", "p_type", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    cond = (
        ((F.col("p_type") == "SMALL") & F.col("p_size").between(1, 10) & F.col("qty").between(1, 15))
        | ((F.col("p_type") == "MEDIUM") & F.col("p_size").between(1, 20) & F.col("qty").between(10, 30))
        | ((F.col("p_type") == "LARGE") & F.col("p_size").between(1, 30) & F.col("qty").between(20, 50))
    )
    return j.where(cond).agg(
        F.sum("rev").alias("revenue_cents"), F.count("*").alias("n_items")
    )


# ---------------------------------------------------------------------------
# driver registry
# ---------------------------------------------------------------------------


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1995-03-15",
    k: int = 10,
) -> DataFrame:
    """Top-k unshipped orders by revenue for one market segment (Q3 shape):
    broadcast the filtered customer dim, shuffle only lineitem ⋈ orders on
    orderkey, then a global top-k (TakeOrderedAndProject — no full sort).
    Tie-break by (order_date, orderkey) keeps the k-boundary deterministic."""
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < _ts(date)).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    l = lineitem.where(F.col("l_shipdate") > _ts(date)).select(
        "l_orderkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum("rev").alias("revenue_cents"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue_cents",
        )
        .orderBy(F.desc("revenue_cents"), "order_date", "orderkey")
        .limit(k)
    )


def price_percentiles(lineitem: DataFrame) -> DataFrame:
    """Exact discrete percentiles of price cents per returnflag —
    ``percentile_disc`` picks actual data values (smallest with cume_dist ≥
    p), so results are integers and engine-exact, unlike interpolated or
    approximate quantiles. At 100 TB swap in ``approx_percentile`` for the
    single-pass sketch when exactness isn't required; the exact form costs a
    per-group sort."""
    cents = _cents(F.col("l_extendedprice"))
    df = lineitem.select("l_returnflag", cents.alias("cents"))
    return df.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("p50_cents"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("p90_cents"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("p99_cents"),
    )


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Histogram of customers by order count, INCLUDING zero-order customers
    (Q13 shape): left outer join then two aggregations. The outer join
    shuffles on custkey once; the second groupBy is over ≤ max-order-count
    rows per task — negligible. The classic shape for 'how engaged is the
    customer base' at any scale."""
    per_cust = (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#4"
) -> DataFrame:
    """Revenue from unusually small orders of one brand's parts (Q17 shape):
    lineitems with quantity below 20% of that part's average quantity.

    The per-part average is a window over the same partkey shuffle the join
    needs — no second pass, no correlated subquery. The threshold compares
    in exact integers (5·qty·cnt < sum_qty ⟺ qty < avg/5 for integral
    quantities), so the row set is engine-exact — a float average would
    disagree in the last ulp at the boundary."""
    items = lineitem.join(
        F.broadcast(part.where(F.col("p_brand") == brand).select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    w = Window.partitionBy("l_partkey")
    stats = items.withColumn("_cnt", F.count("*").over(w)).withColumn(
        "_sum_qty", F.sum(F.col("l_quantity").cast("long")).over(w)
    )
    small = stats.where(
        5 * F.col("l_quantity").cast("long") * F.col("_cnt") < F.col("_sum_qty")
    )
    return small.agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("small_qty_rev_cents"),
        F.count("*").alias("n_items"),
    )


def queries():
    return {
        "rel_pricing_summary": lambda s, d: pricing_summary(_t(s, d, "lineitem")),
        "rel_revenue_by_nation": lambda s, d: revenue_by_nation(
            _t(s, d, "lineitem"),
            _t(s, d, "orders"),
            _t(s, d, "customer"),
            _t(s, d, "nation"),
            _t(s, d, "region"),
        ),
        "rel_order_priority": lambda s, d: order_priority_count(
            _t(s, d, "orders"), _t(s, d, "lineitem")
        ),
        "rel_top_customers": lambda s, d: top_customers_by_segment(
            _t(s, d, "orders"), _t(s, d, "customer")
        ),
        "rel_pricing_rollup": lambda s, d: pricing_rollup(_t(s, d, "lineitem")),
        "rel_supplier_volume": lambda s, d: supplier_volume(
            _t(s, d, "lineitem"), _t(s, d, "supplier"), _t(s, d, "nation")
        ),
        "rel_brand_volume": lambda s, d: brand_volume(
            _t(s, d, "lineitem"), _t(s, d, "part")
        ),
        "rel_pricing_cube": lambda s, d: pricing_cube(_t(s, d, "lineitem")),
        "rel_shipping_priority": lambda s, d: shipping_priority(
            _t(s, d, "customer"), _t(s, d, "orders"), _t(s, d, "lineitem")
        ),
        "rel_price_percentiles": lambda s, d: price_percentiles(_t(s, d, "lineitem")),
        "rel_cust_order_dist": lambda s, d: customer_order_distribution(
            _t(s, d, "customer"), _t(s, d, "orders")
        ),
        "rel_small_qty_revenue": lambda s, d: small_quantity_revenue(
            _t(s, d, "lineitem"), _t(s, d, "part")
        ),
        "rel_nation_trade_volume": lambda s, d: nation_trade_volume(
            _t(s, d, "lineitem"),
            _t(s, d, "orders"),
            _t(s, d, "customer"),
            _t(s, d, "supplier"),
            _t(s, d, "nation"),
        ),
        "rel_market_share": lambda s, d: market_share(
            _t(s, d, "lineitem"),
            _t(s, d, "orders"),
            _t(s, d, "customer"),
            _t(s, d, "supplier"),
            _t(s, d, "nation"),
            _t(s, d, "region"),
            _t(s, d, "part"),
        ),
        "rel_promo_revenue": lambda s, d: promo_revenue(
            _t(s, d, "lineitem"), _t(s, d, "part")
        ),
        "rel_large_orders": lambda s, d: large_orders(
            _t(s, d, "lineitem"), _t(s, d, "orders"), _t(s, d, "customer")
        ),
        "rel_disjunctive_revenue": lambda s, d: disjunctive_revenue(
            _t(s, d, "lineitem"), _t(s, d, "part")
        ),
    }


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
  sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_base_cents,
  sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS sum_disc_cents,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

_REVENUE_SQL = """
SELECT n_name, sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""

_TOPCUST_SQL = """
WITH totals AS (
  SELECT o_custkey, sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT c_mktsegment, c_custkey, total_cents, n_orders,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY total_cents DESC, c_custkey ASC) AS rank
  FROM totals JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, c_custkey, total_cents, n_orders, rank::INTEGER AS rank
FROM ranked WHERE rank <= 3
"""


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
  count(*) AS count_order,
  grouping(l_returnflag, l_linestatus)::INTEGER AS lvl
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
  count(*) AS count_order,
  grouping(l_returnflag, l_linestatus)::INTEGER AS lvl
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


_SUPPLIER_SQL = """
SELECT n_name, sum(l_quantity::BIGINT)::BIGINT AS sum_qty, count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
"""

_BRAND_SQL = """
SELECT p_brand, sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS revenue_cents,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


_SHIPPING_SQL = """
SELECT l_orderkey AS orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY 1, 2
ORDER BY revenue_cents DESC, order_date, orderkey
LIMIT 10
"""


_PERCENTILE_SQL = """
WITH c AS (
  SELECT l_returnflag, round(l_extendedprice * 100)::BIGINT AS cents FROM lineitem
)
SELECT l_returnflag,
       quantile_disc(cents, 0.5)::BIGINT AS p50_cents,
       quantile_disc(cents, 0.9)::BIGINT AS p90_cents,
       quantile_disc(cents, 0.99)::BIGINT AS p99_cents
FROM c GROUP BY l_returnflag
"""


_CUSTDIST_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count
"""

_SMALLQTY_SQL = """
WITH items AS (
  SELECT l_partkey, l_quantity::BIGINT AS qty, l_extendedprice,
         count(*) OVER (PARTITION BY l_partkey) AS cnt,
         (sum(l_quantity::BIGINT) OVER (PARTITION BY l_partkey))::BIGINT AS sum_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#4'
)
SELECT sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS small_qty_rev_cents,
       count(*) AS n_items
FROM items WHERE 5 * qty * cnt < sum_qty
"""


_TRADE_SQL = """
SELECT supp_nation, cust_nation, l_year, sum(rev)::BIGINT AS revenue_cents
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate)::INTEGER AS l_year,
         round(l_extendedprice * (1 - l_discount) * 100)::BIGINT AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
"""

_MKTSHARE_SQL = """
SELECT EXTRACT(year FROM o_orderdate)::INTEGER AS o_year,
  sum(CASE WHEN sn.n_name = 'NATION_3'
      THEN round(l_extendedprice * (1 - l_discount) * 100)::BIGINT
      ELSE 0 END)::BIGINT AS nation_rev_cents,
  sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS total_rev_cents
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
  AND EXISTS (
    SELECT 1 FROM customer
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region    ON cn.n_regionkey = r_regionkey
    WHERE c_custkey = o_custkey AND r_name = 'ASIA')
GROUP BY 1
"""

_PROMO_SQL = """
SELECT
  sum(CASE WHEN p_type = 'PROMO'
      THEN round(l_extendedprice * (1 - l_discount) * 100)::BIGINT
      ELSE 0 END)::BIGINT AS promo_rev_cents,
  sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS total_rev_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""

_LARGEORD_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity::BIGINT)::BIGINT AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity::BIGINT) > 200
)
SELECT c_name, c_custkey, o_orderkey AS orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(o_totalprice * 100)::BIGINT AS total_cents, sum_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

_DISJUNCT_SQL = """
SELECT sum(rev)::BIGINT AS revenue_cents, count(*) AS n_items
FROM (
  SELECT round(l_extendedprice * (1 - l_discount) * 100)::BIGINT AS rev,
         l_quantity::BIGINT AS qty, p_type, p_size
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
WHERE (p_type = 'SMALL'  AND p_size BETWEEN 1 AND 10 AND qty BETWEEN 1  AND 15)
   OR (p_type = 'MEDIUM' AND p_size BETWEEN 1 AND 20 AND qty BETWEEN 10 AND 30)
   OR (p_type = 'LARGE'  AND p_size BETWEEN 1 AND 30 AND qty BETWEEN 20 AND 50)
"""


def oracle_sql():
    return {
        "rel_pricing_summary": _PRICING_SQL,
        "rel_revenue_by_nation": _REVENUE_SQL,
        "rel_order_priority": _PRIORITY_SQL,
        "rel_top_customers": _TOPCUST_SQL,
        "rel_pricing_rollup": _ROLLUP_SQL,
        "rel_supplier_volume": _SUPPLIER_SQL,
        "rel_brand_volume": _BRAND_SQL,
        "rel_pricing_cube": _CUBE_SQL,
        "rel_shipping_priority": _SHIPPING_SQL,
        "rel_price_percentiles": _PERCENTILE_SQL,
        "rel_cust_order_dist": _CUSTDIST_SQL,
        "rel_small_qty_revenue": _SMALLQTY_SQL,
        "rel_nation_trade_volume": _TRADE_SQL,
        "rel_market_share": _MKTSHARE_SQL,
        "rel_promo_revenue": _PROMO_SQL,
        "rel_large_orders": _LARGEORD_SQL,
        "rel_disjunctive_revenue": _DISJUNCT_SQL,
    }
