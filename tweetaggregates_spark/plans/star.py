"""Beyond-reference surface: star-schema joins and aggregations over the
driver testdata (SURVEY.md §7 M5 — the reference has NO joins, §2.3; all
of this is Spark-built-in capability exposed as engine queries).

Scale design notes (100 TB):
* dimension tables (region/nation/customer/supplier/part) broadcast —
  the autoBroadcastJoinThreshold covers them, and AQE converts at
  runtime if an estimate was off; the fact tables (orders/lineitem)
  never move for dim joins.
* the one fact-fact join (orders <-> lineitem) shuffles on the order
  key; at scale this is the query's cost center — both sides would be
  bucketed by orderkey in a real deployment (store.py does the
  analogous sort-on-write for the aggregate tables).
* every aggregate goes partial -> shuffle -> final (map-side combine);
  sums over doubles run through DECIMAL(18,6) for exact, order-free
  results that hash-match the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweetaggregates_spark.sources.tables import load_table


def _revenue() -> F.Column:
    # one IEEE multiply (identical in both engines), then exact decimal sum
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: lineitem pricing summary by returnflag/linestatus
    with shipdate cutoff."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02 00:00:00").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of unshipped orders for one market
    segment; top 10 by revenue. customer broadcasts; orders-lineitem is
    the shuffle join."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(_revenue()).alias("rev")
    )
    return (
        agg.orderBy(F.desc("rev"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier
    share the nation, one region, one year. All dims broadcast; the
    plan's only shuffles are the fact-fact join and the final group."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — subtotals + grand total
    (grouping-sets surface the reference lacks, SURVEY §2.5 A9)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping-set combos
    (the ROLLUP sibling; SURVEY §2.5 A9)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("cnt"),
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers who never placed an URGENT
    order. The priority filter pushes into the orders scan before the
    anti join; at 100 TB this is a shuffled left-anti on custkey."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS) counterpart, grouped by market segment."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def brand_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate + broadcast dim join: per part brand, distinct
    suppliers/parts seen in lineitem and quantity sum."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot shape): order counts and totals per
    priority, one column per order status. Expressed as FILTER-style
    conditional aggs — one pass, no Spark 'pivot' needed, and the same
    SQL runs on the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    outs = [
        F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"n_{s.lower()}")
        for s in ("O", "F", "P")
    ]
    sums = [
        F.sum(
            F.when(F.col("o_orderstatus") == s, F.col("o_totalprice")).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias(f"total_{s.lower()}")
        for s in ("O", "F", "P")
    ]
    return orders.groupBy("o_orderpriority").agg(*outs, *sums)


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side aggregation — every predicate
    (shipdate range, discount band, quantity cap) pushes into the
    parquet scan, and only the 4 referenced columns are read (pinned by
    test_q6_pushdown_plan: PushedFilters + narrow ReadSchema), then a
    partial/final hash agg with a single-row combine."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in one
    quarter — orders/lineitem fact-fact shuffle join, customer + nation
    broadcast, top 20 by revenue (tiebreak custkey)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(_revenue()).alias("rev")
    )
    return (
        agg.orderBy(F.desc("rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("rev").cast("double").alias("revenue"),
        )
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share in one month — broadcast
    part join, conditional numerator and unconditional denominator in
    ONE aggregation pass (no second scan, no self-join)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = joined.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
                F.lit(0).cast("decimal(18,6)")
            )
        ).alias("promo"),
        F.sum(_revenue()).alias("total"),
    )
    return agg.select(
        F.round(F.lit(100.0) * F.col("promo") / F.col("total"), 6).alias(
            "promo_revenue_pct"
        ),
        F.col("promo").cast("double").alias("promo_revenue"),
        F.col("total").cast("double").alias("total_revenue"),
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 250 — a
    HAVING on the fact-side aggregate, then joins back to orders and
    customer. The heavy groupBy runs BEFORE the joins so only the ~1%
    survivors shuffle into them (aggregate-then-join, the order Catalyst
    cannot derive on its own from the joined form)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_qty")
        )
        .filter(F.col("total_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("o_orderkey"),
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window function over the fact table: top-3 orders by
    totalprice per customer (deterministic tiebreak on orderkey)."""
    from tweetaggregates_spark.operators.topk import rank_topk

    orders = load_table(spark, sf_dir, "orders")
    ranked = rank_topk(
        orders, ["o_custkey"], "o_totalprice", ["o_orderkey"], 3,
        rank_name="order_rank", keep_rank=True,
    )
    return ranked.select(
        "o_custkey", "o_orderkey", "o_totalprice", "order_rank"
    )


def q4_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders with at least
    one LATE lineitem (shipped >30 days after the order date — the
    testdata has no commit/receipt dates, so the late predicate adapts
    Q4's "committed < received" to the columns that exist).

    Plan: left-semi join orders->lineitem on (orderkey AND the non-equi
    lateness condition) — the semi stops probing an order at its first
    late line, and EXISTS never duplicates orders the way an inner
    join + distinct would. groupBy on the 5-value priority afterwards
    is a trivial shuffle."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (the last missing number: 1-22 now all covered):
    for LATE lines shipped in 1996 (>60 days after the order date — the
    testdata has no commit/receipt dates, so lateness adapts as in Q4),
    count high-priority (1-URGENT/2-HIGH) vs low-priority orders per
    l_returnflag (stand-in for the absent l_shipmode). Q12's signature
    is the conditional CASE aggregation over the joined priorities.

    Plan: both filters (date range on lineitem, none on orders) push to
    the scans; one shuffle join on orderkey; the conditional sums fuse
    into a single hash aggregate over 3 groups."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, type, size) part family, excluding a supplier blocklist
    (negative account balance stands in for Q16's complaints filter;
    there is no partsupp table, so supply relationships come from
    lineitem).

    Plan: the blocklist is a broadcast anti-join (6 rows); part is a
    broadcast dim join; the only shuffle is the (brand,type,size)
    aggregate whose countDistinct(suppkey) expands partial-aggregated
    map-side. Top-20 via TakeOrderedAndProject, rank stamped on the
    truncated rows."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != "Brand#45"
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    supply = (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
    )
    agg = supply.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )
    top = agg.orderBy(
        F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
        F.asc("p_size"),
    ).limit(20)
    from pyspark.sql import Window

    # constant-but-unfoldable partition key (pmod(x,1) == 0) on the
    # post-limit 20-row result: the single-partition sort is
    # intentional, not an accidental global window
    w = Window.partitionBy(
        F.pmod(F.col("supplier_cnt"), F.lit(1))
    ).orderBy(
        F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
        F.asc("p_size"),
    )
    return top.withColumn("rank", F.row_number().over(w))


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from an OR of three conjunctive
    (brand, size-range, quantity-range) branches — the classic
    disjunctive-predicate query. Expressed as one boolean expression so
    Catalyst keeps it a single broadcast-join + scan (no union of three
    scans) and pushes the common l_quantity bounds to the parquet
    reader."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b = F.col("p_brand")
    sz = F.col("p_size")
    q = F.col("l_quantity")
    cond = (
        ((b == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & sz.between(1, 50) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between nation pairs by year —
    the classic two-dimension-role join (nation joined twice, once for
    the supplier side and once for the customer side). Both nation
    copies broadcast; the fact-fact orders<->lineitem join is the only
    shuffle, and the directed-pair filter lands on the broadcast side so
    non-qualifying rows die before the group-by."""
    nations = ("NATION_1", "NATION_2", "NATION_3")
    n_supp = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n_cust = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue for one
    part type, per order year. The share is a conditional-sum ratio
    computed in the same single aggregate pass (no second scan, no
    self-join); every dimension broadcasts. Both engines form the two
    DECIMAL sums exactly, cast to double, and perform one IEEE divide,
    so the ratio hash-matches."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    nation_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == region.r_regionkey)
        .join(F.broadcast(nation_supp), F.col("s_nationkey") == F.col("sn_key"))
    )
    vol = _revenue()
    agg = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(
            F.lit(0).cast("decimal(18,6)")
        )).cast("double").alias("nation_volume"),
        F.sum(vol).cast("double").alias("total_volume"),
    )
    return agg.select(
        "o_year",
        F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias(
            "mkt_share"
        ),
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer, keeping the
    zero-order customers — LEFT OUTER join then two cascaded aggregates.
    The outer join shuffles on custkey; the second aggregate's input is
    |customers| rows, so its shuffle is negligible. The order-side
    filter (recent URGENT only) sits on the join's right input, not in
    a post-join WHERE, which is what preserves the zero-order
    customers."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    )
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the global maximum quarter
    revenue — aggregate, then compare against a one-row global scalar.
    The scalar max is broadcast (a 1-row cross join), so no second pass
    over the fact table and no single-partition window over the
    aggregate. Revenue stays DECIMAL until after the equality test, so
    the max comparison is exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_rev"))
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_rev == top.max_rev)
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand,
    where "small" is relative to the part's own average quantity — the
    classic correlated-scalar-subquery decorrelated into an aggregate +
    join-back. The per-part average never materializes as a double:
    the predicate is 5 * qty * n < sum_qty (all DECIMAL/integer math),
    so both engines make the identical exact comparison. The per-part
    aggregate is computed only over the brand's parts (filter pushed
    before the agg) and broadcasts back."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    brand_lines = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_part = brand_lines.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    j = brand_lines.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("agg_partkey")
    ).filter(
        F.col("l_quantity").cast("decimal(18,6)") * 5 * F.col("n_lines")
        < F.col("sum_qty")
    )
    return j.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
            / 7.0
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small_lines"),
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers gone quiet (no order since
    1999) — a global scalar threshold (average positive balance) plus an
    anti join, grouped by nation. The threshold comparison multiplies
    through by the count (bal * n > total) so no engine ever divides:
    the test is IEEE-multiply vs exact-decimal-sum in both engines. The
    1-row scalar broadcasts; the anti join's right side is pre-filtered
    to recent orders, so only those custkeys shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_pos"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    wealthy = (
        customer.join(F.broadcast(pos))
        .filter(F.col("c_acctbal") * F.col("n_pos") > F.col("total_pos"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
    )
    return (
        wealthy.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table in the testdata): for
    each part of one brand, the supplier shipping it at the lowest
    observed unit price — the argmin-per-group join-back pattern. The
    rank runs per-part over the (unit_price, suppkey) order, so ties
    break deterministically; unit price is one IEEE divide identical in
    both engines.

    Scale: the window partitions by partkey — the same shuffle the
    group-by would need, state O(1) per partition via row_number."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_price"), F.asc("l_suppkey")
    )
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        best.join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.round("unit_price", 6).alias("min_unit_price"),
        )
    )


def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates): for orders
    touched by >=2 distinct suppliers, charge the order's LAST shipment
    to its supplier and count how often each supplier is that laggard —
    a per-order argmax plus a multi-supplier qualifier computed in ONE
    window pass (no groupBy-then-join-back second shuffle). Top 10
    laggards with deterministic tiebreak."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    wr = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_shipdate"), F.asc("l_suppkey"), F.asc("l_linenumber")
    )
    marked = li.select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_linenumber"
    ).withColumn(
        "n_supps", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn("rn", F.row_number().over(wr))
    laggards = marked.filter((F.col("n_supps") >= 2) & (F.col("rn") == 1))
    counts = laggards.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("numwait")
    )
    return (
        counts.join(F.broadcast(supplier), counts.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("l_suppkey").alias("s_suppkey"), "s_name", "numwait"
        )
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(10)
    )


def returnflag_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) shape: aggregate three measures per returnflag,
    then rotate the wide row into (measure, total) long form — the
    inverse of order_status_pivot. The unpivot runs AFTER the aggregate,
    so it rotates |groups| x 3 rows, never the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_price"),
        F.sum(F.col("l_discount").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "measure",
        "total",
    )


def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so unit cost proxies as
    10% of p_retailprice): profit per supplier nation per year for one
    part-name family — the many-dimension join + derived-measure
    aggregate. part/supplier/nation broadcast; orders joins lineitem on
    the order key (the only fact-fact shuffle); profit stays DECIMAL to
    the end."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    ).cast("decimal(18,6)")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


def q11_part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: lineitem revenue stands in for
    partsupp stock value): parts whose revenue share is more than twice
    the average per-part share — per-group aggregate HAVING against a
    global scalar, with a scale-free threshold (Q11's own fraction
    scales by 1/SF for the same reason; 1.5x the average per-part
    share keeps a selective-but-nonempty result at every SF). Both
    aggregates come from ONE scan (the global is a second reduction of
    the per-part partials); the 1-row scalar broadcasts, and the
    threshold test multiplies through (2 * rev * n_parts > 3 * total)
    so it is exact decimal on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_revenue()).alias("part_rev")
    )
    total = per_part.agg(
        F.sum("part_rev").alias("total_rev"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("part_rev") * F.col("n_parts") * 2
            > F.col("total_rev") * 3
        )
        .select(
            "l_partkey",
            F.col("part_rev").cast("double").alias("part_revenue"),
        )
    )


def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: shipped quantity stands in for excess
    stock): suppliers who shipped more than half the corpus-wide
    average per-supplier quantity of one part family in one year — an
    aggregate-vs-aggregate semi chain. The per-supplier aggregate is
    tiny (|suppliers| rows); the global average is a 1-row broadcast;
    the threshold multiplies through so no engine divides."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_supp = shipped.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("supp_qty")
    )
    tot = per_supp.agg(
        F.sum("supp_qty").alias("total_qty"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    heavy = (
        per_supp.join(F.broadcast(tot))
        .filter(
            F.col("supp_qty") * 2 * F.col("n_supp") > F.col("total_qty")
        )
    )
    return (
        heavy.join(F.broadcast(supplier), heavy.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.col("supp_qty").cast("double").alias("shipped_qty"),
        )
    )


def order_latency_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-duration distribution: days from order placement to the
    order's LAST shipment, bucketed by week — the fulfillment-latency
    readout over the fact-fact join. One orderkey shuffle (join +
    per-order max fused on the same exchange), then a tiny bucket
    count; all duration math is exact integer days."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    lat_days = F.datediff(F.col("last_ship"), F.col("o_orderdate"))
    return (
        per_order.select(
            F.floor(lat_days / 7).cast("int").alias("latency_weeks")
        )
        .groupBy("latency_weeks")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
