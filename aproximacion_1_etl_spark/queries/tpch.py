"""Query catalog — tpch domain (mechanically moved from queries.py)."""


from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from aproximacion_1_etl_spark.sources.tables import load_table
from .common import *  # noqa: F401,F403



def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority x status (explicit value list =>
    no extra distinct-scan job; stable column set)."""
    o = load_table(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("n_p"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: (status, priority), (status), () in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# ------------------------------------------------------- joins / aggregates


def q_join_enrichment_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension-join chain customer -> nation -> region."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_customers"),
            _fround(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
    )


def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti joins: customers with vs without orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    on = c["c_custkey"] == o["o_custkey"]
    with_orders = (
        c.join(o, on, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_orders"))
    )
    without = (
        c.join(o, on, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without_orders"))
    )
    return (
        with_orders.join(without, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority) with subtotals + grand total."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over customer-key sets from two date halves."""
    o = load_table(spark, sf_dir, "orders")
    cut = "1998-01-01"
    h1 = o.filter(F.col("o_orderdate") < cut).select("o_custkey").distinct()
    h2 = o.filter(F.col("o_orderdate") >= cut).select("o_custkey").distinct()
    n_both = h1.intersect(h2).agg(F.count("*").alias("n_both"))
    n_only_early = h1.exceptAll(h2.distinct()).agg(
        F.count("*").alias("n_only_early")
    )
    return n_both.crossJoin(n_only_early)


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: 20 most expensive orders (deterministic tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderstatus",
        )
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            _fround(F.avg("l_quantity"), 4).alias("avg_qty"),
            _fround(
                F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).cast(
                    "double"
                )
                / F.count("*"),
                4,
            ).alias("avg_price"),
            _fround(
                F.sum(F.col("l_discount").cast("decimal(30,8)")).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top 10 unshipped-revenue orders for one segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = "1998-01-01"
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c["c_custkey"] == o["o_custkey"])
        .filter(F.col("o_orderdate") < cut)
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate") > cut)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            _ts_str("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


def q_q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue per nation where supplier and customer
    share the nation, one region, one date year."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .filter(c["c_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def q_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of orders-per-customer including
    zero-order customers (left outer join + two-level aggregation)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("n_customers")
    )


def q_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: revenue from small-quantity lineitems of one
    brand, threshold correlated on the per-part average quantity. The
    per-part aggregate is tiny relative to lineitem, so it broadcasts
    back — the correlated subquery costs one extra scan, zero extra
    shuffles on the fact side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(F.col("p_brand") == "Brand#4")
        .join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            _fround(
                F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


def q_q18_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds 300 (HAVING
    over a child rollup, semi-joined back to parent + customer)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            _ts_str("o_orderdate").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over the low-cardinality (hence
    hot-keyed) event_type — result identical to the plain group-by."""
    from aproximacion_1_etl_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        salt_on="event_id",
        metrics={
            "n_events": F.lit(1),
            "sum_value": F.col("value"),
        },
        buckets=16,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        _fround(F.col("sum_value").cast("double"), 2).alias("sum_value"),
    )


def q_skew_replicated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicated-dim salted join events->customer, rolled up per
    mktsegment — result identical to the plain equi-join."""
    from aproximacion_1_etl_spark.operators.skew import replicated_skew_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = replicated_skew_join(
        ev, c, fact_key="user_id", dim_key="c_custkey", salt_on="event_id",
        buckets=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        _dsum(F.col("value")).alias("sum_value"),
    )


def q_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average-balance customers with no recent
    orders — scalar aggregate subquery (broadcast single row) + anti
    join against a filtered fact."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1998-06-01"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_custs"),
        _dsum(F.col("c_acctbal")).alias("total_bal"),
    )


def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point: temp-view catalog + spark.sql —
    the same Catalyst plans as the DataFrame API (a CTE + window query
    exercising the SQL parser path end-to-end)."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH yearly AS (
          SELECT o_custkey,
                 year(o_orderdate) AS yr,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 floor(sum(CAST(o_totalprice AS DECIMAL(30,8)))
                       * 100.0 + 0.5) / 100.0 AS spend
          FROM orders GROUP BY 1, 2
        )
        SELECT o_custkey, yr, n_orders,
               CAST(spend AS DOUBLE) AS spend,
               CAST(rank() OVER (PARTITION BY yr ORDER BY spend DESC,
                                 o_custkey ASC) AS BIGINT) AS spend_rank
        FROM yearly
        WHERE yr = 1997
        ORDER BY spend_rank LIMIT 25
        """
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 higher-order array functions: per-order sorted quantity
    array (deterministic collect), filtered/transformed/folded JVM-side
    — no UDFs, no explode-regroup round trip."""
    li = load_table(spark, sf_dir, "lineitem")
    arr = F.array_sort(F.collect_list(F.round("l_quantity", 2)))
    return (
        li.groupBy("l_orderkey")
        .agg(arr.alias("qtys"))
        .select(
            "l_orderkey",
            F.size("qtys").cast("bigint").alias("n_items"),
            F.element_at("qtys", 1).alias("min_qty"),
            F.size(F.filter("qtys", lambda q: q > 25))
            .cast("bigint")
            .alias("n_large"),
            _fround(
                F.aggregate(
                    F.transform("qtys", lambda q: q * F.lit(2.0)),
                    F.lit(0.0),
                    lambda acc, q: acc + q,
                ),
                2,
            ).alias("double_total"),
        )
    )


# ------------------------------------------------- round-2 TPC-H widening
# The testdata star schema lacks partsupp and the shipmode/commitdate/
# receiptdate lineitem columns, so Q12/Q16/Q20 are adapted to the
# available columns (the join/agg SHAPE — the thing being tested — is
# preserved; the predicate columns differ and are documented per query).


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-aggregate — the canonical
    predicate-pushdown probe. All three filters reach the parquet scan
    (PushedFilters in .explain), no join, no shuffle beyond the final
    single-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipping volume between two nations, both
    directions, by ship year. Two aliased broadcast joins of the same
    nation dim (supplier side vs customer side)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("sn_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == pair[0][0]) & (F.col("cust_nation") == pair[0][1]))
            | ((F.col("supp_nation") == pair[1][0]) & (F.col("cust_nation") == pair[1][1]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume")
        )
    )


def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue lost to returns
    (l_returnflag = 'R') in one quarter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")
        )
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
    )


def q_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style (adapted: l_linestatus stands in for the absent
    l_shipmode): per line status, count of high- vs low-priority orders
    shipped in one year — conditional aggregation via CASE inside
    sum."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promo revenue share for one ship month —
    ratio of two conditional decimal sums, broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,8)"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-03-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            _fround(
                (
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", disc).otherwise(
                            F.lit(0).cast("decimal(30,8)")
                        )
                    ).cast("double")
                    / F.sum(disc).cast("double")
                ),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style (adapted: supplier-per-part relationships come
    from lineitem, since the testdata has no partsupp; the 'customer
    complaints' exclusion becomes negative-balance suppliers): distinct
    supplier count per (brand, type, size) bucket with an anti-join
    exclusion list."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad),
            li["l_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(
            (F.col("p_brand") != "Brand#4")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue under three OR'd brand/size/quantity
    predicate groups — exercises disjunctive filter pushdown through a
    broadcast join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    g1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    g2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    g3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 50))
        & (F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(g1 | g2 | g3)
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def q_q20_promo_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style (adapted to lineitem as the part-supplier
    bridge): suppliers who shipped more than 300 units of PROMO parts
    in one year — HAVING rollup semi-joined back to the supplier dim."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    promo_qty = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(
            F.broadcast(p.filter(F.col("p_type") == "PROMO")),
            li["l_partkey"] == p["p_partkey"],
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("promo_qty"))
        .filter(F.col("promo_qty") > 300)
    )
    return (
        s.join(
            F.broadcast(promo_qty),
            s["s_suppkey"] == promo_qty["l_suppkey"],
            "left_semi",
        )
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


def q_q4_late_ship_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style (adapted: the testdata lacks commit/receipt
    dates, so 'late' = some lineitem shipped > 60 days after the order
    date): per order priority, count of orders in one quarter with at
    least one late shipment — EXISTS via left-semi join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(
        o.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == o["o_orderkey"]
    ).filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
    return (
        o.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")
        )
        .join(
            late.select(F.col("l_orderkey").alias("lk")).distinct(),
            F.col("o_orderkey") == F.col("lk"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: NATION_1 suppliers' share of ASIA-customer
    revenue by order year — two nation lookups (supplier side for the
    share numerator, customer side joined through region for the
    market), conditional-sum ratio."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,8)"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            _fround(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
                        F.lit(0).cast("decimal(30,8)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: supplier(s) achieving the maximum quarterly
    revenue — aggregate, then keep the rows equal to the global max
    (scalar-subquery shape via cross-joined max)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["mx"])
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style (adapted to available columns: 'R' return flag
    stands in for late delivery): suppliers of NATION_1 who returned
    lines on multi-supplier orders where NO OTHER supplier returned —
    the Q21 semi-join + anti-join sandwich on a self-referencing
    child."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    # EXISTS: another supplier on the same order (any flag)
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    ).distinct()
    # NOT EXISTS: another supplier who ALSO returned on that order
    l3 = l1.select(
        F.col("l_orderkey").alias("l3_ok"), F.col("l_suppkey").alias("l3_sk")
    ).distinct()
    cand = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_ok"))
            & (F.col("l_suppkey") != F.col("l2_sk")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_ok"))
            & (F.col("l_suppkey") != F.col("l3_sk")),
            "left_anti",
        )
    )
    nat = n.filter(F.col("n_name") == "NATION_1")
    return (
        cand.join(F.broadcast(s), cand["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(nat), s["s_nationkey"] == nat["n_nationkey"], "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


def q_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: events.props JSON parsed to map<string,bigint>
    (not a fixed struct — schema-free key set), then map_keys /
    element access / size."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.size(m).alias("n_props"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
        m.getItem("k").alias("k_val"),
    )


def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse_json ->
    variant_get path extraction — schema-on-read without declaring a
    struct/map, the engine's answer to evolving JSON payloads."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        k.isNotNull().alias("has_k"),
    )


def q_listagg_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg WITHIN GROUP (ordered string aggregation): each
    customer's order-status history as one ordered CSV string."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.expr(
            "listagg(o_orderstatus, ',') "
            "within group (order by o_orderdate, o_orderkey)"
        ).alias("status_seq")
    )


def q_unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot -> unpivot roundtrip: per-priority status counts widened
    to columns (pivot) then melted back to long form (unpivot/melt) —
    both reshape directions of the engine."""
    o = load_table(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
    )
    return (
        wide.unpivot(
            ["o_orderpriority"], statuses, "o_orderstatus", "n_orders"
        )
        .filter(F.col("n_orders").isNotNull())
        .select(
            "o_orderpriority",
            "o_orderstatus",
            F.col("n_orders").cast("bigint").alias("n_orders"),
        )
    )


def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style (adapted: testdata has no partsupp, so supply
    cost(part, supplier) = the minimum extendedprice the pair ever
    traded at in lineitem): for LARGE parts of size < 26, keep only the
    EUROPE supplier(s) offering the per-part minimum cost — the
    correlated-min subquery shape, de-correlated into a per-part min
    aggregate + equality join (Catalyst's own strategy for Q2).
    Region/nation/part filters are applied BEFORE the lineitem
    aggregate so the big scan reduces early; dimension sides broadcast.
    Reference parity: joins of this shape are the SP layer's key-equi
    pattern (DAG_cloudrun_dataflow_sp.py:146-191)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            n["n_regionkey"] == r["r_regionkey"],
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    psel = p.filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") < 26)
    ).select("p_partkey", "p_type")
    cost = (
        li.join(F.broadcast(eu), li["l_suppkey"] == eu["s_suppkey"])
        .join(F.broadcast(psel), li["l_partkey"] == psel["p_partkey"])
        .groupBy("p_partkey", "s_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    # Per-part min via a window over the aggregate's own partitioning
    # (one shuffle on p_partkey) instead of a second groupBy + self
    # equi-join — audited: 2 exchanges total vs 5 for the join form.
    mn = F.min("cost").over(Window.partitionBy("p_partkey"))
    return (
        cost.withColumn("mn", mn)
        .filter(F.col("cost") == F.col("mn"))
        .join(F.broadcast(eu), "s_suppkey")
        .join(F.broadcast(psel), "p_partkey")
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            _fround(F.col("cost"), 2).alias("supply_cost"),
        )
    )


def q_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style (adapted: profit = discounted revenue, no
    supplycost in testdata): per (supplier nation, ship year) profit
    over parts whose name contains 'red' — the classic star join
    (fact x 2 small dims broadcast) feeding a two-key aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pn = p.filter(F.col("p_name").contains("red")).select("p_partkey")
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", "n_name"
    )
    return (
        li.join(F.broadcast(pn), li["l_partkey"] == pn["p_partkey"])
        .join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_profit")
        )
    )


def q_q11_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style (adapted: part 'stock value' = sum of
    extendedprice x quantity traded by NATION_9 suppliers): keep parts
    whose value exceeds 0.01% of the national total — a global scalar
    subquery broadcast against the per-part aggregate. The threshold
    compare happens on exact decimal sums cast to double (identically
    in the oracle) BEFORE display rounding, so the cut is
    engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nat = (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_9")),
            s["s_nationkey"] == n["n_nationkey"],
        )
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(nat), li["l_suppkey"] == nat["s_suppkey"], "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(30,8)"
                )
            ).alias("v")
        )
    )
    tot = val.agg(F.sum("v").cast("double").alias("t"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("v").cast("double") > F.col("t") * 0.0001)
        .select(
            "l_partkey",
            _fround(F.col("v").cast("double"), 2).alias("part_value"),
        )
    )


def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL correlated subquery (Spark 4 SQL surface): per-nation
    top-3 customers by balance, expressed as a lateral per-row subquery
    instead of a window — Catalyst decorrelates it into a ranked join,
    so the SQL sugar costs nothing at scale."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, x.c_name,
               floor(x.c_acctbal * 100.0 + 0.5) / 100.0 AS acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name ASC LIMIT 3) x
        """
    )


def q_qualify_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-style windowed filter in ONE SQL block (the classic
    decision-support shape the suite lacked): per-nation top-2
    suppliers by exact decimal revenue. OSS Spark has no QUALIFY
    keyword, so this is the canonical rewrite — the window in an
    inline subquery, filtered one level up; the DuckDB oracle runs the
    literal QUALIFY form, proving the rewrite IS that semantics.
    Catalyst plans the filter-on-rank as a running TopK per partition
    (WindowGroupLimit pushes rn <= 2 below the sort), so the window
    never materializes full partitions — the form that survives a
    1000-way nation skew at 100 TB."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, s_name,
               floor(CAST(revenue AS DOUBLE) * 100.0 + 0.5) / 100.0
                 AS revenue,
               CAST(rn AS INT) AS rn
        FROM (
          SELECT n.n_name, s.s_name, r.revenue,
                 row_number() OVER (
                   PARTITION BY n.n_name
                   ORDER BY r.revenue DESC, s.s_name ASC) AS rn
          FROM (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(38,6))) AS revenue
            FROM lineitem GROUP BY 1) r
          JOIN supplier s ON s.s_suppkey = r.l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey)
        WHERE rn <= 2
        """
    )


def q_correlated_scalar_subquery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated scalar subquery in SELECT position (TPC-H q17's
    inner shape, surfaced as its own key): each part priced against
    its brand's average retail price, the average written as a
    per-row correlated subquery. Catalyst DECORRELATES it into one
    brand-grain aggregate + an equi-join — the SQL sugar costs one
    shuffle on p_brand, never a per-row subquery execution (the plan
    a naive engine would run |part| times). The subquery is written
    ONCE and the derived flag computed a level up — repeating the
    correlated expression would plan a second identical aggregate.
    Decimal sum / count keeps the average engine-identical."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_brand,
               floor(raw_price * 100.0 + 0.5) / 100.0 AS price,
               floor(raw_avg * 100.0 + 0.5) / 100.0 AS brand_avg_price,
               CASE WHEN raw_price > raw_avg THEN 1 ELSE 0 END
                 AS above_avg
        FROM (
          SELECT p_partkey, p_brand, p_retailprice AS raw_price,
                 (SELECT CAST(sum(CAST(p2.p_retailprice
                                       AS DECIMAL(38,6)))
                              AS DOUBLE) / count(*)
                  FROM part p2
                  WHERE p2.p_brand = p.p_brand) AS raw_avg
          FROM part p)
        """
    )


def q_sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT clause (the wide->long inverse of pivot_status,
    §2.6/§2.7 surface): per-nation customer metrics computed ONCE in
    wide form, then unpivoted to (nation, metric, value) rows — the
    report-friendly long grain. UNPIVOT is a zero-shuffle projection
    (each wide row explodes to |metrics| rows map-side); the only
    exchange is the metric aggregate itself. Values are decimal-exact
    before the final rounding; both engines run their native UNPIVOT
    syntax."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, metric,
               floor(val * 100.0 + 0.5) / 100.0 AS value
        FROM (
          SELECT n.n_name,
                 CAST(count(*) AS DOUBLE) AS n_customers,
                 CAST(sum(CAST(c.c_acctbal AS DECIMAL(38,6)))
                      AS DOUBLE) AS total_balance,
                 CAST(max(c.c_acctbal) AS DOUBLE) AS max_balance
          FROM customer c
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          GROUP BY 1)
        UNPIVOT (val FOR metric IN (
          n_customers, total_balance, max_balance))
        """
    )


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 SQL surface): ancestor chains over a
    derived hierarchy (nation n reports to n-5), returning each node's
    root and depth — the fixed-point iteration dup_clusters implements
    with a DataFrame loop, here in pure SQL."""
    from aproximacion_1_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
          SELECT n_nationkey AS node, n_nationkey AS root,
                 0 AS depth
          FROM nation WHERE n_nationkey < 5
          UNION ALL
          SELECT n.n_nationkey, a.root, a.depth + 1
          FROM nation n JOIN anc a ON n.n_nationkey - 5 = a.node
        )
        SELECT node, root, CAST(depth AS INT) AS depth FROM anc
        """
    )


def q_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 collations: a mixed-case
    event_type column (upper-cased on even ids) groups under
    ``UTF8_LCASE`` collation without materializing a lowercased copy —
    collation-aware comparison happens inside the hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(
            F.col("event_id") % 2 == 0, F.upper("event_type")
        ).otherwise(F.col("event_type")).alias("type_mixed"),
        "value",
    )
    g = mixed.groupBy(
        F.collate(F.col("type_mixed"), "UTF8_LCASE").alias("k")
    ).agg(
        F.count("*").alias("n"),
        _dsum(F.col("value")).alias("total_value"),
    )
    # emit a deterministic representative (the collated group may pick
    # any case variant as its key value)
    return g.select(
        F.lower(F.col("k")).alias("event_type"),
        "n",
        "total_value",
    )


def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable count-min sketch (§2.6 sketch family, with
    hll_sketch_union): per-partition CMS partials merge associatively in
    the JVM aggregate, then the driver queries the merged sketch for
    each candidate key — frequency estimation with fixed memory no
    matter the stream size. Estimates are >= true counts (one-sided
    error) and within eps*N; both claims ride in the hashed output as a
    boolean next to the exact counts (DuckDB has no CMS, so the oracle
    emits the exact counts and TRUE — a broken bound now fails the
    driver gate, not just the pytest)."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(
        F.count_min_sketch(
            F.col("event_type"), F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("sketch")
    ).collect()[0]["sketch"]
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk)
    )
    rows = [(t, int(cms.estimateCount(t))) for t in sorted(types)]
    est_df = spark.createDataFrame(
        rows, "event_type STRING, est_count BIGINT"
    )
    true_cnt = ev.groupBy("event_type").agg(
        F.count("*").alias("true_cnt")
    )
    totals = true_cnt.agg(F.sum("true_cnt").alias("n_total"))
    return (
        true_cnt.join(F.broadcast(est_df), "event_type")
        .crossJoin(F.broadcast(totals))
        .select(
            "event_type",
            F.col("true_cnt").cast("bigint").alias("true_cnt"),
            (
                (F.col("est_count") >= F.col("true_cnt"))
                & (
                    F.col("est_count")
                    <= F.col("true_cnt")
                    + F.lit(0.001) * F.col("n_total")
                    + F.lit(1)
                )
            ).alias("est_ok"),
        )
    )


def q_approx_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy-hitter aggregate: top event types with
    estimated counts from a bounded-memory summary. With maxItemsTracked
    >= the distinct count the estimate is exact, so the oracle checks it
    against plain GROUP BY counts."""
    ev = load_table(spark, sf_dir, "events")
    topk = ev.agg(
        F.expr("approx_top_k(event_type, 10, 10000)").alias("tk")
    ).select(F.explode("tk").alias("e"))
    return topk.select(
        F.col("e.item").alias("event_type"),
        F.col("e.count").cast("bigint").alias("n"),
    )


def q_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 skew diagnosis — measure BEFORE salting: for every
    candidate join key in the schema, the key-frequency profile that
    decides the join strategy (max key rows, skew ratio vs the mean
    key, top-key share). Each family is one groupBy + one 1-row
    aggregate; the report is |families| rows. The `is_skewed` flag
    (ratio > 10) is what the salted-agg / replicated-join operators
    key off at 100 TB."""
    families = [
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("events.user_id", "events", "user_id"),
    ]
    out = None
    for label, table, key in families:
        t = load_table(spark, sf_dir, table)
        per_key = t.groupBy(F.col(key)).agg(F.count("*").alias("c"))
        stats = per_key.agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_key_rows"),
        ).select(
            F.lit(label).alias("join_key"),
            "n_rows",
            "n_keys",
            "max_key_rows",
            _fround(
                F.col("max_key_rows").cast("double")
                / (
                    F.col("n_rows").cast("double")
                    / F.col("n_keys").cast("double")
                ),
                2,
            ).alias("skew_ratio"),
            _fround(
                F.col("max_key_rows").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("top_key_share"),
        )
        stats = stats.withColumn(
            "is_skewed", (F.col("skew_ratio") > 10.0).cast("int")
        )
        out = stats if out is None else out.unionByName(stats)
    return out


def q_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner-grade join-cardinality diagnostic: for each candidate
    join, the textbook uniform-NDV estimate |R|x|S|/max(ndv_R, ndv_S)
    next to the EXACT output size — computed without materializing the
    join (sum of per-key count products, one aggregate per side + a
    key-count join, so the "actual" costs two shuffled aggregates on
    keys, never |R join S| rows). The FK joins estimate exactly; the
    many-many nation join shows the uniformity error a real optimizer
    carries into its plan choice — the number AQE's runtime stats are
    there to correct.
    """

    def one(name, left, lk, right, rk):
        ls = left.agg(
            F.count("*").alias("n_left"),
            F.count_distinct(F.col(lk)).alias("ndv_left"),
        )
        rs = right.agg(
            F.count("*").alias("n_right"),
            F.count_distinct(F.col(rk)).alias("ndv_right"),
        )
        cl = left.groupBy(F.col(lk).alias("k")).agg(F.count("*").alias("cl"))
        cr = right.groupBy(F.col(rk).alias("k")).agg(F.count("*").alias("cr"))
        actual = cl.join(cr, "k").agg(
            F.sum(F.col("cl") * F.col("cr")).alias("actual_rows")
        )
        est = F.floor(
            F.col("n_left").cast("double")
            * F.col("n_right").cast("double")
            / F.greatest("ndv_left", "ndv_right").cast("double")
        ).cast("bigint")
        return (
            ls.crossJoin(F.broadcast(rs))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(name).alias("join_name"),
                F.col("n_left").cast("bigint").alias("n_left"),
                F.col("n_right").cast("bigint").alias("n_right"),
                F.col("ndv_left").cast("bigint").alias("ndv_left"),
                F.col("ndv_right").cast("bigint").alias("ndv_right"),
                est.alias("est_rows"),
                F.col("actual_rows").cast("bigint").alias("actual_rows"),
                _fround(
                    (est.cast("double") - F.col("actual_rows"))
                    / F.col("actual_rows")
                    * 100.0,
                    2,
                ).alias("err_pct"),
            )
        )

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        one("orders_lineitem", o, "o_orderkey", li, "l_orderkey")
        .unionByName(one("customer_orders", c, "c_custkey", o, "o_custkey"))
        .unionByName(
            one("customer_supplier_nation", c, "c_nationkey", s, "s_nationkey")
        )
    )


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 concentration analysis (the Lorenz/80-20 report): per
    market segment, how concentrated is revenue across customers —
    top-decile revenue share and the minimum number of customers
    covering 80% of segment revenue. One fact aggregation to customer
    grain, one per-segment rank window over the |customers| aggregate
    (two-phase bucketed rank at fact scale — grouped_quantiles
    machinery), cumulative decimal sums; the 80% cut compares
    5*cum >= 4*total in EXACT decimal so the boundary can't flap
    between engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)")).alias(
                "r"
            )
        )
    )
    w_rank = Window.partitionBy("c_mktsegment").orderBy(
        F.col("r").desc(), F.col("c_custkey").asc()
    )
    w_seg = Window.partitionBy("c_mktsegment")
    ranked = rev.select(
        "c_mktsegment",
        "r",
        F.row_number().over(w_rank).alias("rk"),
        F.count("*").over(w_seg).alias("n_cust"),
        F.sum("r").over(w_seg).alias("tot"),
        F.sum("r")
        .over(
            w_rank.rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum"),
    )
    return ranked.groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(
        F.max("n_cust").cast("bigint").alias("n_customers"),
        _fround(F.max("tot").cast("double"), 2).alias("total_revenue"),
        _fround(
            F.sum(
                F.when(
                    F.col("rk") <= F.ceil(F.col("n_cust") / 10),
                    F.col("r"),
                )
            ).cast("double")
            / F.max("tot").cast("double"),
            4,
        ).alias("top_decile_share"),
        F.min(
            F.when(
                F.col("cum") * 5 >= F.col("tot") * 4, F.col("rk")
            )
        )
        .cast("bigint")
        .alias("n_for_80pct"),
    )


def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 hierarchy ratio-to-parent OLAP report: revenue per
    (region, nation) with each nation's share of its region and of
    the grand total — the drill-down idiom every BI layer issues. One
    fact aggregation to the leaf grain, then two windows over the
    |nations| aggregate (parent and grand partitions) — ratios never
    touch the fact table again. Decimal revenue sums; shares are one
    IEEE division each."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(
            "s_suppkey",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )
    leaf = (
        li.join(F.broadcast(dim), li["l_suppkey"] == dim["s_suppkey"])
        .groupBy("region", "nation")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                ).cast("decimal(38,12)")
            ).alias("rev")
        )
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return leaf.select(
        "region",
        "nation",
        _fround(F.col("rev").cast("double"), 2).alias("revenue"),
        _fround(
            F.col("rev").cast("double")
            / F.sum("rev").over(w_region).cast("double"),
            6,
        ).alias("share_of_region"),
        _fround(
            F.col("rev").cast("double")
            / F.sum("rev").over(w_all).cast("double"),
            6,
        ).alias("share_of_total"),
    )


def q_drill_across(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 DRILL-ACROSS (Kimball): two fact tables at different
    grains — order revenue and event activity — aggregated SEPARATELY
    to the conformed customer-segment dimension, then merged by a full
    outer join on the conformed key. Never a fact-to-fact join: each
    fact shuffles once to the dimension grain (|segments| rows), the
    merge is segment-sized. The cross-process ratio (revenue per
    event) is derivable only at the conformed grain."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    seg = F.broadcast(
        c.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    )
    f_orders = (
        o.join(seg, o["o_custkey"] == F.col("c_custkey"))
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("order_revenue"),
        )
    )
    f_events = (
        ev.join(seg, ev["user_id"] == F.col("c_custkey"))
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            _dsum(F.coalesce(F.col("value"), F.lit(0.0))).alias(
                "event_value"
            ),
        )
    )
    j = f_orders.join(f_events, "segment", "full_outer")
    # coalesce BEFORE the ratio so a segment present in only one fact
    # yields 0-valued measures on both engine and oracle sides
    rev0 = F.coalesce("order_revenue", F.lit(0.0))
    return j.select(
        "segment",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        rev0.alias("order_revenue"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("event_value", F.lit(0.0)).alias("event_value"),
        _fround(
            rev0 / F.nullif(F.col("n_events").cast("double"), F.lit(0.0)),
            2,
        ).alias("revenue_per_event"),
    )


def q_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 PRICE-VOLUME-MIX waterfall (the FP&A bridge report): the
    year-over-year revenue change per brand decomposed into price
    effect (p1-p0)*q0, volume effect p0*(q1-q0), and the cross/mix
    term (p1-p0)*(q1-q0) — the three sum exactly (in IEEE, identically
    on both engines) to p1*q1 - p0*q0. Each period aggregates the
    facts ONCE to the brand grain (decimal revenue/quantity sums);
    average prices and effects are scalar algebra on the
    |brands|-sized merge. Brands must trade in both periods (inner
    merge) — a one-sided brand has no decomposition."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    facts = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.year("l_shipdate").alias("yr"),
        "l_quantity",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "net"
        ),
    )

    def per_year(yr: int, sfx: str) -> DataFrame:
        return (
            facts.filter(F.col("yr") == yr)
            .groupBy("p_brand")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(38,12)"))
                .cast("double")
                .alias("q" + sfx),
                F.sum(F.col("net").cast("decimal(38,12)"))
                .cast("double")
                .alias("r" + sfx),
            )
        )

    j = per_year(1996, "0").join(per_year(1997, "1"), "p_brand")
    p0 = F.col("r0") / F.col("q0")
    p1 = F.col("r1") / F.col("q1")
    return j.select(
        "p_brand",
        _fround(F.col("r0"), 2).alias("rev_1996"),
        _fround(F.col("r1"), 2).alias("rev_1997"),
        _fround((p1 - p0) * F.col("q0"), 2).alias("price_effect"),
        _fround(p0 * (F.col("q1") - F.col("q0")), 2).alias("volume_effect"),
        _fround(
            (p1 - p0) * (F.col("q1") - F.col("q0")), 2
        ).alias("mix_effect"),
    )


def q_topn_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 TOP-N + OTHER rollup (the BI idiom behind every pie
    chart): top-5 brands by decimal-exact net revenue, everything else
    collapsed into one 'OTHER' row, with exact shares. One fact
    aggregation to brand grain, one rank window over the |brands|
    aggregate, one re-aggregation of the relabeled rows — facts
    scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    brands = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                ).cast("decimal(38,12)")
            ).alias("rev")
        )
    )
    w = Window.orderBy(F.col("rev").desc(), F.col("p_brand").asc())
    labeled = brands.withColumn(
        "grp",
        F.when(F.row_number().over(w) <= 5, F.col("p_brand")).otherwise(
            "OTHER"
        ),
    )
    rolled = labeled.groupBy("grp").agg(
        F.sum("rev").alias("rev"),
        F.count("*").cast("bigint").alias("n_brands"),
    )
    return rolled.select(
        F.col("grp").alias("brand"),
        "n_brands",
        _fround(F.col("rev").cast("double"), 2).alias("revenue"),
        _fround(
            F.col("rev").cast("double")
            / F.sum(F.col("rev"))
            .over(Window.partitionBy())
            .cast("double"),
            6,
        ).alias("share"),
    )


__all__ = [
    "q_pivot_status",
    "q_grouping_sets",
    "q_join_enrichment_dims",
    "q_join_semi_anti",
    "q_agg_rollup",
    "q_agg_cube",
    "q_set_ops",
    "q_topk_orders",
    "q_pricing_summary",
    "q_q3_shipping_priority",
    "q_q5_nation_revenue",
    "q_q13_order_count_distribution",
    "q_q17_small_qty_revenue",
    "q_q18_big_spenders",
    "q_skew_salted_agg",
    "q_skew_replicated_join",
    "q_q22_idle_customers",
    "q_sql_surface",
    "q_array_funcs",
    "q_q6_forecast_revenue",
    "q_q7_nation_volume",
    "q_q10_returned_items",
    "q_q12_priority_lines",
    "q_q14_promo_revenue",
    "q_q16_supplier_count",
    "q_q19_disjunctive_revenue",
    "q_q20_promo_shippers",
    "q_q4_late_ship_orders",
    "q_q8_market_share",
    "q_q15_top_supplier",
    "q_q21_sole_returner",
    "q_map_props",
    "q_variant_props",
    "q_listagg_statuses",
    "q_unpivot_status_counts",
    "q_q2_min_cost_supplier",
    "q_q9_product_profit",
    "q_q11_part_value",
    "q_lateral_topn",
    "q_qualify_window_filter",
    "q_correlated_scalar_subquery",
    "q_sql_unpivot",
    "q_recursive_cte",
    "q_collated_group",
    "q_heavy_hitters_cms",
    "q_approx_topk_types",
    "q_join_skew_report",
    "q_join_cardinality_estimate",
    "q_revenue_concentration",
    "q_share_of_parent",
    "q_drill_across",
    "q_price_volume_mix",
    "q_topn_with_other",
]
