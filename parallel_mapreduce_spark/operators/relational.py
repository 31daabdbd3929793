"""Core relational operators, declared as Catalyst-optimizable DataFrame plans.

The reference can express any single MapReduce round via its Mapper/Reducer
function slots (``src/mapreduce.h:11-14``); everything here is the canonical
relational derivation of that capability surface (SURVEY.md §2.2/§2.3), built
on DataFrame ops so Catalyst supplies pushdown, pruning, join selection, and
partial aggregation — the optimizations the reference lacks entirely
(SURVEY.md §4.1).

Scale notes (100 TB posture), validated by plan tests in tests/test_plans.py:
- bounded-cardinality dimensions (region=5, nation=25, literal band tables,
  1-row scalar aggregates) are explicitly broadcast: no shuffle of the fact
  side, at any scale. Tables that grow with the data (customer/supplier/
  part and frames derived from them) carry NO broadcast hint — Spark's size
  threshold + AQE broadcast them while they fit (so local plans still show
  BroadcastHashJoin) and degrade to a shuffle join when they outgrow an
  executor, instead of OOMing on a forced broadcast;
- fact-fact joins (orders x lineitem) shuffle on the join key and rely on AQE
  for skew splitting + partition coalescing;
- top-k is orderBy().limit(k) => TakeOrderedAndProject, never a global sort
  materialization;
- aggregates are partial (map-side combine) by construction.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.sources import load_table, register_views

_SHIP_CUTOFF = "1998-09-02 00:00:00"


def _ts(lit: str):
    return F.to_timestamp(F.lit(lit))


# --------------------------------------------------------------------------
# Projection + filter (pushdown demo: both reach the parquet scan).
# --------------------------------------------------------------------------
@query(
    "filter_project",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS total
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 400000
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 400000))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("total"))
    )


# --------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: the full scalar-aggregate set with partial
# aggregation (the reference's COUNT-only reducer, main.c:30-40, generalized).
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_SHIP_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _ts(_SHIP_CUTOFF))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Aggregate breadth: min/max/avg/sum + exact distinct counts.
# --------------------------------------------------------------------------
@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(MIN(l_extendedprice), 4) AS min_price,
           ROUND(MAX(l_extendedprice), 4) AS max_price,
           ROUND(AVG(l_discount), 4) AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )


# --------------------------------------------------------------------------
# TPC-H Q3-style: customer x orders x lineitem, revenue top-10.
# customer->orders and orders->lineitem are fact joins (shuffle on key);
# the final top-k is TakeOrdered, not a global sort.
# --------------------------------------------------------------------------
@query(
    "q3_top_revenue",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-01-01 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-01-01 00:00:00")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey"), orders.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q5-style: six-table join; all dimension sides broadcast.
# --------------------------------------------------------------------------
@query(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY n_name
    """,
    headline=True,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("2000-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# --------------------------------------------------------------------------
@query(
    "semi_join_big_spenders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_no_f_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def anti_join_no_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    f_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        f_orders, cust.c_custkey == f_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Outer join + null-safe aggregation.
# --------------------------------------------------------------------------
@query(
    "left_join_open_orders",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_open,
           ROUND(COALESCE(SUM(o_totalprice), 0), 4) AS open_total
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'O') o
      ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def left_join_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_open"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("open_total"),
        )
    )


# --------------------------------------------------------------------------
# Full-outer join + null-side aggregation — completes the join-kind matrix
# (inner/left/semi/anti/range/asof/broadcast/salted/bucketed + full outer).
# Both inputs are filtered subsets, so unmatched keys exist on BOTH sides
# and every row class (both / customer_only / order_only) is visible in the
# output. Scale shape: a full outer can never broadcast (both sides must
# keep unmatched rows), so this is the one join kind that is always a
# key-partitioned shuffle join — AQE handles skew; the pre-aggregation on
# the orders side keeps the shuffled payload one row per customer.
# --------------------------------------------------------------------------
@query(
    "full_outer_customer_orders",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    o AS (
      SELECT o_custkey, COUNT(*) AS n_big,
             ROUND(SUM(o_totalprice), 4) AS spend
      FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
    )
    SELECT COALESCE(c_custkey, o_custkey) AS cust_key,
           c_mktsegment AS segment,
           COALESCE(n_big, 0) AS n_big_orders,
           COALESCE(spend, 0.0) AS big_spend,
           CASE WHEN c_custkey IS NULL THEN 'order_only'
                WHEN o_custkey IS NULL THEN 'customer_only'
                ELSE 'both' END AS side
    FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
    """,
)
def full_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_mktsegment")
    )
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_big"),
            F.round(F.sum("o_totalprice"), 4).alias("spend"),
        )
    )
    return cust.join(big, cust.c_custkey == big.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("cust_key"),
        F.col("c_mktsegment").alias("segment"),
        F.coalesce("n_big", F.lit(0).cast("long")).alias("n_big_orders"),
        F.coalesce("spend", F.lit(0.0)).alias("big_spend"),
        F.when(F.col("c_custkey").isNull(), F.lit("order_only"))
        .when(F.col("o_custkey").isNull(), F.lit("customer_only"))
        .otherwise(F.lit("both"))
        .alias("side"),
    )


# --------------------------------------------------------------------------
# Range (non-equi) join against a literal band table — broadcast nested loop
# on a 3-row side, i.e. free at any scale.
# --------------------------------------------------------------------------
_BANDS = [("low", 0.0, 15.0), ("mid", 15.0, 35.0), ("high", 35.0, 51.0)]


@query(
    "range_join_quantity_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 15.0), ('mid', 15.0, 35.0), ('high', 35.0, 51.0)
    )
    SELECT band, COUNT(*) AS cnt, ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
)
def range_join_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    cond = (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi"))
    return (
        li.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
    )


# --------------------------------------------------------------------------
# Windows: ranking, running aggregate, lag.
# --------------------------------------------------------------------------
@query(
    "window_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS total,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
    WHERE rk <= 3
    """,
    headline=True,
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("total"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


@query(
    "window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW), 4) AS running_total
    FROM orders
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_total"),
    )


@query(
    "window_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(COALESCE(date_diff('day', prev_date, o_orderdate), -1) AS BIGINT)
             AS days_since_prev
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev_date
          FROM orders)
    """,
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(F.datediff(F.col("o_orderdate"), prev), F.lit(-1))
        .cast("long")
        .alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Set operations (union / intersect / except), D7 generalized.
# --------------------------------------------------------------------------
_BUILDING = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_BIG_ORDER = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000"


def _setop_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a, b


@query("set_union", oracle=f"{_BUILDING} UNION {_BIG_ORDER}")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    a, b = _setop_sides(spark, sf_dir)
    return a.union(b).distinct()


@query("set_intersect", oracle=f"{_BUILDING} INTERSECT {_BIG_ORDER}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    a, b = _setop_sides(spark, sf_dir)
    return a.intersect(b)


@query("set_except", oracle=f"{_BUILDING} EXCEPT {_BIG_ORDER}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    a, b = _setop_sides(spark, sf_dir)
    return a.exceptAll(b).distinct()


# --------------------------------------------------------------------------
# Multi-dimensional aggregation: rollup / cube / grouping sets.
# --------------------------------------------------------------------------
@query(
    "rollup_flag_status",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS cnt, ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "cnt",
            "sum_qty",
        )
    )


@query(
    "cube_flag_status",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS cnt, ROUND(SUM(l_extendedprice), 4) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "cnt",
            "sum_price",
        )
    )


@query(
    "grouping_sets_segment_status",
    oracle="""
    SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS cnt
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus))
    """,
)
def grouping_sets_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS cnt
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus))
        """
    )


# --------------------------------------------------------------------------
# Global top-k: TakeOrderedAndProject (no full sort).
# --------------------------------------------------------------------------
@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 4).alias("total"))
        .limit(15)
    )


# --------------------------------------------------------------------------
# Pivot (wide conditional aggregation).
# --------------------------------------------------------------------------
@query(
    "pivot_status_by_segment",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey)
    pivoted = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "c_mktsegment",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


# --------------------------------------------------------------------------
# Scalar function library (string / date / math), SURVEY.md §2.3: the
# reference's only scalar op is strsep tokenization.
# --------------------------------------------------------------------------
@query(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 1, 3)) AS pri3,
           CAST(strlen(o_orderstatus) AS BIGINT) AS status_len,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           ROUND(sqrt(o_totalprice), 4) AS sqrt_total,
           ROUND(abs(o_totalprice - 250000.0), 4) AS dev
    FROM orders
    WHERE o_orderkey < 200
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") < 200).select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("pri3"),
        F.length("o_orderstatus").cast("long").alias("status_len"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_total"),
        F.round(F.abs(F.col("o_totalprice") - 250000.0), 4).alias("dev"),
    )


# --------------------------------------------------------------------------
# Time-series rollup: monthly revenue (date_format group key).
# --------------------------------------------------------------------------
@query(
    "monthly_revenue",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 4).alias("revenue"))


# --------------------------------------------------------------------------
# Fact-dimension join with explicit broadcast (part is the dimension).
# --------------------------------------------------------------------------
@query(
    "brand_volume",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
    )


# --------------------------------------------------------------------------
# HAVING (post-aggregation filter).
# --------------------------------------------------------------------------
@query(
    "having_frequent_customers",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def having_frequent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


# --------------------------------------------------------------------------
# Sketch aggregation: approx_count_distinct (HLL). Rows-only — DuckDB's
# approx_count_distinct uses a different sketch, values can't hash-match;
# accuracy vs exact is asserted in tests/test_plans.py.
# --------------------------------------------------------------------------
@query(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS hll_within_15pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch vs exact distinct. The sketch estimate itself is
    engine-specific (DuckDB cannot replay Spark's HLL), but the check is
    still VALUE-level: the exact count is compared directly, and the
    engine asserts the sketch lands within 15% of it (default rsd=0.05 ->
    3 sigma; measured error is ~2.6% at every sf) — the oracle pins that
    boolean to TRUE. A degraded sketch now fails the hash instead of
    passing a rows-only count."""
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.countDistinct("l_partkey")
    approx = F.approx_count_distinct("l_partkey")
    return li.groupBy("l_returnflag").agg(
        exact.cast("long").alias("exact_parts"),
        (F.abs(approx - exact) <= 0.15 * exact).alias("hll_within_15pct"),
    )


# --------------------------------------------------------------------------
# Exact percentiles (Spark `percentile` == DuckDB `quantile_cont`, both
# linear-interpolated). The approximate scale path is percentile_approx.
# --------------------------------------------------------------------------
@query(
    "price_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
    )


# --------------------------------------------------------------------------
# UNION ALL (bag semantics, contrast with set_union).
# --------------------------------------------------------------------------
@query(
    "set_union_all",
    oracle=f"{_BUILDING} UNION ALL {_BIG_ORDER}",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    a, b = _setop_sides(spark, sf_dir)
    return a.union(b)


# --------------------------------------------------------------------------
# Correlated-scalar-subquery pattern: customers above their nation's average
# balance (expressed as a broadcast join against the per-group aggregate —
# the scalable decorrelated form).
# --------------------------------------------------------------------------
@query(
    "cust_above_nation_avg",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 4) AS acctbal
    FROM customer c
    JOIN (SELECT c_nationkey, AVG(c_acctbal) AS nav
          FROM customer GROUP BY c_nationkey) n
      ON c.c_nationkey = n.c_nationkey
    WHERE c.c_acctbal > n.nav
    """,
)
def cust_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nav"))
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nav"))
        .select("c_custkey", F.round("c_acctbal", 4).alias("acctbal"))
    )


# --------------------------------------------------------------------------
# Multi-column dedup (dropDuplicates on a key subset).
# --------------------------------------------------------------------------
@query(
    "orders_status_priority_dedup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, MIN(o_orderkey) AS first_orderkey,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def orders_status_priority_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.min("o_orderkey").alias("first_orderkey"),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# Fact-fact join + date arithmetic: shipping latency per order month.
# --------------------------------------------------------------------------
@query(
    "ship_latency_by_month",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_lines,
           ROUND(AVG(CAST(date_diff('day', o_orderdate, l_shipdate) AS DOUBLE)), 4)
             AS avg_latency_days
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def ship_latency_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.avg(F.datediff("l_shipdate", "o_orderdate").cast("double")), 4
            ).alias("avg_latency_days"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q6-style forecast revenue: pure scan + conditional filter + scalar
# aggregate. The whole WHERE clause reaches the parquet reader as pushed
# filters — the plan is scan -> partial agg -> final agg, no shuffle of data
# rows at all (only the one-row partials).
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1995-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-01-01 00:00:00"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q4-style priority check: EXISTS semi-join — orders in a window that
# had at least one line shipped after the order date, counted by priority.
# The semi-join shuffles both sides on orderkey; AQE picks broadcast when the
# filtered order window is small enough.
# --------------------------------------------------------------------------
@query(
    "q4_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-07-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --------------------------------------------------------------------------
# TPC-H Q14-style promo share: conditional aggregation over a fact-dim join
# (part is the dim side -> broadcast; one shuffle-free pass over lineitem).
# --------------------------------------------------------------------------
@query(
    "q14_promo_share",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1995-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1995-10-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.lit(100.0) * F.sum(promo_rev) / F.sum(rev), 4).alias(
                "promo_share"
            )
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q18-style large-volume customers: aggregate-then-join. The heavy
# per-order quantity aggregation runs FIRST (one shuffle on orderkey, output
# is orders-sized), the selective HAVING shrinks it to a handful of rows, and
# only then do the joins happen — by construction the join input is tiny.
# --------------------------------------------------------------------------
Q18_MIN_QTY = 150


@query(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) AS orderdate_epoch,
           ROUND(o_totalprice, 4) AS totalprice,
           ROUND(total_qty, 4) AS total_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > {Q18_MIN_QTY}
    ) big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    headline=True,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big
        .join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round("total_qty", 4).alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q19-style disjunctive predicates: OR-of-ANDs across join sides.
# Catalyst extracts the common `p_partkey = l_partkey` conjunct so this stays
# an equi-join (broadcast on part) with the disjunction as a post-join
# filter — not a nested-loop join.
# --------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# RANGE-frame window: trailing-7-day spend per customer — a value-based
# frame (range on event-time seconds), complementing the row-based frames in
# window_running_spend. One shuffle on custkey serves the whole analytic.
# --------------------------------------------------------------------------
@query(
    "window_trailing_7d_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ), 4) AS trailing_7d
    FROM orders
    """,
)
def window_trailing_7d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("trailing_7d"),
    )


# --------------------------------------------------------------------------
# Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicity-aware,
# implemented by Spark as an aggregate of per-side counts — one shuffle, no
# join explosion.
# --------------------------------------------------------------------------
@query("set_intersect_all", oracle=f"{_BUILDING} INTERSECT ALL {_BIG_ORDER}")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    a, b = _setop_sides(spark, sf_dir)
    return a.intersectAll(b)


@query("set_except_all", oracle=f"{_BUILDING} EXCEPT ALL {_BIG_ORDER}")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    a, b = _setop_sides(spark, sf_dir)
    return a.exceptAll(b)


# --------------------------------------------------------------------------
# Remaining analytic functions: ntile deciles + nth_value + cume_dist over
# one customer-partitioned window (one exchange serves all three).
# --------------------------------------------------------------------------
@query(
    "window_ntile_nth",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER w AS spend_quartile,
           ROUND(nth_value(o_totalprice, 2) OVER
                 (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4)
             AS second_highest,
           ROUND(cume_dist() OVER w, 4) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ntile_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.round(F.nth_value("o_totalprice", 2).over(w_full), 4).alias(
            "second_highest"
        ),
        F.round(F.cume_dist().over(w), 4).alias("cdist"),
    )


# --------------------------------------------------------------------------
# The pure-SQL surface: the engine's queries are equally expressible through
# spark.sql over the registered views (same Catalyst plans as the DataFrame
# API). TPC-H Q10-style returned-item revenue per customer, top 20.
# --------------------------------------------------------------------------
_Q10_SQL = """
SELECT c.c_custkey,
       c.c_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items_sql", oracle=_Q10_SQL)
def q10_returned_items_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Submitted as SQL text (spark.sql) — IDENTICAL string to the oracle;
    Catalyst plans it like the DataFrame queries (broadcast nation, pushed
    date/returnflag filters, TakeOrdered top-k)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q10_SQL)


# --------------------------------------------------------------------------
# Sketch path for percentiles: percentile_approx (t-digest-style bounded
# memory, mergeable partials — the scale substitute for the exact sort-based
# `price_percentiles`). Rows-only (DuckDB's approx_quantile uses a different
# sketch); closeness to the exact values is asserted in tests/test_plans.py.
# --------------------------------------------------------------------------
@query(
    "price_percentiles_approx",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
           TRUE AS p50_within_2pct,
           TRUE AS p90_within_2pct,
           TRUE AS p99_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def price_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch) vs exact interpolated
    percentiles. Same upgrade as approx_distinct_parts: the sketch output
    is engine-specific, but the exact p50 crosses the hash directly and
    the engine asserts each sketch quantile lands within 2% of its exact
    twin (measured error ~0.1% at every sf with accuracy=10000); the
    oracle pins the booleans TRUE."""
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    acc = F.lit(10000)  # 1/accuracy relative error bound

    def within(p: float):
        exact = F.percentile("l_extendedprice", F.lit(p))
        approx = F.percentile_approx("l_extendedprice", F.lit(p), acc)
        return F.abs(approx - exact) <= 0.02 * exact

    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias(
            "p50_exact"
        ),
        within(0.5).alias("p50_within_2pct"),
        within(0.9).alias("p90_within_2pct"),
        within(0.99).alias("p99_within_2pct"),
    )


# --------------------------------------------------------------------------
# TPC-H Q7-style volume shipping: revenue between (supplier nation, customer
# nation) pairs per year. Both nation lookups broadcast; the only data-sized
# shuffles are the two fact joins on their keys.
# --------------------------------------------------------------------------
@query(
    "q7_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name IN ('FRANCE', 'GERMANY')
      AND cn.n_name IN ('FRANCE', 'GERMANY')
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nation.filter(F.col("n_name").isin("FRANCE", "GERMANY")).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.filter(F.col("n_name").isin("FRANCE", "GERMANY")).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.round(F.sum(rev), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# TPC-H Q15-style top supplier: argmax over an aggregate — per-supplier
# revenue, then the supplier(s) hitting the global maximum. The max is a
# one-row aggregate of the per-supplier frame joined back as a BROADCAST
# scalar (same pattern as q11's total / winsorize's thresholds) — never an
# empty-partition window, which would pull all |suppliers| rows through a
# single task at scale.
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_rev
    FROM rev JOIN supplier ON s_suppkey = suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_rev"
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_rev") == F.col("mx")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(supp, top.suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "total_rev"
    )


# --------------------------------------------------------------------------
# RIGHT OUTER join — completes the join-kind matrix (inner/left/full/semi/
# anti/range/asof already have oracle-checked instances). The narrow side is
# the returned-lineitem aggregate; the preserved (right) side is one month
# of orders, so orders with no returns materialize the null side. Same
# physical plan as the mirrored LEFT join — the point of the query is the
# explicit join-kind semantics, pinned by the oracle.
# --------------------------------------------------------------------------
@query(
    "right_join_order_returns",
    oracle="""
    WITH r AS (
      SELECT l_orderkey, COUNT(*) AS n_ret,
             ROUND(SUM(l_quantity), 4) AS ret_qty
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
    )
    SELECT o_orderkey, o_orderpriority,
           COALESCE(n_ret, 0) AS n_returned,
           COALESCE(ret_qty, 0.0) AS returned_qty
    FROM r RIGHT JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-02-01'
    """,
)
def right_join_order_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_ret"),
            F.round(F.sum("l_quantity"), 4).alias("ret_qty"),
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    return returned.join(
        orders, returned.l_orderkey == orders.o_orderkey, "right_outer"
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.coalesce("n_ret", F.lit(0).cast("long")).alias("n_returned"),
        F.coalesce("ret_qty", F.lit(0.0)).alias("returned_qty"),
    )


# --------------------------------------------------------------------------
# Unpivot (melt): wide -> long reshaping, the inverse of pivot. Spark 3.4+'s
# native df.unpivot keeps the reshape inside the JVM plan (an Expand over
# the value columns — N output rows per input row, no shuffle). The base is
# a q1-style per-flag aggregate, so the melt runs over a GROUP-COUNT-sized
# frame, not the fact table.
# --------------------------------------------------------------------------
@query(
    "unpivot_pricing_metrics",
    oracle=f"""
    WITH w AS (
      SELECT l_returnflag,
             ROUND(SUM(l_quantity), 4) AS sum_qty,
             ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
             ROUND(AVG(l_discount), 4) AS avg_disc
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '{_SHIP_CUTOFF}'
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_base_price', sum_base_price FROM w
    UNION ALL
    SELECT l_returnflag, 'avg_disc', avg_disc FROM w
    """,
)
def unpivot_pricing_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.filter(F.col("l_shipdate") <= _ts(_SHIP_CUTOFF))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_base_price", "avg_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------
# Bivariate statistics: Pearson correlation, sample covariance, and the
# least-squares fit of extendedprice on quantity, per return flag — the
# regr_*/corr aggregate family. All partial-aggregable (sum/sum-of-
# products moments), so one shuffle on the group key at any scale.
# --------------------------------------------------------------------------
@query(
    "price_qty_correlation",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_extendedprice, l_quantity), 4) AS price_qty_corr,
           ROUND(covar_samp(l_extendedprice, l_quantity), 4) AS price_qty_covar,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS fit_slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS fit_intercept
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def price_qty_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias(
            "price_qty_covar"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("fit_slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "fit_intercept"
        ),
    )


DECILES = [i / 10.0 for i in range(1, 10)]


# --------------------------------------------------------------------------
# Equi-height (decile) binning WITHOUT a global window: thresholds come
# from one exact interpolated-percentile aggregate (partial-aggregable,
# GROUP-sized output), broadcast back as a 1-row array; each order's decile
# is then "1 + #thresholds strictly below it" — a narrow map. ntile() would
# need a global total-order window (one task holds everything); this shape
# is the one that survives 100 TB.
# --------------------------------------------------------------------------
@query(
    "price_decile_distribution",
    oracle=f"""
    WITH t AS (
      SELECT quantile_cont(o_totalprice, {DECILES}) AS thr FROM orders
    )
    SELECT CAST(1 + len(list_filter(thr, x -> o_totalprice > x)) AS BIGINT)
             AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS spend,
           ROUND(MIN(o_totalprice), 4) AS lo,
           ROUND(MAX(o_totalprice), 4) AS hi
    FROM orders CROSS JOIN t
    GROUP BY 1
    """,
)
def price_decile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    thr = orders.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(p) for p in DECILES])).alias(
            "thr"
        )
    )
    price = F.col("o_totalprice")
    decile = (
        F.lit(1)
        + F.size(F.filter("thr", lambda x: price > x))
    ).cast("long")
    return (
        orders.crossJoin(F.broadcast(thr))
        .groupBy(decile.alias("decile"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("spend"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# Period-over-period: month-over-month revenue growth — LAG over the
# MONTH-GRAIN aggregate (the window input is #months rows, so the single-
# partition total-order window is bounded by the calendar, not the data;
# the same query at day/hour grain would partition the window by a coarser
# period).
# --------------------------------------------------------------------------
@query(
    "monthly_revenue_growth",
    oracle="""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             ROUND(SUM(o_totalprice), 4) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           ROUND(revenue - LAG(revenue) OVER (ORDER BY month), 4) AS delta,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
                 * 100.0 / LAG(revenue) OVER (ORDER BY month), 4) AS mom_pct
    FROM m
    """,
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 4).alias("delta"),
        F.round((F.col("revenue") - prev) * 100.0 / prev, 4).alias("mom_pct"),
    )


ERASE_MOD = 113  # user_id/custkey % 113 == 0 -> erasure request set


# --------------------------------------------------------------------------
# Right-to-erasure audit: before deleting a user set, report the blast
# radius — affected row counts per table. Each branch is an independent
# filtered aggregate over ITS table (scan-pruned to the key column); union
# of one-row frames. The deletion itself would be the same predicates as
# anti-join filters on rewrite; this query is the audit half that runs
# first (and the driver-checkable half — a destructive rewrite of shared
# testdata has no place in a query registry).
# --------------------------------------------------------------------------
@query(
    "user_erasure_audit",
    oracle=f"""
    SELECT 'customer' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows_affected
    FROM customer WHERE c_custkey % {ERASE_MOD} = 0
    UNION ALL
    SELECT 'orders', CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE o_custkey % {ERASE_MOD} = 0
    UNION ALL
    SELECT 'lineitem', CAST(COUNT(*) AS BIGINT)
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_custkey % {ERASE_MOD} = 0
    UNION ALL
    SELECT 'events', CAST(COUNT(*) AS BIGINT)
    FROM events WHERE user_id % {ERASE_MOD} = 0
    """,
)
def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % ERASE_MOD == 0
    )
    orders = load_table(spark, sf_dir, "orders")
    erased_orders = orders.filter(F.col("o_custkey") % ERASE_MOD == 0)
    li = load_table(spark, sf_dir, "lineitem").join(
        erased_orders.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % ERASE_MOD == 0
    )
    parts = [
        cust.agg(F.lit("customer").alias("table_name"), F.count("*").alias("n_rows_affected")),
        erased_orders.agg(F.lit("orders").alias("table_name"), F.count("*").alias("n_rows_affected")),
        li.agg(F.lit("lineitem").alias("table_name"), F.count("*").alias("n_rows_affected")),
        ev.agg(F.lit("events").alias("table_name"), F.count("*").alias("n_rows_affected")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


WINSOR_LO, WINSOR_HI = 0.01, 0.99


# --------------------------------------------------------------------------
# Winsorization: clip order prices to the [p01, p99] band and report the
# per-status effect — the robust-stats transform that tames heavy tails
# before training/averaging. Same two-phase shape as the decile binning:
# one exact-percentile aggregate (GROUP-sized), broadcast back, then a
# narrow clip + re-aggregate. The corpus never shuffles for the clip.
# --------------------------------------------------------------------------
@query(
    "winsorize_order_prices",
    oracle=f"""
    WITH t AS (
      SELECT quantile_cont(o_totalprice, {WINSOR_LO}) AS lo,
             quantile_cont(o_totalprice, {WINSOR_HI}) AS hi
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (o_totalprice < lo OR o_totalprice > hi)
                AS BIGINT) AS n_clipped,
           ROUND(SUM(o_totalprice), 4) AS sum_raw,
           ROUND(SUM(LEAST(GREATEST(o_totalprice, lo), hi)), 4) AS sum_winsorized
    FROM orders CROSS JOIN t
    GROUP BY o_orderstatus
    """,
)
def winsorize_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    t = orders.agg(
        F.percentile("o_totalprice", F.lit(WINSOR_LO)).alias("lo"),
        F.percentile("o_totalprice", F.lit(WINSOR_HI)).alias("hi"),
    )
    price = F.col("o_totalprice")
    clipped = F.least(F.greatest(price, F.col("lo")), F.col("hi"))
    out_of_band = ((price < F.col("lo")) | (price > F.col("hi"))).cast("long")
    return (
        orders.crossJoin(F.broadcast(t))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(out_of_band).alias("n_clipped"),
            F.round(F.sum(price), 4).alias("sum_raw"),
            F.round(F.sum(clipped), 4).alias("sum_winsorized"),
        )
    )


MERGE_MOD = 101  # orders with o_orderkey % 101 == 0 receive a change row
MERGE_INSERT_OFFSET = 10_000_000  # synthetic new-row keys


# --------------------------------------------------------------------------
# MERGE INTO / upsert apply — the batch CDC pattern (Delta/Iceberg MERGE
# semantics on plain DataFrames): a deterministic change set (price
# corrections for every MERGE_MOD-th order + brand-new rows) full-outer-
# joined onto the base table; matched rows take the change, unmatched
# changes insert, unmatched base rows persist. One shuffle on the merge
# key for each side; at scale the change set is deltas-sized, so AQE
# broadcasts it and the base table never reshuffles.
# --------------------------------------------------------------------------
@query(
    "orders_merge_upsert",
    oracle=f"""
    WITH chg AS (
      SELECT o_orderkey AS k, ROUND(o_totalprice * 1.1, 4) AS new_price
      FROM orders WHERE o_orderkey % {MERGE_MOD} = 0
      UNION ALL
      SELECT o_orderkey + {MERGE_INSERT_OFFSET}, ROUND(o_totalprice / 2, 4)
      FROM orders WHERE o_orderkey % {MERGE_MOD} = 0
    )
    SELECT COALESCE(o_orderkey, k) AS o_orderkey,
           ROUND(COALESCE(new_price, o_totalprice), 4) AS final_price,
           CASE WHEN o_orderkey IS NULL THEN 'insert'
                WHEN k IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM orders FULL OUTER JOIN chg ON o_orderkey = k
    """,
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base_chg = orders.filter(F.col("o_orderkey") % MERGE_MOD == 0)
    chg = base_chg.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 1.1, 4).alias("new_price"),
    ).unionByName(
        base_chg.select(
            (F.col("o_orderkey") + MERGE_INSERT_OFFSET).alias("k"),
            F.round(F.col("o_totalprice") / 2, 4).alias("new_price"),
        )
    )
    merged = orders.join(chg, orders.o_orderkey == chg.k, "full_outer")
    return merged.select(
        F.coalesce("o_orderkey", "k").alias("o_orderkey"),
        F.round(F.coalesce("new_price", "o_totalprice"), 4).alias("final_price"),
        F.when(F.col("o_orderkey").isNull(), F.lit("insert"))
        .when(F.col("k").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )


# --------------------------------------------------------------------------
# Argmax aggregate (max_by/min_by): the richest and poorest customer per
# nation in ONE pass — no self-join, no window. max_by carries its payload
# through the partial/final aggregation, so this is strictly cheaper than
# the rank-and-filter formulation wherever only the extreme row matters.
# Ties broken deterministically by a composite numeric key
# (acctbal * 1e10 + custkey): both engines compute the identical double,
# and at the 1e14 magnitude the custkey term stays far above one ulp, so
# equal balances order by key. (A struct ordering key would be natural in
# Spark but DuckDB's max_by does not accept one.)
# --------------------------------------------------------------------------
@query(
    "nation_extreme_customers",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           max_by(c_custkey, c_acctbal * 10000000000 + c_custkey) AS richest_key,
           ROUND(MAX(c_acctbal), 4) AS max_bal,
           min_by(c_custkey, c_acctbal * 10000000000 + c_custkey) AS poorest_key,
           ROUND(MIN(c_acctbal), 4) AS min_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def nation_extreme_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name")
    )
    tie_key = F.col("c_acctbal") * F.lit(10_000_000_000.0) + F.col("c_custkey")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.max_by("c_custkey", tie_key).alias("richest_key"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
            F.min_by("c_custkey", tie_key).alias("poorest_key"),
            F.round(F.min("c_acctbal"), 4).alias("min_bal"),
        )
    )


# --------------------------------------------------------------------------
# Relative-standing windows: percent_rank + cume_dist of order value within
# (priority, order month) — the two rank-normalization window forms the
# suite didn't yet pin (row_number/rank/dense_rank/ntile/nth are covered).
# Partitioning by (priority, month) rather than priority alone keeps window
# partitions bounded as history grows — 5 priorities would be 5 giant
# sorted tasks at 100 TB; priority x month is the same analytics at ~100x
# the parallelism. Ratios are rational (rank-1)/(n-1) — floor-rounded
# portably on both sides.
# --------------------------------------------------------------------------
@query(
    "orders_percent_rank_cume",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_epoch,
           floor(percent_rank() OVER w * 10000 + 0.5) / 10000 AS pr,
           floor(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority, date_trunc('month', o_orderdate)
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def orders_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    w = W.partitionBy("o_orderpriority", month).orderBy(
        "o_totalprice", "o_orderkey"
    )
    pr4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.unix_timestamp(month).alias("month_epoch"),
        pr4(F.percent_rank().over(w)).alias("pr"),
        pr4(F.cume_dist().over(w)).alias("cd"),
    )


PARETO_QUANTILE = 0.8  # "top 20% of customers" threshold


# --------------------------------------------------------------------------
# Revenue Pareto share: what fraction of total order revenue the top-20%
# customers (by spend) contribute. The cut is the exact interpolated 0.8
# quantile of per-customer spend joined back as a BROADCAST scalar — never
# a global ranking sort of the customer frame (ties at the threshold fall
# into the top bucket on both engines, so the cut is deterministic).
# --------------------------------------------------------------------------
@query(
    "revenue_pareto_share",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, SUM(o_totalprice) AS spend
      FROM orders GROUP BY o_custkey
    ), thr AS (
      SELECT quantile_cont(spend, {PARETO_QUANTILE}) AS thr FROM spend
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(*) FILTER (spend >= thr) AS BIGINT) AS n_top,
           ROUND(ANY_VALUE(thr), 4) AS spend_threshold,
           floor(SUM(CASE WHEN spend >= thr THEN spend ELSE 0 END)
                 / SUM(spend) * 10000 + 0.5) / 10000 AS top_share
    FROM spend CROSS JOIN thr
    """,
)
def revenue_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    thr = spend.agg(
        F.percentile("spend", F.lit(PARETO_QUANTILE)).alias("thr")
    )
    top = F.col("spend") >= F.col("thr")
    return (
        spend.crossJoin(F.broadcast(thr))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(top.cast("long")).alias("n_top"),
            F.round(F.first("thr"), 4).alias("spend_threshold"),
            (
                F.floor(
                    F.sum(F.when(top, F.col("spend")).otherwise(0.0))
                    / F.sum("spend")
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("top_share"),
        )
    )


# --------------------------------------------------------------------------
# Supplier concentration per nation (Herfindahl-Hirschman index): sum of
# squared revenue shares of each nation's suppliers — the market-structure
# rollup (HHI -> 1 means one supplier owns the nation's volume). One fact
# aggregation keyed (nationkey, suppkey); the per-nation share/HHI pass
# runs on the supplier-sized aggregate, and nation names attach broadcast.
# --------------------------------------------------------------------------
@query(
    "nation_supplier_hhi",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT s_nationkey, SUM(rev) AS nat_rev, COUNT(*) AS n_suppliers
      FROM rev GROUP BY 1
    )
    SELECT n.n_name AS nation,
           CAST(t.n_suppliers AS BIGINT) AS n_suppliers,
           ROUND(t.nat_rev, 4) AS nation_revenue,
           floor(SUM((r.rev / t.nat_rev) * (r.rev / t.nat_rev))
                 * 10000 + 0.5) / 10000 AS hhi
    FROM rev r
    JOIN tot t USING (s_nationkey)
    JOIN nation n ON n.n_nationkey = r.s_nationkey
    GROUP BY 1, 2, 3
    """,
)
def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            )
        )
    )
    tot = rev.groupBy("s_nationkey").agg(
        F.sum("rev").alias("nat_rev"), F.count("*").alias("n_suppliers")
    )
    share2 = (F.col("rev") / F.col("nat_rev")) * (F.col("rev") / F.col("nat_rev"))
    return (
        rev.join(F.broadcast(tot), "s_nationkey")
        .join(F.broadcast(nat), rev.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("n_suppliers"),
            F.round("nat_rev", 4).alias("nation_revenue"),
        )
        .agg(
            (F.floor(F.sum(share2) * 10000 + F.lit(0.5)) / 10000).alias("hhi")
        )
        .select(
            "nation",
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            "nation_revenue",
            "hhi",
        )
    )


# --------------------------------------------------------------------------
# Equi-WIDTH histogram (the companion to price_decile_distribution's
# equi-HEIGHT bins): bounds come from one min/max aggregate broadcast back
# onto the scan; the bin index is a narrow map (floor((x-lo)/width), top
# edge clamped into the last bin). Two passes over the column, zero
# windows, bin count fixed — the histogram every profiler/BI layer wants,
# in the shape that survives any scale. Bin edges are reported so the
# result is self-describing.
# --------------------------------------------------------------------------
PRICE_HIST_BINS = 20


@query(
    "orders_price_histogram",
    oracle=f"""
    WITH b AS (
      SELECT MIN(o_totalprice) AS lo,
             GREATEST((MAX(o_totalprice) - MIN(o_totalprice))
                        / {PRICE_HIST_BINS}, 1e-12) AS width
      FROM orders
    )
    SELECT LEAST({PRICE_HIST_BINS - 1},
                 CAST(FLOOR((o_totalprice - lo) / width) AS BIGINT)) AS bin,
           ROUND(lo + LEAST({PRICE_HIST_BINS - 1},
                 CAST(FLOOR((o_totalprice - lo) / width) AS BIGINT)) * width, 4)
             AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders CROSS JOIN b
    GROUP BY 1, 2
    """,
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    # GREATEST(width, eps): a degenerate corpus where every price is equal
    # would give width=0 -> (x-lo)/0, and Spark (floor(NaN)->null) and
    # DuckDB (inf) diverge instead of failing cleanly; with eps both
    # engines put every row in bin 0.
    b = orders.agg(
        F.min("o_totalprice").alias("lo"),
        F.greatest(
            (F.max("o_totalprice") - F.min("o_totalprice")) / PRICE_HIST_BINS,
            F.lit(1e-12),
        ).alias("width"),
    )
    bin_idx = F.least(
        F.lit(PRICE_HIST_BINS - 1),
        F.floor((F.col("o_totalprice") - F.col("lo")) / F.col("width")),
    ).cast("long")
    return (
        orders.crossJoin(F.broadcast(b))
        .groupBy(
            bin_idx.alias("bin"),
            F.round(F.col("lo") + bin_idx * F.col("width"), 4).alias("bin_lo"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
    )


# --------------------------------------------------------------------------
# RFM segmentation: per-customer Recency / Frequency / Monetary metrics,
# each scored into quartiles against corpus-wide thresholds, concatenated
# to the classic 'R#F#M#' segment code. Same scale discipline as
# price_decile_distribution: the three threshold arrays come from ONE
# percentile aggregate over the customer-grain frame and are broadcast
# back — no global ntile window ever orders all customers in one task.
# Score = 1 + #thresholds strictly below the value, identically in both
# engines, so quartile boundaries are value-pinned. Round-before-cut:
# 'mon' is an order-dependent double sum, so it is rounded to 4dp BEFORE
# the quantile and the '>' comparison, and the interpolated thresholds are
# rounded to 6dp, on BOTH engines — a last-ulp summation or interpolation
# difference can no longer flip a customer across a quartile boundary
# (rec/freq are integer-exact already).
# --------------------------------------------------------------------------
RFM_QUARTILES = [0.25, 0.5, 0.75]


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             floor(epoch(MAX(o_orderdate))) AS rec,
             COUNT(*) * 1.0 AS freq,
             ROUND(SUM(o_totalprice), 4) AS mon
      FROM orders GROUP BY o_custkey
    ), t AS (
      SELECT list_transform(quantile_cont(rec, {RFM_QUARTILES}),
                            x -> ROUND(x, 6)) AS tr,
             list_transform(quantile_cont(freq, {RFM_QUARTILES}),
                            x -> ROUND(x, 6)) AS tf,
             list_transform(quantile_cont(mon, {RFM_QUARTILES}),
                            x -> ROUND(x, 6)) AS tm
      FROM rfm
    )
    SELECT 'R' || CAST(1 + len(list_filter(tr, x -> rec > x)) AS VARCHAR)
        || 'F' || CAST(1 + len(list_filter(tf, x -> freq > x)) AS VARCHAR)
        || 'M' || CAST(1 + len(list_filter(tm, x -> mon > x)) AS VARCHAR)
             AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(mon), 4) AS segment_spend
    FROM rfm CROSS JOIN t
    GROUP BY 1
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.floor(F.unix_timestamp(F.max("o_orderdate"))).alias("rec"),
        (F.count("*") * F.lit(1.0)).alias("freq"),
        F.round(F.sum("o_totalprice"), 4).alias("mon"),
    )
    qs = F.array(*[F.lit(p) for p in RFM_QUARTILES])
    t = rfm.agg(
        F.transform(F.percentile("rec", qs), lambda x: F.round(x, 6)).alias("tr"),
        F.transform(F.percentile("freq", qs), lambda x: F.round(x, 6)).alias("tf"),
        F.transform(F.percentile("mon", qs), lambda x: F.round(x, 6)).alias("tm"),
    )

    def score(col: str, thr: str):
        v = F.col(col)
        return (F.lit(1) + F.size(F.filter(thr, lambda x: v > x))).cast("string")

    segment = F.concat(
        F.lit("R"), score("rec", "tr"),
        F.lit("F"), score("freq", "tf"),
        F.lit("M"), score("mon", "tm"),
    )
    return (
        rfm.crossJoin(F.broadcast(t))
        .groupBy(segment.alias("segment"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("mon"), 4).alias("segment_spend"),
        )
    )


# --------------------------------------------------------------------------
# Data-quality constraint report: the dbt-test / Deequ-shaped validation
# pass a pipeline runs before trusting a load — null keys, primary-key
# duplicates, referential orphans, domain-range and cross-table temporal
# violations, one row per check. Single-table checks share ONE scan each
# via conditional aggregation (no per-check re-scan); the referential
# checks are anti joins (customer side broadcasts; the lineitem->orders
# orphan check shuffle-joins on the key it would shuffle on anyway); the
# report itself is |checks| rows. At 100 TB every check stays one pass —
# nothing here is per-row Python or per-check scanning.
# --------------------------------------------------------------------------
@query(
    "dq_constraint_report",
    oracle="""
    SELECT 'orders_null_custkey' AS check_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_dup_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_nonpositive_totalprice',
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_orphan_custkey', CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_ship_before_order', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate < o.o_orderdate
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    # All three single-table orders checks ride one scan/aggregate.
    o_single = orders.agg(
        one_if(F.col("o_custkey").isNull()).alias("orders_null_custkey"),
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("orders_dup_orderkey"),
        one_if(F.col("o_totalprice") <= 0).alias("orders_nonpositive_totalprice"),
    )
    o_rows = o_single.unpivot(
        [], o_single.columns, "check_name", "n_violations"
    )

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count("*").cast("long").alias("n_violations"),
        )

    orphan_o = count_row(
        "orders_orphan_custkey",
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        ),
    )
    orphan_l = count_row(
        "lineitem_orphan_orderkey",
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
        ),
    )
    ship_bad = count_row(
        "lineitem_ship_before_order",
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).filter(F.col("l_shipdate") < F.col("o_orderdate")),
    )
    return (
        o_rows.unionByName(orphan_o)
        .unionByName(orphan_l)
        .unionByName(ship_bad)
    )


CDC_MOD = 97


# --------------------------------------------------------------------------
# CDC apply WITH tombstones — the full change-data-capture alphabet on top
# of orders_merge_upsert's upsert shape: a change feed carrying
# inserts (I), updates (U), and deletes (D) applied in one full-outer
# join; matched deletes drop the row, matched updates take the new value,
# unmatched inserts append, untouched base rows persist. The tombstone
# filter uses null-safe comparison (op IS DISTINCT FROM 'D' /
# eqNullSafe) because unmatched base rows surface op = NULL and a plain
# <> would silently drop them. Same scale posture as the upsert: one
# shuffle per side on the merge key; a real deltas-sized feed broadcasts.
# --------------------------------------------------------------------------
@query(
    "cdc_apply_with_deletes",
    oracle=f"""
    WITH chg AS (
      SELECT o_orderkey AS k, 'D' AS op, CAST(NULL AS DOUBLE) AS new_price
      FROM orders WHERE o_orderkey % {CDC_MOD} = 0
      UNION ALL
      SELECT o_orderkey, 'U', ROUND(o_totalprice * 1.1, 4)
      FROM orders WHERE o_orderkey % {CDC_MOD} = 1
      UNION ALL
      SELECT o_orderkey + {MERGE_INSERT_OFFSET}, 'I',
             ROUND(o_totalprice / 3, 4)
      FROM orders WHERE o_orderkey % {CDC_MOD} = 2
    )
    SELECT COALESCE(o_orderkey, k) AS o_orderkey,
           ROUND(COALESCE(new_price, o_totalprice), 4) AS final_price,
           CASE WHEN o_orderkey IS NULL THEN 'insert'
                WHEN op = 'U' THEN 'update'
                ELSE 'keep' END AS action
    FROM orders FULL OUTER JOIN chg ON o_orderkey = k
    WHERE op IS DISTINCT FROM 'D'
    """,
)
def cdc_apply_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    key = F.col("o_orderkey")
    deletes = orders.filter(key % CDC_MOD == 0).select(
        key.alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("new_price"),
    )
    updates = orders.filter(key % CDC_MOD == 1).select(
        key.alias("k"),
        F.lit("U").alias("op"),
        F.round(F.col("o_totalprice") * 1.1, 4).alias("new_price"),
    )
    inserts = orders.filter(key % CDC_MOD == 2).select(
        (key + MERGE_INSERT_OFFSET).alias("k"),
        F.lit("I").alias("op"),
        F.round(F.col("o_totalprice") / 3, 4).alias("new_price"),
    )
    chg = deletes.unionByName(updates).unionByName(inserts)
    joined = orders.join(chg, orders.o_orderkey == chg.k, "full_outer")
    action = (
        F.when(F.col("o_orderkey").isNull(), "insert")
        .when(F.col("op") == "U", "update")
        .otherwise("keep")
    )
    return (
        joined.filter(~F.col("op").eqNullSafe(F.lit("D")))
        .select(
            F.coalesce("o_orderkey", "k").alias("o_orderkey"),
            F.round(F.coalesce("new_price", "o_totalprice"), 4).alias(
                "final_price"
            ),
            action.alias("action"),
        )
    )


# --------------------------------------------------------------------------
# ROLLUP with grouping_id-labeled subtotal rows: NULL-based subtotal
# detection breaks the moment a grouping column itself contains NULLs;
# grouping_id() is the unambiguous label (bitmask, first rollup column =
# most significant bit — the SAME convention in Spark and DuckDB, pinned
# here by the value hash). Companion to the unlabeled rollup/cube queries.
# --------------------------------------------------------------------------
@query(
    "rollup_labeled_subtotals",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS spend
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def rollup_labeled_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("spend"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n_orders",
            "spend",
        )
    )


# --------------------------------------------------------------------------
# WEIGHTED median (lower weighted median: smallest price whose cumulative
# quantity-weight reaches half the group total) per return flag — the
# robust-statistics aggregate percentile() cannot express (it has no
# weight argument portable across engines). The cumulative weight is
# computed HIERARCHICALLY (operators/rank.global_prefix_sum: range shards
# on the global (flag, price, key) order + broadcast shard bases), then
# per-flag cumulative = global cumulative minus the broadcast sum of
# EARLIER flags — the stratified_split trick applied to SUM, so no window
# ever spans a flag's full (corpus-scale) slice. Weights are cast to
# BIGINT: integer addition is associative, so the sharded summation and
# the oracle's sequential window land on identical boundary values —
# "2*cum >= total" cannot flip on a last-ulp float.
# --------------------------------------------------------------------------
@query(
    "price_weighted_median_by_flag",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
    ), c AS (
      SELECT flag, price, w,
             CAST(SUM(w) OVER (PARTITION BY flag
                               ORDER BY price, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
             CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS totw
      FROM b
    )
    SELECT flag,
           CAST(totw AS BIGINT) AS total_weight,
           ROUND(MIN(CASE WHEN 2 * cumw >= totw THEN price END), 4)
             AS weighted_median
    FROM c GROUP BY flag, totw
    """,
)
def price_weighted_median_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parallel_mapreduce_spark.operators.rank import global_prefix_sum

    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    order = [
        F.asc("flag"),
        F.asc("price"),
        F.asc("l_orderkey"),
        F.asc("l_linenumber"),
    ]
    cum = global_prefix_sum(b, order, "w", out="gcum")
    totals = b.groupBy("flag").agg(F.sum("w").alias("totw"))
    w_base = W.orderBy("flag").rowsBetween(W.unboundedPreceding, -1)
    bases = totals.select(
        "flag",
        "totw",
        F.coalesce(F.sum("totw").over(w_base), F.lit(0).cast("long")).alias(
            "_earlier"
        ),
    )
    c = cum.join(F.broadcast(bases), "flag").withColumn(
        "cumw", F.col("gcum") - F.col("_earlier")
    )
    return (
        c.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("flag", "totw")
        .agg(F.round(F.min("price"), 4).alias("weighted_median"))
        .select(
            "flag",
            F.col("totw").cast("long").alias("total_weight"),
            "weighted_median",
        )
    )


# --------------------------------------------------------------------------
# Spark 4 SQL SCRIPTING (BEGIN/DECLARE/WHILE): data-dependent iterative
# control flow expressed IN SQL — a doubling search for the smallest
# power-of-two price threshold covering at least half the orders. Each
# loop iteration runs a real aggregate; the loop count is decided by the
# data, which is exactly what static SQL cannot express and what the
# scripting surface (or a driver-side loop) is for. The oracle replays the
# search declaratively: the predicate is monotone in the threshold, so the
# WHILE result equals the minimum over the geometric grid. The scan per
# iteration is a pushdown count; iterations are O(log(price range)).
# --------------------------------------------------------------------------
SCRIPT_BASE_THRESHOLD = 4096


@query(
    "sql_scripting_threshold_search",
    oracle=f"""
    WITH nn AS (
      SELECT CAST(CEIL(COUNT(*) / 2.0) AS BIGINT) AS need FROM orders
    ),
    g AS (SELECT CAST({SCRIPT_BASE_THRESHOLD} * (1::BIGINT << i) AS BIGINT)
                 AS thr
          FROM range(0, 24) t(i)),
    c AS (SELECT thr,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                  WHERE o_totalprice < thr) AS n_below
          FROM g),
    sel AS (SELECT thr, n_below FROM c, nn
            WHERE n_below >= need ORDER BY thr LIMIT 1)
    SELECT CAST(thr AS BIGINT) AS threshold,
           n_below,
           need AS n_needed
    FROM sel, nn
    """,
)
def sql_scripting_threshold_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    # The loop is bounded to the oracle's 24-point geometric grid (i = 0..23,
    # i.e. at most 23 doublings past the base), and the final SELECT emits a
    # row only when the search actually converged — on pathological data
    # both engines now return the same empty result instead of diverging
    # (unbounded engine loop vs grid-capped oracle). The scripting conf is
    # saved/restored so a shared session doesn't carry it into later
    # queries; the script executes eagerly, so the (single-row) result is
    # re-materialized as a local DataFrame before the conf goes back.
    from parallel_mapreduce_spark.session import scoped_conf

    with scoped_conf(spark, "spark.sql.scripting.enabled", "true"):
        out = spark.sql(f"""
        BEGIN
          DECLARE t BIGINT DEFAULT {SCRIPT_BASE_THRESHOLD};
          DECLARE i INT DEFAULT 0;
          DECLARE need BIGINT;
          DECLARE have BIGINT;
          SET need = (SELECT CAST(CEIL(COUNT(*) / 2.0) AS BIGINT) FROM orders);
          SET have = (SELECT COUNT(*) FROM orders WHERE o_totalprice < t);
          WHILE have < need AND i < 23 DO
            SET t = t * 2;
            SET i = i + 1;
            SET have = (SELECT COUNT(*) FROM orders WHERE o_totalprice < t);
          END WHILE;
          SELECT t AS threshold, have AS n_below, need AS n_needed
          FROM (SELECT 1) WHERE have >= need;
        END
        """)
        rows, schema = out.collect(), out.schema
    return spark.createDataFrame(rows, schema)


TRY_BIG = 9223372036854775807 - 100  # BIGINT max minus a small headroom


# --------------------------------------------------------------------------
# ANSI-safe arithmetic (try_divide / try_add): Spark 4 runs ANSI mode by
# default, where division by zero and integer overflow FAIL the job — the
# correct default for a 100 TB run (silent nulls hide corruption), with
# the try_* family as the explicit opt-out where null-on-error is the
# intended semantics. This query pins those semantics value-level: a
# divisor that hits zero on real rows (quantity - 30) and an addend that
# overflows BIGINT exactly when l_orderkey > 100; the oracle spells out
# the expected null-sets as CASE expressions, so an engine that silently
# wrapped or errored would hash-mismatch.
# --------------------------------------------------------------------------
@query(
    "ansi_try_arithmetic_report",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l_quantity = 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_null,
           CAST(SUM(CASE WHEN l_orderkey > 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_overflow_null,
           ROUND(SUM(CASE WHEN l_quantity <> 30
                          THEN l_extendedprice / (l_quantity - 30) END), 4)
             AS sum_safe_rate
    FROM lineitem
    """,
)
def ansi_try_arithmetic_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    rate = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 30)
    overflow = F.try_add(F.col("l_orderkey"), F.lit(TRY_BIG))
    return li.agg(
        F.count("*").alias("n_rows"),
        F.sum(rate.isNull().cast("long")).alias("n_div_null"),
        F.sum(overflow.isNull().cast("long")).alias("n_overflow_null"),
        F.round(F.sum(rate), 4).alias("sum_safe_rate"),
    )


# --------------------------------------------------------------------------
# Benford first-digit audit: the classic forensic screen — organically
# generated amounts follow P(d) = log10(1 + 1/d); fabricated or capped
# data drifts. First digit = floor(x / 10^floor(log10(x))) with the SAME
# float formula on both engines (identical IEEE inputs and operation
# order; a divergence would need log10(x) within one ulp of an integer,
# i.e. x within ~1e-12 of a power of ten). One scan, a 9-group aggregate,
# expected shares folded in as literals.
# --------------------------------------------------------------------------
@query(
    "benford_first_digit_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(FLOOR(o_totalprice
                 / POWER(10, FLOOR(LOG10(o_totalprice)))) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT digit, n,
           ROUND(n * 1.0 / total, 4) AS share,
           ROUND(LOG10(1 + 1.0 / digit), 4) AS benford_share
    FROM c CROSS JOIN t
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("long")
    c = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(F.col("n") * 1.0 / F.col("total"), 4).alias("share"),
        F.round(F.log10(1 + 1.0 / F.col("digit")), 4).alias("benford_share"),
    )


# --------------------------------------------------------------------------
# RE-AGGREGATABLE distinct-count sketches (Apache DataSketches HLL via
# Spark 4's hll_sketch_agg / hll_union_agg): the pattern that makes
# distinct counts tractable at 100 TB rollup grain — store one serialized
# sketch per partition/day, answer any coarser-grain distinct question by
# UNIONING sketches instead of rescanning raw data. The query builds
# per-day user sketches, merges them, and pins (a) the exact distinct
# both directly and (b) that the merged estimate and the single-pass
# estimate agree with the exact count within a 15% bound (measured ~2%)
# — the merge must not degrade the sketch. DuckDB cannot replay the
# sketch bytes, so the bounds ride the value hash as oracle-pinned TRUEs,
# the same contract as approx_distinct_parts.
# --------------------------------------------------------------------------
@query(
    "hll_sketch_mergeable_rollup",
    oracle="""
    SELECT CAST(COUNT(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)))
                AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_within_15pct,
           TRUE AS direct_within_15pct,
           TRUE AS merge_equals_direct_est
    FROM events
    """,
)
def hll_sketch_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    per_day = ev.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = per_day.agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    direct = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_est"),
    )
    j = merged.crossJoin(F.broadcast(direct))
    within = lambda est: (  # noqa: E731
        F.abs(F.col(est) - F.col("exact_users"))
        <= 0.15 * F.col("exact_users")
    )
    return j.select(
        "n_days",
        "exact_users",
        within("merged_est").alias("merged_within_15pct"),
        within("direct_est").alias("direct_within_15pct"),
        # Same sketch family, same data: the union of per-day sketches must
        # estimate (essentially) what the one-pass sketch estimates. NOT
        # strict equality: the DataSketches HLL union runs an HLL_8 gadget
        # with mode promotions, and bit-identical estimates at every
        # cardinality/lgK are not contractually guaranteed. Measured: the
        # estimates are bit-equal at 15 and 150 distinct users (sparse
        # mode) but diverge 0.40% at 1,500 (sf0.1: merged 1488 vs direct
        # 1494 — the union's gadget promotion) — so the band is 2%:
        # comfortably above observed promotion noise, far below the 15%
        # accuracy bound, still proving the merge didn't degrade the
        # sketch.
        (
            F.abs(F.col("merged_est") - F.col("direct_est"))
            <= 0.02 * F.col("direct_est")
        ).alias("merge_equals_direct_est"),
    )


# --------------------------------------------------------------------------
# LATERAL join (correlated table subquery in FROM): the top-N-per-row
# shape written as the SQL standard writes it. Spark decorrelates the
# correlated LIMIT subquery instead of executing it per outer row — at
# 100 TB the naive interpretation (one orders probe per customer) is a
# driver-side loop in disguise; decorrelation turns it into one join +
# per-key rank, the same physical shape as the window-function form. The
# oracle runs DuckDB's own LATERAL (comma syntax), so two independent
# decorrelators must agree on the full result, ties broken by the
# explicit o_orderkey column.
# --------------------------------------------------------------------------
@query(
    "lateral_top_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_custkey % 10 = 0
    """,
)
def lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_custkey % 10 = 0
    """)


OBS_MIN_CHARS = 200  # quality-gate threshold the observed pipeline applies


# --------------------------------------------------------------------------
# Observed metrics (df.observe + Observation): pipeline data-quality
# telemetry collected DURING the run as accumulator-style aggregates —
# rows in, rows kept, pre-gate mean length — with ZERO extra passes. The
# production posture at 100 TB: a monitoring recount of the input would
# cost a second full scan; observe() piggybacks the metrics on the
# already-running job. The metrics are then re-emitted as the query's
# result row, and the oracle recomputes all three from the raw table, so
# the observation path itself is value-checked.
# --------------------------------------------------------------------------
@query(
    "observed_metrics_quality_gate",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_in,
           CAST(COUNT(*) FILTER (n_chars >= {OBS_MIN_CHARS}) AS BIGINT)
             AS rows_kept,
           floor(SUM(n_chars) / COUNT(*) * 10000 + 0.5) / 10000
             AS mean_chars_in
    FROM documents
    """,
)
def observed_metrics_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pre = Observation("pre_gate")
    post = Observation("post_gate")
    gated = (
        docs.observe(
            pre,
            F.count(F.lit(1)).alias("rows_in"),
            F.avg("n_chars").alias("mean_chars_in"),
        )
        .filter(F.col("n_chars") >= OBS_MIN_CHARS)
        .observe(post, F.count(F.lit(1)).alias("rows_kept"))
    )
    # One pass drives the pipeline AND fills both observations.
    gated.write.format("noop").mode("overwrite").save()
    m_pre, m_post = pre.get, post.get
    # Portable floor rounding (floor(x*1e4+0.5)/1e4), the repo's _pr4
    # idiom: Python round() is banker's, and even Spark round() vs DuckDB
    # ROUND can split on half-ulp boundaries for freshly computed doubles
    # like this AVG-of-bigints; floor is floor everywhere.
    return spark.createDataFrame(
        [
            (
                m_pre["rows_in"],
                m_post["rows_kept"],
                m_pre["mean_chars_in"],
            )
        ],
        "rows_in bigint, rows_kept bigint, mean_chars_in double",
    ).select(
        "rows_in",
        "rows_kept",
        (F.floor(F.col("mean_chars_in") * 10000 + F.lit(0.5)) / 10000).alias(
            "mean_chars_in"
        ),
    )


# --------------------------------------------------------------------------
# SQL pipe syntax (round 6): Spark 4's |> operator chain — the same
# logical plan as nested SELECTs, written as a linear dataflow (scan |>
# filter |> aggregate |> post-filter |> projection). Catalyst sees
# ordinary operators (the pipe form is pure surface syntax), so pushdown
# and partial aggregation are unchanged; the oracle is the classic-SQL
# spelling of the identical plan, proving the two syntaxes agree.
# --------------------------------------------------------------------------
@query(
    "pipe_syntax_order_stats",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS total_price,
           ROUND(MAX(o_totalprice), 4) AS max_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 10
    """,
)
def pipe_syntax_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     ROUND(SUM(o_totalprice), 4) AS total_price,
                     ROUND(MAX(o_totalprice), 4) AS max_price
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        |> SELECT o_orderpriority, n_orders, total_price, max_price
        """
    )


# --------------------------------------------------------------------------
# SQL UDF (round 6): CREATE FUNCTION ... RETURN <expr> — a function whose
# body is SQL, so Catalyst INLINES it into the plan like a macro: it
# stays inside whole-stage codegen with zero serialization boundary, the
# polar opposite of a Python UDF. The right default for reusable business
# expressions at 100 TB; the oracle hand-inlines the same expression.
# --------------------------------------------------------------------------
@query(
    "sql_udf_net_price_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
             AS net_revenue
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY l_returnflag
    """,
)
def sql_udf_net_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION pmr_net_price(
          price DOUBLE, discount DOUBLE, tax DOUBLE
        ) RETURNS DOUBLE
        RETURN price * (1 - discount) * (1 + tax)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               ROUND(SUM(pmr_net_price(l_extendedprice, l_discount, l_tax)), 4)
                 AS net_revenue
        FROM lineitem
        WHERE l_quantity >= 25
        GROUP BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# String collation (round 6): Spark 4 collations make case-insensitive
# comparison a TYPE property instead of a lower()-wrapping convention —
# the collation rides the column through joins/groups and (unlike
# lower()) keeps equality sargable for pushdown. The exhibit doubles
# every other supplier name as an UPPERCASE variant, then groups under
# UTF8_LCASE: each doubled name folds into ONE group of 2. Group keys
# themselves are NOT emitted (the engine may surface either case variant
# as the representative — nondeterministic across engines); the output is
# the group-size histogram plus collated vs binary distinct counts. The
# oracle folds with lower(), which coincides with UTF8_LCASE folding on
# this ASCII corpus.
# --------------------------------------------------------------------------
@query(
    "collated_group_fold",
    oracle="""
    WITH doubled AS (
      SELECT s_name FROM supplier
      UNION ALL
      SELECT upper(s_name) FROM supplier WHERE s_suppkey % 2 = 0
    ), g AS (
      SELECT lower(s_name) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM doubled GROUP BY lower(s_name)
    )
    SELECT cnt AS group_size,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           (SELECT CAST(COUNT(DISTINCT lower(s_name)) AS BIGINT) FROM doubled)
             AS n_distinct_folded,
           (SELECT CAST(COUNT(DISTINCT s_name) AS BIGINT) FROM doubled)
             AS n_distinct_binary
    FROM g
    GROUP BY cnt
    """,
)
def collated_group_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    doubled = sup.select("s_name").unionAll(
        sup.filter(F.col("s_suppkey") % 2 == 0).select(
            F.upper("s_name").alias("s_name")
        )
    )
    folded = F.collate(F.col("s_name"), "UTF8_LCASE")
    g = doubled.groupBy(folded.alias("k")).agg(F.count("*").alias("cnt"))
    counts = doubled.agg(
        F.countDistinct(folded).alias("n_distinct_folded"),
        F.countDistinct("s_name").alias("n_distinct_binary"),
    )
    return (
        g.groupBy(F.col("cnt").alias("group_size"))
        .agg(F.count("*").alias("n_groups"))
        .crossJoin(F.broadcast(counts))
    )


# --------------------------------------------------------------------------
# Parameterized SQL (round 6): spark.sql(query, args=...) with named
# parameter markers plus the IDENTIFIER() clause for the table name — the
# injection-safe way to template queries (the reference's CLI takes file
# paths and a lookup word as runtime arguments, main.c:10-24; this is the
# SQL-surface equivalent of binding user input). Parameters bind as
# literals BEFORE optimization, so they constant-fold into pushable scan
# filters exactly like hand-inlined constants — pinned in
# tests/test_plans.py; IDENTIFIER() binds the table name without string
# splicing. The oracle hand-inlines the same constants.
# --------------------------------------------------------------------------
@query(
    "parameterized_sql_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS total_price
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def parameterized_sql_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS total_price
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"tbl": "orders", "min_price": 150000.0, "status": "O"},
    )


# --------------------------------------------------------------------------
# Three-valued NOT IN semantics (round 6): the classic ANSI null trap.
# `x NOT IN (subquery)` is NULL — never TRUE — for every x as soon as
# the subquery produces one NULL, so the predicate filters ALL rows;
# NOT EXISTS / anti join ignores the NULLs and keeps the real
# non-matches. Engines that "fix" this silently (or users who alias the
# two forms) corrupt results at any scale; the exhibit pins both counts
# side by side against DuckDB's independent ANSI implementation, plus
# the null-filtered NOT IN that makes the two forms agree again. The
# probe set marks every 7th customer key NULL via CASE so the documents
# can't dodge the trap by schema (c_custkey itself is non-null), and
# trap_fired is COMPUTED (NOT IN emptied the result while NOT EXISTS
# kept rows), not a decorative constant: if a fixture change ever left
# the probe NULL-free, the boolean would flip and the gate would catch
# the exhibit no longer demonstrating its headline semantics.
# --------------------------------------------------------------------------
_NOT_IN_SQL = """
WITH probe AS (
  SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer WHERE c_mktsegment = 'BUILDING'
), counts AS (
  SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
     WHERE o_custkey NOT IN (SELECT k FROM probe)) AS n_not_in_with_nulls,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
     WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = o.o_custkey))
      AS n_not_exists,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
     WHERE o_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL))
      AS n_not_in_null_filtered
)
SELECT n_not_in_with_nulls, n_not_exists, n_not_in_null_filtered,
       (n_not_in_with_nulls = 0 AND n_not_exists > 0) AS trap_fired
FROM counts
"""


@query("not_in_null_semantics_report", oracle=_NOT_IN_SQL)
def not_in_null_semantics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_NOT_IN_SQL)


# --------------------------------------------------------------------------
# Schema-drift union (round 6): unionByName(allowMissingColumns=True) —
# the DataFrame-side twin of the mergeSchema read
# (schema_evolution_merged_read): two batches whose schemas drifted in
# BOTH directions — the old batch still carries o_orderstatus (dropped
# from the new feed) and the new batch gained o_orderpriority (absent
# from the old) — union BY NAME, with each side's missing column
# null-filled: position-based unionAll would misalign columns or
# refuse. Both fill directions are value-proven: the priority grouping
# exercises the old side's null fill, n_with_status (COUNT over the
# nullable status column) counts exactly the old rows and exercises the
# new side's. DuckDB's UNION ALL BY NAME is the independent oracle. The
# ingest posture at 100 TB: feeds evolve, the union must never depend
# on column order.
# --------------------------------------------------------------------------
@query(
    "union_by_name_drift",
    oracle="""
    WITH old_batch AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    ), new_batch AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 1
    ), unioned AS (
      SELECT * FROM old_batch UNION ALL BY NAME SELECT * FROM new_batch
    )
    SELECT COALESCE(o_orderpriority, '<missing>') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(o_orderstatus) AS BIGINT) AS n_with_status,
           ROUND(SUM(o_totalprice), 4) AS total_price
    FROM unioned
    GROUP BY COALESCE(o_orderpriority, '<missing>')
    """,
)
def union_by_name_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old_batch = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new_batch = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    unioned = old_batch.unionByName(new_batch, allowMissingColumns=True)
    return (
        unioned.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("<missing>")).alias(
                "priority"
            )
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.count("o_orderstatus").alias("n_with_status"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Null-safe equality join (round 6): the third ANSI-null exhibit (with
# not_in_null_semantics_report and ansi_try_arithmetic_report). `a <=> b`
# (IS NOT DISTINCT FROM) treats NULL as a joinable value: NULL matches
# NULL and nothing else, while plain `=` makes NULL match nothing. The
# report pins both inner-join cardinalities on a deliberately
# null-seeded key pair plus the null-pair product — the invariant
# n_null_safe == n_eq + n_null_pairs holds structurally (null-safe adds
# exactly the NULL×NULL cross group to the equi matches) and is emitted
# as an oracled boolean. At scale the lesson is the same as skew: the
# NULL group joins as ONE key, so a null-heavy column under <=> is a
# built-in hot key (here both null groups are filter-bounded).
# DuckDB's IS NOT DISTINCT FROM is the independent oracle.
# --------------------------------------------------------------------------
def null_seeded_join_sides(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The null-seeded (lhs, rhs) key frames counted by
    null_safe_join_report — shared with the plan pin in
    tests/test_plans.py so the HashJoin/equi-rewrite guarantee always
    covers the exact joins the shipped report measures."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lhs = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.when(F.col("o_custkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("lk")
    )
    rhs = customer.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("c_custkey"))
        .alias("rk")
    )
    return lhs, rhs


@query(
    "null_safe_join_report",
    oracle="""
    WITH l AS (
      SELECT CASE WHEN o_custkey % 11 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ), r AS (
      SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_custkey END AS k
      FROM customer WHERE c_mktsegment = 'MACHINERY'
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM l JOIN r ON l.k = r.k)
        AS n_eq_join,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM l JOIN r
        ON l.k IS NOT DISTINCT FROM r.k) AS n_null_safe_join,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM l JOIN r
        ON l.k IS NULL AND r.k IS NULL) AS n_null_pairs,
      (SELECT COUNT(*) FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k)
        = (SELECT COUNT(*) FROM l JOIN r ON l.k = r.k)
          + (SELECT COUNT(*) FROM l JOIN r ON l.k IS NULL AND r.k IS NULL)
        AS decomposition_holds
    """,
)
def null_safe_join_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE lazy plan (round-7 advice): the null-safe join's output
    # partitions exactly into the equi-join rows (key non-null on both
    # sides) and the null-pair rows (key null on both — `<=>` matched
    # them, so lk IS NULL iff rk IS NULL in the output). Conditional
    # aggregation over that single join therefore yields all three
    # cardinalities with the join executed ONCE, and the registered
    # query's plan IS the null-safe hash join — visible to the plan
    # audit, unlike the previous three-`.count()` driver-side version
    # whose returned frame was a local literal scan. The decomposition
    # check stays meaningful cross-engine: the ORACLE still runs the
    # three joins separately in DuckDB, so the value compare proves
    # Spark's one `<=>` join against an independent engine's
    # equi+null-pair decomposition.
    lhs, rhs = null_seeded_join_sides(spark, sf_dir)
    joined = lhs.join(rhs, lhs.lk.eqNullSafe(rhs.rk), "inner")
    return joined.agg(
        F.count(F.when(F.col("lk").isNotNull(), 1)).alias("n_eq_join"),
        F.count(F.lit(1)).alias("n_null_safe_join"),
        F.count(F.when(F.col("lk").isNull(), 1)).alias("n_null_pairs"),
    ).select(
        "n_eq_join",
        "n_null_safe_join",
        "n_null_pairs",
        (
            F.col("n_null_safe_join")
            == F.col("n_eq_join") + F.col("n_null_pairs")
        ).alias("decomposition_holds"),
    )


# --------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL / LIMIT-OFFSET pagination (round 6): the
# modern SQL resolution shortcuts plus the pagination clause, pinned
# against DuckDB's implementation of the SAME text. Determinism: ORDER
# BY ALL sorts the select list left-to-right and the leading
# (o_orderpriority, o_orderstatus) pair is the unique group key, so the
# OFFSET 3 / LIMIT 5 page is a total-order slice, not an arbitrary one.
# The at-scale note is OFFSET's cost model: the plan pin
# (tests/test_plans.py) shows Spark fuses sort+limit+offset into ONE
# TakeOrderedAndProject(limit=offset+limit, offset=...) — every
# partition keeps offset+limit rows, so cost grows with the page DEPTH
# even though no global sort runs; fine for page-sized offsets,
# degenerate for deep pagination (keyset pagination on the sort key is
# the 100 TB idiom; this exhibit is the page-1 shape).
# --------------------------------------------------------------------------
_GROUP_BY_ALL_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 4) AS total_price
FROM orders
GROUP BY ALL
ORDER BY ALL
LIMIT 5 OFFSET 3
"""


@query("group_by_all_pagination", oracle=_GROUP_BY_ALL_SQL)
def group_by_all_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL_SQL)


# --------------------------------------------------------------------------
# EXECUTE IMMEDIATE + session variables (round 6): Spark 4's dynamic-SQL
# surface — DECLARE VARIABLE, EXECUTE IMMEDIATE ... INTO (a query result
# captured into a variable), then EXECUTE IMMEDIATE ... USING binding
# the variable into a second statement. Distinct from
# parameterized_sql_revenue (named markers on spark.sql) and
# sql_scripting_threshold_search (BEGIN..END control flow): this is the
# compose-SQL-from-SQL path a warehouse migration hits first. The
# at-scale point, verified via .explain during development: USING binds
# BEFORE optimization, so the variable's value constant-folds into
# PushedFilters on the dim scan and the broadcast join still fires —
# unlike the driver-side collect()-then-format string building it
# replaces, identical plan quality to a literal. Variable names are
# invocation-unique and dropped after use (session variables are
# session-global state; a fixed name would race concurrent invocations
# between INTO and USING).
# --------------------------------------------------------------------------
_EXEC_IMM_SEQ = itertools.count(1)


@query(
    "execute_immediate_variables",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment AS s FROM customer
      GROUP BY 1 ORDER BY COUNT(*) DESC, c_mktsegment LIMIT 1
    )
    SELECT (SELECT s FROM seg) AS segment, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = (SELECT s FROM seg)
    GROUP BY o_orderstatus
    """,
)
def execute_immediate_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    var = f"exec_imm_target_segment_{next(_EXEC_IMM_SEQ)}"
    spark.sql(f"DECLARE OR REPLACE VARIABLE {var} STRING")
    try:
        spark.sql(
            f"""EXECUTE IMMEDIATE
            'SELECT c_mktsegment FROM customer
             GROUP BY 1 ORDER BY COUNT(*) DESC, c_mktsegment LIMIT 1'
            INTO {var}"""
        )
        out = spark.sql(
            f"""EXECUTE IMMEDIATE
            'SELECT ? AS segment, o_orderstatus,
                    CAST(COUNT(*) AS BIGINT) AS n_orders,
                    ROUND(SUM(o_totalprice), 4) AS total_price
             FROM orders JOIN customer ON o_custkey = c_custkey
             WHERE c_mktsegment = ? GROUP BY o_orderstatus'
            USING {var}, {var}"""
        )
        # EXECUTE IMMEDIATE binds the variable's VALUE at execution, so the
        # returned plan is literal-bound and survives the variable drop.
        return out
    finally:
        spark.sql(f"DROP TEMPORARY VARIABLE IF EXISTS {var}")


# --------------------------------------------------------------------------
# listagg / string_agg (round 6): Spark 4's ordered string aggregation —
# `listagg(expr, sep) WITHIN GROUP (ORDER BY ...)`, the SQL:2016 form —
# against DuckDB's string_agg(... ORDER BY ...). The WITHIN GROUP order
# key (s_name, unique per group) makes the concatenation a total order,
# so the STRING ITSELF is value-checked, not just its length. At 100 TB
# the operator's hazard is that the result grows with the group: it is
# a sort-based aggregate whose per-group output must fit in one row, so
# the exhibit aggregates a TRUE top-N — a ROW_NUMBER window caps each
# nation at its first 8 suppliers by name, keeping the per-group string
# CONSTANT-sized at any corpus scale (a fractional sample would still
# grow linearly; aggregate a bounded top-N, never an unbounded corpus,
# into a string).
# --------------------------------------------------------------------------
@query(
    "listagg_nation_suppliers",
    oracle="""
    WITH ranked AS (
      SELECT n_name, s_name,
             ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY s_name) AS rn
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    )
    SELECT n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS supplier_csv,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM ranked WHERE rn <= 8
    GROUP BY n_name
    """,
)
def listagg_nation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH ranked AS (
          SELECT n_name, s_name,
                 ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY s_name)
                   AS rn
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
        )
        SELECT n_name,
               listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)
                 AS supplier_csv,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM ranked WHERE rn <= 8
        GROUP BY n_name
        """
    )


# --------------------------------------------------------------------------
# percentile_cont vs percentile_disc (round 6): the SQL:2016 inverse
# distribution pair, same text on both engines. The semantic split
# matters operationally: _cont interpolates (its p50 may be a value no
# row ever had — fine for dashboards, wrong for "pick a real example
# row"), _disc returns the first actual data value whose cumulative
# distribution reaches the fraction. disc_is_data_value pins the
# defining property with an EXISTS membership test on the UNROUNDED
# disc result (exact equality is safe — disc copies a value, never
# computes one). Exact percentiles are the small-data oracle twin; the
# 100 TB path stays percentile_approx (price_percentiles_approx).
# --------------------------------------------------------------------------
_PCT_DISC_SQL = """
WITH p AS (
  SELECT l_returnflag,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
           AS p50_cont_raw,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
           AS p50_disc_raw,
         percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)
           AS p95_disc_raw
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND(p50_cont_raw, 4) AS p50_cont,
       ROUND(p50_disc_raw, 4) AS p50_disc,
       ROUND(p95_disc_raw, 4) AS p95_disc,
       EXISTS (SELECT 1 FROM lineitem li
               WHERE li.l_returnflag = p.l_returnflag
                 AND li.l_extendedprice = p.p50_disc_raw)
         AND EXISTS (SELECT 1 FROM lineitem li
                     WHERE li.l_returnflag = p.l_returnflag
                       AND li.l_extendedprice = p.p95_disc_raw)
         AS disc_is_data_value
FROM p
"""


@query("percentile_disc_vs_cont", oracle=_PCT_DISC_SQL)
def percentile_disc_vs_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_PCT_DISC_SQL)


# --------------------------------------------------------------------------
# explode vs explode_outer (round 6): generator null/empty semantics.
# Inner explode DROPS every row whose array is empty or null — the
# classic silent row-loss bug in per-document pipelines (a doc with no
# qualifying items vanishes from downstream stats with no error);
# explode_outer preserves the row with a NULL element. The probe builds
# per-order arrays of rare high-quantity items via a left join +
# collect_list (collect_list over a null-producing left join yields
# EMPTY arrays, the exact shape that triggers the trap), runs BOTH
# generators, and pins all four cardinalities against a closed-form
# relational oracle (no unnest needed on the DuckDB side): outer =
# inner + rows-with-no-hits, and the NULL-element count IS that
# row-loss delta. The three one-row aggregate branches combine in ONE
# lazy plan (broadcast singleton cross joins), so the generators sit
# inside the audited, returned plan and materialization is a single
# action — a first draft used four driver-side count() actions, which
# re-ran the probe join per action and hid the real plan from the
# audit behind a literal scan.
# --------------------------------------------------------------------------
@query(
    "explode_outer_row_preservation",
    oracle="""
    WITH probe AS (
      SELECT o_orderkey FROM orders WHERE o_orderkey % 17 = 0
    ), hits AS (
      SELECT o_orderkey, COUNT(*) AS n
      FROM lineitem JOIN probe ON l_orderkey = o_orderkey
      WHERE l_quantity >= 48
      GROUP BY o_orderkey
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS n_orders,
      (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM hits)
        AS n_inner_rows,
      (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM hits)
        + (SELECT CAST(COUNT(*) AS BIGINT) FROM probe)
        - (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_outer_rows,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM probe)
        - (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_null_rows
    """,
)
def explode_outer_row_preservation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    probe = orders.filter(F.col("o_orderkey") % 17 == 0).select("o_orderkey")
    big_items = lineitem.filter(F.col("l_quantity") >= 48).select(
        "l_orderkey", "l_quantity"
    )
    per_order = (
        probe.join(
            big_items,
            probe.o_orderkey == big_items.l_orderkey,
            "left_outer",
        )
        .groupBy("o_orderkey")
        .agg(F.collect_list("l_quantity").alias("qs"))
    )
    orders_cnt = per_order.agg(F.count("*").alias("n_orders"))
    inner_cnt = per_order.select(F.explode("qs").alias("q")).agg(
        F.count("*").alias("n_inner_rows")
    )
    outer_cnt = per_order.select(F.explode_outer("qs").alias("q")).agg(
        F.count("*").alias("n_outer_rows"),
        F.sum(F.when(F.col("q").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_rows"),
    )
    return orders_cnt.crossJoin(F.broadcast(inner_cnt)).crossJoin(
        F.broadcast(outer_cnt)
    )


# --------------------------------------------------------------------------
# Join strategy hints (round 7): the manual physical-join override — the
# one planner knob the engine uses everywhere (broadcast) but had never
# pinned as a *user-facing* surface. At 100 TB the optimizer's size
# estimates can mislead (post-filter dim cardinality unknown, stats
# stale), and the fix is a hint, not a rewrite: BROADCAST ships the dim
# to every task and the fact never shuffles; MERGE keeps both sides
# spillable (sort-merge — the safe choice when both sides are huge);
# SHUFFLE_HASH skips the sort when one side hashes into task memory.
# The probe runs the SAME orders x customer aggregate under all three
# hints in ONE union plan — tests/test_plans.py pins that each branch
# compiles to its distinct physical join (BroadcastHashJoin /
# SortMergeJoin / ShuffledHashJoin) — and the oracle computes the join
# once, cross-joined with the strategy labels: physical strategy must
# not change results, and each branch is value-checked independently.
# (Each branch's double SUM folds in its own partition order before the
# 4-dp round; a sum landing on a rounding midpoint could in principle
# split branches — same documented half-ulp class as kmeans.)
# --------------------------------------------------------------------------
JOIN_HINT_STRATEGIES: dict[str, str] = {
    "broadcast": "BROADCAST(c)",
    "merge": "MERGE(c)",
    "shuffle_hash": "SHUFFLE_HASH(c)",
}

_HINT_JOIN_BODY = """
    SELECT /*+ {hint} */
           c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 4) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
"""


def hinted_join_branch(spark: SparkSession, strategy: str) -> DataFrame:
    """One strategy's branch: the hinted aggregate tagged with its label.
    Exposed for the plan-pin test, which asserts each branch alone
    compiles to its hinted physical join."""
    body = _HINT_JOIN_BODY.format(hint=JOIN_HINT_STRATEGIES[strategy])
    return spark.sql(body).select(
        F.lit(strategy).alias("strategy"),
        "segment",
        "n_orders",
        "total_price",
    )


@query(
    "join_strategy_hint_matrix",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(o.o_totalprice), 4) AS total_price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    )
    SELECT s.strategy, j.segment, j.n_orders, j.total_price
    FROM j CROSS JOIN (
      VALUES ('broadcast'), ('merge'), ('shuffle_hash')
    ) AS s(strategy)
    """,
)
def join_strategy_hint_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    out = hinted_join_branch(spark, "broadcast")
    for strategy in ("merge", "shuffle_hash"):
        out = out.unionByName(hinted_join_branch(spark, strategy))
    return out


# --------------------------------------------------------------------------
# histogram_numeric (round 7) — Spark's streaming equi-height-ish histogram
# (the Hive/Ben-Haim-Tom-Tov NumericHistogram): one fixed-memory pass that
# maintains NB weighted centroids, merging the two closest on overflow.
# Mergeable partial state -> partial-aggregable -> 100 TB-shaped, and the
# single data-profiling pass every ingest pipeline wants before choosing
# bucket boundaries. The bin PLACEMENT is engine-specific (DuckDB has no
# replay), so the oracle pins the sketch's invariant PROPERTIES — exact
# bin count, exact mass conservation (sum of bin weights == row count:
# centroid merges add weights, losslessly, and counts stay exact doubles
# below 2^53), strictly ascending centroids, centroids inside the exact
# [min, max] — beside the exact scalars they are checked against. Same
# stance as approx_distinct_parts: a degraded sketch fails the value hash,
# not a rows-only count.
# --------------------------------------------------------------------------
HIST_NB = 8


@query(
    "histogram_numeric_profile",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST({HIST_NB} AS BIGINT) AS n_bins,
           TRUE AS mass_conserved,
           TRUE AS x_strictly_ascending,
           TRUE AS x_within_minmax,
           ROUND(MIN(l_extendedprice), 4) AS min_price,
           ROUND(MAX(l_extendedprice), 4) AS max_price
    FROM lineitem
    """,
)
def histogram_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregation pass computes the {HIST_NB}-bin histogram sketch
    AND the exact count/min/max it is audited against; the flags are
    JVM-side higher-order functions over the bin array."""
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    prof = li.agg(
        F.expr(f"histogram_numeric(l_extendedprice, {HIST_NB})").alias("h"),
        F.count("*").alias("n_rows"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    pairs = (
        "zip_with(slice(h, 1, size(h) - 1), slice(h, 2, size(h) - 1), "
        "(a, b) -> a.x < b.x)"
    )
    return prof.select(
        F.col("n_rows"),
        F.size("h").cast("long").alias("n_bins"),
        (
            F.expr("aggregate(h, 0.0D, (acc, b) -> acc + b.y)")
            == F.col("n_rows").cast("double")
        ).alias("mass_conserved"),
        F.expr(f"forall({pairs}, p -> p)").alias("x_strictly_ascending"),
        F.expr("forall(h, b -> b.x >= mn AND b.x <= mx)").alias(
            "x_within_minmax"
        ),
        F.round("mn", 4).alias("min_price"),
        F.round("mx", 4).alias("max_price"),
    )


# --------------------------------------------------------------------------
# df.stat.freqItems (round 7) — Spark's Karp-Schenker-Papadimitriou heavy-
# hitter pass: one fixed-memory scan returning a SUPERSET of every value
# whose frequency exceeds the support threshold (false positives allowed,
# false negatives impossible). The classic sketch-proposes/exact-verifies
# composition: the bounded candidate array (<= 1/support entries per
# column, one row total) broadcasts into an exact-count filter, so the
# final answer is EXACT while the corpus is scanned only twice. Note the
# candidate pass is EAGER — freqItems (like li.count below) runs a Spark
# job on call and returns a bounded 1-row local relation, which is then
# re-joined; only the verification aggregation defers to the final
# action. The support test is integer-exact on both sides
# (cnt * 10 > n * {{support*10}}), so no float boundary exists.
# --------------------------------------------------------------------------
FI_SUPPORT_TENTHS = 3  # support = 0.3


@query(
    "freq_items_verified",
    oracle=f"""
    WITH u AS (
      SELECT 'l_returnflag' AS column_name, l_returnflag AS value
      FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', l_linestatus FROM lineitem
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)
    SELECT column_name, value,
           CAST(COUNT(*) AS BIGINT) AS exact_cnt,
           ROUND(COUNT(*) * 1.0 / (SELECT n FROM n), 4) AS share
    FROM u
    WHERE value IS NOT NULL
    GROUP BY column_name, value
    HAVING COUNT(*) * 10 > (SELECT n FROM n) * {FI_SUPPORT_TENTHS}
    """,
)
def freq_items_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    support = FI_SUPPORT_TENTHS / 10.0
    # freqItems runs its one-pass streaming job EAGERLY and hands back the
    # candidate arrays as a bounded 1-row local relation (2 array cells);
    # only the exact-count verification pass below stays lazy.
    cand_row = li.stat.freqItems(["l_returnflag", "l_linestatus"], support)
    cands = (
        cand_row.select(
            F.explode("l_returnflag_freqItems").alias("value")
        ).withColumn("column_name", F.lit("l_returnflag"))
        .unionByName(
            cand_row.select(
                F.explode("l_linestatus_freqItems").alias("value")
            ).withColumn("column_name", F.lit("l_linestatus"))
        )
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    unpivoted = li.select(
        F.expr(
            "stack(2, 'l_returnflag', l_returnflag, "
            "'l_linestatus', l_linestatus) AS (column_name, value)"
        )
    ).filter(F.col("value").isNotNull())
    n_total = li.count()  # exact denominator; one bounded driver scalar
    counts = unpivoted.groupBy("column_name", "value").agg(
        F.count("*").alias("exact_cnt")
    )
    return (
        counts.join(F.broadcast(cands), ["column_name", "value"])
        .filter(F.col("exact_cnt") * 10 > F.lit(n_total) * FI_SUPPORT_TENTHS)
        .select(
            "column_name",
            "value",
            "exact_cnt",
            F.round(F.col("exact_cnt") / F.lit(n_total), 4).alias("share"),
        )
    )


# --------------------------------------------------------------------------
# CACHE TABLE / InMemoryRelation (round 7) — the caching layer, previously
# the one storage surface with no exhibit. CACHE TABLE materializes the
# relation once into Spark's compressed COLUMNAR in-memory format; every
# later consumer plans an InMemoryTableScan against it instead of re-running
# the scan+filter (plan-pinned in tests/test_plans.py for BOTH consumers
# here). The 100 TB role: a hot, reused intermediate (a filtered dimension,
# an iteration-invariant frame) is paid for once per cluster, not once per
# downstream query — the declarative sibling of the .persist() calls the
# engine's iterative operators already use. Cached-batch min/max stats also
# let later filters skip whole batches (partition pruning's in-memory twin).
# The cached projection here is 3 columns of orders post-filter — bounded,
# and the cache must stay alive when the fn returns because the driver
# executes the returned plan afterwards (cache substitution happens at
# planning time of each ACTION, not when the DataFrame object is built).
# --------------------------------------------------------------------------
CACHED_HOT_VIEW = "pmrs_cached_hot_orders"


@query(
    "cached_table_reuse",
    oracle="""
    WITH hot AS (
      SELECT o_orderstatus, o_totalprice, o_custkey
      FROM orders WHERE o_totalprice > 1000
    ), a AS (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(o_totalprice), 4) AS total_price
      FROM hot GROUP BY o_orderstatus
    ), b AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             ROUND(AVG(o_totalprice), 4) AS avg_price
      FROM hot
    )
    SELECT a.o_orderstatus, a.n_orders, a.total_price,
           b.n_customers, b.avg_price
    FROM a CROSS JOIN b
    """,
)
def cached_table_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent aggregates (per-status rollup; global distinct
    customers + mean) over ONE cached filtered projection — both consumers
    must plan InMemoryTableScan, proving the scan+filter is paid once."""
    register_views(spark, sf_dir)
    hot_src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 1000)
        .select("o_orderstatus", "o_totalprice", "o_custkey")
    )
    hot_src.createOrReplaceTempView(CACHED_HOT_VIEW)
    # Idempotent under re-registration (the driver calls each query fresh):
    # CACHE TABLE on an already-cached plan is a no-op, but the view text
    # may have been re-created, so drop any stale entry first.
    try:
        spark.catalog.uncacheTable(CACHED_HOT_VIEW)
    except Exception:
        pass
    spark.sql(f"CACHE TABLE {CACHED_HOT_VIEW}")  # eager columnar build
    # The cache must survive this function's return (the driver executes
    # the returned plan afterwards), so cleanup is DEFERRED: the next
    # query's register_views() uncaches it via PENDING_UNCACHE, bounding
    # residency to one registry slot rather than the whole run.
    from parallel_mapreduce_spark.sources.tables import PENDING_UNCACHE

    PENDING_UNCACHE.add(CACHED_HOT_VIEW)
    hot = spark.table(CACHED_HOT_VIEW)
    agg_a = hot.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )
    agg_b = hot.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )
    return agg_a.crossJoin(F.broadcast(agg_b))


# --------------------------------------------------------------------------
# df.transpose (round 7) — Spark 4.0's new reshape API, the inverse-ish of
# unpivot_pricing_metrics above: the INDEX column's VALUES become the
# output's column names (metrics-as-rows, groups-as-columns — the report
# orientation). Transpose must enumerate the distinct index values at PLAN
# time to name the columns, i.e. it executes the child and collects the
# index domain to the driver — inherently bounded work ONLY when the input
# is already an aggregate (here: 3 returnflag rows); transposing a
# corpus-scale frame would collect the corpus and is the anti-pattern this
# docstring exists to flag. Values are rounded BEFORE the reshape so both
# engines transpose identical cells.
# --------------------------------------------------------------------------
@query(
    "transpose_pricing_report",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS f,
             ROUND(AVG(l_extendedprice), 4) AS avg_price,
             ROUND(AVG(l_quantity), 4) AS avg_qty,
             ROUND(SUM(l_discount), 4) AS sum_disc
      FROM lineitem GROUP BY 1
    )
    SELECT 'avg_price' AS key,
           (SELECT avg_price FROM g WHERE f = 'A') AS A,
           (SELECT avg_price FROM g WHERE f = 'N') AS N,
           (SELECT avg_price FROM g WHERE f = 'R') AS R
    UNION ALL
    SELECT 'avg_qty',
           (SELECT avg_qty FROM g WHERE f = 'A'),
           (SELECT avg_qty FROM g WHERE f = 'N'),
           (SELECT avg_qty FROM g WHERE f = 'R')
    UNION ALL
    SELECT 'sum_disc',
           (SELECT sum_disc FROM g WHERE f = 'A'),
           (SELECT sum_disc FROM g WHERE f = 'N'),
           (SELECT sum_disc FROM g WHERE f = 'R')
    """,
)
def transpose_pricing_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag pricing metrics transposed to metrics-as-rows:
    (key, A, N, R). The transposed frame is 3x3 — group-count bounded."""
    register_views(spark, sf_dir)
    wide = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum("l_discount"), 4).alias("sum_disc"),
        )
    )
    return wide.transpose("l_returnflag")


# --------------------------------------------------------------------------
# Bitmap distinct-count rollup (round 7) — the EXACT mergeable twin of
# hll_sketch_mergeable_rollup: bitmap_bucket_number / bitmap_bit_position
# shard an integer key domain into fixed-size (32k-bit) bucket bitmaps,
# bitmap_construct_agg sets the bits, and coarser grains come from
# bitmap_or_agg over the finer grain's bitmaps — COUNT(DISTINCT) becomes a
# re-aggregatable SUM of bitmap popcounts with NO error bar (HLL trades
# exactness for constant size; bitmaps stay exact at size proportional to
# the key domain / density). The rollup-storage pattern for 100 TB: store
# per-(day, group, bucket) bitmaps once, answer any coarser distinct-count
# exactly by OR-merging — the fact stream never re-scans. The query
# value-checks BOTH levels against nothing less than the exact distinct:
# fine-grain (flag, status) counts summed from construct_agg bitmaps, and
# flag-level counts from or_agg-merged bitmaps, each pinned equal to
# COUNT(DISTINCT) in the oracle.
# --------------------------------------------------------------------------
@query(
    "bitmap_distinct_rollup",
    oracle="""
    WITH fine AS (
      SELECT l_returnflag, l_linestatus,
             COUNT(DISTINCT l_partkey) AS nd
      FROM lineitem GROUP BY 1, 2
    )
    SELECT f.l_returnflag,
           CAST(SUM(f.nd) AS BIGINT) AS sum_fine_distinct,
           CAST(g.nd AS BIGINT) AS n_distinct_parts,
           TRUE AS fine_bitmap_exact,
           TRUE AS merged_bitmap_exact
    FROM fine f
    JOIN (SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd
          FROM lineitem GROUP BY 1) g USING (l_returnflag)
    GROUP BY f.l_returnflag, g.nd
    """,
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per returnflag: the (flag, status)-grain distinct-part counts summed
    (fine grain), the flag-grain distinct from OR-merged bitmaps, and two
    booleans pinning both bitmap paths equal to the exact distinct."""
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_partkey"
    )
    bm = li.groupBy(
        "l_returnflag",
        "l_linestatus",
        F.expr("bitmap_bucket_number(l_partkey)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").alias(
            "bm"
        )
    )
    fine = bm.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("sum(bitmap_count(bm))").alias("nd_bitmap")
    )
    merged = (
        bm.groupBy("l_returnflag", "bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("l_returnflag")
        .agg(F.expr("sum(bitmap_count(bm))").alias("nd_merged"))
    )
    exact_fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.countDistinct("l_partkey").alias("nd_exact")
    )
    exact_flag = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_exact_flag")
    )
    fine_ok = (
        fine.join(exact_fine, ["l_returnflag", "l_linestatus"])
        .groupBy("l_returnflag")
        .agg(
            F.sum("nd_bitmap").cast("long").alias("sum_fine_distinct"),
            F.min(
                (F.col("nd_bitmap") == F.col("nd_exact")).cast("int")
            ).alias("_fine_ok"),
        )
    )
    return (
        fine_ok.join(merged, "l_returnflag")
        .join(exact_flag, "l_returnflag")
        .select(
            "l_returnflag",
            "sum_fine_distinct",
            F.col("nd_merged").cast("long").alias("n_distinct_parts"),
            (F.col("_fine_ok") == 1).alias("fine_bitmap_exact"),
            (F.col("nd_merged") == F.col("nd_exact_flag")).alias(
                "merged_bitmap_exact"
            ),
        )
    )


# --------------------------------------------------------------------------
# Column masking / data governance (round 7) — the SQL-standard mask()
# function (Spark 3.5+): upper -> X, lower -> x, digit -> n, other chars
# preserved. The governance pattern for sharing 100 TB outside the trust
# boundary: masking is a pure JVM projection (no UDF, survives pushdown
# around it), and UNLIKE redaction-by-regex-denylist (pii_redact, which
# targets KNOWN patterns) it destroys ALL alphanumeric content uniformly.
# The report value-checks that destruction: per market segment, the raw
# names are all distinct while the masked names collapse to ONE shape
# (every name matches 'Customer#' + 9 digits), so n_distinct_masked == 1 —
# the k-anonymity consequence the oracle pins exactly, along with the
# masked shape itself crossing the value hash. DuckDB replays mask() as
# three character-class regexp passes (upper first: introduced 'X'/'x'
# are never re-matched by a later class).
# --------------------------------------------------------------------------
@query(
    "mask_customer_pii",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_distinct_raw,
           CAST(COUNT(DISTINCT regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n',
             'g')) AS BIGINT) AS n_distinct_masked,
           MIN(regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n',
             'g')) AS masked_shape
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def mask_customer_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment: customer count, distinct raw vs masked names
    (mask collapses every name to one shape), and that shape itself."""
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_name", F.expr("mask(c_name)").alias("masked")
    )
    return cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_name").alias("n_distinct_raw"),
        F.countDistinct("masked").alias("n_distinct_masked"),
        F.min("masked").alias("masked_shape"),
    )


# --------------------------------------------------------------------------
# Theta sketch set algebra (round 7) — the DataSketches Theta family:
# unlike HLL (union-only), Theta sketches support INTERSECTION and
# DIFFERENCE, answering "distinct customers in A but not B" from two small
# sketch states without touching the fact table again — the audience-
# overlap / retention-delta primitive at 100 TB. Error stance: every
# estimate's error is relative to the SUPPORT the sketch sampled (the
# union), so all five estimates are pinned |est - exact| <= 5% of the
# exact union — the 3-sigma bound at the default nominal 4096 entries is
# 4.7%, and the sampling seed is fixed, so the booleans are deterministic
# per dataset (exact regime below 4096 distincts: sf0.01 and down).
# The EXACT set algebra crosses the value hash; one conditional-aggregate
# pass computes it (per-custkey membership flags -> five sums), and one
# FILTER-clause aggregate pass builds both sketches.
# --------------------------------------------------------------------------
@query(
    "theta_customer_set_algebra",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             bool_or(o_orderstatus = 'F') AS fa,
             bool_or(o_orderstatus = 'O') AS fb
      FROM orders WHERE o_orderstatus IN ('F', 'O')
      GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) FILTER (fa) AS BIGINT) AS n_f,
           CAST(COUNT(*) FILTER (fb) AS BIGINT) AS n_o,
           CAST(COUNT(*) AS BIGINT) AS n_union,
           CAST(COUNT(*) FILTER (fa AND fb) AS BIGINT) AS n_both,
           CAST(COUNT(*) FILTER (fa AND NOT fb) AS BIGINT) AS n_f_only,
           TRUE AS f_within_bound, TRUE AS o_within_bound,
           TRUE AS union_within_bound, TRUE AS intersect_within_bound,
           TRUE AS difference_within_bound
    FROM per
    """,
)
def theta_customer_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers with F-status orders, O-status orders, and their
    union/intersection/difference — exact counts value-checked, with the
    five Theta-sketch estimates pinned inside 5% of the exact union."""
    register_views(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "O")
    )
    per = o.groupBy("o_custkey").agg(
        F.max((F.col("o_orderstatus") == "F").cast("int")).alias("fa"),
        F.max((F.col("o_orderstatus") == "O").cast("int")).alias("fb"),
    )
    exact = per.agg(
        F.sum("fa").cast("long").alias("n_f"),
        F.sum("fb").cast("long").alias("n_o"),
        F.count("*").alias("n_union"),
        F.sum(F.col("fa") * F.col("fb")).cast("long").alias("n_both"),
        F.sum(F.col("fa") * (1 - F.col("fb"))).cast("long").alias("n_f_only"),
    )
    sk = o.agg(
        F.expr(
            "theta_sketch_agg(o_custkey) FILTER (WHERE o_orderstatus = 'F')"
        ).alias("ska"),
        F.expr(
            "theta_sketch_agg(o_custkey) FILTER (WHERE o_orderstatus = 'O')"
        ).alias("skb"),
    ).selectExpr(
        "theta_sketch_estimate(ska) AS ta",
        "theta_sketch_estimate(skb) AS tb",
        "theta_sketch_estimate(theta_union(ska, skb)) AS tu",
        "theta_sketch_estimate(theta_intersection(ska, skb)) AS ti",
        "theta_sketch_estimate(theta_difference(ska, skb)) AS td",
    )
    bound = 0.05 * F.col("n_union")
    return exact.crossJoin(F.broadcast(sk)).select(
        "n_f",
        "n_o",
        "n_union",
        "n_both",
        "n_f_only",
        (F.abs(F.col("ta") - F.col("n_f")) <= bound).alias("f_within_bound"),
        (F.abs(F.col("tb") - F.col("n_o")) <= bound).alias("o_within_bound"),
        (F.abs(F.col("tu") - F.col("n_union")) <= bound).alias(
            "union_within_bound"
        ),
        (F.abs(F.col("ti") - F.col("n_both")) <= bound).alias(
            "intersect_within_bound"
        ),
        (F.abs(F.col("td") - F.col("n_f_only")) <= bound).alias(
            "difference_within_bound"
        ),
    )


# --------------------------------------------------------------------------
# KLL quantile rollup (round 7) — the DataSketches KLL family: mergeable
# quantile STATE as a first-class SQL value (kll_sketch_agg_double ->
# kll_merge_agg_double -> get_quantile), completing the mergeable-sketch
# matrix (HLL/Theta: distincts, CMS/FI: frequencies, KLL: quantiles,
# bitmaps: exact distincts). Unlike approx_percentile (one-shot GK, state
# internal), KLL's per-group sketches persist and roll up — store per-day
# sketches once, answer any coarser-grain quantile later. KLL's guarantee
# is on RANK, not value: the value returned for quantile q has TRUE rank
# within q +/- eps (~1.65% at the default k=200, 99% confidence); the
# query computes that true rank EXACTLY (one conditional count pass) and
# pins |rank - q| <= 2% per probe — measured 0.02-0.5% at sf0.01-0.1.
# --------------------------------------------------------------------------
KLL_PROBES = (0.5, 0.9, 0.99)


@query(
    "kll_quantile_rollup",
    oracle=" UNION ALL ".join(
        f"""SELECT CAST({q} AS DOUBLE) AS q,
            ROUND(quantile_cont(l_extendedprice, {q}), 4) AS exact_value,
            TRUE AS rank_within_bound FROM lineitem"""
        for q in KLL_PROBES
    ),
)
def kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per probe quantile: the exact value (value-checked) and whether the
    value read from the MERGED per-returnflag KLL sketches has true rank
    within 2% of the probe — the KLL guarantee, checked exactly."""
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    merged = (
        li.groupBy("l_returnflag")
        .agg(F.expr("kll_sketch_agg_double(l_extendedprice)").alias("sk"))
        .agg(F.expr("kll_merge_agg_double(sk)").alias("msk"))
    )
    est_row = merged.selectExpr(
        *[
            f"kll_sketch_get_quantile_double(msk, {q}) AS q{i}"
            for i, q in enumerate(KLL_PROBES)
        ]
    ).collect()[0]  # 3 scalars; the only driver-side hop
    ests = {q: est_row[f"q{i}"] for i, q in enumerate(KLL_PROBES)}
    agg_cols = [F.count("*").alias("n")]
    for i, q in enumerate(KLL_PROBES):
        agg_cols.append(
            F.sum(
                (F.col("l_extendedprice") <= F.lit(ests[q])).cast("long")
            ).alias(f"le{i}")
        )
        agg_cols.append(
            F.round(
                F.percentile("l_extendedprice", F.lit(q)), 4
            ).alias(f"ex{i}")
        )
    one = li.agg(*agg_cols)
    rows = one.select(
        F.expr(
            "stack({}, {}) AS (q, exact_value, rank_within_bound)".format(
                len(KLL_PROBES),
                ", ".join(
                    f"CAST({q} AS DOUBLE), ex{i}, "
                    f"abs(le{i} / n - CAST({q} AS DOUBLE)) <= 0.02"
                    for i, q in enumerate(KLL_PROBES)
                ),
            )
        )
    )
    return rows


# --------------------------------------------------------------------------
# HLL precision/accuracy curve (round 8) — the committed memory/accuracy
# trade-off for the distinct-count sketch, the sibling of the ANN
# recall matrix: hll_sketch_mergeable_rollup proves the merge contract at
# ONE precision; this measures what each precision BUYS. One pass builds
# sketches at lgConfigK = 4/6/8/10/12 (2^lgK 6-bit registers, i.e.
# 12 B -> 3 KB of state); each estimate is bound-checked against the
# exact distinct at 4 sigma of the theoretical rsd 1.04/sqrt(2^lgK)
# (integer-literal rsd_x10000 on both sides, so the bound itself rides
# the hash). The estimates are engine-internal (DuckDB cannot replay
# DataSketches HLL), so — the approx_distinct_parts contract — the exact
# count crosses the hash as a value and the bound as an oracle-pinned
# TRUE: a degraded sketch at any precision fails the gate. Measured on
# this corpus: within bound at every precision.
# --------------------------------------------------------------------------
HLL_CURVE_LGKS = (4, 6, 8, 10, 12)
_HLL_RSD_X10000 = {
    lg: int(1.04 / (2**lg) ** 0.5 * 10000) for lg in HLL_CURVE_LGKS
}


@query(
    "hll_precision_error_curve",
    oracle="""
    WITH ex AS (
      SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
      FROM lineitem
    )
    SELECT lg_k, exact_parts, rsd_x10000, TRUE AS within_4sigma
    FROM ex CROSS JOIN (
      VALUES {values}
    ) v(lg_k, rsd_x10000)
    """.format(
        values=", ".join(
            f"(CAST({lg} AS BIGINT), CAST({_HLL_RSD_X10000[lg]} AS BIGINT))"
            for lg in HLL_CURVE_LGKS
        )
    ),
)
def hll_precision_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lg_k, exact_parts, rsd_x10000, within_4sigma) per precision: the
    sketch-state-size vs accuracy curve, every row's estimate asserted
    within 4 sigma of its precision's theoretical rsd."""
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
        *[
            F.hll_sketch_estimate(
                F.hll_sketch_agg("l_partkey", F.lit(lg))
            ).alias(f"est_{lg}")
            for lg in HLL_CURVE_LGKS
        ],
    )
    stack_expr = "stack({n}, {args}) AS (lg_k, rsd_x10000, est)".format(
        n=len(HLL_CURVE_LGKS),
        args=", ".join(
            f"CAST({lg} AS BIGINT), CAST({_HLL_RSD_X10000[lg]} AS BIGINT),"
            f" est_{lg}"
            for lg in HLL_CURVE_LGKS
        ),
    )
    return row.select("exact_parts", F.expr(stack_expr)).select(
        "lg_k",
        "exact_parts",
        "rsd_x10000",
        (
            F.abs(F.col("est") - F.col("exact_parts"))
            <= F.lit(4.0) * F.col("rsd_x10000") / 10000.0 * F.col("exact_parts")
        ).alias("within_4sigma"),
    )


# --------------------------------------------------------------------------
# k-anonymity generalization audit (round 10, session 3) — the data-release
# governance question the PII family (mask_customer_pii / pii_redact /
# user_erasure_audit) stops short of: after masking direct identifiers,
# can the QUASI-identifier combination (nation, market segment, account-
# balance bucket) still single customers out? Sweeney 2002's k-anonymity:
# a release is k-anonymous iff every quasi-identifier group holds >= k
# rows. The query walks a 5-level generalization lattice (balance bucket
# 100s -> 1000s -> suppressed -> nation coarsened to region -> region
# only) and reports, per level, the group count, the smallest group, and
# how many rows sit in groups below K_ANON — the table a steward reads to
# pick the coarsest level that is actually releasable.
#
# Scale shape: one hash aggregate per lattice level over the customer
# frame (5 corpus passes, each count-only), the 25-row nation dim
# broadcast for the region levels; per-level group stats fold in a second
# tiny aggregate over the group counts. No windows, no driver loops.
# Bucket arithmetic note: FLOOR(acctbal / 10^b) is engine-stable because
# a 2-dp decimal only reaches a floor boundary when it is an exact
# multiple of the bucket width, and those are integers (exact doubles).
# --------------------------------------------------------------------------
K_ANON = 5
_KANON_LEVELS = [
    # (level, label, DuckDB group-key expr on customer c + nation n)
    (0, "nation+segment+bal100", "c.c_nationkey, c.c_mktsegment,"
        " FLOOR(c.c_acctbal / 100)"),
    (1, "nation+segment+bal1000", "c.c_nationkey, c.c_mktsegment,"
        " FLOOR(c.c_acctbal / 1000)"),
    (2, "nation+segment", "c.c_nationkey, c.c_mktsegment"),
    (3, "region+segment", "n.n_regionkey, c.c_mktsegment"),
    (4, "region", "n.n_regionkey"),
]


def _kanon_oracle() -> str:
    legs = []
    for lvl, label, keys in _KANON_LEVELS:
        legs.append(f"""
    SELECT CAST({lvl} AS BIGINT) AS gen_level,
           '{label}' AS quasi_ids,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(grp_n) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN grp_n < {K_ANON} THEN grp_n ELSE 0 END)
                AS BIGINT) AS rows_below_k,
           ROUND(SUM(CASE WHEN grp_n < {K_ANON} THEN grp_n ELSE 0 END)
                 * 1.0 / SUM(grp_n), 4) AS pct_below_k,
           MIN(grp_n) >= {K_ANON} AS k_anonymous
    FROM (
      SELECT COUNT(*) AS grp_n
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY {keys}
    )""")
    return "\n    UNION ALL\n".join(legs)


@query("k_anonymity_generalization", oracle=_kanon_oracle())
def k_anonymity_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(gen_level, quasi_ids, n_groups, min_group_size, rows_below_k,
    pct_below_k, k_anonymous) — one row per generalization-lattice level,
    K_ANON = 5."""
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    base = cust.join(
        F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"]
    )
    level_keys = {
        0: [
            F.col("c_nationkey"),
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") / 100),
        ],
        1: [
            F.col("c_nationkey"),
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") / 1000),
        ],
        2: [F.col("c_nationkey"), F.col("c_mktsegment")],
        3: [F.col("n_regionkey"), F.col("c_mktsegment")],
        4: [F.col("n_regionkey")],
    }
    out = None
    for lvl, label, _keys_sql in _KANON_LEVELS:
        groups = base.groupBy(*level_keys[lvl]).agg(
            F.count("*").alias("grp_n")
        )
        below = F.when(F.col("grp_n") < K_ANON, F.col("grp_n")).otherwise(
            F.lit(0)
        )
        leg = groups.agg(
            F.lit(lvl).cast("long").alias("gen_level"),
            F.lit(label).alias("quasi_ids"),
            F.count("*").cast("long").alias("n_groups"),
            F.min("grp_n").cast("long").alias("min_group_size"),
            F.sum(below).cast("long").alias("rows_below_k"),
            F.round(F.sum(below) * 1.0 / F.sum("grp_n"), 4).alias(
                "pct_below_k"
            ),
            (F.min("grp_n") >= K_ANON).alias("k_anonymous"),
        )
        out = leg if out is None else out.union(leg)
    return out
