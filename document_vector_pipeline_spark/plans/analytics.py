"""General analytics over the star schema (SURVEY.md §2 #28-32): the engine
must also answer the relational queries a corpus-metadata warehouse gets.

Plan discipline (checked in tests via explain):
- selective filters sit directly on the scans (parquet pushdown),
- dimension tables (region/nation/customer at SF) join via broadcast,
- aggregates are declared so Catalyst does partial (map-side) aggregation.

Determinism contract: every money aggregate uses fixed-point arithmetic —
`sum(cast(round(expr * 10^s) as long)) / 10^s` — so the result is an exact
integer sum of 10^-s units.  Double summation order varies with partition
layout (and between engines); integer summation does not, so the same query
at 100 TB on 1000 executors reproduces bit-identical results, and the
DuckDB oracle matches by value, not by tolerance.  The testdata prices are
2-decimal, so no information is lost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def money_sum(expr: Column, scale: int = 4) -> Column:
    """Deterministic sum of a decimal-valued double column as exact integer
    10^-scale units, emitted as double (see module docstring)."""
    unit = float(10 ** scale)
    return F.sum(F.round(expr * unit, 0).cast("long")) / unit


def q1_pricing(lineitem: DataFrame, ship_before: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1-style pricing summary."""
    agg = (lineitem
           .filter(F.col("l_shipdate") < ship_before)
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum("l_quantity").alias("sum_qty"),
                money_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
                money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                 .alias("sum_disc_price"),
                money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                          * (1 + F.col("l_tax")), 6).alias("sum_charge"),
                money_sum(F.col("l_discount"), 2).alias("sum_disc"),
                F.count("*").alias("count_order")))
    return (agg.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge",
        F.round(F.col("sum_qty") / F.col("count_order"), 6).alias("avg_qty"),
        F.round(F.col("sum_base_price") / F.col("count_order"), 6).alias("avg_price"),
        F.round(F.col("sum_disc") / F.col("count_order"), 6).alias("avg_disc"),
        "count_order")
        .orderBy("l_returnflag", "l_linestatus"))


def q3_shipping(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                segment: str = "BUILDING",
                cutoff: str = "1996-03-15") -> DataFrame:
    """TPC-H Q3-style shipping priority: 3-way join, top revenue orders."""
    return (lineitem.filter(F.col("l_shipdate") > cutoff)
            .join(orders.filter(F.col("o_orderdate") < cutoff),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
            .limit(10))


def q5_local_supplier(region: DataFrame, nation: DataFrame, customer: DataFrame,
                      supplier: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, region_name: str = "ASIA",
                      date_from: str = "1996-01-01",
                      date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H Q5-style local-supplier revenue: 6-way join; all dims broadcast;
    the customer-nation == supplier-nation co-location constraint."""
    return (lineitem
            .join(orders.filter((F.col("o_orderdate") >= date_from)
                                & (F.col("o_orderdate") < date_to)),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(customer),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(supplier),
                  (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region.filter(F.col("r_name") == region_name)),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("n_name")
            .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), "n_name"))


def q6_forecast(lineitem: DataFrame, date_from: str = "1996-01-01",
                date_to: str = "1997-01-01", disc: float = 0.06,
                qty: int = 24) -> DataFrame:
    """TPC-H Q6-style forecast revenue: selective scan, single agg."""
    return (lineitem
            .filter((F.col("l_shipdate") >= date_from)
                    & (F.col("l_shipdate") < date_to)
                    & (F.col("l_discount") >= disc - 0.011)
                    & (F.col("l_discount") <= disc + 0.011)
                    & (F.col("l_quantity") < qty))
            .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount"), 4)
                 .alias("revenue")))


def q14_promo(lineitem: DataFrame, part: DataFrame,
              date_from: str = "1996-01-01",
              date_to: str = "1996-02-01") -> DataFrame:
    """TPC-H Q14-style promotion revenue share: selective lineitem scan,
    broadcast part join, conditional fixed-point aggregation."""
    cents4 = F.round((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                     * 10000.0, 0).cast("long")
    j = (lineitem.filter((F.col("l_shipdate") >= date_from)
                         & (F.col("l_shipdate") < date_to))
         .join(F.broadcast(part),
               F.col("l_partkey") == F.col("p_partkey")))
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", cents4).otherwise(0))
         .alias("promo_cents4"),
        F.sum(cents4).alias("total_cents4"),
        F.count("*").alias("n_items"),
        F.count(F.when(F.col("p_type") == "PROMO", 1)).alias("n_promo_items"))
    return agg.select(
        F.round(F.lit(100.0) * F.col("promo_cents4") / F.col("total_cents4"),
                6).alias("promo_revenue"),
        "n_items", "n_promo_items")


def events_enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Events × customer broadcast enrichment + per-segment/type rollup
    (user_id is a customer key in the testdata)."""
    joined = events.join(F.broadcast(customer),
                         F.col("user_id") == F.col("c_custkey"), "inner")
    return (joined.groupBy("c_mktsegment", "event_type")
            .agg(F.count("*").alias("n_events"),
                 money_sum(F.col("value"), 2).alias("total_value"))
            .orderBy("c_mktsegment", "event_type"))
