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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from document_vector_pipeline_spark.functions.expr import epoch_us


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


def q4_late_orders(orders: DataFrame, lineitem: DataFrame,
                   slack_days: int = 60) -> DataFrame:
    """TPC-H Q4-style order-priority check, adapted to the available columns
    (no l_commitdate in the testdata): count orders with at least one line
    shipped more than ``slack_days`` after the order date.  LEFT SEMI join —
    no distinct, no row blowup; at scale this is one shuffle on orderkey
    with the EXISTS short-circuit evaluated stream-side."""
    late = orders.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr(f"INTERVAL {slack_days} DAYS")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


def q10_returned(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                 date_from: str = "1996-01-01",
                 date_to: str = "1996-04-01", topn: int = 20) -> DataFrame:
    """TPC-H Q10-style returned-item losses: selective quarter of orders,
    returned lines only, revenue per customer, top N.  Customer is the
    broadcast side; revenue is fixed-point so the top-N cut is exact."""
    return (lineitem.filter(F.col("l_returnflag") == "R")
            .join(orders.filter((F.col("o_orderdate") >= date_from)
                                & (F.col("o_orderdate") < date_to)),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(customer),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
            .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                           4).alias("revenue"))
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(topn))


def q13_custdist(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT join so
    zero-order customers land in the c_count=0 bucket, then a second
    aggregation over the (tiny) per-customer counts."""
    counts = (customer
              .join(orders.filter(F.col("o_orderpriority") != "1-URGENT"),
                    F.col("c_custkey") == F.col("o_custkey"), "left")
              .groupBy("c_custkey")
              .agg(F.count("o_orderkey").alias("c_count")))
    return (counts.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


def q18_large_orders(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, qty_threshold: int = 250) -> DataFrame:
    """TPC-H Q18-style large-volume orders: the HAVING side aggregates
    lineitem FIRST (map-side partials shrink the shuffle to one row per
    order), then joins the few surviving keys; customer is broadcast.
    l_quantity values are integral doubles, so sums are exact."""
    big = (lineitem.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .filter(F.col("sum_qty") > qty_threshold))
    return (orders
            .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(customer),
                  F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                    "o_totalprice", "sum_qty")
            .orderBy(F.desc("sum_qty"), "o_orderkey"))


def q19_disjuncts(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-style disjunctive brand/size/quantity predicates: broadcast
    part join; the OR-of-ANDs stays a single codegen'd predicate so Catalyst
    can still push the common conjuncts (qty/size bounds) to the scans."""

    def arm(brand: str, max_size: int, qmin: int, qmax: int):
        return ((F.col("p_brand") == brand) & (F.col("p_size") <= max_size)
                & (F.col("l_quantity") >= qmin) & (F.col("l_quantity") <= qmax))

    return (lineitem
            .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .filter(arm("Brand#1", 15, 1, 15) | arm("Brand#2", 25, 10, 30)
                    | arm("Brand#3", 35, 20, 40))
            .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                           4).alias("revenue"),
                 F.count("*").alias("n_items")))


def q22_inactive(customer: DataFrame, orders: DataFrame,
                 cutoff: str = "2000-01-01") -> DataFrame:
    """TPC-H Q22-style global-sales-opportunity, adapted (every testdata
    customer has orders): above-average-balance customers with NO urgent
    order since ``cutoff``, counted per market segment.

    The average-balance threshold is compared in integer cents domain
    (bal_cents·n > total_cents) — no division, so the boundary is exact on
    both engines.  The scalar aggregate broadcasts (1 row); the exclusion is
    a LEFT ANTI join on the filtered order set."""
    cents = F.round(F.col("c_acctbal") * 100.0, 0).cast("long")
    pos = (customer.filter(F.col("c_acctbal") > 0.0)
           .agg(F.sum(cents).alias("total_cents"),
                F.count("*").alias("n_pos")))
    urgent = orders.filter((F.col("o_orderpriority") == "1-URGENT")
                           & (F.col("o_orderdate") >= cutoff))
    return (customer
            .join(F.broadcast(pos))
            .filter((cents * F.col("n_pos")) > F.col("total_cents"))
            .join(urgent, F.col("c_custkey") == F.col("o_custkey"),
                  "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("numcust"),
                 money_sum(F.col("c_acctbal"), 2).alias("totacctbal"))
            .orderBy("c_mktsegment"))


def q7_volume(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
              supplier: DataFrame, nation: DataFrame,
              n1: str = "NATION_1", n2: str = "NATION_2",
              date_from: str = "1996-01-01",
              date_to: str = "1998-01-01") -> DataFrame:
    """TPC-H Q7-style cross-nation shipping volume between two nations,
    per (supp_nation, cust_nation, year).

    Scale plan: the nation-pair predicate is applied to supplier and
    customer BEFORE they touch the fact tables, so only ~2/25 of each
    dimension is broadcast and the lineitem⋈orders shuffle is the sole
    big exchange."""
    pair = nation.filter(F.col("n_name").isin(n1, n2))
    supp = (supplier.join(F.broadcast(pair),
                          F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust = (customer.join(F.broadcast(pair),
                          F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    j = (lineitem.filter((F.col("l_shipdate") >= date_from)
                         & (F.col("l_shipdate") < date_to))
         .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
         .filter(F.col("supp_nation") != F.col("cust_nation")))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
            .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                           4).alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


def q8_share(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
             supplier: DataFrame, nation: DataFrame, region: DataFrame,
             part: DataFrame, target_nation: str = "NATION_3",
             target_region: str = "ASIA",
             p_type: str = "ECONOMY") -> DataFrame:
    """TPC-H Q8-style market share: the target nation's fraction of revenue
    for one part type sold to customers in one region, per order year.

    The share divides two exact integer-cents4 sums (conditional numerator /
    total), rounded at 6 dp — bit-stable cross-engine.  Region→nation→
    customer prune before the fact join; part filter prunes lineitem via a
    broadcast join."""
    cents4 = F.round((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                     * 10000.0, 0).cast("long")
    rnat = (nation.join(F.broadcast(
                region.filter(F.col("r_name") == target_region)),
                F.col("n_regionkey") == F.col("r_regionkey"))
            .select(F.col("n_nationkey").alias("rn_key")))
    cust = (customer.join(F.broadcast(rnat),
                          F.col("c_nationkey") == F.col("rn_key"))
            .select("c_custkey"))
    supp = (supplier.join(F.broadcast(nation),
                          F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    j = (lineitem
         .join(F.broadcast(part.filter(F.col("p_type") == p_type)
                           .select("p_partkey")),
               F.col("l_partkey") == F.col("p_partkey"))
         .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")))
    return (j.groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(F.when(F.col("supp_nation") == target_nation, cents4)
                       .otherwise(0)).alias("nat_cents4"),
                 F.sum(cents4).alias("tot_cents4"))
            .select("o_year",
                    F.round(F.col("nat_cents4") / F.col("tot_cents4"), 6)
                    .alias("mkt_share"),
                    (F.col("tot_cents4") / 10000.0).alias("total_revenue"))
            .orderBy("o_year"))


def q12_priority(orders: DataFrame, lineitem: DataFrame,
                 date_from: str = "1996-01-01",
                 date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H Q12-style priority split (adapted: no l_shipmode/l_commitdate
    in the testdata, so l_linestatus plays the ship-mode role and the year
    filter sits on l_shipdate).  Conditional counts stay one aggregation;
    the lineitem⋈orders join is the only shuffle and the date filter is
    pushed to the lineitem scan."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (lineitem.filter((F.col("l_shipdate") >= date_from)
                            & (F.col("l_shipdate") < date_to))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_linestatus")
            .agg(F.count(F.when(high, 1)).alias("high_line_count"),
                 F.count(F.when(~high, 1)).alias("low_line_count"))
            .orderBy("l_linestatus"))


def q16_suppcnt(lineitem: DataFrame, part: DataFrame,
                excl_brand: str = "Brand#45",
                sizes: tuple = (1, 4, 9, 16, 25, 36, 49)) -> DataFrame:
    """TPC-H Q16-style supplier-count distribution (adapted: lineitem plays
    partsupp's role as the part↔supplier bridge).  COUNT(DISTINCT) expands
    to Spark's two-phase plan — partial distinct on (brand, type, size,
    suppkey), then the final count — so no single reducer sees all pairs."""
    pt = part.filter((F.col("p_brand") != excl_brand)
                     & F.col("p_size").isin(*sizes))
    return (lineitem
            .join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


def q17_small_qty(lineitem: DataFrame, part: DataFrame,
                  brand: str = "Brand#23") -> DataFrame:
    """TPC-H Q17-style small-quantity revenue: average yearly revenue lost
    if orders below 20% of a part's average quantity were no longer taken.

    The correlated scalar subquery becomes aggregate-then-join (one shuffle
    each side, partial aggs shrink the per-part stats to one row/part).
    The 20%-of-average comparison is cleared of division: qty < 0.2·(sq/n)
    ⇔ 5·qty·n < sq, exact because quantities are integral doubles.  The
    final /7.0 acts on an exact cents sum — same op in both engines."""
    per_part = (lineitem.groupBy("l_partkey")
                .agg(F.count("*").alias("pp_n"),
                     F.sum("l_quantity").alias("pp_sum_qty"))
                .withColumnRenamed("l_partkey", "pp_partkey"))
    sel = (lineitem
           .join(F.broadcast(part.filter(F.col("p_brand") == brand)
                             .select("p_partkey")),
                 F.col("l_partkey") == F.col("p_partkey"))
           .join(per_part, F.col("l_partkey") == F.col("pp_partkey"))
           .filter(F.col("l_quantity") * 5.0 * F.col("pp_n")
                   < F.col("pp_sum_qty")))
    return sel.agg(
        F.round(money_sum(F.col("l_extendedprice"), 2) / 7.0, 6)
         .alias("avg_yearly"),
        F.count("*").alias("n_lines"))


def events_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured column handling: parse the JSON ``props`` payload
    (``{"k": int}``) with get_json_object — JVM-side Jackson path, no Python
    — and aggregate the extracted field per event type.  Integer sums and
    exact-integer division keep the average bit-stable cross-engine."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (events.groupBy("event_type")
            .agg(F.count(k).alias("n_with_k"),
                 F.sum(k).alias("sum_k"),
                 F.min(k).alias("min_k"),
                 F.max(k).alias("max_k"))
            .withColumn("avg_k", F.round(F.col("sum_k")
                                         / F.col("n_with_k"), 6))
            .orderBy("event_type"))


def events_lag_deltas(events: DataFrame) -> DataFrame:
    """Per-user inter-event gaps via lag() (one window pass), aggregated per
    event type.  Gap sums are exact integer microseconds; the average is an
    exact-integer division rounded at 6 dp — bit-stable cross-engine."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (epoch_us(F.col("ts"))
           - epoch_us(F.lag("ts").over(w))).alias("gap_us")
    return (events.select("event_type", gap)
            .groupBy("event_type")
            .agg(F.count("gap_us").alias("n_gaps"),
                 F.sum("gap_us").alias("sum_gap_us"),
                 F.max("gap_us").alias("max_gap_us"))
            .withColumn("avg_gap_us",
                        F.round(F.col("sum_gap_us") / F.col("n_gaps"), 6))
            .orderBy("event_type"))


def events_percentiles(events: DataFrame) -> DataFrame:
    """Discrete percentiles (p50/p90/p99) of value per event type, by exact
    rank selection: idx_p = (n-1)·p (integer arithmetic), total order
    (value, event_id).  No interpolation — the selected values are raw
    input doubles, so both engines agree bit-for-bit.  The ranking is
    TWO-PHASE per-group (plans/ranking.grouped_running_sum): this
    frame is the RAW EVENTS table and event types are a handful, so a
    type-partitioned window would drag the whole corpus through a few
    tasks — the worst few-huge-groups shape in the repo."""
    from document_vector_pipeline_spark.plans.ranking import (
        grouped_running_sum)

    base = events.select("event_type", "value", "event_id",
                         F.lit(1).cast("long").alias("__one"))
    n_per = (events.groupBy("event_type")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    ranked = (grouped_running_sum(
                  base, "event_type",
                  [F.col("value"), F.col("event_id")], "__one", out="rn")
              .join(F.broadcast(n_per), "event_type")
              .select("event_type", "value", "rn", "n"))

    def at(pct: int):
        idx = ((F.col("n") - 1) * pct - ((F.col("n") - 1) * pct) % 100) / 100
        return F.max(F.when(F.col("rn") == idx.cast("long") + 1,
                            F.col("value")))

    return (ranked.groupBy("event_type")
            .agg(F.max("n").alias("n_events"),
                 at(50).alias("p50"), at(90).alias("p90"),
                 at(99).alias("p99"))
            .orderBy("event_type"))


def orders_latency(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Order-to-first-ship latency percentiles per order priority:
    (priority, n_orders, p50_days, p90_days, p99_days) — the
    fulfillment-SLA dashboard, in exact integer days with the same
    rank-selection contract as events_percentiles (idx = (n-1)·p,
    total order (days, orderkey), no interpolation).

    Plan: one orderkey-join shuffle attaches min(l_shipdate) per order
    (partial-aggregated map-side), day difference is integer µs
    division, and the percentile ranking runs on the per-ORDER table —
    one row per order, never per lineitem — in TWO-PHASE per-group
    form (plans/ranking.grouped_running_sum): with only 5 priorities a
    priority-partitioned window is one task per priority, the same
    few-huge-groups trap as token budgets."""
    from document_vector_pipeline_spark.plans.ranking import (
        grouped_running_sum)

    first_ship = (lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey"))
                  .agg(F.min("l_shipdate").alias("first_ship")))
    us_diff = (epoch_us(F.date_trunc("day", F.col("first_ship")))
               - epoch_us(F.date_trunc("day", F.col("o_orderdate"))))
    days = us_diff.cast("long") - F.pmod(us_diff.cast("long"),
                                         F.lit(86_400_000_000))
    days = (days / F.lit(86_400_000_000)).cast("long")
    per = (orders.join(first_ship, "o_orderkey")
           .select(F.col("o_orderpriority").alias("priority"),
                   F.col("o_orderkey").alias("okey"),
                   days.alias("days"),
                   F.lit(1).cast("long").alias("__one")))
    n_per = (per.groupBy(F.col("priority").alias("priority"))
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    ranked = (grouped_running_sum(
                  per, "priority", [F.col("days"), F.col("okey")],
                  "__one", out="rn")
              .join(F.broadcast(n_per), "priority")
              .select("priority", "days", "rn", "n"))

    def at(pct: int):
        idx = ((F.col("n") - 1) * pct
               - ((F.col("n") - 1) * pct) % 100) / 100
        return F.max(F.when(F.col("rn") == idx.cast("long") + 1,
                            F.col("days")))

    return (ranked.groupBy("priority")
            .agg(F.max("n").cast("long").alias("n_orders"),
                 at(50).alias("p50_days"), at(90).alias("p90_days"),
                 at(99).alias("p99_days"))
            .orderBy("priority"))


def events_salted_agg(events: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Skew-safe two-stage aggregation: stage 1 aggregates on
    (event_type, salt) so a hot event_type spreads over ``salt_buckets``
    reducers; stage 2 merges the tiny partials.  Result is exactly the
    direct groupBy (integer cents commute) — the oracle is the plain SQL
    aggregate.  This is the manual fallback when AQE skew handling can't
    help (single giant group rather than a skewed join)."""
    cents = F.round(F.col("value") * 100.0, 0).cast("long")
    partial = (events
               .groupBy("event_type",
                        F.pmod(F.col("event_id"), F.lit(salt_buckets))
                        .alias("__salt"))
               .agg(F.count("*").alias("n"), F.sum(cents).alias("cents")))
    return (partial.groupBy("event_type")
            .agg(F.sum("n").alias("n_events"),
                 (F.sum("cents") / 100.0).alias("total_value"))
            .orderBy("event_type"))


def events_enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Events × customer broadcast enrichment + per-segment/type rollup
    (user_id is a customer key in the testdata)."""
    joined = events.join(F.broadcast(customer),
                         F.col("user_id") == F.col("c_custkey"), "inner")
    return (joined.groupBy("c_mktsegment", "event_type")
            .agg(F.count("*").alias("n_events"),
                 money_sum(F.col("value"), 2).alias("total_value"))
            .orderBy("c_mktsegment", "event_type"))


def _cents4(expr: Column) -> Column:
    """Exact 10^-4-unit integer sum units of a 2-decimal money expression."""
    return F.round(expr * 10000.0, 0).cast("long")


def q9_profit(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
              supplier: DataFrame, nation: DataFrame,
              name_token: str = "red") -> DataFrame:
    """TPC-H Q9-style product profit by (nation, year).  Adapted to the
    reduced schema: no partsupp/supplycost, so profit is the discounted
    revenue, and the nation is the supplier's.

    Plan shape: part filter broadcasts into lineitem (the only fact
    shuffle is the orderkey join for the year), supplier and nation are
    broadcast dims; one final small agg shuffle on (nation, year)."""
    pt = part.filter(F.col("p_name").contains(name_token)).select("p_partkey")
    return (lineitem
            .join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
            .join(orders.select("o_orderkey", "o_orderdate"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(money_sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")), 4)
                 .alias("sum_profit"))
            .orderBy("nation", F.desc("o_year")))


def q11_important_parts(lineitem: DataFrame,
                        fraction_denom: int = 1400) -> DataFrame:
    """TPC-H Q11-style important parts (adapted: discounted revenue plays
    partsupp stock value).  The scalar-subquery total becomes a one-row
    broadcast cross join; the threshold compare stays in exact integer
    10^-4 units (v4 * denom > t4) so both engines agree bit-for-bit.
    At 100 TB: one shuffle for the per-part agg; the global total
    re-aggregates the per-part partials (tiny), never rescans the fact."""
    per = (lineitem.groupBy("l_partkey")
           .agg(F.sum(_cents4(F.col("l_extendedprice")
                              * (1 - F.col("l_discount")))).alias("v4")))
    total = per.agg(F.sum("v4").alias("t4"))
    return (per.join(F.broadcast(total))
            .filter(F.col("v4") * fraction_denom > F.col("t4"))
            .select("l_partkey",
                    F.round(F.col("v4") / 1e4, 4).alias("value"))
            .orderBy(F.desc("value"), "l_partkey"))


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame,
                     date_from: str = "1996-01-01",
                     date_to: str = "1996-04-01") -> DataFrame:
    """TPC-H Q15 top supplier.  The revenue view is a per-supplier agg; the
    scalar MAX(total_revenue) is a one-row broadcast joined back — no
    global window sort, ties kept exactly as the spec requires.  Exact
    integer revenue units make the max/equality deterministic."""
    rev = (lineitem
           .filter((F.col("l_shipdate") >= date_from)
                   & (F.col("l_shipdate") < date_to))
           .groupBy("l_suppkey")
           .agg(F.sum(_cents4(F.col("l_extendedprice")
                              * (1 - F.col("l_discount")))).alias("r4")))
    mx = rev.agg(F.max("r4").alias("m4"))
    return (rev.join(F.broadcast(mx)).filter(F.col("r4") == F.col("m4"))
            .join(F.broadcast(supplier),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.round(F.col("r4") / 1e4, 4).alias("total_revenue"))
            .orderBy("s_suppkey"))


def q20_promo_suppliers(lineitem: DataFrame, part: DataFrame,
                        supplier: DataFrame, nation: DataFrame,
                        prefix: str = "small", year: int = 1997,
                        min_qty: float = 50.0) -> DataFrame:
    """TPC-H Q20-style promotion-candidate suppliers (adapted: lineitem
    plays partsupp/availqty — suppliers who shipped more than ``min_qty``
    units of ``prefix``-named parts in ``year``).  The nested-IN chain
    becomes broadcast part filter → per-supplier agg → HAVING → LEFT SEMI
    into supplier.  The semi join keeps supplier attributes without
    duplicating rows; nation broadcasts."""
    pt = part.filter(F.col("p_name").startswith(prefix)).select("p_partkey")
    qualified = (lineitem
                 .filter(F.year("l_shipdate") == year)
                 .join(F.broadcast(pt),
                       F.col("l_partkey") == F.col("p_partkey"))
                 .groupBy("l_suppkey")
                 .agg(F.sum("l_quantity").alias("qty"))
                 .filter(F.col("qty") > min_qty))
    return (supplier
            .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_semi")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_name", F.col("n_name").alias("nation"))
            .orderBy("s_name"))


def q21_waiting_suppliers(lineitem: DataFrame, orders: DataFrame,
                          supplier: DataFrame, late_days: int = 60,
                          status: str = "F") -> DataFrame:
    """TPC-H Q21-style suppliers who kept orders waiting (adapted: no
    commit/receipt dates — "late" is shipping > ``late_days`` after the
    order date).  The EXISTS / NOT-EXISTS pair over sibling lineitems
    collapses to ONE per-order aggregate: an order counts against supplier
    s iff it has ≥2 distinct suppliers and s is its only late one —
    n_late = 1 makes max(late supplier) that supplier.  The orderkey join
    output feeds the orderkey groupBy directly (same partitioning, no
    second fact shuffle)."""
    lat = (lineitem
           .join(orders.filter(F.col("o_orderstatus") == status)
                 .select("o_orderkey", "o_orderdate"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .withColumn("__late",
                       F.col("l_shipdate")
                       > F.col("o_orderdate")
                       + F.expr(f"INTERVAL {late_days} DAYS")))
    late_supp = F.when(F.col("__late"), F.col("l_suppkey"))
    per_order = (lat.groupBy("l_orderkey")
                 .agg(F.count_distinct("l_suppkey").alias("n_supp"),
                      F.count_distinct(late_supp).alias("n_late"),
                      F.max(late_supp).alias("late_supp")))
    sole = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    return (sole.groupBy("late_supp").agg(F.count("*").alias("numwait"))
            .join(F.broadcast(supplier),
                  F.col("late_supp") == F.col("s_suppkey"))
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), "s_name")
            .limit(100))


def q2_mincost(part: DataFrame, supplier: DataFrame, nation: DataFrame,
               region: DataFrame, lineitem: DataFrame,
               region_name: str = "EUROPE",
               p_type: str = "ECONOMY") -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier (adapted: no partsupp table —
    the observed unit price min(l_extendedprice/l_quantity) over lineitem
    is the supply cost, in exact integer cents).

    Plan: ONE fact shuffle (the (part, supplier) groupBy); supplier→nation→
    region and the part filter are broadcast; the correlated min-cost
    subquery of the original is a per-part window min on the already-
    part-partitioned aggregate — no extra join, and the window reuses the
    groupBy's hash partitioning modulo the supplier key (one small
    exchange of the filtered aggregate, never the fact table)."""
    from pyspark.sql import Window

    cost = F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0) \
            .cast("long")
    supply = (lineitem
              .groupBy("l_partkey", "l_suppkey")
              .agg(F.min(cost).alias("cost_cents")))
    supp_region = (supplier
                   .join(F.broadcast(nation),
                         F.col("s_nationkey") == F.col("n_nationkey"))
                   .join(F.broadcast(region.filter(F.col("r_name")
                                                   == region_name)),
                         F.col("n_regionkey") == F.col("r_regionkey"))
                   .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    j = (supply
         .join(F.broadcast(supp_region),
               F.col("l_suppkey") == F.col("s_suppkey"))
         .join(F.broadcast(part.filter(F.col("p_type") == p_type)),
               F.col("l_partkey") == F.col("p_partkey")))
    w = Window.partitionBy("p_partkey")
    return (j.withColumn("__mc", F.min("cost_cents").over(w))
            .filter(F.col("cost_cents") == F.col("__mc"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_brand", "cost_cents")
            .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
            .limit(100))


def events_anomalies(events: DataFrame, z: int = 3) -> DataFrame:
    """(event_id, event_type, value): events whose value is >= z standard
    deviations from their type's mean — flagged WITHOUT any float
    arithmetic.

    |x - s/n| >= z * sqrt(ss/n - (s/n)^2) squares and clears denominators to

        (x*n - s)^2 >= z^2 * (ss*n - s^2)

    over exact integer cents (s = sum, ss = sum of squares).  The products
    exceed int64, so they are decimal(38,0) — exact, associative, and the
    same comparison DuckDB runs in int128.  Plan: one partial-aggregated
    shuffle for the per-type moments (tiny), broadcast back onto the scan,
    map-side comparison — the 100 TB shape for any moment-based filter."""
    cents = F.round(F.col("value").cast("double") * 100, 0).cast("long")
    e = events.select("event_id", "event_type", "value",
                      cents.alias("x"))
    # sums accumulate IN decimal (a long sum of squared cents would
    # overflow int64 around 1e7 rows of 1e6-cent values)
    mom = (e.groupBy("event_type")
           .agg(F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
                F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
                 .alias("ss"),
                F.count("*").cast("decimal(38,0)").alias("n")))
    d = F.col("x").cast("decimal(38,0)") * F.col("n") - F.col("s")
    var_num = F.col("ss") * F.col("n") - F.col("s") * F.col("s")
    return (e.join(F.broadcast(mom), "event_type")
            .filter(d * d >= F.lit(z * z).cast("decimal(38,0)") * var_num)
            .select("event_id", "event_type", "value")
            .orderBy("event_id"))


def event_transitions(events: DataFrame) -> DataFrame:
    """Event-type transition matrix (first-order Markov): for every
    ordered pair of consecutive events within a user's stream,
    (prev_type, event_type, n, prob) where prob is the exact row-
    normalized transition probability in millionths ((1e6·n) div
    rowsum, /1e6 — integer arithmetic, partition-order independent).

    The sequence-analytics staple (what follows what): one window pass
    ordered by (ts, event_id) per user — ONE shuffle on user_id — then
    two tiny aggregations over the (types × types) pair space."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (events
             .select("user_id", "ts", "event_id", "event_type")
             .withColumn("prev_type", F.lag("event_type").over(w))
             .filter(F.col("prev_type").isNotNull()))
    c = (pairs.groupBy("prev_type", "event_type")
         .agg(F.count("*").cast("long").alias("n")))
    tot = c.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return (c.join(tot, "prev_type")
            .select("prev_type", "event_type", "n",
                    F.round(F.expr("(1000000 * n) div row_n") / 1e6, 6)
                     .alias("prob"))
            .orderBy("prev_type", "event_type"))


def basket_pairs(lineitem: DataFrame, min_support: int = 2,
                 topk: int = 50) -> DataFrame:
    """Market-basket co-occurrence mining: the top part pairs that appear
    together in the same order, with their support counts.

    Plan: distinct (order, part) → one shuffle to collect each order's
    sorted item set → MAP-SIDE pair expansion via nested array HOFs
    (quadratic only in basket size, which is small and bounded by the
    schema, never in corpus size) → one shuffle on the pair key.  The
    classic a-priori first pass, shaped so the only wide stages are two
    uniform-key exchanges; no self-join of the fact table (the naive
    SQL form the oracle uses would shuffle lineitem twice at 100 TB).
    """
    # collect_set dedups per order, so no distinct pre-pass: ONE shuffle
    # (on l_orderkey) builds the baskets
    items = (lineitem.select("l_orderkey", "l_partkey")
             .groupBy("l_orderkey")
             .agg(F.array_sort(F.collect_set("l_partkey")).alias("items")))
    pair_arr = F.flatten(F.transform(
        F.col("items"),
        lambda x, i: F.transform(
            F.slice(F.col("items"), i + F.lit(2),
                    F.size(F.col("items"))),
            lambda y: F.struct(x.alias("part_a"), y.alias("part_b")))))
    pairs = (items.select(F.explode(pair_arr).alias("p"))
             .select(F.col("p.part_a"), F.col("p.part_b")))
    return (pairs.groupBy("part_a", "part_b")
            .agg(F.count("*").cast("long").alias("n_orders"))
            .filter(F.col("n_orders") >= min_support)
            .orderBy(F.desc("n_orders"), "part_a", "part_b")
            .limit(topk))


def customer_deciles(orders: DataFrame, n_tiles: int = 10) -> DataFrame:
    """Customer lifetime-value deciles: rank customers by total order value
    into n equal tiles and report each tile's size and value share.

    Per-customer rollup, then the TWO-PHASE exact global ntile
    (plans/ranking.py: range exchange + partition-offset arithmetic,
    bit-identical to the unpartitioned ntile window) with a total
    tie-break order (cents, custkey) so tile membership is
    deterministic — no single-task stage even at 10^9 customers."""
    from document_vector_pipeline_spark.plans.ranking import global_ntile

    rev = (orders.groupBy("o_custkey")
           .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .alias("cents")))
    tiled = global_ntile(rev, [F.desc("cents"), F.col("o_custkey")],
                         n_tiles, out="decile")
    return (tiled.groupBy("decile")
            .agg(F.count("*").cast("long").alias("n_customers"),
                 (F.sum("cents") / 100).alias("revenue"))
            .orderBy("decile"))


def events_bots(events: DataFrame, min_events: int = 50,
                max_median_gap_s: int = 600) -> DataFrame:
    """Bot/automation detection per user: event count, minimum and exact
    rank-selected MEDIAN inter-event gap, and a verdict (high volume AND
    super-human cadence).  The abuse-filter analogue of the corpus
    quality battery — training pipelines drop machine traffic the same
    way they drop machine text.

    ONE scan and ONE exchange: the lag window, the gap-rank window, the
    per-user count window, and the final reduction all share the user_id
    partitioning.  Exactly one row per user has a null gap (the first
    event), so with an explicit NULLS FIRST rank (both engines agree by
    declaration, not by default) the median among real gaps sits at
    rank 1 + ceil(n_gaps/2).  All integer µs, no interpolation."""
    from pyspark.sql import Window

    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wg = Window.partitionBy("user_id").orderBy(
        F.col("gap_us").asc_nulls_first())
    wc = Window.partitionBy("user_id")
    g = (events.select(
        "user_id",
        (epoch_us(F.col("ts"))
         - epoch_us(F.lag("ts").over(wo))).alias("gap_us"))
        .withColumn("rk", F.row_number().over(wg))
        .withColumn("n_gaps", F.count("gap_us").over(wc)))
    med_rank = (F.lit(1) + F.floor((F.col("n_gaps") + 1) / 2)).cast("int")
    per = (g.groupBy("user_id")
           .agg(F.count("*").cast("long").alias("n_events"),
                F.min("gap_us").alias("min_gap_us"),
                F.max(F.when(F.col("rk") == med_rank, F.col("gap_us")))
                 .alias("median_gap_us")))
    verdict = ((F.col("n_events") >= min_events)
               & (F.col("median_gap_us")
                  < F.lit(max_median_gap_s).cast("long") * 1_000_000))
    return (per.select("user_id", "n_events", "min_gap_us",
                       "median_gap_us",
                       F.coalesce(verdict, F.lit(False)).alias("is_bot"))
            .orderBy("user_id"))


def yearly_growth(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Per-nation year-over-year revenue growth: the trend query every
    revenue rollup gets asked next.  One fact shuffle (orderkey join),
    broadcast dims, then a lag window over the TINY (nation, year)
    aggregate — growth is computed on exact fixed-point revenues, with
    the single rounded division per output row."""
    from pyspark.sql import Window

    rev = (lineitem
           .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(F.broadcast(customer),
                 F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(nation),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .groupBy("n_name", F.year("o_orderdate").alias("year"))
           .agg(money_sum(F.col("l_extendedprice")
                          * (1 - F.col("l_discount")), 4).alias("revenue")))
    w = Window.partitionBy("n_name").orderBy("year")
    prev = F.lag("revenue").over(w)
    return (rev.withColumn("prev_revenue", prev)
            .withColumn("growth_bp",
                        F.round(10000 * (F.col("revenue") - prev) / prev, 6))
            .orderBy("n_name", "year"))


def events_mad_outliers(events: DataFrame,
                        k_milli: int = 4448) -> DataFrame:
    """Robust outlier summary per event type via MAD (median absolute
    deviation): unlike events_anomalies' z-score, one whale purchase
    cannot drag the threshold — the robust statistic a fraud/abuse
    monitor actually wants.  Outlier ⇔ 1000·|x − median| > k·MAD with
    k = 4448 ≈ 3·1.4826·1000, all exact integer cents (cleared
    denominators, rank-selected medians, no interpolation).

    Each rank-selected median is computed on the per-type DISTINCT-VALUE
    histogram, not the raw frame: one map-side-combined (type, value)
    count aggregate, then a running-sum window over the histogram picks
    the value whose cumulative count first reaches floor((n+1)/2) — the
    k-th order statistic with multiplicity, value-identical to ranking
    the raw rows (the rank's event_id tie-break never changes WHICH
    value holds rank k).  The windows run over histogram rows (bounded
    by distinct cent values per type), so nothing funnels the raw
    corpus through per-type tasks, and — unlike the previous two-phase
    ranked form — no full-frame materialization or driver collect is
    needed: the whole statistic is one lazy plan.  The per-type medians
    broadcast back as a tiny join."""
    from pyspark.sql import Window

    cents = F.round(F.col("value") * 100, 0).cast("long")
    e = events.select("event_type", cents.alias("x"))

    def median_of(df, order_col, out):
        h = (df.groupBy("event_type", order_col)
             .agg(F.count(F.lit(1)).cast("long").alias("__c")))
        wcum = (Window.partitionBy("event_type").orderBy(order_col)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wall = Window.partitionBy("event_type")
        k = F.floor((F.sum("__c").over(wall) + 1) / 2)
        cum = F.sum("__c").over(wcum)
        return (h.withColumn("__cum", cum).withColumn("__k", k)
                .filter((F.col("__cum") >= F.col("__k"))
                        & (F.col("__cum") - F.col("__c") < F.col("__k")))
                .select("event_type", F.col(order_col).alias(out)))

    med = median_of(e, "x", "med")
    d = (e.join(F.broadcast(med), "event_type")
         .withColumn("dev", F.abs(F.col("x") - F.col("med"))))
    mad = median_of(d.select("event_type", "dev"), "dev", "mad")
    flagged = (d.join(F.broadcast(mad), "event_type")
               .withColumn("is_out",
                           F.lit(1000) * F.col("dev")
                           > F.lit(k_milli).cast("long") * F.col("mad")))
    return (flagged.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.max("med").alias("median_cents"),
                 F.max("mad").alias("mad_cents"),
                 F.count(F.when(F.col("is_out"), 1)).cast("long")
                  .alias("n_outliers"))
            .orderBy("event_type"))


def conversion_latency(events: DataFrame, from_type: str = "view",
                       to_type: str = "purchase") -> DataFrame:
    """Conversion-latency distribution: for every user whose first
    ``to_type`` event happens at/after their first ``from_type`` event,
    the elapsed µs — summarized as exact rank-selected p50/p90/p99 (same
    convention as events_percentiles) plus the converter count.

    One exchange on user_id covers the first-view window and the
    per-user reduction; the percentile ranking then runs over ONE ROW
    PER CONVERTER as the TWO-PHASE exact global rank
    (plans/ranking.py — converters are users-sized, so no single-task
    window), with the converter count riding in as plan metadata."""
    from pyspark.sql import Window

    from document_vector_pipeline_spark.plans.ranking import (
        global_row_number)

    w = Window.partitionBy("user_id")
    df = events.withColumn(
        "t1", F.min(F.when(F.col("event_type") == from_type,
                           F.col("ts"))).over(w))
    conv = (df.filter((F.col("event_type") == to_type)
                      & (F.col("ts") >= F.col("t1")))
            .groupBy("user_id")
            .agg((F.min(epoch_us(F.col("ts")))
                  - F.max(epoch_us(F.col("t1")))).alias("latency_us")))
    ranked, total = global_row_number(
        conv, [F.col("latency_us"), F.col("user_id")], out="rn")

    def at(pct: int):
        idx = ((total - 1) * pct - ((total - 1) * pct) % 100) // 100
        return F.max(F.when(F.col("rn") == F.lit(idx + 1),
                            F.col("latency_us")))

    return ranked.agg(F.lit(total).cast("long").alias("n_converters"),
                      at(50).alias("p50_us"), at(90).alias("p90_us"),
                      at(99).alias("p99_us"))


def customer_churn(orders: DataFrame) -> DataFrame:
    """Year-over-year customer churn: of the customers active in year Y,
    how many placed no order in Y+1 (the last data year is excluded —
    its churn is not yet observable).  Exact integer ppm.

    The (customer, year) activity set is distinct-reduced FIRST (one
    shuffle, customers×years rows), so the anti-join that finds churners
    runs on the reduced set, never the order fact table."""
    ay = (orders.select("o_custkey",
                        F.year("o_orderdate").alias("year"))
          .distinct())
    nxt = ay.select("o_custkey", (F.col("year") - 1).alias("year"))
    churned = ay.join(nxt, ["o_custkey", "year"], "left_anti")
    mx = ay.agg(F.max("year").alias("max_year"))
    base = (ay.groupBy("year")
            .agg(F.count("*").cast("long").alias("n_active")))
    lost = (churned.groupBy("year")
            .agg(F.count("*").cast("long").alias("n_churned")))
    return (base.join(lost, "year", "left")
            .crossJoin(F.broadcast(mx))
            .filter(F.col("year") < F.col("max_year"))
            .select("year", "n_active",
                    F.coalesce("n_churned", F.lit(0).cast("long"))
                     .alias("n_churned"))
            .withColumn("churn_ppm",
                        F.expr("(1000000 * n_churned) div n_active"))
            .orderBy("year"))


def events_user_diversity(events: DataFrame) -> DataFrame:
    """Per-user behavioral diversity: event count, distinct event types,
    and a Gini–Simpson diversity index in exact ppm —
    gini_ppm = 10⁶·(n² − Σnᵢ²) div n² over the per-type counts nᵢ.
    Single-type users score 0, perfectly-mixed users approach
    10⁶·(1 − 1/k).  The bot/engagement segmentation feature that needs
    no entropy (no logs, no floats — cross-engine exact).

    Two partial-aggregated shuffles, both on uniform keys
    ((user, type) then user)."""
    per_type = (events.groupBy("user_id", "event_type")
                .agg(F.count("*").cast("long").alias("ni")))
    per_user = (per_type.groupBy("user_id")
                .agg(F.sum("ni").alias("n"),
                     F.sum(F.col("ni") * F.col("ni")).alias("ss"),
                     F.count("*").cast("long").alias("n_types")))
    return (per_user.select(
        "user_id", F.col("n").cast("long").alias("n_events"), "n_types",
        F.expr("(1000000 * (n * n - ss)) div (n * n)").cast("long")
         .alias("gini_ppm"))
        .orderBy("user_id"))


def supplier_concentration(lineitem: DataFrame, supplier: DataFrame,
                           nation: DataFrame) -> DataFrame:
    """Supplier market concentration per nation: a Herfindahl-style index
    over supplier revenue shares, fully integer-defined so both engines
    agree bit-for-bit — share_ppm = (10⁶·cents) div total_cents per
    supplier, hhi_ppm = Σ share_ppm² div 10⁶ (10⁶ = monopoly, →0 =
    fragmented).  The supply-chain-risk rollup a procurement dashboard
    wants.

    One fact shuffle (supplier rollup), broadcast dims, and the HHI
    reduce runs on the nation×supplier aggregate.  Integer bound:
    10⁶·cents needs total revenue per supplier ≤ ~9·10¹² cents."""
    rev = (lineitem
           .join(F.broadcast(supplier),
                 F.col("l_suppkey") == F.col("s_suppkey"))
           .join(F.broadcast(nation),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .groupBy("n_name", "s_suppkey")
           .agg(F.sum(F.round(F.col("l_extendedprice")
                              * (1 - F.col("l_discount")) * 100, 0)
                      .cast("long")).alias("cents")))
    from pyspark.sql import Window

    total = F.sum("cents").over(Window.partitionBy("n_name"))
    shared = (rev.withColumn("__total", total)
              .withColumn("share_ppm",
                          F.expr("(1000000 * cents) div __total")))
    return (shared.groupBy("n_name")
            .agg(F.count("*").cast("long").alias("n_suppliers"),
                 F.expr("sum(share_ppm * share_ppm) div 1000000")
                  .cast("long").alias("hhi_ppm"))
            .orderBy("n_name"))


def event_trigrams(events: DataFrame, top: int = 30) -> DataFrame:
    """Top event-type trigrams over per-user ordered streams — the
    sequence-mining extension of event_transitions (what 3-step paths do
    users actually walk): (t1, t2, t3, n), top `top` by count.

    Same scale shape as event_transitions: ONE shuffle on user_id for
    the (ts, event_id)-ordered window, two leads instead of one lag,
    then an aggregation over the bounded types³ key space and a tiny
    global top-k sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (events
         .select("user_id", "ts", "event_id", "event_type")
         .withColumn("t2", F.lead("event_type", 1).over(w))
         .withColumn("t3", F.lead("event_type", 2).over(w))
         .filter(F.col("t3").isNotNull()))
    return (t.groupBy(F.col("event_type").alias("t1"), "t2", "t3")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy(F.desc("n"), "t1", "t2", "t3")
            .limit(top))


def sequence_match(events: DataFrame, pattern: str = "vc*p") -> DataFrame:
    """MATCH_RECOGNIZE-style pattern matching over per-user event
    streams — the row-pattern operator SQL:2016 defines and Spark lacks:
    encode each user's (ts, event_id)-ordered events as a one-char-per-
    event string (event types here have distinct initials) and count the
    non-overlapping occurrences of ``pattern`` (default: a view, any
    clicks, then a purchase).  Regex engines agree on leftmost
    non-overlapping matching for this pattern class, so the count is
    engine-exact.

    Scale shape: ONE shuffle (the per-user groupBy); the sequence
    string is bounded by the user's event count, the regex runs
    map-side on the aggregated rows.  Billions of users is the sharded
    dimension; no per-user window, no self-join."""
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(
                F.col("ts"), F.col("event_id"),
                F.substring(F.col("event_type"), 1, 1).alias("c")))),
            lambda x: x["c"]), "")
    return (events.groupBy("user_id")
            .agg(seq.alias("seq"))
            .select("user_id", "seq",
                    F.length("seq").cast("int").alias("n_events"),
                    F.regexp_count(F.col("seq"), F.lit(pattern))
                     .cast("int").alias("n_matches")))


def orders_mix_trend(orders: DataFrame) -> DataFrame:
    """Order-priority composition by month: (month, priority, n_orders,
    share_ppm within the month) — the mix-shift report that catches
    composition drift a total-volume chart hides (rising share of
    1-URGENT is an ops signal even at flat volume).

    One partial-aggregated shuffle on the bounded (month, priority)
    key; the ppm share window runs on the crosstab, never on orders."""
    month = F.date_trunc("month", F.col("o_orderdate"))
    cnt = (orders.groupBy(month.alias("month"),
                          F.col("o_orderpriority").alias("priority"))
           .agg(F.count("*").cast("long").alias("n_orders")))
    return (cnt.withColumn(
        "share_ppm",
        F.expr("(1000000 * n_orders) div sum(n_orders) over "
               "(partition by month)").cast("long"))
        .select(F.col("month").cast("timestamp_ntz").alias("month"),
                "priority", "n_orders", "share_ppm")
        .orderBy("month", "priority"))


def events_benford(events: DataFrame, value: str = "value") -> DataFrame:
    """Benford first-significant-digit profile of the value column —
    the classic synthetic-data / fraud screen (fabricated amounts skew
    uniform; organic multiplicative amounts follow log10(1+1/d)):
    (digit, n, obs_ppm, benford_ppm, excess_ppm).

    Map-only digit extraction (first char of the positive integer
    cents) + a 9-row aggregate; observed shares are exact integer ppm
    and the Benford expectations are shared LITERALS (computed once in
    Python, identical text in both engines), so no log evaluates in
    either engine."""
    benford = {d: round(__import__("math").log10(1 + 1 / d) * 1_000_000)
               for d in range(1, 10)}
    cents = F.round(F.col(value) * 100.0, 0).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    base = (events.filter(cents > 0)
            .select(digit.alias("digit")))
    total = Window.partitionBy()
    exp_map = F.create_map(*[x for d, p in benford.items()
                             for x in (F.lit(d), F.lit(p))])
    return (base.groupBy("digit")
            .agg(F.count("*").cast("long").alias("n"))
            .withColumn("obs_ppm",
                        F.expr("(1000000 * n) div "
                               "sum(n) over ()").cast("long"))
            .withColumn("benford_ppm",
                        F.element_at(exp_map, F.col("digit"))
                        .cast("long"))
            .withColumn("excess_ppm",
                        (F.col("obs_ppm") - F.col("benford_ppm"))
                        .cast("long"))
            .orderBy("digit"))


def events_burst(events: DataFrame, factor: int = 3,
                 lookback: int = 24) -> DataFrame:
    """Burst detection per event type: hourly buckets whose count
    exceeds ``factor`` × the trailing-``lookback``-hour mean — the
    rate-spike monitor (deploy gone wrong, crawler loop, bot wave).
    (event_type, bucket, n, trail_n, trail_hours, burst).

    The comparison n · trail_hours > factor · trail_n clears the
    denominator, so no float mean exists anywhere — engine-exact.
    Buckets with an incomplete lookback window (the first day) are
    never flagged.

    Scale: events are touched ONCE by the hourly aggregation; the
    trailing frame runs over the (type × hours) grid — a RANGE frame on
    the integer hour index, so absent hours count as zero rows rather
    than shifting the window."""
    hour_idx = (epoch_us(F.date_trunc("hour", F.col("ts")))
                / F.lit(3_600_000_000)).cast("long")
    hourly = (events
              .groupBy(F.col("event_type"), hour_idx.alias("h"))
              .agg(F.count("*").alias("n")))
    w = (Window.partitionBy("event_type").orderBy("h")
         .rangeBetween(-lookback, -1))
    first_h = F.min("h").over(Window.partitionBy("event_type"))
    return (hourly
            .withColumn("trail_n",
                        F.coalesce(F.sum("n").over(w), F.lit(0)))
            .withColumn("trail_hours", F.lit(lookback).cast("int"))
            .withColumn("burst",
                        (F.col("h") - first_h >= lookback)
                        & (F.col("n") * lookback
                           > F.lit(factor) * F.col("trail_n")))
            .select("event_type",
                    F.timestamp_seconds(F.col("h") * 3600)
                     .cast("timestamp_ntz").alias("bucket"),
                    F.col("n").cast("long").alias("n"),
                    F.col("trail_n").cast("long").alias("trail_n"),
                    "trail_hours", "burst"))


def customer_skyline(orders: DataFrame) -> DataFrame:
    """Pareto frontier (skyline) of customers over (order count, total
    spend): the classic SKYLINE OF operator relational engines bolt on,
    as ONE window pass instead of the naive NOT-EXISTS self-join.

    Dominance is strict on both dimensions (c' dominates c iff
    n' > n AND cents' > cents), so a customer survives exactly when
    its spend is >= the max spend among customers with strictly more
    orders — the strictly-greater suffix max over the per-customer
    rollup computes that directly, in TWO-PHASE form
    (plans/ranking.global_suffix_max: range exchange on n_orders,
    later-partition maxes as plan metadata, local range frame inside
    each partition — bit-identical to the unpartitioned RANGE window
    with no single-task pass).  All integer cents; the frame sees one
    row per customer, never orders, and holds at billions of
    customers."""
    from document_vector_pipeline_spark.plans.ranking import (
        global_suffix_max)

    per = (orders.groupBy(F.col("o_custkey").alias("custkey"))
           .agg(F.count("*").cast("long").alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100.0, 0)
                      .cast("long")).alias("cents")))
    # max spend among customers with STRICTLY more orders
    withmax = global_suffix_max(per, "n_orders", "cents",
                                out="best_above")
    return (withmax
            .withColumn("best_above",
                        F.coalesce(F.col("best_above"),
                                   F.lit(-1).cast("long")))
            .filter(F.col("cents") >= F.col("best_above"))
            .select("custkey", "n_orders",
                    (F.col("cents") / 100.0).alias("total_spend"))
            .orderBy("custkey"))


def order_backlog(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Sweep-line interval counting: for every day, how many lineitems
    are on backlog (ordered but not yet shipped: order ≤ d < ship) —
    the "concurrent intervals" query (open orders, active sessions,
    connections) WITHOUT an interval join: each lineitem contributes
    +1 on its order day and −1 on its ship day, a per-day delta
    aggregation collapses billions of intervals to one row per day,
    and a running sum over the tiny day table yields the open count.
    (day, n_ordered, n_shipped, open_count).

    Scale: one orderkey join attaches the order date (co-partitioned
    fact-fact join; bucketed layouts make it exchange-free, see
    source_bucketed), then ONE shuffle on the day key (bounded: a few
    thousand days); the cumulative window runs on the per-day
    aggregate, never on lineitems."""
    with_od = lineitem.select("l_orderkey", "l_shipdate").join(
        orders.select(F.col("o_orderkey").alias("l_orderkey"),
                      "o_orderdate"), "l_orderkey")
    day = F.date_trunc("day", F.col("o_orderdate"))
    sday = F.date_trunc("day", F.col("l_shipdate"))
    deltas = (with_od.select(day.alias("day"), F.lit(1).alias("d"))
              .unionAll(with_od.select(sday.alias("day"),
                                       F.lit(-1).alias("d"))))
    per_day = (deltas.groupBy("day")
               .agg(F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
                    .cast("long").alias("n_ordered"),
                    F.sum(F.when(F.col("d") == -1, 1).otherwise(0))
                    .cast("long").alias("n_shipped")))
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (per_day
            .withColumn("open_count",
                        F.sum(F.col("n_ordered") - F.col("n_shipped"))
                        .over(w).cast("long"))
            .select(F.col("day").cast("timestamp_ntz").alias("day"),
                    "n_ordered", "n_shipped", "open_count")
            .orderBy("day"))


def multitouch_attribution(events: DataFrame,
                           lookback_us: int = 30 * 60 * 1_000_000,
                           unit: int = 1000) -> DataFrame:
    """Linear multi-touch attribution: every purchase splits ``unit``
    milli-credits equally across the user's clicks in the preceding
    ``lookback_us`` window; per click, the number of purchases it helped
    convert and its total credit.  Integer remainders go to the EARLIEST
    click of each purchase, so credits sum exactly to unit × purchases
    matched (the audit invariant a marketing pipeline reconciles on).

    Plan: the bucketed interval join from plans/temporal (shuffle
    O(2·|purchases| + |clicks|), never a per-user cross product), one
    per-purchase window over its ≤ lookback clicks, one groupBy on the
    click key.  All integer arithmetic — oracle-exact."""
    from pyspark.sql import Window

    from document_vector_pipeline_spark.plans.temporal import range_join

    p = (events.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"), "user_id", "ts"))
    c = (events.filter(F.col("event_type") == "click")
         .select("user_id", "ts", "event_id"))
    pairs = range_join(p, c, key="user_id",
                       lower_us=-lookback_us, upper_us=0,
                       right_cols=["event_id"], prefix="click_")
    wk = Window.partitionBy("purchase_id")
    wr = Window.partitionBy("purchase_id").orderBy("click_ts",
                                                   "click_event_id")
    credit = (F.expr(f"{unit} div __k")
              + F.when(F.col("__rn") == 1, F.expr(f"{unit} % __k"))
                 .otherwise(F.lit(0)))
    return (pairs
            .withColumn("__k", F.count("*").over(wk))
            .withColumn("__rn", F.row_number().over(wr))
            .withColumn("__credit", credit.cast("long"))
            .groupBy(F.col("click_event_id").alias("click_id"))
            .agg(F.count("*").cast("long").alias("n_purchases"),
                 F.sum("__credit").cast("long").alias("credit_milli")))


def cohort_ltv(events: DataFrame) -> DataFrame:
    """Weekly-cohort lifetime-value curve: users cohorted by their first
    purchase week; per (cohort_week, age_weeks) the purchase count,
    active purchasers, period value and the cohort's cumulative value —
    the LTV table every subscription/commerce dashboard draws.

    Exact money: cents as int64 (round(value·100)), divided back only in
    the final projection.  Two shuffles (user first-purchase agg + the
    cohort-age agg; the user join reuses the first agg's partitioning)
    and one bounded-key cumulative window."""
    from pyspark.sql import Window

    p = (events.filter(F.col("event_type") == "purchase")
         .select("user_id", "ts",
                 F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents")))
    first = p.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    j = (p.join(first, "user_id")
         .withColumn("cohort_week", F.date_trunc("week", F.col("first_ts")))
         .withColumn("__dus", epoch_us(F.col("ts"))
                     - epoch_us(F.col("first_ts")))
         .withColumn("age_weeks",
                     F.expr("__dus div 604800000000").cast("long")))
    g = (j.groupBy("cohort_week", "age_weeks")
         .agg(F.count("*").cast("long").alias("n_purchases"),
              F.count_distinct("user_id").cast("long").alias("n_users"),
              F.sum("cents").alias("cents")))
    w = (Window.partitionBy("cohort_week").orderBy("age_weeks")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (g.select(
        "cohort_week", "age_weeks", "n_purchases", "n_users",
        (F.col("cents").cast("long") / 100.0).alias("value"),
        (F.sum("cents").over(w).cast("long") / 100.0).alias("cum_value")))


def seasonal_baseline_mae(events: DataFrame,
                          train_days: int = 21) -> DataFrame:
    """Seasonal-naive forecast backtest: train on the first
    ``train_days`` of the stream, predict each later event's value by
    its (event_type, day-of-week, hour) training mean — falling back to
    the event_type's global training mean for unseen cells — and report
    the mean absolute error per event_type in exact integer cents.
    The baseline every forecasting pipeline must beat, evaluated with
    the same deterministic integer arithmetic as everything else
    (means and MAE are floor divisions of cent sums).

    Plan: one pass for the split boundary (min ts — plan metadata
    scale), one bounded-key agg for cell means, broadcast join of the
    tiny mean tables onto the test scan, one final agg."""
    ev = events.select(
        "event_type", "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hr"))
    bound_row = ev.agg(F.min("ts").alias("t0")).collect()[0]
    split = bound_row["t0"]
    if split is None:
        # empty stream: no split boundary exists — typed-empty result
        return (ev.groupBy("event_type")
                .agg(F.lit(0).cast("long").alias("n_train"),
                     F.lit(0).cast("long").alias("n_test"),
                     F.lit(0).cast("long").alias("mae_cents"))
                .orderBy("event_type"))
    train = ev.filter(
        F.col("ts") < F.lit(split) + F.expr(f"INTERVAL {train_days} DAYS"))
    test = ev.filter(
        F.col("ts") >= F.lit(split) + F.expr(f"INTERVAL {train_days} DAYS"))
    cell = (train.groupBy("event_type", "dow", "hr")
            .agg(F.expr("sum(cents) div count(*)").alias("cell_pred")))
    glob = (train.groupBy("event_type")
            .agg(F.expr("sum(cents) div count(*)").alias("glob_pred"),
                 F.count("*").cast("long").alias("n_train")))
    joined = (test
              .join(F.broadcast(cell), ["event_type", "dow", "hr"], "left")
              .join(F.broadcast(glob), "event_type", "left")
              .withColumn("pred", F.coalesce("cell_pred", "glob_pred")))
    return (joined.groupBy("event_type")
            .agg(F.first("n_train").alias("n_train"),
                 F.count("*").cast("long").alias("n_test"),
                 F.expr("sum(abs(cents - pred)) div count(*)")
                  .alias("mae_cents"))
            .orderBy("event_type"))


def customer_rfm(orders: DataFrame, n_tiles: int = 5) -> DataFrame:
    """RFM segmentation: per-customer Recency / Frequency / Monetary
    quintile scores (1 = most recent / most frequent / highest value),
    aggregated to the ≤ n³ segment grid with sizes and revenue — the
    classic CRM segmentation table.

    Same shape discipline as customer_deciles: all three ntile rankings
    run on the ALREADY-AGGREGATED one-row-per-customer frame with total
    tie-break orders (metric, custkey), so segment membership is
    deterministic — each as the TWO-PHASE exact global ntile
    (plans/ranking.py), so none of the three rankings has a
    single-task stage at any customer cardinality.  Recency is
    measured in days against the corpus max order date (plan
    metadata)."""
    from document_vector_pipeline_spark.plans.ranking import global_ntile

    per = (orders.groupBy("o_custkey")
           .agg(F.max("o_orderdate").alias("last_dt"),
                F.count("*").cast("long").alias("freq"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                 .alias("cents")))
    mx = per.agg(F.max("last_dt").alias("mx"))
    scored = (per.crossJoin(F.broadcast(mx))
              .withColumn("rec_days",
                          F.datediff(F.col("mx"), F.col("last_dt"))))
    tiled = scored
    for cols, out in (
            ([F.col("rec_days"), F.col("o_custkey")], "r_score"),
            ([F.desc("freq"), F.col("o_custkey")], "f_score"),
            ([F.desc("cents"), F.col("o_custkey")], "m_score")):
        tiled = global_ntile(tiled, cols, n_tiles, out=out)
    return (tiled.groupBy("r_score", "f_score", "m_score")
            .agg(F.count("*").cast("long").alias("n_customers"),
                 (F.sum("cents").cast("long") / 100.0).alias("revenue")))


def events_seasonal(events: DataFrame) -> DataFrame:
    """Classical additive seasonal decomposition of the daily event
    count — (day, n_events, trend_micro, seasonal_micro, resid_micro):
    trend = centered 7-day moving average (partial windows at the
    edges), seasonal = per-ISO-weekday mean of the detrended series,
    residual = the exact remainder.  The capacity-planning /
    anomaly-baseline view of an event stream (what events_anomalies'
    z-scores lack: a day-of-week-aware baseline).

    Exactness + scale: the corpus collapses to day grain in ONE
    map-side-combinable aggregation (the only pass over the events);
    everything after runs on the day-grain frame (365 rows/year at any
    corpus size) in pure integer micro-units — means are exact floor
    divisions, so no float ever enters and the identity
    n*1e6 = trend + seasonal + resid holds bit-exactly."""
    dd = (events.groupBy(F.col("ts").cast("date").alias("day"))
          .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    # `div` is truncating integer division in BOTH Spark and DuckDB
    # (// in DuckDB truncates toward zero too) — exact, no float
    tr = (dd.select(
            "day", "n_events",
            (F.lit(1000000) * F.sum("n_events").over(w)).alias("__ws"),
            F.count(F.lit(1)).over(w).alias("__wc"))
          .select("day", "n_events",
                  F.expr("__ws div __wc").cast("long")
                  .alias("trend_micro")))
    # ISO weekday (Mon=1..Sun=7): Spark weekday() is Mon=0
    dow = (F.weekday(F.col("day")) + F.lit(1)).alias("dow")
    det = tr.select(
        "day", "n_events", "trend_micro", dow,
        (F.lit(1000000) * F.col("n_events") - F.col("trend_micro"))
        .alias("det"))
    se = (det.groupBy("dow")
          .agg(F.sum("det").alias("__sd"), F.count(F.lit(1)).alias("__n"))
          .select("dow", F.expr("__sd div __n").cast("long")
                  .alias("seasonal_micro")))
    return (det.join(F.broadcast(se), "dow")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "n_events", "trend_micro", "seasonal_micro",
                    (F.col("det") - F.col("seasonal_micro"))
                    .cast("long").alias("resid_micro"))
            .orderBy("day"))


def markov_stationary(events: DataFrame, iters: int = 3) -> DataFrame:
    """Near-stationary distribution of the first-order event-type
    Markov chain — (event_type, pi_ppm): the transition matrix in
    exact ppm (truncating div of transition counts), a uniform start,
    and ``iters`` power-method steps with EXACT integer arithmetic
    (each step sums pi_i * p_ij over sources exactly, then divides by
    1e6 ONCE per destination — order-free, so engines cannot diverge).
    Answers 'where does user attention settle': the long-run share of
    each event type under observed dynamics, vs the raw frequency mix.

    Scale: transition counting is one lag window per user partition +
    a (types²)-group aggregation; every iteration is a join between
    the types-sized pi vector and the types²-sized matrix — after the
    first aggregation nothing depends on corpus size.  States with no
    observed outgoing transitions shed their mass (no renormalization
    — a fixed-step mixing diagnostic, not an eigensolver), identically
    on both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (events.select(F.col("event_type").alias("dst"),
                       F.lag("event_type").over(w).alias("src"))
         .filter(F.col("src").isNotNull())
         .groupBy("src", "dst")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    row = c.groupBy("src").agg(F.sum("n").alias("row_n"))
    P = (c.join(row, "src")
         .select("src", "dst",
                 F.expr("(1000000 * n) div row_n").cast("long")
                 .alias("p_ppm"))
         .localCheckpoint(eager=True))
    states = (P.select(F.col("src").alias("state"))
              .unionByName(P.select(F.col("dst").alias("state")))
              .distinct())
    n_states = states.count()
    if n_states == 0:
        # no user has two events → no transitions; empty, typed result
        return events.sparkSession.createDataFrame(
            [], "event_type string, pi_ppm long")
    pi = states.select(
        "state",
        F.lit(1000000 // n_states).cast("long").alias("pi_ppm"))
    for _ in range(iters):
        pi = (P.join(pi, P.src == pi.state)
              .groupBy("dst")
              .agg(F.sum(F.col("pi_ppm") * F.col("p_ppm")).alias("__m"))
              .select(F.col("dst").alias("state"),
                      F.expr("__m div 1000000").cast("long")
                      .alias("pi_ppm")))
    return (pi.select(F.col("state").alias("event_type"), "pi_ppm")
            .orderBy("event_type"))


def basket_lift(lineitem: DataFrame, min_support: int = 2,
                topk: int = 30) -> DataFrame:
    """Association strength for co-ordered part pairs — lift in exact
    milli: lift = P(a,b) / (P(a)·P(b)) = (n_ab · N) / (n_a · n_b) over
    orders.  The a-priori second pass that separates real affinities
    from popular-by-coincidence pairs (raw support just promotes pairs
    of bestsellers; lift > 1000 milli = appear together MORE than
    independence predicts).  Output: top-``topk`` qualifying pairs by
    (lift desc, part_a, part_b) with their support and marginals.

    Plan: the pair counts reuse basket_pairs' map-side basket
    expansion (never a fact-table self-join); the marginals are one
    part-keyed aggregation BROADCAST to the pair frame; N is a scalar.
    Integer headroom: 1000·n_ab·N must fit int64 — fine through ~10^7
    orders; past that lift the numerator to decimal(38,0)."""
    items = (lineitem.select("l_orderkey", "l_partkey")
             .groupBy("l_orderkey")
             .agg(F.array_sort(F.collect_set("l_partkey")).alias("items")))
    items = items.localCheckpoint(eager=True)   # pairs + marginals + N
    pair_arr = F.flatten(F.transform(
        F.col("items"),
        lambda x, i: F.transform(
            F.slice(F.col("items"), i + F.lit(2),
                    F.size(F.col("items"))),
            lambda y: F.struct(x.alias("part_a"), y.alias("part_b")))))
    pairs = (items.select(F.explode(pair_arr).alias("p"))
             .select(F.col("p.part_a"), F.col("p.part_b"))
             .groupBy("part_a", "part_b")
             .agg(F.count("*").cast("long").alias("n_ab"))
             .filter(F.col("n_ab") >= min_support))
    marg = (items.select(F.explode("items").alias("part"))
            .groupBy("part")
            .agg(F.count("*").cast("long").alias("n_part")))
    n = items.agg(F.count("*").cast("long").alias("n_orders_total"))
    scored = (pairs
              .join(F.broadcast(marg.select(
                  F.col("part").alias("part_a"),
                  F.col("n_part").alias("n_a"))), "part_a")
              .join(F.broadcast(marg.select(
                  F.col("part").alias("part_b"),
                  F.col("n_part").alias("n_b"))), "part_b")
              .crossJoin(F.broadcast(n))
              .select("part_a", "part_b", "n_ab", "n_a", "n_b",
                      F.expr("(1000 * n_ab * n_orders_total) "
                             "div (n_a * n_b)").cast("long")
                      .alias("lift_milli")))
    from document_vector_pipeline_spark.plans.ranking import partial_topk

    # co-occurrence-pairs-sized frame: map-side partial top-k pre-cut
    # bounds the global rank window (lossless for rank<=topk)
    scored = partial_topk(
        scored, [F.desc("lift_milli"), F.col("part_a"), F.col("part_b")],
        topk)
    w = Window.orderBy(F.desc("lift_milli"), "part_a", "part_b")
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= topk)
            .select("rank", "part_a", "part_b", "n_ab", "n_a", "n_b",
                    "lift_milli"))


def ab_lift(events: DataFrame, user_col: str = "user_id",
            type_col: str = "event_type",
            convert_type: str = "purchase") -> DataFrame:
    """Two-cohort A/B conversion readout with the two-proportion
    z-test — the experiment scorecard run over the raw event log
    (cohort = user_id parity here; production would hash the
    randomization unit the same way).  A user converts when they have
    at least one ``convert_type`` event.

    One row: (n_a, n_b, conv_a, conv_b, rate_a, rate_b, abs_lift,
    z_score) with z = (p_b − p_a)/√(p̂(1−p̂)(1/n_a + 1/n_b)) under the
    pooled rate p̂; 0.0 when the standard error vanishes (empty cohort
    or degenerate pooled rate).  Every float derives from four exact
    integer counts in one fixed expression tree, so the oracle
    replays it bit-for-bit.

    Plan: one user-keyed aggregation (map-side combinable max), one
    2-row cohort aggregation — no joins, no windows; the user-keyed
    exchange is the irreducible cost of user-level conversion at any
    scale."""
    per_user = (events
                .select(F.col(user_col).alias("u"),
                        (F.col(type_col) == convert_type)
                        .cast("int").alias("cv"))
                .groupBy("u").agg(F.max("cv").alias("converted")))
    cohort = (per_user
              .groupBy((F.pmod(F.col("u"), F.lit(2)) == 0)
                       .alias("is_a"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("converted").alias("conv")))
    a = cohort.filter(F.col("is_a")).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a"))
    b = cohort.filter(~F.col("is_a")).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b"))
    j = a.crossJoin(b)
    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    p_a = F.col("conv_a").cast("double") / n_a
    p_b = F.col("conv_b").cast("double") / n_b
    p = ((F.col("conv_a") + F.col("conv_b")).cast("double")
         / (F.col("n_a") + F.col("n_b")).cast("double"))
    se = F.sqrt((p * (F.lit(1.0) - p))
                * ((F.lit(1.0) / n_a) + (F.lit(1.0) / n_b)))
    z = F.when(se == 0, F.lit(0.0)).otherwise(
        F.round((p_b - p_a) / se, 6))
    return j.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(p_b - p_a, 6).alias("abs_lift"),
        z.alias("z_score"))


def ab_sequential(events: DataFrame, user_col: str = "user_id",
                  type_col: str = "event_type",
                  convert_type: str = "purchase",
                  ts_col: str = "ts", tau2: float = 0.01) -> DataFrame:
    """Always-valid sequential A/B readout (the mSPRT of Johari et al.,
    "Peeking at A/B Tests", KDD 2017) — the reading that makes daily
    peeks at ab_lift's z-score safe: the z-test's 1.96 threshold only
    holds at ONE predetermined look, while an experimenter who peeks
    every day inflates false positives several-fold.  The mixture
    sequential probability ratio test pays a small power tax for a
    statistic whose rejection threshold is valid at EVERY peek.

    One row per experiment day (cumulative counts as of that day):
    (day, n_a, n_b, conv_a, conv_b, z_score, log_lambda_micro,
    log_lambda_max_micro, reject_95, reject_99).  With θ̂ = p_b − p_a
    and V = p̂(1−p̂)(1/n_a + 1/n_b) (ab_lift's pooled variance),

        ln Λ = ½·ln(V/(V+τ²)) + τ²·θ̂² / (2·V·(V+τ²))

    under the normal mixture with variance ``tau2`` (the shared
    literal constant).  The always-valid decision uses the RUNNING MAX
    of ln Λ (once crossed, always rejected): reject_95/99 compare the
    integer micro-rounded running max against the integer-rounded
    literal thresholds ln(1/0.05)·1e6 / ln(1/0.01)·1e6 — an exact
    integer comparison, no float boundary anywhere in the decision.
    ln Λ itself surfaces micro-rounded (the idf_micro discipline: the
    engines' ln differ in the last ulp, the 1e-6 grid absorbs it);
    z_score rides along for the naive-vs-sequential contrast.

    Plan: one user-keyed aggregation (the irreducible exchange), then
    ALL cumulation and algebra on the days-sized grid (a day×day
    triangle join and one unpartitioned running-max window over ≤
    experiment-length rows — bounded, never user- or event-sized)."""
    import math

    day = F.to_date(F.col(ts_col))
    per_user = (events
                .select(F.col(user_col).alias("u"), day.alias("d"),
                        (F.col(type_col) == convert_type).alias("cv"))
                .groupBy("u")
                .agg(F.min("d").alias("first_day"),
                     F.min(F.when(F.col("cv"), F.col("d")))
                     .alias("conv_day"))
                .withColumn("is_a", F.pmod(F.col("u"), F.lit(2)) == 0))
    days = events.select(day.alias("day")).distinct()
    arr = per_user.groupBy("first_day", "is_a").agg(
        F.count(F.lit(1)).alias("n"))
    cnv = (per_user.filter(F.col("conv_day").isNotNull())
           .groupBy("conv_day", "is_a").agg(F.count(F.lit(1)).alias("n")))

    def cum(src, key, flag, out):
        return (days.join(src, (F.col(key) <= F.col("day"))
                          & (F.col("is_a") == flag))
                .groupBy("day").agg(F.sum("n").alias(out)))

    j = days
    for src, key, flag, out in ((arr, "first_day", True, "n_a"),
                                (arr, "first_day", False, "n_b"),
                                (cnv, "conv_day", True, "conv_a"),
                                (cnv, "conv_day", False, "conv_b")):
        j = (j.join(cum(src, key, flag, out), "day", "left")
             .withColumn(out, F.coalesce(out, F.lit(0)).cast("long")))
    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    p_a = F.col("conv_a").cast("double") / n_a
    p_b = F.col("conv_b").cast("double") / n_b
    p = ((F.col("conv_a") + F.col("conv_b")).cast("double")
         / (F.col("n_a") + F.col("n_b")).cast("double"))
    v = ((p * (F.lit(1.0) - p))
         * ((F.lit(1.0) / n_a) + (F.lit(1.0) / n_b)))
    theta = p_b - p_a
    t2 = F.lit(float(tau2))
    ll = (F.lit(0.5) * F.log(v / (v + t2))
          + (t2 * (theta * theta))
          / ((F.lit(2.0) * v) * (v + t2)))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    se = F.sqrt(v)
    z = (F.when(~ok, F.lit(0.0))
         .when(se == 0, F.lit(0.0))
         .otherwise(F.round(theta / se, 6)))
    llm = (F.when(~ok | (v <= 0), F.lit(0))
           .otherwise(F.round(ll * F.lit(1e6), 0))).cast("long")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    thr95 = round(math.log(1.0 / 0.05) * 1e6)
    thr99 = round(math.log(1.0 / 0.01) * 1e6)
    return (j.withColumn("z_score", z)
            .withColumn("log_lambda_micro", llm)
            .withColumn("log_lambda_max_micro",
                        F.max("log_lambda_micro").over(w).cast("long"))
            .withColumn("reject_95",
                        F.col("log_lambda_max_micro") > F.lit(thr95))
            .withColumn("reject_99",
                        F.col("log_lambda_max_micro") > F.lit(thr99))
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "n_a", "n_b", "conv_a", "conv_b", "z_score",
                    "log_lambda_micro", "log_lambda_max_micro",
                    "reject_95", "reject_99")
            .orderBy("day"))


def ab_cuped(events: DataFrame, user_col: str = "user_id",
             value_col: str = "value", ts_col: str = "ts",
             split_ts: str = "2024-01-16") -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM 2013) —
    the adjustment every large experimentation platform applies before
    reading a metric: each user's post-period value Y is shifted by
    θ·(X − mean(X)) where X is the user's PRE-period value and
    θ = cov(X,Y)/var(X) pooled over both cohorts, removing the
    between-user variance the randomization already balanced.

    Two rows (cohort A/B): (cohort, n_users, mean_y, mean_y_adj,
    theta, var_reduction) — var_reduction = var(Y_adj)/var(Y), 1.0
    when var(Y) is 0, θ = 0.0 on a degenerate pre-period.  Values are
    exact integer cents per user; every surfaced float is one fixed
    expression tree over exact decimal moments (n·Σxy − Σx·Σy style),
    so the oracle replays it bit-for-bit.

    Plan: one user-keyed aggregation (map-side combinable conditional
    sums — the same irreducible exchange as ab_lift), then ALL moment
    algebra on a 2-row cohort table × a 1-row pooled table — nothing
    after the user agg scales with the log."""
    cents = F.round(F.col(value_col) * 100.0, 0).cast("long")
    split = F.to_timestamp(F.lit(split_ts))
    per_user = (events.filter(F.col(user_col).isNotNull())
                .groupBy(F.col(user_col).alias("u"))
                .agg(F.sum(F.when(F.col(ts_col) < split, cents)
                           .otherwise(F.lit(0))).alias("x"),
                     F.sum(F.when(F.col(ts_col) >= split, cents)
                           .otherwise(F.lit(0))).alias("y")))
    d = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("pn"),
        F.sum(d("x")).cast("decimal(38,0)").alias("psx"),
        F.sum(d("y")).cast("decimal(38,0)").alias("psy"),
        F.sum(d("x") * d("y")).cast("decimal(38,0)").alias("psxy"),
        F.sum(d("x") * d("x")).cast("decimal(38,0)").alias("psx2"))
    cohort = (per_user
              .groupBy(F.when(F.pmod(F.col("u"), F.lit(2)) == 0, "A")
                       .otherwise("B").alias("cohort"))
              .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
                   F.sum(d("x")).cast("decimal(38,0)").alias("sx"),
                   F.sum(d("y")).cast("decimal(38,0)").alias("sy"),
                   F.sum(d("x") * d("y")).cast("decimal(38,0)")
                   .alias("sxy"),
                   F.sum(d("x") * d("x")).cast("decimal(38,0)")
                   .alias("sx2"),
                   F.sum(d("y") * d("y")).cast("decimal(38,0)")
                   .alias("sy2")))
    j = cohort.crossJoin(F.broadcast(pooled))
    den = F.col("pn") * F.col("psx2") - F.col("psx") * F.col("psx")
    theta = F.when(den == 0, F.lit(0.0)).otherwise(
        (F.col("pn") * F.col("psxy")
         - F.col("psx") * F.col("psy")).cast("double")
        / den.cast("double"))
    mean_x_all = F.col("psx").cast("double") / F.col("pn").cast("double")
    n_d = F.col("n").cast("double")
    mean_y = F.col("sy").cast("double") / n_d
    mean_x = F.col("sx").cast("double") / n_d
    mean_y_adj = mean_y - (theta * (mean_x - mean_x_all))
    nn = n_d * n_d
    var_y = (F.col("n") * F.col("sy2")
             - F.col("sy") * F.col("sy")).cast("double") / nn
    cov = (F.col("n") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast("double") / nn
    var_x = (F.col("n") * F.col("sx2")
             - F.col("sx") * F.col("sx")).cast("double") / nn
    var_y_adj = (var_y - ((F.lit(2.0) * theta) * cov)) \
        + ((theta * theta) * var_x)
    vr = F.when(var_y == 0, F.lit(1.0)).otherwise(
        F.round(var_y_adj / var_y, 6))
    return (j.select(
        "cohort",
        F.col("n").cast("long").alias("n_users"),
        F.round(mean_y, 6).alias("mean_y"),
        F.round(mean_y_adj, 6).alias("mean_y_adj"),
        F.round(theta, 6).alias("theta"),
        vr.alias("var_reduction"))
        .orderBy("cohort"))


def ab_health(events: DataFrame, user_col: str = "user_id",
              type_col: str = "event_type",
              convert_type: str = "purchase") -> DataFrame:
    """Experiment health panel — the two checks an experimentation
    platform runs BEFORE anyone reads a lift number: sample-ratio
    mismatch (Pearson chi-square of cohort sizes against the designed
    50/50 split; chi2 > 3.841 ≈ p<0.05 flags a broken randomizer or a
    logging bias, the most common silent experiment killer) and the
    minimum detectable effect at the current sample size
    (MDE = (z_{0.025}+z_{0.8})·√(p̂(1−p̂)(1/n_a+1/n_b)) — the smallest
    absolute lift this experiment could currently certify at 95 %
    confidence / 80 % power).

    One row: (n_a, n_b, srm_chi2, srm_flag, pooled_rate, mde_abs).
    The z constants ship as shared literals, so both engines compute
    the identical float expression over exact integer counts.  Plan:
    the same single user-keyed aggregation as ab_lift."""
    per_user = (events
                .select(F.col(user_col).alias("u"),
                        (F.col(type_col) == convert_type)
                        .cast("int").alias("cv"))
                .groupBy("u").agg(F.max("cv").alias("converted")))
    cohort = (per_user
              .groupBy((F.pmod(F.col("u"), F.lit(2)) == 0).alias("is_a"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("converted").alias("conv")))
    a = cohort.filter(F.col("is_a")).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a"))
    b = cohort.filter(~F.col("is_a")).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b"))
    j = a.crossJoin(b)
    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    e = (n_a + n_b) / F.lit(2.0)
    chi2 = (((n_a - e) * (n_a - e)) / e) + (((n_b - e) * (n_b - e)) / e)
    p = ((F.col("conv_a") + F.col("conv_b")).cast("double")
         / (F.col("n_a") + F.col("n_b")).cast("double"))
    mde = (F.lit(1.959964) + F.lit(0.841621)) * F.sqrt(
        (p * (F.lit(1.0) - p))
        * ((F.lit(1.0) / n_a) + (F.lit(1.0) / n_b)))
    return j.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(chi2, 6).alias("srm_chi2"),
        (chi2 > F.lit(3.841)).alias("srm_flag"),
        F.round(p, 6).alias("pooled_rate"),
        F.round(mde, 6).alias("mde_abs"))
