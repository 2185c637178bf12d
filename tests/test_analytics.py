"""Relational analytics: results sane + plan discipline (pushdown,
broadcast) visible in the physical plan."""

import pytest
from pyspark.sql import functions as F

from document_vector_pipeline_spark.plans import analytics as A
from document_vector_pipeline_spark.sources import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def t(spark):
    return load_tables(spark, SF)


def test_q1(spark, t):
    rows = A.q1_pricing(t["lineitem"]).collect()
    assert 1 <= len(rows) <= 6
    total = sum(r.count_order for r in rows)
    assert total == t["lineitem"].filter(
        F.col("l_shipdate") < "1998-09-01").count()


def test_q3(spark, t):
    rows = A.q3_shipping(t["customer"], t["orders"], t["lineitem"]).collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5(spark, t):
    rows = A.q5_local_supplier(t["region"], t["nation"], t["customer"],
                               t["supplier"], t["orders"], t["lineitem"],
                               date_from="1995-01-01",
                               date_to="1999-01-01").collect()
    assert len(rows) >= 1
    assert all(r.revenue > 0 for r in rows)


def test_q6(spark, t):
    r = A.q6_forecast(t["lineitem"], date_from="1995-01-01",
                      date_to="1999-01-01").first()
    assert r.revenue is not None and r.revenue > 0


def test_events_enrich(spark, t):
    rows = A.events_enrich(t["events"], t["customer"]).collect()
    assert len(rows) > 0
    assert all(r.n_events > 0 for r in rows)


def test_plan_discipline(spark, t):
    """Filters reach the parquet scan; dims broadcast."""
    q3 = A.q3_shipping(t["customer"], t["orders"], t["lineitem"])
    plan = q3._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # filters sit on the scans (DataFilters in Spark 4's plan string)
    assert "DataFilters: [isnotnull(l_shipdate" in plan
    assert "(c_mktsegment" in plan and "= BUILDING" in plan
    # column pruning: the lineitem scan reads only the 4 needed columns
    assert "FileScan parquet [l_orderkey" in plan and "l_shipdate" in plan
    q6 = A.q6_forecast(t["lineitem"], date_from="1995-01-01",
                       date_to="1999-01-01")
    p6 = q6._jdf.queryExecution().executedPlan().toString()
    assert "DataFilters: [isnotnull(l_shipdate" in p6

def test_basket_pairs_hand_computed(spark):
    from document_vector_pipeline_spark.plans.analytics import basket_pairs

    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20),
        (4, 30), (4, 30),  # duplicate line: distinct collapses it
        (5, 40),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r["part_a"], r["part_b"]): r["n_orders"]
           for r in basket_pairs(li, min_support=2).collect()}
    # (10,20) co-occurs in orders 1,2,3; every other pair only once
    assert out == {(10, 20): 3}


def test_customer_deciles_partition_customers_evenly(spark, t=None):
    from document_vector_pipeline_spark.plans.analytics import customer_deciles
    from document_vector_pipeline_spark.sources import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = customer_deciles(orders).collect()
    assert [r["decile"] for r in out] == list(range(1, 11))
    sizes = [r["n_customers"] for r in out]
    assert max(sizes) - min(sizes) <= 1  # ntile balance
    revs = [r["revenue"] for r in out]
    assert revs == sorted(revs, reverse=True)  # deciles ranked by value


def test_events_bots_median_hand_computed(spark):
    from document_vector_pipeline_spark.plans.analytics import events_bots

    # u1: events at t=0,1,2,3s -> gaps 1s,1s,1s; median 1s; bot at low thresholds
    # u2: single event -> no gaps, never a bot
    rows = [(i, "2024-01-01 00:00:0%d" % s, "u1", "click", 1.0, "{}")
            for i, s in enumerate([0, 1, 2, 3])]
    rows.append((9, "2024-01-01 05:00:00", "u2", "view", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id string, event_type string,"
              " value double, props string") \
        .selectExpr("event_id", "cast(ts as timestamp) as ts", "user_id",
                    "event_type", "value", "props")
    out = {r["user_id"]: r for r in
           events_bots(ev, min_events=3, max_median_gap_s=10).collect()}
    assert out["u1"]["n_events"] == 4
    assert out["u1"]["median_gap_us"] == 1_000_000
    assert out["u1"]["is_bot"]
    assert out["u2"]["n_events"] == 1
    assert out["u2"]["median_gap_us"] is None
    assert not out["u2"]["is_bot"]


def test_mad_outliers_hand_computed(spark):
    from document_vector_pipeline_spark.plans.analytics import (
        events_mad_outliers,
    )

    # values 1..7 plus a whale at 1000: median=4.5->rank4=4 (ceil(9/2)=5?
    # n=8 -> rank (8+1)//2 = 4 -> x=4; devs sorted: 0,1,1,2,2,3,3,996 ->
    # MAD at rank 4 = 2; outlier iff 1000*dev > 4448*2=8896 -> dev>8.896
    # -> only the whale
    rows = [(i, "2024-01-01 00:00:00", "u%d" % i, "purchase", float(v), "{}")
            for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 1000])]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id string, event_type string,"
              " value double, props string") \
        .selectExpr("event_id", "cast(ts as timestamp) as ts", "user_id",
                    "event_type", "value", "props")
    r = events_mad_outliers(ev).collect()[0]
    assert r["median_cents"] == 400
    assert r["mad_cents"] == 200
    assert r["n_outliers"] == 1


def test_conversion_latency_hand_computed(spark):
    from document_vector_pipeline_spark.plans.analytics import (
        conversion_latency,
    )

    rows = [
        # u1: view at 00:00, purchase at 00:10 -> 600s
        (1, "2024-01-01 00:00:00", "u1", "view"),
        (2, "2024-01-01 00:10:00", "u1", "purchase"),
        # u2: purchase BEFORE first view -> later purchase at +30s counts
        (3, "2024-01-01 00:00:00", "u2", "purchase"),
        (4, "2024-01-01 01:00:00", "u2", "view"),
        (5, "2024-01-01 01:00:30", "u2", "purchase"),
        # u3: view only -> not a converter
        (6, "2024-01-01 02:00:00", "u3", "view"),
        # u4: view then purchase at +1200s
        (7, "2024-01-01 03:00:00", "u4", "view"),
        (8, "2024-01-01 03:20:00", "u4", "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id string, event_type string") \
        .selectExpr("event_id", "cast(ts as timestamp) as ts", "user_id",
                    "event_type", "cast(1.0 as double) as value",
                    "'{}' as props")
    r = conversion_latency(ev).collect()[0]
    assert r["n_converters"] == 3
    # sorted latencies: 30s, 600s, 1200s; idx_p = floor((n-1)p/100)
    assert r["p50_us"] == 600 * 1_000_000
    assert r["p90_us"] == 600 * 1_000_000
    assert r["p99_us"] == 600 * 1_000_000


def test_customer_churn_hand_computed(spark):
    from document_vector_pipeline_spark.plans.analytics import customer_churn

    rows = [
        (1, 10, "1995-03-01"), (2, 20, "1995-06-01"),  # 1995: c10, c20
        (3, 10, "1996-01-01"),                           # 1996: only c10
        (4, 10, "1997-01-01"), (5, 30, "1997-05-01"),   # 1997: c10, c30
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate string") \
        .selectExpr("o_orderkey", "o_custkey",
                    "cast(o_orderdate as date) as o_orderdate")
    out = {r["year"]: r for r in customer_churn(orders).collect()}
    # 1995: c20 churned (not in 1996) -> 1/2
    assert out[1995]["n_active"] == 2 and out[1995]["n_churned"] == 1
    assert out[1995]["churn_ppm"] == 500_000
    # 1996: c10 active in 1997 -> 0 churn
    assert out[1996]["n_churned"] == 0
    # 1997 is the last year: excluded
    assert 1997 not in out


def test_user_diversity_hand_computed(spark):
    from document_vector_pipeline_spark.plans.analytics import (
        events_user_diversity,
    )

    rows = [
        (1, "u1", "click"), (2, "u1", "click"),                 # single type
        (3, "u2", "click"), (4, "u2", "view"),                  # 50/50
        (5, "u3", "click"), (6, "u3", "view"), (7, "u3", "buy"),  # thirds
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string") \
        .selectExpr("event_id", "cast('2024-01-01' as timestamp) as ts",
                    "user_id", "event_type",
                    "cast(1.0 as double) as value", "'{}' as props")
    out = {r["user_id"]: r for r in events_user_diversity(ev).collect()}
    assert out["u1"]["gini_ppm"] == 0
    assert out["u2"]["gini_ppm"] == 500_000            # 1 - 2/4
    assert out["u3"]["gini_ppm"] == 1_000_000 * 6 // 9  # 1 - 3/9


def test_supplier_hhi_hand_computed(spark):
    from document_vector_pipeline_spark.plans.analytics import (
        supplier_concentration,
    )

    li = spark.createDataFrame(
        [(1, 100.0, 0.0), (1, 100.0, 0.0), (2, 200.0, 0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double")
    sup = spark.createDataFrame([(1, 7), (2, 7)],
                                "s_suppkey long, s_nationkey long")
    nat = spark.createDataFrame([(7, "FRANCE")],
                                "n_nationkey long, n_name string")
    r = supplier_concentration(li, sup, nat).collect()[0]
    # both suppliers have exactly 50% share -> HHI = 0.5 in ppm
    assert r["n_suppliers"] == 2
    assert r["hhi_ppm"] == 500_000


def test_supplier_hhi_monopoly_is_million(spark):
    from document_vector_pipeline_spark.plans.analytics import (
        supplier_concentration,
    )

    li = spark.createDataFrame(
        [(1, 50.0, 0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double")
    sup = spark.createDataFrame([(1, 7)], "s_suppkey long, s_nationkey long")
    nat = spark.createDataFrame([(7, "FRANCE")],
                                "n_nationkey long, n_name string")
    r = supplier_concentration(li, sup, nat).collect()[0]
    assert r["hhi_ppm"] == 1_000_000


def test_customer_skyline_matches_bruteforce(spark, t):
    from document_vector_pipeline_spark.plans import analytics as A
    per = {r.custkey: (r.n_orders, round(r.total_spend * 100))
           for r in (t["orders"].groupBy(F.col("o_custkey").alias("custkey"))
                     .agg(F.count("*").alias("n_orders"),
                          (F.sum(F.round(F.col("o_totalprice") * 100.0, 0)
                                 .cast("long")) / 100.0).alias("total_spend"))
                     .collect())}
    sky = {r.custkey for r in A.customer_skyline(t["orders"]).collect()}
    expect = {c for c, (n, v) in per.items()
              if not any(n2 > n and v2 > v
                         for c2, (n2, v2) in per.items() if c2 != c)}
    assert sky == expect and sky


def test_order_backlog_conserves_and_stays_nonnegative(spark, t):
    from document_vector_pipeline_spark.plans import analytics as A
    rows = A.order_backlog(t["lineitem"], t["orders"]).collect()
    total_ordered = sum(r.n_ordered for r in rows)
    total_shipped = sum(r.n_shipped for r in rows)
    assert total_ordered == total_shipped == t["lineitem"].count()
    assert rows[-1].open_count == 0
    # (the synthetic testdata contains ship-before-order rows, so the
    # running count may dip negative mid-series; conservation and the
    # zero endpoint are the invariants)
    assert rows[-1].open_count == sum(r.n_ordered - r.n_shipped
                                      for r in rows)


def test_events_burst_hand_case(spark):
    import datetime as dt

    from document_vector_pipeline_spark.plans import analytics as A
    rows = []
    eid = 0
    # 30 calm hours with 2 events each, then one hour with 100
    for h in range(30):
        for _ in range(2):
            rows.append((eid, 1, dt.datetime(2024, 1, 1) +
                         dt.timedelta(hours=h), "view", 0.0))
            eid += 1
    for _ in range(100):
        rows.append((eid, 1, dt.datetime(2024, 1, 1) +
                     dt.timedelta(hours=30), "view", 0.0))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp,"
              " event_type string, value double")
    out = {r.bucket.hour + 24 * (r.bucket.day - 1): r
           for r in A.events_burst(ev).collect()}
    assert out[30].burst           # 100 * 24 > 3 * 48
    assert not out[29].burst       # 2 * 24 < 3 * 48
    assert not out[10].burst       # incomplete lookback window -> never


def test_orders_latency_rank_selected(spark, t):
    from document_vector_pipeline_spark.plans import analytics as A
    rows = {r.priority: r
            for r in A.orders_latency(t["orders"], t["lineitem"]).collect()}
    assert rows
    # brute-force check one priority against python rank selection
    pr = sorted(rows)[0]
    first = (t["lineitem"].groupBy(F.col("l_orderkey").alias("o_orderkey"))
             .agg(F.min("l_shipdate").alias("fs")))
    per = sorted(
        ((r.fs.date() - r.o_orderdate.date()).days, r.o_orderkey)
        for r in t["orders"].join(first, "o_orderkey")
        .filter(F.col("o_orderpriority") == pr)
        .select("o_orderkey", "o_orderdate", "fs").collect())
    n = len(per)
    assert rows[pr].n_orders == n
    assert rows[pr].p50_days == per[(n - 1) * 50 // 100][0]
    assert rows[pr].p99_days == per[(n - 1) * 99 // 100][0]


def test_events_benford_shares_and_constants(spark, t):
    import math

    from document_vector_pipeline_spark.plans import analytics as A
    rows = {r.digit: r for r in A.events_benford(t["events"]).collect()}
    assert set(rows) <= set(range(1, 10))
    assert sum(r.obs_ppm for r in rows.values()) <= 1_000_000
    for d, r in rows.items():
        assert r.benford_ppm == round(math.log10(1 + 1 / d) * 1_000_000)
        assert r.excess_ppm == r.obs_ppm - r.benford_ppm


def test_orders_mix_trend_shares(spark, t):
    from document_vector_pipeline_spark.plans import analytics as A
    rows = A.orders_mix_trend(t["orders"]).collect()
    per = {}
    for r in rows:
        per.setdefault(r.month, []).append(r)
    assert len(per) > 1
    for month, rs in per.items():
        total = sum(r.n_orders for r in rs)
        for r in rs:
            assert r.share_ppm == (1_000_000 * r.n_orders) // total


def test_ab_lift_counts_and_z_sign(spark):
    """Hand-built log: cohort A (even users 0,2) converts 1/2, cohort B
    (odd users 1,3) converts 2/2 — positive lift, positive z, exact
    counts; a user with many purchases still counts once."""
    rows = [(0, "view"), (0, "purchase"), (0, "purchase"),
            (2, "view"),
            (1, "purchase"), (3, "purchase"), (3, "view")]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    r = A.ab_lift(ev).collect()[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (2, 1, 2, 2)
    assert r["rate_a"] == 0.5 and r["rate_b"] == 1.0
    assert r["abs_lift"] == 0.5 and r["z_score"] > 0


def test_ab_lift_no_conversions_z_zero(spark):
    ev = spark.createDataFrame([(0, "view"), (1, "view")],
                               "user_id long, event_type string")
    r = A.ab_lift(ev).collect()[0]
    assert r["conv_a"] == 0 and r["conv_b"] == 0 and r["z_score"] == 0.0


def test_ab_cuped_removes_pre_period_variance(spark):
    """y = x + cohort effect: theta ~ 1, per-cohort variance collapses
    after adjustment, and the adjusted means keep the true +100-cent
    B-over-A effect."""
    rows = []
    for u in range(8):
        rows.append((u, 2024_01_10, float(u + 1)))          # pre
        rows.append((u, 2024_01_20, float(u + 1) + (u % 2)))  # post
    ev = spark.createDataFrame(
        [(u, f"2024-01-{d % 100:02d} 12:00:00", v) for u, d, v in rows],
        "user_id long, ts_s string, value double").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    out = {r["cohort"]: r for r in A.ab_cuped(ev).collect()}
    assert out["A"]["n_users"] == 4 and out["B"]["n_users"] == 4
    assert 0.9 < out["A"]["theta"] < 1.1
    assert out["A"]["theta"] == out["B"]["theta"]       # pooled
    for c in "AB":
        assert out[c]["var_reduction"] < 0.2
    lift = out["B"]["mean_y_adj"] - out["A"]["mean_y_adj"]
    assert abs(lift - 100.0) < 15.0                     # cents


def test_ab_cuped_degenerate_pre_period_theta_zero(spark):
    """All users share one pre-period value -> var(X)=0 -> theta=0 and
    the adjusted mean equals the raw mean."""
    ev = spark.createDataFrame(
        [(u, "2024-01-10 00:00:00", 5.0) for u in range(4)]
        + [(u, "2024-01-20 00:00:00", float(u)) for u in range(4)],
        "user_id long, ts_s string, value double").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    out = A.ab_cuped(ev).collect()
    assert all(r["theta"] == 0.0 and r["mean_y"] == r["mean_y_adj"]
               for r in out)


def test_ab_health_flags_sample_ratio_mismatch(spark):
    """Balanced cohorts: chi2 = 0, no flag; a 90/10 split flags."""
    bal = spark.createDataFrame(
        [(u, "view") for u in range(20)],
        "user_id long, event_type string")
    r = A.ab_health(bal).collect()[0]
    assert r["srm_chi2"] == 0.0 and not r["srm_flag"]
    # 18 even users vs 2 odd users: chi2 = (8^2/10)*2 = 12.8 -> flag
    skew = spark.createDataFrame(
        [(2 * u, "view") for u in range(18)]
        + [(2 * u + 1, "view") for u in range(2)],
        "user_id long, event_type string")
    r2 = A.ab_health(skew).collect()[0]
    assert r2["srm_chi2"] == 12.8 and r2["srm_flag"]


def test_ab_health_mde_shrinks_with_sample_size(spark):
    small = spark.createDataFrame(
        [(u, "purchase" if u % 4 == 0 else "view") for u in range(20)],
        "user_id long, event_type string")
    big = spark.createDataFrame(
        [(u, "purchase" if u % 4 == 0 else "view") for u in range(2000)],
        "user_id long, event_type string")
    m_small = A.ab_health(small).collect()[0]["mde_abs"]
    m_big = A.ab_health(big).collect()[0]["mde_abs"]
    assert m_big < m_small / 5          # ~1/sqrt(100x) shrink
