"""Temporal operators: as-of join, range join, rolling windows, rollups.

Corner cases covered by hand-built frames (ties, tolerance, bucket
boundaries, duplicate matches, unmatched rows); data-scale sanity via
sf0.001 events.  Oracle exactness runs in test_entry_oracle.py.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from document_vector_pipeline_spark.plans import temporal as T
from document_vector_pipeline_spark.sources import load_table

TS = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


def test_asof_basic_and_tie(spark):
    left = _ev(spark, [(1, 7, TS(2024, 1, 1, 10, 0, 0), 0.0),
                       (2, 7, TS(2024, 1, 1, 9, 30, 0), 0.0)])
    # two right rows at the same instant as left #2 (09:30) → included (<=),
    # tie broken by max event_id; left #1 matches the 10:00 row exactly
    right = _ev(spark, [(10, 7, TS(2024, 1, 1, 9, 30, 0), 1.0),
                        (11, 7, TS(2024, 1, 1, 9, 30, 0), 2.0),
                        (12, 7, TS(2024, 1, 1, 10, 0, 0), 3.0),
                        (13, 8, TS(2024, 1, 1, 9, 0, 0), 9.0)])
    out = {r.event_id: r for r in T.asof_join(
        left, right.select("user_id", "ts", "event_id", "value"),
        key="user_id", right_cols=["event_id", "value"],
        right_seq="event_id").collect()}
    assert out[1].r_event_id == 12 and out[1].r_value == 3.0
    assert out[2].r_event_id == 11 and out[2].r_value == 2.0  # tie → id 11


def test_asof_no_match_and_other_key(spark):
    left = _ev(spark, [(1, 7, TS(2024, 1, 1, 8, 0, 0), 0.0)])
    right = _ev(spark, [(10, 7, TS(2024, 1, 1, 9, 0, 0), 1.0),  # after left
                        (11, 8, TS(2024, 1, 1, 7, 0, 0), 2.0)])  # other key
    r = T.asof_join(left, right.select("user_id", "ts", "event_id"),
                    key="user_id", right_cols=["event_id"],
                    right_seq="event_id").collect()[0]
    assert r.r_event_id is None and r.r_ts is None


def test_asof_tolerance(spark):
    left = _ev(spark, [(1, 7, TS(2024, 1, 1, 10, 0, 0), 0.0)])
    right = _ev(spark, [(10, 7, TS(2024, 1, 1, 9, 0, 0), 1.0)])
    keep = T.asof_join(left, right.select("user_id", "ts", "event_id"),
                       key="user_id", right_cols=["event_id"],
                       right_seq="event_id",
                       tolerance_us=3600 * 10**6).collect()[0]
    drop = T.asof_join(left, right.select("user_id", "ts", "event_id"),
                       key="user_id", right_cols=["event_id"],
                       right_seq="event_id",
                       tolerance_us=3600 * 10**6 - 1).collect()[0]
    assert keep.r_event_id == 10
    assert drop.r_event_id is None


# ---------------------------------------------------------------------------
# range_join / range_join_agg
# ---------------------------------------------------------------------------


def test_range_join_boundaries(spark):
    left = _ev(spark, [(1, 7, TS(2024, 1, 1, 10, 0, 0), 0.0)])
    # window is [09:30, 10:00): 09:30 in, 09:29:59.999999 out, 10:00 out
    right = _ev(spark, [(10, 7, TS(2024, 1, 1, 9, 30, 0), 1.0),
                        (11, 7, TS(2024, 1, 1, 9, 29, 59, 999999), 2.0),
                        (12, 7, TS(2024, 1, 1, 10, 0, 0), 3.0),
                        (13, 7, TS(2024, 1, 1, 9, 59, 59, 999999), 4.0)])
    got = sorted(r.r_event_id for r in T.range_join(
        left, right.select("user_id", "ts", "event_id"),
        key="user_id", right_cols=["event_id"]).collect())
    assert got == [10, 13]


def test_range_join_duplicate_values_counted(spark):
    left = _ev(spark, [(1, 7, TS(2024, 1, 1, 10, 0, 0), 0.0),
                       (2, 8, TS(2024, 1, 1, 10, 0, 0), 0.0)])  # no matches
    # identical (ts, value) duplicates must both count
    right = _ev(spark, [(10, 7, TS(2024, 1, 1, 9, 45, 0), 2.5),
                        (11, 7, TS(2024, 1, 1, 9, 45, 0), 2.5)])
    out = {r.event_id: r for r in T.range_join_agg(
        left, right.select("user_id", "ts", "value"),
        key="user_id").collect()}
    assert out[1].n_matched == 2 and out[1].matched_value == 5.0
    assert out[2].n_matched == 0 and out[2].matched_value == 0.0


def test_range_join_agg_matches_rolling(spark):
    """Self range-join ≡ RANGE-frame rolling window on real data."""
    ev = (load_table(spark, "/root/testdata/sf0.001", "events")
          .select("event_id", "user_id", "ts", "value"))
    agg = {r.event_id: (r.n_matched, r.matched_value)
           for r in T.range_join_agg(
               ev.select("event_id", "user_id", "ts"), ev.drop("event_id"),
               key="user_id").collect()}
    roll = {r.event_id: (r.n_prev, r.prev_value)
            for r in T.rolling_counts(ev).collect()}
    assert agg == roll


# ---------------------------------------------------------------------------
# rollups
# ---------------------------------------------------------------------------


def test_rollup_grand_total(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = T.rollup_events(ev).collect()
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1 and grand[0].n_events == ev.count()
    per_type = {r.event_type: r.n_events for r in rows if r.gid == 1}
    assert sum(per_type.values()) == ev.count()
    leaf_total = sum(r.n_events for r in rows if r.gid == 0)
    assert leaf_total == ev.count()


def test_hypertable_grains_agree(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = T.hypertable_rollup(ev).collect()
    hours = [r for r in rows if r.grain == "hour"]
    days = [r for r in rows if r.grain == "day"]
    assert sum(r.n_events for r in hours) == sum(r.n_events for r in days)
    assert round(sum(r.total_value for r in hours), 2) == \
        round(sum(r.total_value for r in days), 2)


def test_asof_single_shuffle_no_join(spark):
    """The as-of plan must contain a window, ONE exchange, and no join."""
    ev = (load_table(spark, "/root/testdata/sf0.001", "events")
          .select("event_id", "user_id", "ts"))
    plan = T.asof_join(
        ev.limit(10), ev.select("user_id", "ts", "event_id"),
        key="user_id", right_cols=["event_id"],
        right_seq="event_id")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan or "join" not in plan.lower().replace(
        "joinedrow", "")
    assert plan.count("Exchange hashpartitioning") <= 1


# ---------------------------------------------------------------------------
# asof_forward / gapfill_locf
# ---------------------------------------------------------------------------


def test_asof_forward_basic_tie_and_tolerance(spark):
    left = _ev(spark, [(1, 7, TS(2024, 1, 1, 10, 0, 0), 0.0),
                       (2, 7, TS(2024, 1, 1, 9, 30, 0), 0.0),
                       (3, 9, TS(2024, 1, 1, 9, 0, 0), 0.0)])
    # two right rows at left #2's instant → included (>=), tie broken by
    # MIN event_id; left #1 matches the 11:00 row (next at-or-after);
    # user 9 has no future click → NULLs
    right = _ev(spark, [(10, 7, TS(2024, 1, 1, 9, 30, 0), 1.0),
                        (11, 7, TS(2024, 1, 1, 9, 30, 0), 2.0),
                        (12, 7, TS(2024, 1, 1, 11, 0, 0), 3.0),
                        (13, 9, TS(2024, 1, 1, 8, 0, 0), 9.0)])
    out = {r.event_id: r for r in T.asof_forward(
        left, right.select("user_id", "ts", "event_id", "value"),
        key="user_id", right_cols=["event_id", "value"],
        right_seq="event_id").collect()}
    assert out[2].r_event_id == 10 and out[2].r_value == 1.0
    assert out[1].r_event_id == 12 and out[1].r_value == 3.0
    assert out[3].r_event_id is None and out[3].r_ts is None
    # tolerance: 30 min window drops left #1's 60-min-ahead match
    tol = {r.event_id: r for r in T.asof_forward(
        left, right.select("user_id", "ts", "event_id", "value"),
        key="user_id", right_cols=["event_id", "value"],
        right_seq="event_id",
        tolerance_us=30 * 60 * 1_000_000).collect()}
    assert tol[2].r_event_id == 10
    assert tol[1].r_event_id is None


def test_asof_forward_single_shuffle_no_join(spark):
    ev = (load_table(spark, "/root/testdata/sf0.001", "events")
          .select("event_id", "user_id", "ts"))
    plan = T.asof_forward(
        ev.limit(10), ev.select("user_id", "ts", "event_id"),
        key="user_id", right_cols=["event_id"],
        right_seq="event_id")._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_gapfill_locf_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "a", TS(2024, 1, 1, 0, 10), 1.0),
         (2, "a", TS(2024, 1, 1, 0, 50), 2.0),
         (3, "a", TS(2024, 1, 1, 3, 5), 4.0),
         (4, "b", TS(2024, 1, 1, 2, 0), 8.0)],
        "event_id long, event_type string, ts timestamp, value double")
    rows = {(r.event_type, r.bucket.hour): r
            for r in T.gapfill_locf(df).collect()}
    # grid spans hours 0..3 for BOTH types (corpus range)
    assert len(rows) == 8
    a1 = rows[("a", 1)]
    assert a1.is_gap and a1.n_events == 0 and a1.bucket_value is None
    assert a1.locf_value == 3.0          # carried from hour 0 (1+2)
    assert rows[("a", 3)].bucket_value == 4.0
    assert not rows[("a", 3)].is_gap
    b0 = rows[("b", 0)]
    assert b0.is_gap and b0.locf_value is None   # before first real bucket
    assert rows[("b", 2)].locf_value == 8.0
    assert rows[("b", 3)].locf_value == 8.0      # carried forward


def test_gapfill_grid_window_not_on_events(spark):
    """The LOCF window must consume the grid join, not the event scan:
    no window operator may appear below the grain aggregation."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    plan = T.gapfill_locf(ev)._jdf.queryExecution().executedPlan().toString()
    # one aggregate pass over events, window strictly above it
    assert plan.index("Window") < plan.index("HashAggregate")
