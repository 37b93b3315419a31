"""Time-series joins (operators/timeseries.py): exact parity with Python
brute force for asof_join (ties, no-predecessor NULLs, tolerance) and
range_join (boundary inclusion/exclusion, multi-bucket intervals), plus
the plan shapes the module promises (one exchange / broadcast equi-join,
never a nested loop)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from resume_ocr_spark.operators import timeseries

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes, micros=0):
    return T0 + dt.timedelta(minutes=minutes, microseconds=micros)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(10), 101), (1, _ts(20), 102),
         (2, _ts(5), 200), (2, _ts(6), 201),
         (3, _ts(1), 300)],  # key 3 has no right rows at all
        "k long, ts timestamp, ev long")
    right = spark.createDataFrame(
        [(1, _ts(0), 1.0),    # tie with left @0 → matches (inclusive)
         (1, _ts(15), 2.0),
         (2, _ts(4), 3.0)],
        "k long, ts timestamp, v double")
    return left, right


def _py_asof(left_rows, right_rows, tol_sec=None):
    out = {}
    for k, lts, ev in left_rows:
        best = None
        for rk, rts, v in right_rows:
            if rk == k and rts <= lts and (best is None or rts > best[0]):
                best = (rts, v)
        if best and tol_sec is not None \
                and (lts - best[0]).total_seconds() > tol_sec:
            best = None
        out[ev] = (best[1], best[0]) if best else (None, None)
    return out


class TestAsof:
    LEFT = [(1, _ts(0), 100), (1, _ts(10), 101), (1, _ts(20), 102),
            (2, _ts(5), 200), (2, _ts(6), 201), (3, _ts(1), 300)]
    RIGHT = [(1, _ts(0), 1.0), (1, _ts(15), 2.0), (2, _ts(4), 3.0)]

    def test_matches_python_brute_force(self, spark, frames):
        left, right = frames
        got = {r["ev"]: (r["v_r"], r["ts_r"])
               for r in timeseries.asof_join(left, right, ["k"]).collect()}
        assert got == _py_asof(self.LEFT, self.RIGHT)
        assert got[100] == (1.0, _ts(0))       # inclusive tie
        assert got[300] == (None, None)        # totality: no predecessor

    def test_tolerance_expires_stale_matches(self, spark, frames):
        left, right = frames
        got = {r["ev"]: (r["v_r"], r["ts_r"])
               for r in timeseries.asof_join(
                   left, right, ["k"], tolerance_sec=300).collect()}
        assert got == _py_asof(self.LEFT, self.RIGHT, tol_sec=300)
        assert got[102] == (2.0, _ts(15))      # 5 min old: fresh
        assert got[101] == (None, None)        # 10 min old: expired

    def test_single_exchange_no_joins(self, spark, frames):
        left, right = frames
        plan = timeseries.asof_join(left, right, ["k"]) \
            ._jdf.queryExecution().executedPlan().toString()
        import re
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        assert "Join" not in plan

    def test_validation(self, spark, frames):
        left, right = frames
        with pytest.raises(ValueError, match="payload"):
            timeseries.asof_join(left, right.select("k", "ts"), ["k"])


class TestRange:
    def test_matches_python_brute_force(self, spark):
        events = spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b", _ts(i * 7)) for i in range(40)],
            "event_id long, k string, ts timestamp")
        # interval spanning many 1-min buckets + an empty interval dropped
        intervals = spark.createDataFrame(
            [("a", _ts(10), _ts(100)), ("b", _ts(0), _ts(35)),
             ("b", _ts(50), _ts(50))],
            "k string, start_ts timestamp, end_ts timestamp")
        got = {(r["event_id"], r["start_ts"])
               for r in timeseries.range_join(
                   events, intervals, ["k"], width_sec=60).collect()}
        ev = [(i, "a" if i % 2 == 0 else "b", _ts(i * 7)) for i in range(40)]
        iv = [("a", _ts(10), _ts(100)), ("b", _ts(0), _ts(35))]
        expect = {(e[0], s) for e in ev for (k, s, t) in iv
                  if e[1] == k and s <= e[2] < t}
        assert got == expect and got

    def test_half_open_boundaries(self, spark):
        events = spark.createDataFrame(
            [(0, "x", _ts(10)), (1, "x", _ts(20))],
            "event_id long, k string, ts timestamp")
        intervals = spark.createDataFrame(
            [("x", _ts(10), _ts(20))],
            "k string, start_ts timestamp, end_ts timestamp")
        got = [r["event_id"] for r in timeseries.range_join(
            events, intervals, ["k"]).collect()]
        assert got == [0]  # start inclusive, end exclusive

    def test_broadcast_equi_join_never_nested_loop(self, spark):
        events = spark.createDataFrame(
            [(0, "x", _ts(1))], "event_id long, k string, ts timestamp")
        intervals = spark.createDataFrame(
            [("x", _ts(0), _ts(5))],
            "k string, start_ts timestamp, end_ts timestamp")
        plan = timeseries.range_join(events, intervals, ["k"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_validation(self, spark):
        events = spark.createDataFrame(
            [(0, "x", _ts(1))], "event_id long, k string, ts timestamp")
        with pytest.raises(ValueError, match="width_sec"):
            timeseries.range_join(events, events.select(
                "k", F.col("ts").alias("start_ts"),
                F.col("ts").alias("end_ts")), ["k"], width_sec=0)


class TestHypertableRollup:
    def test_each_level_matches_flat_recompute(self, spark):
        events = spark.createDataFrame(
            [(i, "t" + str(i % 3), _ts(i * 13, micros=i),
              round((i * 7 % 50) / 4.0, 2)) for i in range(200)],
            "event_id long, event_type string, ts timestamp, value double")
        out = timeseries.hypertable_rollup(
            events, ["event_type"], widths_sec=(60, 3600, 86400)).collect()
        rows = [(r["event_type"], r["ts"], round(r["value"] * 100))
                for r in events.collect()]
        for width in (60, 3600, 86400):
            flat = {}
            for k, ts, cv in rows:
                b = (int(ts.timestamp() * 1_000_000)) // (width * 1_000_000)
                n, s, mn, mx = flat.get((k, b), (0, 0, None, None))
                flat[(k, b)] = (n + 1, s + cv,
                                cv if mn is None else min(mn, cv),
                                cv if mx is None else max(mx, cv))
            got = {(r["event_type"],
                    int(r["bucket_start"].timestamp() * 1_000_000)
                    // (width * 1_000_000)):
                   (r["n_events"], r["sum_cents"], r["min_cents"],
                    r["max_cents"])
                   for r in out if r["bucket_width_sec"] == width}
            assert got == flat, width

    def test_counts_conserved_across_levels(self, spark):
        events = spark.createDataFrame(
            [(i, "x", _ts(i), 1.0) for i in range(100)],
            "event_id long, event_type string, ts timestamp, value double")
        out = timeseries.hypertable_rollup(
            events, ["event_type"], widths_sec=(60, 3600)).collect()
        by_level = {}
        for r in out:
            by_level[r["bucket_width_sec"]] = \
                by_level.get(r["bucket_width_sec"], 0) + r["n_events"]
        assert by_level == {60: 100, 3600: 100}

    def test_validation(self, spark):
        events = spark.createDataFrame(
            [(0, "x", _ts(0), 1.0)],
            "event_id long, event_type string, ts timestamp, value double")
        with pytest.raises(ValueError, match="divide"):
            timeseries.hypertable_rollup(events, ["event_type"],
                                         widths_sec=(60, 90))
        with pytest.raises(ValueError, match="ascending|divide"):
            timeseries.hypertable_rollup(events, ["event_type"],
                                         widths_sec=(3600, 60))
        with pytest.raises(ValueError, match="non-empty"):
            timeseries.hypertable_rollup(events, ["event_type"],
                                         widths_sec=())


class TestReviewRegressions:
    """Round-5 review findings: row-atomic carry, NULL-ts right rows,
    pre-1970 floor bucketing, reserved-name collisions."""

    def test_asof_carry_is_row_atomic_under_null_payload(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(6), 100)], "k long, ts timestamp, ev long")
        right = spark.createDataFrame(
            [(1, _ts(0), 3.0), (1, _ts(5), None)],
            "k long, ts timestamp, v double")
        [r] = timeseries.asof_join(left, right, ["k"]).collect()
        # the matched row is (ts=5, v=NULL) VERBATIM — not v from ts=0
        # stitched onto ts from ts=5
        assert (r["v_r"], r["ts_r"]) == (None, _ts(5))

    def test_asof_null_ts_right_rows_never_match(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(1), 100)], "k long, ts timestamp, ev long")
        right = spark.createDataFrame(
            [(1, None, 9.0)], "k long, ts timestamp, v double")
        [r] = timeseries.asof_join(left, right, ["k"]).collect()
        assert (r["v_r"], r["ts_r"]) == (None, None)

    def test_pre_1970_timestamps_bucket_by_floor(self, spark):
        old = dt.datetime(1969, 12, 31, 23, 30)
        events = spark.createDataFrame(
            [(0, "x", old, 1.0)],
            "event_id long, event_type string, ts timestamp, value double")
        out = timeseries.hypertable_rollup(
            events, ["event_type"], widths_sec=(3600, 86400)).collect()
        for r in out:  # bucket_start must bound its events from below
            assert r["bucket_start"] <= old
        intervals = spark.createDataFrame(
            [("x", dt.datetime(1969, 12, 31), dt.datetime(1970, 1, 2))],
            "event_type string, start_ts timestamp, end_ts timestamp")
        got = timeseries.range_join(
            events.select("event_id", "event_type", "ts"), intervals,
            ["event_type"]).collect()
        assert len(got) == 1

    def test_reserved_name_collisions_raise(self, spark, frames):
        left, right = frames
        with pytest.raises(ValueError, match="reserved"):
            timeseries.asof_join(
                left.withColumn("v_r", F.lit(1)), right, ["k"])
        ev = spark.createDataFrame(
            [(0, "x", _ts(1), 5)],
            "event_id long, k string, ts timestamp, _b long")
        iv = spark.createDataFrame(
            [("x", _ts(0), _ts(5))],
            "k string, start_ts timestamp, end_ts timestamp")
        with pytest.raises(ValueError, match="reserved"):
            timeseries.range_join(ev, iv, ["k"])
        with pytest.raises(ValueError, match="positive"):
            timeseries.hypertable_rollup(
                ev.withColumnRenamed("k", "event_type")
                .withColumnRenamed("_b", "value"), ["event_type"],
                widths_sec=(0,))
