"""Beyond-reference time-series primitives: as-of join, sessionization,
time-bucket rollup, bucketed point-in-interval (range) join."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            pd.DataFrame(
                {"k": ["a", "a", "a", "b"],
                 "ts": [_ts(10), _ts(20), _ts(30), _ts(10)],
                 "lv": [1, 2, 3, 4]}
            )
        )
        right = spark.createDataFrame(
            pd.DataFrame(
                {"k": ["a", "a", "b", "c"],
                 "ts": [_ts(5), _ts(20), _ts(50), _ts(1)],
                 "rv": [100, 200, 300, 400]}
            )
        )
        return left, right

    def test_backward_inclusive(self, spark):
        from holcstore_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        out = {
            (r["k"], r["lv"]): r["rv_r"]
            for r in asof_join(left, right, on="k").collect()
        }
        # ts=10 → right@5; ts=20 → right@20 (inclusive); ts=30 → right@20
        assert out[("a", 1)] == 100
        assert out[("a", 2)] == 200
        assert out[("a", 3)] == 200
        # b@10 has no right row at or before → NULL
        assert out[("b", 4)] is None

    def test_tolerance_nulls_stale_matches(self, spark):
        from holcstore_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        out = {
            (r["k"], r["lv"]): r["rv_r"]
            for r in asof_join(
                left, right, on="k", tolerance_seconds=6 * 60
            ).collect()
        }
        assert out[("a", 1)] == 100      # 5 min gap <= 6 min
        assert out[("a", 3)] is None     # 10 min gap > 6 min
        assert out[("a", 2)] == 200      # exact match, gap 0

    def test_forward(self, spark):
        from holcstore_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        out = {
            (r["k"], r["lv"]): (r["rv_r"], r["ts_r"])
            for r in asof_join(left, right, on="k", direction="forward").collect()
        }
        assert out[("a", 1)][0] == 200   # earliest right at/after 10 is @20
        assert out[("a", 2)][0] == 200   # inclusive
        assert out[("a", 3)][0] is None  # nothing after 30 for k=a
        assert out[("b", 4)][0] == 300

    def test_left_rows_all_survive_and_columns(self, spark):
        from holcstore_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        out = asof_join(left, right, on="k")
        assert out.count() == left.count()
        assert out.columns == ["k", "ts", "lv", "ts_r", "rv_r"]


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        from holcstore_spark.operators.sessions import sessionize, session_stats

        df = spark.createDataFrame(
            pd.DataFrame(
                {"user_id": [1, 1, 1, 1, 2],
                 "ts": [_ts(0), _ts(10), _ts(41), _ts(45), _ts(0)],
                 "event_id": [0, 1, 2, 3, 4]}
            )
        )
        out = {
            r["event_id"]: r["session_idx"]
            for r in sessionize(
                df, gap_seconds=30 * 60, tiebreak=("event_id",)
            ).collect()
        }
        # 0→10 same session; 10→41 gap 31min > 30 → new; 41→45 same
        assert [out[i] for i in range(4)] == [0, 0, 1, 1]
        assert out[4] == 0

        stats = {
            (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_sec"])
            for r in session_stats(
                df, gap_seconds=30 * 60, tiebreak=("event_id",)
            ).collect()
        }
        assert stats[(1, 0)] == (2, 600.0)
        assert stats[(1, 1)] == (2, 240.0)
        assert stats[(2, 0)] == (1, 0.0)

    def test_exact_gap_stays_in_session(self, spark):
        from holcstore_spark.operators.sessions import sessionize

        df = spark.createDataFrame(
            pd.DataFrame({"user_id": [1, 1], "ts": [_ts(0), _ts(30)]})
        )
        out = sessionize(df, gap_seconds=30 * 60).collect()
        assert {r["session_idx"] for r in out} == {0}


class TestTimeBucketRollup:
    def test_rollup_values(self, spark):
        from holcstore_spark.operators.resample import time_bucket_rollup

        df = spark.createDataFrame(
            pd.DataFrame(
                {"k": ["a"] * 4,
                 "ts": [_ts(0), _ts(20), _ts(59), _ts(60)],
                 "value": [1.5, 2.25, 3.0, 7.0]}
            )
        )
        out = {
            r["bucket_ts"]: r
            for r in time_bucket_rollup(df, ("k",), 3600).collect()
        }
        b0, b1 = _ts(0), _ts(60)
        assert out[b0]["n"] == 3
        assert out[b0]["v_sum"] == pytest.approx(6.75)
        assert (out[b0]["v_min"], out[b0]["v_max"]) == (1.5, 3.0)
        assert (out[b0]["v_first"], out[b0]["v_last"]) == (1.5, 3.0)
        assert out[b1]["n"] == 1
        assert out[b1]["v_first"] == out[b1]["v_last"] == 7.0

    def test_bucket_edges_epoch_aligned(self, spark):
        from holcstore_spark.operators.resample import time_bucket

        df = spark.createDataFrame(
            pd.DataFrame({"ts": [_ts(0), _ts(90), datetime(1969, 12, 31, 23, 59)]})
        )
        out = sorted(
            r["b"] for r in df.select(time_bucket("ts", 3600).alias("b")).collect()
        )
        assert out == [
            datetime(1969, 12, 31, 23, 0),  # pre-epoch floors DOWN
            _ts(0),
            _ts(60),
        ]


class TestPointInIntervalJoin:
    def test_pairs_once_and_bounds_inclusive(self, spark):
        from holcstore_spark.operators.intervals import point_in_interval_join

        intervals = spark.createDataFrame(
            pd.DataFrame(
                {"k": ["a", "a"],
                 "iv_id": [1, 2],
                 "start_ts": [_ts(0), _ts(25)],
                 "end_ts": [_ts(30), _ts(35)]}
            )
        )
        points = spark.createDataFrame(
            pd.DataFrame(
                {"k": ["a", "a", "a", "b"],
                 "ts": [_ts(0), _ts(30), _ts(34), _ts(10)],
                 "p_id": [10, 11, 12, 13]}
            )
        )
        # bucket (10 min) smaller than intervals → intervals span buckets
        out = point_in_interval_join(
            points, intervals, on="k", bucket_seconds=600
        ).select("iv_id", "p_id").collect()
        pairs = sorted((r["iv_id"], r["p_id"]) for r in out)
        # start and end inclusive; overlapping intervals both match @30;
        # k=b point never matches; each pair exactly once
        assert pairs == [(1, 10), (1, 11), (2, 11), (2, 12)]

    def test_matches_plain_range_join(self, spark):
        from holcstore_spark.operators.intervals import point_in_interval_join

        import numpy as np

        rng = np.random.RandomState(7)
        iv = pd.DataFrame(
            {"k": rng.randint(0, 3, 40),
             "iv_id": range(40),
             "start_m": rng.randint(0, 500, 40)}
        )
        iv["start_ts"] = [_ts(int(m)) for m in iv["start_m"]]
        iv["end_ts"] = [
            _ts(int(m) + int(d))
            for m, d in zip(iv["start_m"], rng.randint(0, 90, 40))
        ]
        pts = pd.DataFrame(
            {"k": rng.randint(0, 3, 200),
             "p_id": range(200),
             "ts": [_ts(float(m)) for m in rng.uniform(0, 600, 200)]}
        )
        intervals = spark.createDataFrame(iv.drop(columns=["start_m"]))
        points = spark.createDataFrame(pts)
        fast = point_in_interval_join(
            points, intervals, on="k", bucket_seconds=1234
        )
        slow = intervals.join(points, on="k").filter(
            F.col("ts").between(F.col("start_ts"), F.col("end_ts"))
        )
        a = sorted((r["iv_id"], r["p_id"]) for r in fast.collect())
        b = sorted((r["iv_id"], r["p_id"]) for r in slow.collect())
        assert a == b and len(a) > 0


class TestSlidingWindowRollup:
    def test_event_lands_in_width_over_slide_windows(self, spark):
        from holcstore_spark.operators.resample import sliding_window_rollup

        df = spark.createDataFrame(pd.DataFrame({
            "g": ["a"],
            "ts": [pd.Timestamp("2024-01-01 05:30:00")],
            "value": [10.0],
        }))
        rows = sliding_window_rollup(df, ("g",), 7200, 3600).orderBy(
            "window_start_us").collect()
        # one event -> exactly 2 windows: starts 04:00 and 05:00
        starts = [pd.Timestamp(r["window_start_us"], unit="us") for r in rows]
        assert starts == [pd.Timestamp("2024-01-01 04:00:00"),
                          pd.Timestamp("2024-01-01 05:00:00")]
        assert all(r["n"] == 1 and r["v_sum"] == 10.0 for r in rows)

    def test_counts_accumulate_across_overlapping_windows(self, spark):
        from holcstore_spark.operators.resample import sliding_window_rollup

        df = spark.createDataFrame(pd.DataFrame({
            "g": ["a", "a"],
            "ts": [pd.Timestamp("2024-01-01 05:10:00"),
                   pd.Timestamp("2024-01-01 06:10:00")],
            "value": [1.0, 2.0],
        }))
        rows = {r["window_start_us"]: r for r in
                sliding_window_rollup(df, ("g",), 7200, 3600).collect()}
        h5 = int(pd.Timestamp("2024-01-01 05:00:00").value // 1000)
        # the 05:00 window spans [05:00,07:00): both events
        assert rows[h5]["n"] == 2 and rows[h5]["v_sum"] == 3.0

    def test_rejects_non_multiple_width(self, spark):
        from holcstore_spark.operators.resample import sliding_window_rollup

        df = spark.createDataFrame(pd.DataFrame({
            "g": ["a"], "ts": [pd.Timestamp("2024-01-01")], "value": [1.0]}))
        with pytest.raises(ValueError):
            sliding_window_rollup(df, ("g",), 7000, 3600)


class TestRollingStats:
    def test_exact_crafted_window(self, spark):
        from holcstore_spark.operators.resample import rolling_stats

        vals = [1.0, 2.0, 3.0, 4.0]
        df = spark.createDataFrame(pd.DataFrame({
            "k": ["a"] * 4,
            "ts": pd.date_range("2024-01-01", periods=4, freq="h"),
            "value": vals,
        }))
        rows = sorted(rolling_stats(df, ("k",), window_rows=3).collect(),
                      key=lambda r: r["ts_us"])
        # row 3 window = [2000, 3000, 4000] (quantized)
        last = rows[-1]
        assert last["n_window"] == 3
        assert last["v_mean_q"] == 3000.0
        assert last["v_min_q"] == 2000 and last["v_max_q"] == 4000
        # n*S2 - S1^2 = 3*(4+9+16)*1e6 - (9000)^2 = 87e6 - 81e6 = 6e6
        assert last["var_num_q"] == 6_000_000
        # first row: window of itself only -> zero variance numerator
        assert rows[0]["n_window"] == 1 and rows[0]["var_num_q"] == 0

    def test_partitions_isolated_per_key(self, spark):
        from holcstore_spark.operators.resample import rolling_stats

        df = spark.createDataFrame(pd.DataFrame({
            "k": ["a", "b"],
            "ts": [pd.Timestamp("2024-01-01")] * 2,
            "value": [1.0, 100.0],
        }))
        rows = {r["k"]: r for r in rolling_stats(df, ("k",), 5).collect()}
        assert rows["a"]["n_window"] == 1 and rows["b"]["n_window"] == 1
        assert rows["b"]["v_mean_q"] == 100000.0


class TestSeasonalProfile:
    def test_baseline_and_residual_exact(self, spark):
        from holcstore_spark.operators.resample import seasonal_profile

        # two Mondays at 05:00 with values 10 and 20 share a slot:
        # baseline 15000 (quantized), residuals -5000/+5000
        ts = [pd.Timestamp("2024-01-01 05:00"), pd.Timestamp("2024-01-08 05:00"),
              pd.Timestamp("2024-01-06 05:00")]   # Saturday -> other slot
        df = spark.createDataFrame(pd.DataFrame({
            "k": ["a"] * 3, "ts": ts, "value": [10.0, 20.0, 7.0]}))
        rows = {pd.Timestamp(r["ts_us"], unit="us"): r
                for r in seasonal_profile(df, ("k",)).collect()}
        mon1 = rows[ts[0]]
        assert (mon1["hod"], mon1["is_weekend"]) == (5, 0)
        assert mon1["n_slot"] == 2 and mon1["baseline_q"] == 15000.0
        assert mon1["resid_q"] == -5000.0
        sat = rows[ts[2]]
        assert sat["is_weekend"] == 1 and sat["resid_q"] == 0.0

    def test_epoch_weekday_formula(self, spark):
        from holcstore_spark.operators.resample import seasonal_profile

        # known dates: 2024-01-06 Saturday and 2024-01-07 Sunday are
        # weekend; 2024-01-05 Friday is not
        ts = [pd.Timestamp("2024-01-05 12:00"), pd.Timestamp("2024-01-06 12:00"),
              pd.Timestamp("2024-01-07 12:00")]
        df = spark.createDataFrame(pd.DataFrame({
            "k": ["a"] * 3, "ts": ts, "value": [1.0] * 3}))
        rows = sorted(seasonal_profile(df, ("k",)).collect(),
                      key=lambda r: r["ts_us"])
        assert [r["is_weekend"] for r in rows] == [0, 1, 1]
