"""Unit tests for as-of join, range join, sessionization."""

from datetime import datetime

from pyspark.sql import functions as F

from bruin_spark.operators import relational as R


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), "p1"), (1, ts("2024-01-01T12:00:00"), "p2"),
         (2, ts("2024-01-01T09:00:00"), "p3")],
        "user_id bigint, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:30:00"), 10.0), (1, ts("2024-01-01T11:00:00"), 20.0)],
        "user_id bigint, ts timestamp, score double",
    )
    out = {
        r["name"]: (r["ts_right"], r["score_right"])
        for r in R.asof_join(left, right, on="user_id").collect()
    }
    assert out["p1"] == (ts("2024-01-01T09:30:00"), 10.0)
    assert out["p2"] == (ts("2024-01-01T11:00:00"), 20.0)
    assert out["p3"] == (None, None)  # no prior right row


def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01T10:00:00"), "x")],
                                 "k bigint, ts timestamp, name string")
    right = spark.createDataFrame([(1, ts("2024-01-01T10:00:00"), 5.0)],
                                  "k bigint, ts timestamp, v double")
    row = R.asof_join(left, right, on="k").collect()[0]
    assert row["v_right"] == 5.0


def test_range_join(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 25.0)], "id int, v double")
    bands = spark.createDataFrame([(0.0, 10.0), (10.0, 20.0)], "lo double, hi double")
    got = {r["id"]: (r["lo"], r["hi"]) for r in R.range_join(df, bands, "v").collect()}
    assert got == {1: (0.0, 10.0), 2: (10.0, 20.0)}  # 25.0 unmatched


def test_sessionize_gap(spark):
    rows = [
        (1, ts("2024-01-01T10:00:00")),
        (1, ts("2024-01-01T10:10:00")),  # same session (10 min)
        (1, ts("2024-01-01T11:30:00")),  # new session (80 min gap)
        (2, ts("2024-01-01T10:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = R.sessionize(df, gap_seconds=1800.0).orderBy("user_id", "ts").collect()
    assert [r["session_seq"] for r in out] == [1, 1, 2, 1]


def test_session_stats(spark):
    rows = [
        (1, ts("2024-01-01T10:00:00"), 1.0),
        (1, ts("2024-01-01T10:10:00"), 2.0),
        (1, ts("2024-01-01T12:00:00"), 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = R.session_stats(df, value_col="value").orderBy("session_seq").collect()
    assert len(out) == 2
    assert out[0]["n_events"] == 2 and out[0]["total_value"] == 3.0
    assert out[1]["n_events"] == 1 and out[1]["total_value"] == 4.0
