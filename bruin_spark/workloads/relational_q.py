"""As-of join / range join / sessionization workloads with DuckDB oracles."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from bruin_spark.operators import relational as R
from bruin_spark.session import read_parquet

GAP_S = 1800.0
# p_retailprice spans ~[900, 920+] in the driver testdata; 5-unit bands
# give a real multi-band distribution at every scale factor
BANDS = [(900.0, 905.0), (905.0, 910.0), (910.0, 915.0), (915.0, 920.0), (920.0, 925.0)]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, "events.parquet"))


# -- as-of join: each purchase -> the user's most recent login at/before it ----


def rel_asof_purchase_login(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase")
    logins = ev.filter(F.col("event_type") == "login")
    joined = R.asof_join(purchases, logins, on="user_id", right_cols=[])
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_right").alias("login_ts"),
        F.round(
            R.epoch_seconds("ts") - R.epoch_seconds("ts_right"), 4
        ).alias("secs_since_login"),
    )


ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
       (SELECT MAX(l.ts) FROM events l
        WHERE l.user_id = p.user_id AND l.event_type = 'login' AND l.ts <= p.ts) AS login_ts,
       ROUND(EPOCH(p.ts) - EPOCH((SELECT MAX(l.ts) FROM events l
        WHERE l.user_id = p.user_id AND l.event_type = 'login' AND l.ts <= p.ts)), 4) AS secs_since_login
FROM events p
WHERE p.event_type = 'purchase'
"""


# -- range join: parts priced into static bands --------------------------------


def rel_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_parquet(spark, os.path.join(sf_dir, "part.parquet"))
    bands = spark.createDataFrame(BANDS, "lo double, hi double")
    joined = R.range_join(part, bands, "p_retailprice")
    return joined.groupBy("lo", "hi").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
    )


def _range_oracle() -> str:
    rows = ", ".join(f"({lo}, {hi})" for lo, hi in BANDS)
    return f"""
WITH bands(lo, hi) AS (VALUES {rows})
SELECT lo, hi, COUNT(*) AS n_parts, ROUND(AVG(p_retailprice), 4) AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY lo, hi
"""


# -- sessionization -------------------------------------------------------------


def rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = R.sessionize(_events(spark, sf_dir), gap_seconds=GAP_S, order_tiebreak="event_id")
    return s.select("event_id", "user_id", "ts", "session_seq")


SESSIONIZE_ORACLE = f"""
SELECT event_id, user_id, ts,
       (SUM(CASE WHEN prev_t IS NULL OR (t - prev_t) > {GAP_S} THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
FROM (
  SELECT event_id, user_id, ts, EPOCH(ts) AS t,
         LAG(EPOCH(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
  FROM events
)
"""


def rel_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.session_stats(
        _events(spark, sf_dir), gap_seconds=GAP_S, value_col="value", order_tiebreak="event_id"
    )


SESSION_STATS_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, ts, value,
         (SUM(CASE WHEN prev_t IS NULL OR (t - prev_t) > {GAP_S} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
  FROM (
    SELECT event_id, user_id, ts, value, EPOCH(ts) AS t,
           LAG(EPOCH(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
    FROM events
  )
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
FROM tagged
GROUP BY user_id, session_seq
"""


# -- ordered funnel: view -> click -> purchase, first-touch cascade ------------

FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_HORIZON_H = 48


def rel_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch ordered funnel over events: users reaching each of
    view -> click -> purchase in order, each step strictly after the
    previous step's earliest qualifying event and within 48h of the
    first view (cascaded-min semantics, deterministic)."""
    return R.funnel_counts(
        _events(spark, sf_dir), FUNNEL_STEPS, horizon_hours=FUNNEL_HORIZON_H
    )


def _funnel_oracle() -> str:
    h = FUNNEL_HORIZON_H
    s1, s2, s3 = FUNNEL_STEPS
    return f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{s1}' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = '{s2}' AND e.ts > t1.t1
    AND e.ts <= t1.t1 + INTERVAL {h} HOUR
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 USING (user_id) JOIN t1 USING (user_id)
  WHERE e.event_type = '{s3}' AND e.ts > t2.t2
    AND e.ts <= t1.t1 + INTERVAL {h} HOUR
  GROUP BY e.user_id
), c AS (
  SELECT (SELECT count(*) FROM t1) AS c1,
         (SELECT count(*) FROM t2) AS c2,
         (SELECT count(*) FROM t3) AS c3
)
SELECT 1 AS step_idx, '{s1}' AS step_name, c1::BIGINT AS users,
       CASE WHEN c1 > 0 THEN ROUND(c1::DOUBLE / c1, 4) END AS pct_of_first FROM c
UNION ALL
SELECT 2, '{s2}', c2::BIGINT,
       CASE WHEN c1 > 0 THEN ROUND(c2::DOUBLE / c1, 4) END FROM c
UNION ALL
SELECT 3, '{s3}', c3::BIGINT,
       CASE WHEN c1 > 0 THEN ROUND(c3::DOUBLE / c1, 4) END FROM c
"""


QUERIES = {
    "rel_funnel_steps": (rel_funnel_steps, _funnel_oracle()),
    "rel_asof_purchase_login": (rel_asof_purchase_login, ASOF_ORACLE),
    "rel_range_price_bands": (rel_range_price_bands, _range_oracle()),
    "rel_sessionize": (rel_sessionize, SESSIONIZE_ORACLE),
    "rel_session_stats": (rel_session_stats, SESSION_STATS_ORACLE),
}
