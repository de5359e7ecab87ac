"""Statistical workloads: exact-percentile parity is covered by the oracle
gate; here we pin the sketch's error bound and the plan shapes."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_kmv_sketch_within_error_bound(spark):
    """KMV with k=64 has rsd ~ 1/sqrt(k-2) ~ 12.7%; assert a 3-sigma-ish
    bound.  (At sf0.01 each group has 150 distinct users > k, so the
    estimator path — not the exact-count fallback — is exercised.)"""
    from bruin_spark.workloads.stats_q import KMV_K, stat_event_user_sketch

    rows = stat_event_user_sketch(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_kept == KMV_K, f"{r.event_type}: estimator path not taken"
        rel_err = abs(r.est_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.40, f"{r.event_type}: {r.est_users} vs {r.exact_users}"


def test_kmv_sketch_exact_below_k(spark):
    """Fewer than k distinct ids -> the sketch IS the exact count."""
    from bruin_spark.session import read_parquet
    from bruin_spark.workloads.stats_q import kmv_sketch

    ev = read_parquet(spark, f"{SF}/events.parquet").filter(F.col("user_id") < 20)
    rows = kmv_sketch(ev, ["event_type"], "user_id", k=64).collect()
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    for r in rows:
        assert r.est_users == exact[r.event_type]


def test_kmv_theta_prefilter_matches_when_enough_survivors(spark):
    """A theta pre-filter that still leaves >= k survivors per group must
    not change the sketch (the bottom k hashes all survive the cut)."""
    from bruin_spark.session import read_parquet
    from bruin_spark.workloads.stats_q import HASH_SPACE, kmv_sketch

    ev = read_parquet(spark, f"{SF}/events.parquet")
    full = kmv_sketch(ev, ["event_type"], "user_id", k=32)
    cut = kmv_sketch(ev, ["event_type"], "user_id", k=32, theta=HASH_SPACE // 2)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, cut.collect()))


def test_kmv_sketch_partial_aggregation(spark):
    """The distinct on (group, hash) must partially dedupe map-side —
    the property that bounds the shuffle at O(distinct), and the point
    of a mergeable sketch at scale."""
    from bruin_spark.workloads.stats_q import stat_event_user_sketch

    plan = stat_event_user_sketch(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Aggregate") >= 2


def test_exact_percentile_matches_numpy(spark):
    import numpy as np

    from bruin_spark.workloads.stats_q import stat_price_quantiles
    from bruin_spark.session import read_parquet

    got = {r.o_orderstatus: r for r in stat_price_quantiles(spark, SF).collect()}
    pdf = read_parquet(spark, f"{SF}/orders.parquet").select("o_orderstatus", "o_totalprice").toPandas()
    for status, grp in pdf.groupby("o_orderstatus"):
        want = np.percentile(grp["o_totalprice"].to_numpy(), 50, method="linear")
        assert abs(got[status].median_price - round(want, 4)) < 1e-9
