"""Statistical workloads: exact-percentile parity is covered by the oracle
gate; here we pin the sketch's error bound and the plan shapes."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_hll_sketch_within_error_bound(spark):
    from bruin_spark.workloads.stats_q import stat_event_user_sketch

    rows = stat_event_user_sketch(spark, SF).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.05, f"{r.event_type}: {r.approx_users} vs {r.exact_users}"


def test_hll_sketch_partial_aggregation(spark):
    """The sketch must merge map-side (two HashAggregate/ObjectHashAggregate
    levels) — that is the point of using it at scale."""
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
