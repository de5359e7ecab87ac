"""Skew operator tests: salted results must equal unsalted results."""

from pyspark.sql import functions as F

from bruin_spark.operators.skew import salted_join, two_phase_agg


def test_salted_join_matches_plain_join(spark):
    # heavily skewed: 90% of rows share key 0
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(i, f"dim_{i}") for i in range(7)], "k bigint, label string")
    plain = big.join(small, "k").groupBy("label").count()
    salted = salted_join(big, small, "k", salts=4).groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "nomatch")], "k bigint, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, w string")
    out = salted_join(big, small, "k", salts=3, how="left").collect()
    got = {(r["k"], r["w"]) for r in out}
    assert got == {(1, "x"), (2, "y"), (99, None)}


def test_two_phase_agg_matches_direct(spark):
    df = spark.range(5000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 2).alias("v")
    )
    direct = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    two = two_phase_agg(
        df,
        ["k"],
        {"n": F.count(F.lit(1)), "s": F.sum("v"), "mx": F.max("v")},
        {"n": F.sum("n"), "s": F.sum("s"), "mx": F.max("mx")},
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, two.collect()))
