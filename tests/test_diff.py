"""Data-diff tests: one-pass profile, schema diff, tolerance compare."""

from bruin_spark.diff import diff_tables, profile, profile_long, schema_diff


def test_profile_one_pass_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", True, 1.5), (2, "", False, 2.5), (None, None, None, None)],
        "id int, s string, b boolean, x double",
    )
    stats = {c.column: c for c in profile(df)}
    assert stats["id"].stats["count"] == 2
    assert stats["id"].stats["null_count"] == 1
    assert stats["id"].stats["min"] == 1.0 and stats["id"].stats["max"] == 2.0
    assert stats["s"].stats["empty_count"] == 1
    assert stats["s"].stats["distinct_count"] == 2
    assert stats["b"].stats["true_count"] == 1
    assert stats["b"].stats["false_count"] == 1
    assert stats["x"].stats["sum"] == 4.0


def test_profile_long_shape(spark):
    df = spark.createDataFrame([(1,)], "v int")
    out = profile_long(df)
    assert out.columns == ["column_name", "stat", "value"]
    assert out.count() == 7  # count, null_count + 5 numeric stats


def test_schema_diff(spark):
    a = spark.createDataFrame([(1, "x")], "id int, s string")
    b = spark.createDataFrame([(1, 2.0)], "id int, x double")
    only_a, only_b, mismatch = schema_diff(a, b)
    assert only_a == ["s"] and only_b == ["x"] and mismatch == []


def test_diff_tables_tolerance(spark):
    a = spark.createDataFrame([(1, 100.0), (2, 200.0)], "id int, v double")
    b = spark.createDataFrame([(1, 100.0), (2, 200.02)], "id int, v double")
    strict = diff_tables(a, b, tolerance=0.0)
    assert not strict.matched
    loose = diff_tables(a, b, tolerance=0.01)
    assert loose.matched


def test_diff_tables_identical(spark):
    a = spark.createDataFrame([(1, "x", 1.0)], "id int, s string, v double")
    assert diff_tables(a, a).matched
