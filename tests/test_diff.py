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


def test_diff_rows_classification(spark):
    from bruin_spark.diff import diff_rows

    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0), (None, "n", 1.0)],
        "id int, name string, v double",
    )
    b = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 99.0), (4, "w", 40.0), (None, "n", 2.0)],
        "id int, name string, v double",
    )
    got = {(r["id"], r["change_type"]) for r in diff_rows(a, b, ["id"]).collect()}
    # 1 unchanged (absent); 2 changed; 3 removed; 4 added; NULL pk pairs
    # via eqNullSafe and counts as changed (v 1.0 -> 2.0)
    assert got == {(2, "changed"), (3, "removed"), (4, "added"), (None, "changed")}


def test_diff_rows_single_shuffle(spark):
    from bruin_spark.diff import diff_rows

    a = spark.range(100).selectExpr("id", "id * 2 AS v")
    b = spark.range(100).selectExpr("id", "id * 3 AS v")
    plan = diff_rows(a, b, ["id"])._jdf.queryExecution().executedPlan().toString()
    # one full-outer SMJ: exactly two exchanges (one per side), none after
    assert plan.count("SortMergeJoin") == 1


def test_generate_alter_statements(spark):
    from bruin_spark.diff import generate_alter_statements

    a = spark.createDataFrame([], "id int, old_col string, price float")
    b = spark.createDataFrame([], "id int, new_col string, price double")
    stmts = generate_alter_statements(a, b, "t")
    assert stmts[0] == "ALTER TABLE t ADD COLUMNS (new_col string)"
    assert "ALTER TABLE t DROP COLUMN old_col" in stmts
    assert any("ALTER COLUMN price TYPE double" in s for s in stmts)

    rev = generate_alter_statements(a, b, "t", reverse=True)
    assert rev[0] == "ALTER TABLE t ADD COLUMNS (old_col string)"


def test_top_values_semantics(spark):
    from bruin_spark.diff import top_values

    df = spark.createDataFrame(
        [
            (1, "b", "x"), (2, "b", "x"), (3, "b", None),
            (4, "a", "y"), (5, "a", "y"), (6, "c", ""),
            (7, "c", ""), (8, "c", "z"),
        ],
        "id int, s string, t string",
    )
    rows = top_values(df, n=2).collect()
    got = {
        (r["column_name"], r["rank"]): (r["value"], r["cnt"]) for r in rows
    }
    # s: b×3 and c×3 tie at 3 -> value ASC breaks the tie; numeric id
    # column is not profiled at all
    assert got[("s", 1)] == ("b", 3)
    assert got[("s", 2)] == ("c", 3)
    # t: NULL excluded, empty string counts like any value
    assert got[("t", 1)] == ("", 2)
    assert got[("t", 2)] == ("x", 2)
    assert {r["column_name"] for r in rows} == {"s", "t"}


def test_top_values_take_ordered_plan(spark):
    """The per-column top-k must plan as TakeOrdered (per-partition
    local top-k, driver merge) — a global Sort would shuffle the whole
    value domain to sort rows the limit then discards."""
    from bruin_spark.diff import top_values

    df = spark.createDataFrame([(i, f"v{i % 7}") for i in range(100)], "id int, s string")
    plan = top_values(df, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_profile_approx_matches_exact_within_rsd(spark):
    """approx=True estimates distinct counts via HyperLogLog++ (default
    rsd 5%); every other stat must be bit-identical to exact mode, and
    the approx plan must be Expand-free (the exact multi-distinct agg
    plans an Expand that multiplies each scanned row per distinct agg)."""
    df = spark.createDataFrame(
        [(i, f"s{i % 37}", f"t{i % 11}") for i in range(500)],
        "id int, s string, t string",
    )
    exact = {c.column: c.stats for c in profile(df)}
    approx = {c.column: c.stats for c in profile(df, approx=True)}
    for col, stats in exact.items():
        for stat, ve in stats.items():
            va = approx[col][stat]
            if stat in ("distinct_count", "unique_count"):
                assert abs(va - ve) <= max(0.1 * ve, 2), (col, stat, ve, va)
            else:
                assert va == ve, (col, stat, ve, va)


def test_profile_approx_plan_is_expand_free(spark):
    import bruin_spark.diff.diff as D
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame(
        [(1, "a", "b")], "id int, s string, t string"
    )

    def plan(approx):
        exprs = []
        for i, (name, dtype) in enumerate(df.dtypes):
            cat = D._category(dtype)
            exprs += [
                e.alias(a)
                for a, e in D._agg_exprs(name, cat, f"c{i}_", approx).items()
            ]
        return df.agg(*exprs)._jdf.queryExecution().executedPlan().toString()

    assert "Expand" in plan(False)  # the documented exact-mode cost
    assert "Expand" not in plan(True)


def test_top_values_no_string_columns(spark):
    from bruin_spark.diff import top_values

    df = spark.createDataFrame([(1, 2.0)], "id int, v double")
    out = top_values(df, n=3)
    assert out.columns == ["column_name", "value", "cnt", "rank"]
    assert out.count() == 0


def test_diff_tables_approx_flag_identical_tables_match(spark):
    df = spark.range(500).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS s", "id * 1.5 AS x"
    )
    res = diff_tables(df, df, approx=True)
    assert res.matched and not res.stat_diffs


def test_data_diff_cli_approx_flag(spark, tmp_path, capsys):
    """`bruin data-diff --approx` end-to-end: the CLI threads the flag
    into the Expand-free profile and identical parquet inputs MATCH."""
    from bruin_spark.cli import main

    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    df = spark.range(200).selectExpr("id", "CAST(id % 5 AS STRING) AS s")
    df.write.parquet(p1)
    df.write.parquet(p2)
    rc = main(["data-diff", p1, p2, "--approx"])
    assert rc == 0
    assert "MATCH" in capsys.readouterr().out
