"""Tests for the SQL unit-test framework (fixture injection, compare)."""

from bruin_spark.model.pipeline import Asset
from bruin_spark.unittests import build_test_query, run_unit_tests
from bruin_spark.unittests.runner import compare_rows


def test_build_query_injects_fixture():
    q = build_test_query(
        "SELECT id, amount * 2 AS dbl FROM payments",
        {"inputs": {"payments": {"columns": ["id", "amount"], "rows": [[1, 5.0]]}}},
    )
    assert q.startswith("WITH payments AS (SELECT 1 AS id, 5.0 AS amount)")


def test_build_query_renames_qualified_upstreams():
    q = build_test_query(
        "SELECT * FROM fin.payments",
        {"inputs": {"fin.payments": {"columns": ["id"], "rows": [[1]]}}},
    )
    assert "FROM fin__payments" in q and "WITH fin__payments AS" in q


def test_build_query_freezes_time():
    q = build_test_query(
        "SELECT CURRENT_TIMESTAMP AS t",
        {"execution_time": "2024-03-01 12:00:00"},
    )
    assert "CAST('2024-03-01 12:00:00' AS TIMESTAMP)" in q


def test_compare_modes():
    assert compare_rows([[1], [2]], [[2], [1]], "exact", "any") == ""
    assert compare_rows([[1], [2]], [[2], [1]], "exact", "strict") != ""
    assert compare_rows([[1], [2], [3]], [[1], [3]], "subset", "strict") == ""
    assert compare_rows([[1], [2], [3]], [[3], [1]], "subset", "strict") != ""
    assert compare_rows([[1], [2]], [[1]], "exact", "any") != ""  # extra row
    assert compare_rows([[1.0000000001]], [[1.0]], "exact", "any") == ""  # tolerance


def test_run_unit_tests_end_to_end(spark):
    asset = Asset(
        name="totals",
        type="spark.sql",
        query="SELECT user_id, SUM(amount) AS total FROM payments GROUP BY user_id",
        unit_tests=[
            {
                "name": "sums_per_user",
                "inputs": {
                    "payments": {
                        "columns": ["user_id", "amount"],
                        "types": ["bigint", "double"],
                        "rows": [[1, 10.0], [1, 5.0], [2, 7.0]],
                    }
                },
                "expected": {
                    "columns": ["user_id", "total"],
                    "rows": [[1, 15.0], [2, 7.0]],
                },
            },
            {
                "name": "count_only",
                "inputs": {
                    "payments": {
                        "columns": ["user_id", "amount"],
                        "types": ["bigint", "double"],
                        "rows": [[1, 1.0], [2, 2.0], [3, 3.0]],
                    }
                },
                "expected_count": 3,
            },
        ],
    )
    results = run_unit_tests(spark, asset)
    assert [(r.test, r.passed) for r in results] == [
        ("sums_per_user", True),
        ("count_only", True),
    ]


def test_run_unit_tests_failure_reports(spark):
    asset = Asset(
        name="bad",
        type="spark.sql",
        query="SELECT id FROM src",
        unit_tests=[
            {
                "name": "wrong_expectation",
                "inputs": {"src": {"columns": ["id"], "types": ["bigint"], "rows": [[1]]}},
                "expected": {"columns": ["id"], "rows": [[99]]},
            }
        ],
    )
    res = run_unit_tests(spark, asset)[0]
    assert not res.passed and "not found" in res.message


def test_cte_assertion(spark):
    asset = Asset(
        name="cte_test",
        type="spark.sql",
        query=(
            "WITH staged AS (SELECT id * 2 AS id2 FROM src) "
            "SELECT SUM(id2) AS s FROM staged"
        ),
        unit_tests=[
            {
                "name": "staged_doubles",
                "cte": "staged",
                "inputs": {"src": {"columns": ["id"], "types": ["bigint"], "rows": [[1], [2]]}},
                "expected": {"columns": ["id2"], "rows": [[2], [4]]},
            }
        ],
    )
    res = run_unit_tests(spark, asset)[0]
    assert res.passed, res.message


def test_unit_test_cli_command(spark, tmp_path, capsys):
    """`bruin unit-test <pipeline>`: runs declared tests, exit 0/1
    (ref cmd/unittest.go)."""
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_unit_test

    d = tmp_path / "utpipe"
    (d / "assets").mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: utpipe\n")
    (d / "assets" / "totals.sql").write_text(
        "/* @bruin\nname: totals\ntype: spark.sql\nunit_tests:\n"
        "  - name: sums_per_user\n"
        "    inputs:\n"
        "      raw_events:\n"
        "        columns: [user_id, amount]\n"
        "        types: [bigint, double]\n"
        "        rows: [[1, 10.0], [1, 5.0], [2, 2.0]]\n"
        "    expected:\n"
        "      columns: [user_id, total]\n"
        "      rows: [[1, 15.0], [2, 2.0]]\n"
        "  - name: failing_expectation\n"
        "    inputs:\n"
        "      raw_events:\n"
        "        columns: [user_id, amount]\n"
        "        types: [bigint, double]\n"
        "        rows: [[1, 10.0]]\n"
        "    expected_count: 99\n"
        "@bruin */\n\n"
        "SELECT user_id, SUM(amount) AS total FROM raw_events GROUP BY user_id\n"
    )
    args = SimpleNamespace(pipeline=str(d), asset=None, start=None, end=None)
    rc = cmd_unit_test(args)
    out = capsys.readouterr().out
    assert rc == 1  # one failing test
    assert "ok   totals::sums_per_user" in out
    assert "FAIL totals::failing_expectation" in out
    # asset filter + all-green exit
    args = SimpleNamespace(pipeline=str(d), asset="nope", start=None, end=None)
    assert cmd_unit_test(args) == 2
