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
    # strict order is POSITIONAL (reference compare.go:70-80): expected
    # must be a prefix of actual, not merely an ordered subsequence
    assert compare_rows([[1], [2], [3]], [[1], [2]], "subset", "strict") == ""
    assert compare_rows([[1], [2], [3]], [[1], [3]], "subset", "strict") != ""
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


# -- the reference's compare.go test table (pkg/unittest/compare_test.go) ------


class TestCompareGoTable:
    """Port of TestCompareExpectation/TestCompareResult: the tolerance
    matrix and matching semantics the reference's comparator guarantees."""

    ONE = [{"revenue": 100}]
    TWO = [{"x": 1}, {"x": 2}]

    def test_subset_passes_int_vs_int64(self):
        assert compare_rows(self.ONE, [{"revenue": 100}]) == ""

    def test_subset_fails_shows_expected_and_actual(self):
        msg = compare_rows(self.ONE, [{"revenue": 999}])
        assert "999" in msg and "100" in msg and "actual rows" in msg

    def test_count_matches(self):
        assert compare_rows(self.ONE, [], count=1) == ""
        assert compare_rows(self.ONE, [], count=2) != ""

    def test_count_and_rows_both_enforced(self):
        assert compare_rows(self.TWO, [{"x": 1}], count=2) == ""
        msg = compare_rows(self.TWO, [{"x": 1}], count=1)
        assert "expected 1 row(s), got 2" in msg
        msg = compare_rows(self.TWO, [{"x": 99}], count=2)
        assert "expected row not found" in msg

    def test_dates_compare_by_instant_across_forms(self):
        import datetime

        actual = [{"d": "2024-01-15T00:00:00Z"}]
        assert compare_rows(actual, [{"d": "2024-01-15"}]) == ""
        assert (
            compare_rows(
                actual, [{"d": datetime.datetime(2024, 1, 15, tzinfo=datetime.timezone.utc)}]
            )
            == ""
        )
        assert compare_rows(actual, [{"d": "2024-01-16"}]) != ""
        # BigQuery T-separated zoneless datetime matches space-separated
        assert (
            compare_rows([{"ts": "2024-01-15T09:30:00"}], [{"ts": "2024-01-15 09:30:00"}])
            == ""
        )

    def test_float_tolerates_representation_noise(self):
        assert compare_rows([{"v": 0.1 + 0.2}], [{"v": 0.3}]) == ""

    def test_subset_ignores_extra_rows_exact_does_not(self):
        assert compare_rows(self.TWO, [{"x": 1}]) == ""
        assert compare_rows(self.TWO, [{"x": 1}], match="exact") != ""

    def test_ordered_strict_respects_row_order(self):
        assert compare_rows(self.TWO, [{"x": 2}, {"x": 1}], order="strict") != ""
        assert compare_rows(self.TWO, [{"x": 1}, {"x": 2}], order="strict") == ""

    def test_overlapping_partial_rows_use_maximum_matching(self):
        actual = [
            {"id": 1, "status": "paid"},
            {"id": 1, "status": "refunded"},
        ]
        # greedy binding would let {id:1} consume the paid row and fail
        assert compare_rows(actual, [{"id": 1}, {"id": 1, "status": "paid"}]) == ""
        # but two rows both needing the single paid row still fail
        assert compare_rows(actual, [{"status": "paid"}, {"status": "paid"}]) != ""

    def test_case_insensitive_columns_numeric_string_engine(self):
        # engine returns upper-cased column and numeric-as-string value
        assert (
            compare_rows(
                [["5.000000"]], [{"revenue": 5}], actual_columns=["REVENUE"]
            )
            == ""
        )

    def test_decimal_compares_numerically(self):
        import decimal

        assert (
            compare_rows(
                [[decimal.Decimal("12.48")]],
                [{"avg_unit": 12.48}],
                actual_columns=["avg_unit"],
            )
            == ""
        )

    def test_bytes_text_decoded_to_string(self):
        assert (
            compare_rows([[b"alice"]], [{"name": "alice"}], actual_columns=["name"])
            == ""
        )

    def test_unknown_match_mode_rejected(self):
        msg = compare_rows(self.ONE, [{"revenue": 100}], match="fuzzy")
        assert "unknown match mode" in msg

    def test_bool_spelling_matches_go(self):
        assert compare_rows([[True]], [{"ok": "true"}], actual_columns=["ok"]) == ""
        assert compare_rows([[False]], [{"ok": "true"}], actual_columns=["ok"]) != ""


class TestExtractSelectInBuilder:
    """The builder reduces DDL-wrapped assets to their inner SELECT and
    enforces read-only by construction (ref pkg/unittest/warehouse_test.go
    'a DDL-wrapped asset is reduced to its inner SELECT')."""

    FIXTURE = {
        "inputs": {
            "analytics.orders": {
                "columns": ["id", "amount"],
                "types": ["bigint", "double"],
                "rows": [[1, 10.0], [2, 20.0]],
            }
        }
    }

    def test_ddl_wrapped_asset_reduced_to_inner_select(self):
        q = build_test_query(
            "CREATE OR REPLACE VIEW analytics.revenue AS "
            "SELECT SUM(amount) AS revenue FROM analytics.orders",
            self.FIXTURE,
        )
        assert "CREATE" not in q.upper()
        assert "analytics__orders" in q  # fixture rename still applied

    def test_write_asset_cannot_be_unit_tested(self):
        import pytest

        with pytest.raises(ValueError, match="cannot unit test"):
            build_test_query(
                "DELETE FROM analytics.orders WHERE amount < 0", self.FIXTURE
            )
