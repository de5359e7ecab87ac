"""Quality-check tests against the FIXTURES.md §C check_probe table."""

import pytest

from bruin_spark.checks import CheckError, run_asset_checks
from bruin_spark.model.pipeline import Asset


DIRTY = """
SELECT * FROM VALUES
  (1, 5, 1, 50.0, 'new', 'a@b.com'),
  (2, 0, -1, 0.0, 'open', 'bad-email'),
  (2, -5, 0, 100.0, 'closed', 'c@d.org'),
  (NULL, 3, 2, 120.0, 'bogus', 'e@f.io')
AS t(id, qty, delta, score, status, email)
"""

ASSET = {
    "name": "check_probe",
    "columns": [
        {"name": "id", "type": "int", "checks": ["not_null", "unique"]},
        {"name": "qty", "type": "int", "checks": ["positive"]},
        {"name": "delta", "type": "int", "checks": ["non_negative"]},
        {
            "name": "score",
            "type": "double",
            "checks": [{"name": "min", "value": 0.0}, {"name": "max", "value": 100.0}],
        },
        {
            "name": "status",
            "type": "string",
            "checks": [{"name": "accepted_values", "value": ["new", "open", "closed"]}],
        },
        {"name": "email", "type": "string", "checks": [{"name": "pattern", "value": "^[^@]+@[^@]+$"}]},
    ],
}


def test_dirty_violation_counts(spark):
    df = spark.sql(DIRTY)
    asset = Asset.from_dict(ASSET)
    results = run_asset_checks(spark, asset, df=df, raise_on_failure=False)
    by = {(r.column, r.check): r.actual for r in results}
    assert by[("id", "not_null")] == 1
    assert by[("id", "unique")] == 1  # count(id)=3, distinct=2
    assert by[("qty", "positive")] == 2  # 0 and -5
    assert by[("delta", "non_negative")] == 1
    assert by[("score", "max")] == 1  # 120
    assert by[("score", "min")] == 0
    assert by[("status", "accepted_values")] == 1
    assert by[("email", "pattern")] == 1


def test_clean_passes_and_blocking_raises(spark):
    clean = spark.sql(
        "SELECT * FROM VALUES (1, 1, 0, 50.0, 'new', 'a@b.com') AS t(id, qty, delta, score, status, email)"
    )
    asset = Asset.from_dict(ASSET)
    results = run_asset_checks(spark, asset, df=clean)
    assert all(r.passed for r in results)

    dirty = spark.sql(DIRTY)
    with pytest.raises(CheckError) as exc:
        run_asset_checks(spark, asset, df=dirty)
    assert "not_null" in str(exc.value)


def test_custom_checks(spark):
    spark.sql(DIRTY).createOrReplaceTempView("probe_v")
    asset = Asset.from_dict(
        {
            "name": "probe_v",
            "custom_checks": [
                {"name": "row_count", "query": "SELECT count(*) FROM probe_v", "value": 4},
                {"name": "dup_rows", "count": 1, "query": "SELECT id FROM probe_v GROUP BY id HAVING count(*) > 1"},
            ],
        }
    )
    results = run_asset_checks(spark, asset, df=spark.table("probe_v"))
    assert all(r.passed for r in results)


def test_non_blocking_check_does_not_raise(spark):
    df = spark.sql("SELECT * FROM VALUES (CAST(NULL AS INT)) AS t(id)")
    asset = Asset.from_dict(
        {
            "name": "nb",
            "columns": [{"name": "id", "type": "int", "checks": [{"name": "not_null", "blocking": False}]}],
        }
    )
    results = run_asset_checks(spark, asset, df=df)
    assert not results[0].passed and not results[0].blocking
