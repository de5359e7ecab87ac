"""Seed + Python asset operator tests."""

import textwrap

from bruin_spark.model.pipeline import (
    Asset,
    Column,
    Materialization,
    MaterializationType,
    Strategy,
)
from bruin_spark.operators.assets_ops import run_python_asset, run_seed
from bruin_spark.render.jinja import RenderContext


def table_asset(name, **kw):
    return Asset(
        name=name,
        materialization=Materialization(
            type=MaterializationType.TABLE, strategy=Strategy.CREATE_REPLACE
        ),
        **kw,
    )


def test_seed_csv_with_declared_schema(spark, tmp_path):
    f = tmp_path / "people.csv"
    f.write_text("id,name,score\n1,ann,9.5\n2,bo,7.25\n")
    asset = table_asset(
        "seed_people",
        type="spark.seed",
        parameters={"path": str(f)},
        columns=[
            Column(name="id", type="bigint"),
            Column(name="name", type="string"),
            Column(name="score", type="double"),
        ],
    )
    run_seed(spark, asset)
    rows = spark.table("seed_people").orderBy("id").collect()
    assert [tuple(r) for r in rows] == [(1, "ann", 9.5), (2, "bo", 7.25)]
    assert dict(spark.table("seed_people").dtypes)["id"] == "bigint"


def test_seed_csv_infers_without_columns(spark, tmp_path):
    f = tmp_path / "x.csv"
    f.write_text("a,b\n1,x\n")
    asset = table_asset("seed_infer", type="spark.seed", parameters={"path": str(f)})
    run_seed(spark, asset)
    assert spark.table("seed_infer").count() == 1


def test_python_asset_materialize_pandas(spark):
    src = textwrap.dedent(
        """
        import os
        import pandas as pd

        def materialize():
            assert os.environ["BRUIN_THIS"] == "py_pandas"
            return pd.DataFrame({"id": [1, 2], "v": [10.0, 20.0]})
        """
    )
    asset = table_asset("py_pandas", type="python", query=src)
    run_python_asset(spark, asset, RenderContext(pipeline_name="p"))
    assert spark.table("py_pandas").count() == 2


def test_python_asset_materialize_spark_df(spark):
    src = textwrap.dedent(
        """
        def materialize():
            return spark.range(5).withColumnRenamed("id", "n")
        """
    )
    asset = table_asset("py_sdf", type="python", query=src)
    run_python_asset(spark, asset)
    assert spark.table("py_sdf").count() == 5


def test_python_asset_generator(spark):
    src = textwrap.dedent(
        """
        import pandas as pd

        def materialize():
            yield pd.DataFrame({"id": [1]})
            yield pd.DataFrame({"id": [2]})
        """
    )
    asset = table_asset("py_gen", type="python", query=src)
    run_python_asset(spark, asset)
    assert spark.table("py_gen").count() == 2


def test_python_asset_no_materialization_runs_script(spark):
    src = "result = 41 + 1"
    asset = Asset(name="py_plain", type="python", query=src)
    assert run_python_asset(spark, asset) == 42


def test_python_asset_append_strategy(spark):
    src = textwrap.dedent(
        """
        import pandas as pd

        def materialize():
            return pd.DataFrame({"id": [7]})
        """
    )
    asset = Asset(
        name="py_append",
        type="python",
        query=src,
        materialization=Materialization(
            type=MaterializationType.TABLE, strategy=Strategy.APPEND
        ),
    )
    spark.sql("DROP TABLE IF EXISTS py_append")
    run_python_asset(spark, asset)
    run_python_asset(spark, asset)
    assert spark.table("py_append").count() == 2


def test_python_asset_secrets_and_vars_env(spark, monkeypatch):
    from bruin_spark.model.pipeline import Asset
    from bruin_spark.operators.assets_ops import run_python_asset
    from bruin_spark.render import RenderContext

    monkeypatch.setenv("MY_TOKEN", "s3cr3t")
    asset = Asset(
        name="env_probe",
        type="python",
        query=(
            "import os, json\n"
            "assert os.environ['API_KEY'] == 's3cr3t'\n"
            "assert json.loads(os.environ['BRUIN_VARS']) == {'region': 'eu'}\n"
        ),
        secrets=[{"secret_key": "MY_TOKEN", "inject_as": "API_KEY"}],
    )
    from datetime import datetime

    ctx = RenderContext(
        start=datetime(2024, 1, 1), end=datetime(2024, 1, 2), variables={"region": "eu"}
    )
    run_python_asset(spark, asset, ctx)  # asserts inside the script


def test_python_asset_missing_secret_errors(spark):
    import pytest as _pytest

    from bruin_spark.model.pipeline import Asset
    from bruin_spark.operators.assets_ops import run_python_asset
    from bruin_spark.render import RenderContext

    asset = Asset(
        name="env_probe2",
        type="python",
        query="pass\n",
        secrets=[{"secret_key": "DOES_NOT_EXIST_XYZ"}],
    )
    from datetime import datetime

    ctx = RenderContext(start=datetime(2024, 1, 1), end=datetime(2024, 1, 2))
    with _pytest.raises(ValueError, match="no secret"):
        run_python_asset(spark, asset, ctx)
