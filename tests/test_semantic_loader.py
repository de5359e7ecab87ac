"""YAML semantic-model loading + CLI semantic query path
(ref: semantic-engine/loader.go LoadDirFS, cmd/fetch.go semantic flags)."""

import textwrap

import pytest

from bruin_spark.cli import main as cli_main
from bruin_spark.semantic.loader import load_semantic_dir


@pytest.fixture()
def semantic_dir(tmp_path):
    d = tmp_path / "pipe"
    sd = d / "semantic"
    sd.mkdir(parents=True)
    (sd / "sales.yml").write_text(
        textwrap.dedent(
            """
            schema: v1
            name: sales
            source:
              table: sem_orders
            dimensions:
              - name: status
                type: string
              - name: order_date
                type: time
                granularities:
                  month: date_trunc('month', order_date)
            metrics:
              - name: revenue
                expression: sum(amount)
              - name: order_count
                expression: count(*)
              - name: avg_order_value
                expression: "{revenue} / {order_count}"
              - name: completed_revenue
                expression: sum(amount)
                filter: "status = 'completed'"
            segments:
              - name: completed
                filter: "status = 'completed'"
            """
        )
    )
    return d


def test_load_semantic_dir(semantic_dir):
    models = load_semantic_dir(str(semantic_dir / "semantic"))
    assert set(models) == {"sales"}
    m = models["sales"]
    assert m.table == "sem_orders"
    assert {x.name for x in m.metrics} == {
        "revenue", "order_count", "avg_order_value", "completed_revenue",
    }
    assert m.dimensions[1].granularities["month"].startswith("date_trunc")


def test_duplicate_model_names_error(tmp_path):
    sd = tmp_path / "semantic"
    sd.mkdir()
    for fn in ("a.yml", "b.yml"):
        (sd / fn).write_text("name: same\nsource:\n  table: t\n")
    with pytest.raises(ValueError, match="duplicate"):
        load_semantic_dir(str(sd))


def test_cli_semantic_query(spark, semantic_dir, capsys):
    spark.createDataFrame(
        [(1, "completed", 10), (2, "completed", 30), (3, "open", 5)],
        "order_id int, status string, amount int",
    ).createOrReplaceTempView("sem_orders")
    rc = cli_main(
        [
            "query",
            "--pipeline", str(semantic_dir),
            "--semantic-model", "sales",
            "--dimension", "status",
            "--metric", "revenue",
            "--json",
        ]
    )
    assert rc == 0
    import json

    rows = {r["status"]: r["revenue"] for r in json.loads(capsys.readouterr().out)}
    assert rows == {"completed": 40, "open": 5}


def test_cli_semantic_model_missing(semantic_dir, capsys):
    rc = cli_main(
        ["query", "--pipeline", str(semantic_dir), "--semantic-model", "nope"]
    )
    assert rc == 2
