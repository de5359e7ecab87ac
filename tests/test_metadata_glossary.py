"""Metadata push, glossary inheritance, variants, tier pools."""

from bruin_spark.model.loader import apply_glossary, load_glossary, load_pipeline
from bruin_spark.model.pipeline import (
    Asset,
    Column,
    Materialization,
    MaterializationType,
    Pipeline,
    Strategy,
)
from bruin_spark.operators.metadata import push_metadata


def test_glossary_inheritance(tmp_path):
    (tmp_path / "glossary.yml").write_text(
        """
entities:
  Customer:
    attributes:
      id:
        type: bigint
        description: canonical customer id
      email:
        type: string
        description: contact email
"""
    )
    (tmp_path / "pipeline.yml").write_text("name: g\n")
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "c.asset.yml").write_text(
        """
name: customers
type: spark.sql
query: SELECT 1
columns:
  - name: id
    extends: Customer.id
  - name: email
    extends: Customer.email
    description: already set
  - name: other
"""
    )
    pipe = load_pipeline(str(tmp_path))
    cols = {c.name: c for c in pipe.asset("customers").columns}
    assert cols["id"].type == "bigint"
    assert cols["id"].description == "canonical customer id"
    assert cols["email"].description == "already set"  # declared wins
    assert cols["email"].type == "string"
    assert cols["other"].type == ""


def test_variants_parsed(tmp_path):
    (tmp_path / "pipeline.yml").write_text(
        """
name: v
variables:
  region: us
variants:
  eu:
    variables:
      region: eu
"""
    )
    pipe = load_pipeline(str(tmp_path))
    assert pipe.variables == {"region": "us"}
    assert pipe.variants["eu"]["variables"] == {"region": "eu"}


def test_push_metadata(spark):
    spark.sql("DROP TABLE IF EXISTS meta_t")
    spark.sql("CREATE TABLE meta_t AS SELECT 1 AS a, 'x' AS b")
    asset = Asset(
        name="meta_t",
        description="a documented table",
        owner="data-team",
        tags=["gold"],
        tier="critical",
        columns=[Column(name="a", description="the number"), Column(name="b")],
    )
    n = push_metadata(spark, asset)
    assert n == 3  # table comment + tblproperties + 1 column comment
    props = {
        r["key"]: r["value"]
        for r in spark.sql("SHOW TBLPROPERTIES meta_t").collect()
    }
    assert props.get("bruin.owner") == "data-team"
    assert props.get("bruin.tags") == "gold"
    detail = spark.sql("DESCRIBE TABLE meta_t").collect()
    comments = {r["col_name"]: r["comment"] for r in detail}
    assert comments.get("a") == "the number"


def test_push_metadata_missing_table_noop(spark):
    assert push_metadata(spark, Asset(name="never_made_xyz", description="d")) == 0
