"""Ingestion workloads: exercise the URI -> reader path end-to-end with
an embedded database, oracle-checked against the same source table.

(The JDBC family is covered by option-construction tests in
tests/test_sources.py — no live warehouse in the container; sqlite is
the embedded source that runs for real, mirroring ingestr's
sqlite:// support.)
"""

from __future__ import annotations

import os
import sqlite3
import tempfile

from pyspark.sql import DataFrame, SparkSession

from bruin_spark.sources.ingest import read_source

_STAGED: dict[str, str] = {}


def _sqlite_db(spark: SparkSession, sf_dir: str) -> str:
    """Stage the region dimension into a throwaway sqlite file once per
    sf_dir (5 rows — a driver-side copy of a broadcast-sized dim)."""
    if sf_dir not in _STAGED:
        from bruin_spark.session import read_parquet

        d = tempfile.mkdtemp(prefix="bruin_sqlite_src_")
        db = os.path.join(d, "src.db")
        pdf = read_parquet(spark, os.path.join(sf_dir, "region.parquet")).toPandas()
        con = sqlite3.connect(db)
        try:
            pdf.to_sql("region", con, index=False)
        finally:
            con.close()
        _STAGED[sf_dir] = db
    return _STAGED[sf_dir]


def ingest_sqlite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region -> sqlite file -> read_source("sqlite://...") -> DataFrame;
    values must survive the roundtrip bit-exact."""
    db = _sqlite_db(spark, sf_dir)
    df = read_source(spark, f"sqlite://{db}", table="region")
    return df.select("r_regionkey", "r_name")


SQLITE_ORACLE = "SELECT r_regionkey, r_name FROM region"


_FIXTURED: dict[str, str] = {}


def _saas_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the nation dimension as a recorded stripe://invoices extract
    (BRUIN_SOURCE_FIXTURE_DIR replay layout: <dir>/<scheme>/<table>.parquet)."""
    if sf_dir not in _FIXTURED:
        from bruin_spark.session import read_parquet

        d = tempfile.mkdtemp(prefix="bruin_saas_fixture_")
        os.makedirs(os.path.join(d, "stripe"), exist_ok=True)
        read_parquet(spark, os.path.join(sf_dir, "nation.parquet")).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(d, "stripe", "invoices.parquet"))
        _FIXTURED[sf_dir] = d
    return _FIXTURED[sf_dir]


def ingest_saas_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SaaS-source fixture replay end-to-end: a stripe:// read (normally
    network-gated behind ApiSourceUnavailable) resolves to the recorded
    extract under BRUIN_SOURCE_FIXTURE_DIR; rows must match the staged
    source bit-exact (ref: pkg/ingestr/operator.go:184-437 — ingestr
    lands the same per-source-table rows)."""
    fdir = _saas_fixture_dir(spark, sf_dir)
    old = os.environ.get("BRUIN_SOURCE_FIXTURE_DIR")
    os.environ["BRUIN_SOURCE_FIXTURE_DIR"] = fdir
    try:
        df = read_source(
            spark, "stripe://?api_key=sk_test_fixture", table="invoices"
        )
    finally:
        if old is None:
            os.environ.pop("BRUIN_SOURCE_FIXTURE_DIR", None)
        else:
            os.environ["BRUIN_SOURCE_FIXTURE_DIR"] = old
    return df.select("n_nationkey", "n_name", "n_regionkey")


SAAS_ORACLE = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


_CSV_FIXTURED: dict[str, str] = {}


def _saas_csv_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the region dimension as a recorded shopify://products CSV
    extract — a second scheme AND a second on-disk shape (csv, not
    parquet) through the same replay layout."""
    if sf_dir not in _CSV_FIXTURED:
        from bruin_spark.session import read_parquet

        d = tempfile.mkdtemp(prefix="bruin_saas_csv_fixture_")
        os.makedirs(os.path.join(d, "shopify"), exist_ok=True)
        pdf = read_parquet(spark, os.path.join(sf_dir, "region.parquet")).toPandas()
        pdf[["r_regionkey", "r_name"]].to_csv(
            os.path.join(d, "shopify", "products.csv"), index=False
        )
        _CSV_FIXTURED[sf_dir] = d
    return _CSV_FIXTURED[sf_dir]


def ingest_saas_fixture_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second SaaS replay entry (different scheme + file shape than
    ingest_saas_fixture, so at least one lands in any driver correctness
    window): shopify://products resolves to a recorded CSV extract; rows
    must match the staged source (ref: pkg/ingestr/operator.go:184-437)."""
    from pyspark.sql import functions as F

    fdir = _saas_csv_fixture_dir(spark, sf_dir)
    old = os.environ.get("BRUIN_SOURCE_FIXTURE_DIR")
    os.environ["BRUIN_SOURCE_FIXTURE_DIR"] = fdir
    try:
        df = read_source(
            spark, "shopify://?api_key=shpat_fixture", table="products"
        )
    finally:
        if old is None:
            os.environ.pop("BRUIN_SOURCE_FIXTURE_DIR", None)
        else:
            os.environ["BRUIN_SOURCE_FIXTURE_DIR"] = old
    # CSV lands untyped; surface typed columns like an ingestr extract
    return df.select(
        F.col("r_regionkey").cast("bigint").alias("r_regionkey"),
        F.col("r_name").cast("string").alias("r_name"),
    )


SAAS_CSV_ORACLE = "SELECT r_regionkey, r_name FROM region"


QUERIES = {
    "ingest_sqlite_roundtrip": (ingest_sqlite_roundtrip, SQLITE_ORACLE),
    "ingest_saas_fixture": (ingest_saas_fixture, SAAS_ORACLE),
    "ingest_saas_fixture_csv": (ingest_saas_fixture_csv, SAAS_CSV_ORACLE),
}
