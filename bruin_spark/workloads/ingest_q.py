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


QUERIES = {
    "ingest_sqlite_roundtrip": (ingest_sqlite_roundtrip, SQLITE_ORACLE),
}
