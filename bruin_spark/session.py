"""SparkSession factory tuned for both local testing and cluster scale.

The session is the engine's "connection" (the reference ships SQL text to
an external warehouse; we ship logical plans to Catalyst). Configuration
principles, chosen for a 1000-executor / 100 TB target but harmless on
local[32]:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switching replace most hand-tuning.
- Arrow on: every pandas-UDF / toPandas boundary is columnar.
- shuffle.partitions is only the *initial* number; AQE coalesces. At real
  scale set it ~2-3x total cores via BRUIN_SPARK_SHUFFLE_PARTITIONS.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("BRUIN_SPARK_SHUFFLE_PARTITIONS", "32")
DEFAULT_MASTER = os.environ.get(
    "BRUIN_SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
)


def get_spark(app_name: str = "bruin_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Safe to call repeatedly; Spark returns the active session.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # driver testdata is written with nanosecond timestamps; Spark 4
        # reads them as timestamp_ntz under this flag instead of erroring
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # with the default in-memory catalog, a stale warehouse dir from a
        # previous session would otherwise fail CREATE OR REPLACE TABLE
        # with LOCATION_ALREADY_EXISTS
        .config("spark.sql.legacy.allowNonEmptyLocationInCTAS", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("BRUIN_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master or not SparkSession.getActiveSession():
        builder = builder.master(master or DEFAULT_MASTER)
    return builder.getOrCreate()


def read_parquet(spark: SparkSession, path: str):
    """Read parquet, normalizing nanosecond-timestamp columns.

    Parquet TIMESTAMP(NANOS) columns surface as raw nano longs under
    ``spark.sql.legacy.parquet.nanosAsLong``; convert them back to
    timestamp_ntz (integer division — no float precision loss). Detection
    uses the pyarrow footer (metadata-only, no data read).
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    n_row_groups = None
    try:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        schema = pf.schema_arrow
        nano_cols = {f.name for f in schema if str(f.type) == "timestamp[ns]"}
        n_row_groups = pf.metadata.num_row_groups
        n_rows = pf.metadata.num_rows
    except Exception:
        nano_cols = set()
    for name, dtype in df.dtypes:
        if name in nano_cols and dtype == "bigint":
            df = df.withColumn(
                name, F.expr(f"timestamp_micros(`{name}` div 1000)").cast("timestamp_ntz")
            )
    # Parquet can only split at row-group boundaries: a single-row-group
    # file is ONE input partition no matter how many cores exist, so every
    # downstream map stage runs serially. Fan small inputs out to the
    # cluster's parallelism (footer-metadata check only; at real scale
    # inputs have >= cores row groups and this is a no-op).
    #
    # Round-robin deliberately, despite its internal binary-row sort
    # (sortBeforeRepartition, SPARK-23207; ~45% of the exchange's wall
    # on a full-width lineitem scan): a content-hash fan-out
    # (repartition on xxhash64(all columns)) removes the sort but its
    # hash expression REFERENCES every column, defeating column pruning
    # below the exchange — q1's lineitem ReadSchema grew from 6 to 11
    # columns and 4 of 6 representative queries got slower (interleaved
    # min-of-5 A/B, r15).  RR keys on nothing, so Catalyst prunes the
    # scan to exactly the query's columns; pruning beats the sort
    # saving, and this exchange only exists on sub-row-group LOCAL
    # inputs anyway (at scale the branch never fires).
    cores = spark.sparkContext.defaultParallelism
    if n_row_groups is not None and n_row_groups < cores and n_rows >= 1000:
        df = df.repartition(cores)
    return df


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register the driver's parquet tables as temp views.

    Views (not managed copies): the parquet scan stays pruned/pushed-down
    and no data is duplicated. ``tables`` defaults to the full star schema.
    """
    names = tables or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            read_parquet(spark, path).createOrReplaceTempView(name)
