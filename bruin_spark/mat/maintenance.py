"""Table maintenance: small-file compaction + table/column statistics.

Incremental strategies (append / merge / delete+insert / streaming
foreachBatch) fragment a table into ever more small files; at 100 TB
the file count — not the byte count — becomes the bottleneck: every
query pays listing + task-scheduling overhead per file, and tiny row
groups defeat parquet's columnar encoding. Warehouses the reference
targets handle this internally (BigQuery auto-reclusters, Delta has
OPTIMIZE, Iceberg rewrite_data_files); a Spark-parquet warehouse needs
an explicit maintenance pass, so this engine ships one.

Design:
- ``table_file_stats`` is metadata-only (driver-side Hadoop FS listing,
  no executor job) — cheap enough to run before every compaction to
  decide whether it is worth it.
- ``compact_table`` rewrites through a staged table and the same
  crash-safe rename-to-backup -> rename-stage-in -> drop-backup swap as
  the CDC applier (streaming/streaming.py), so the target always exists
  and a crash is recoverable; a recovery sweep at entry restores a
  mid-swap backup and drops orphaned stage tables.
- ``analyze_table`` wraps ``ANALYZE TABLE ... COMPUTE STATISTICS`` so
  Catalyst's CBO sees row counts / NDVs and can pick broadcast joins on
  its own at real scale.
"""

from __future__ import annotations

import math
import uuid

from pyspark.sql import SparkSession

MB = 1024 * 1024


def _qual_parts(table: str) -> tuple[str, str]:
    """(schema-or-empty, base) of a possibly qualified table name."""
    parts = table.split(".")
    return (".".join(parts[:-1]), parts[-1])


def table_file_stats(spark: SparkSession, table: str) -> dict:
    """File-level stats of a catalog table: metadata-only, no Spark job.

    Walks the driver-side Hadoop FileSystem over ``df.inputFiles()`` —
    O(n_files) on the driver, which is the same cost every query's scan
    planning already pays to list the table.
    """
    df = spark.table(table)
    files = df.inputFiles()
    hconf = spark._jsc.hadoopConfiguration()
    jvm = spark._jvm
    fs = None
    total = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        if fs is None:
            fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()
    n = len(files)
    return {
        "table": table,
        "n_files": n,
        "total_bytes": total,
        "avg_file_bytes": total // n if n else 0,
    }


def _is_partitioned(spark: SparkSession, table: str) -> bool:
    return any(c.isPartition for c in spark.catalog.listColumns(table))


def sync_partitions(spark: SparkSession, table: str) -> None:
    """Re-discover a partitioned table's per-partition locations.

    ``ALTER TABLE ... RENAME`` moves the data directory but leaves the
    catalog's per-partition locations pointing at the old path; until a
    SYNC the table reads empty, and a DROP would follow the stale
    pointers and delete files that now belong to ANOTHER table. Every
    rename/drop of a possibly-partitioned table must go through here.
    """
    if _is_partitioned(spark, table):
        spark.sql(f"MSCK REPAIR TABLE {table} SYNC PARTITIONS")


def swap_token() -> str:
    """Stage/backup name token for crash-safe swaps. The recovery sweeps
    pick the 'newest' backup as ``sorted(backups)[-1]``, so the token
    MUST sort lexicographically by creation time — a bare random hex
    would let a stale leftover backup win the restore and lose the
    newest data. Zero-padded epoch-millis prefix (fixed 13 digits until
    year 2286) + a uuid suffix for collision safety within one millis."""
    import time as _time
    import uuid as _uuid

    return f"{int(_time.time() * 1000):013d}{_uuid.uuid4().hex[:6]}"


def safe_drop(spark: SparkSession, table: str) -> None:
    """DROP that can never delete another table's files through stale
    partition locations (see ``sync_partitions``)."""
    sync_partitions(spark, table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def safe_swap(spark: SparkSession, target: str, stage: str, backup: str) -> None:
    """Crash-safe table swap: target always exists under every prefix of
    the sequence, and partitioned metadata is repaired before any drop."""
    spark.sql(f"ALTER TABLE {target} RENAME TO {backup}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {target}")
    sync_partitions(spark, target)
    safe_drop(spark, backup)


_ORPHAN_RE = None


def sweep_orphans(spark: SparkSession, database: str | None = None) -> list[str]:
    """Catalog-wide stage/backup orphan sweep for both swap families
    (``__cdc_*`` from the streaming applier, ``__opt_*`` from
    compaction). For each family: if the base table is MISSING and a
    backup exists, the newest backup IS the data — restore it; then
    safe-drop the remaining orphans. A plain DROP here would lose data
    twice over: dropping the only backup of a crashed swap, or deleting
    the live table's files through a backup's stale partition locations.
    Returns a list of ``restored:``/``dropped:`` actions.
    """
    import re

    global _ORPHAN_RE
    if _ORPHAN_RE is None:
        _ORPHAN_RE = re.compile(
            r"^(?P<base>.+)__(?P<fam>cdc|opt)_(?P<kind>stage|backup)_(?P<token>[0-9a-zA-Z]+)$"
        )
    names = [
        t.name
        for t in spark.catalog.listTables(database)
        if t.tableType != "TEMPORARY"
    ]
    nameset = set(names)
    prefix = f"{database}." if database else ""
    groups: dict = {}
    for n in names:
        m = _ORPHAN_RE.match(n)
        if m:
            groups.setdefault((m["base"], m["fam"]), []).append((m["kind"], n))
    actions: list[str] = []
    for (base, _fam), items in sorted(groups.items()):
        backups = sorted(n for k, n in items if k == "backup")
        if base not in nameset and backups:
            latest = backups[-1]
            spark.sql(f"ALTER TABLE {prefix}{latest} RENAME TO {prefix}{base}")
            sync_partitions(spark, f"{prefix}{base}")
            nameset.add(base)
            actions.append(f"restored:{base}<-{latest}")
            backups = backups[:-1]
        for n in backups + [n for k, n in items if k == "stage"]:
            safe_drop(spark, f"{prefix}{n}")
            actions.append(f"dropped:{n}")
    return actions


def _recover_orphans(spark: SparkSession, table: str) -> None:
    """Restore a mid-swap backup; drop stage/backup leftovers."""
    schema, base = _qual_parts(table)
    prefix = f"{schema}." if schema else ""
    names = [t.name for t in spark.catalog.listTables(schema or None)]
    backups = sorted(n for n in names if n.startswith(f"{base}__opt_backup_"))
    if base not in names and backups:
        spark.sql(f"ALTER TABLE {prefix}{backups[-1]} RENAME TO {table}")
        sync_partitions(spark, table)
        backups = backups[:-1]
    for n in backups:
        safe_drop(spark, f"{prefix}{n}")
    for n in names:
        if n.startswith(f"{base}__opt_stage_"):
            safe_drop(spark, f"{prefix}{n}")


Z_BITS = 16  # per-dimension resolution of the z-value (interleaved bits)


def zorder_column(df, cols: list[str], out: str = "_zval"):
    """Add a Morton/Z-order key interleaving each column's rank bucket.

    Each column is normalized to a per-dimension bucket over its
    NaN-free [min, max] range (one cheap global agg, broadcast as
    literals), and the bucket bits of all columns are interleaved so
    sorting by the key clusters rows that are close in EVERY dimension.
    After a range-repartition + within-partition sort on this key, each
    parquet file's min/max stats cover a tight hyper-rectangle — point
    and range predicates on ANY of the z-ordered columns skip most row
    groups, the same data-skipping mechanism as Delta's OPTIMIZE ZORDER.

    The per-dimension resolution shrinks with the column count so the
    interleaved key always fits 63 bits (``min(Z_BITS, 63 // n)`` —
    Java's shiftleft masks shift counts mod 64, so overflowing bit
    positions would silently wrap onto low bits and corrupt the key).
    NULL and NaN values bucket to 0 — co-located with the range minimum
    rather than silently poisoning every row's key through NaN min/max.
    """
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("zorder needs at least one column")
    n = len(cols)
    bits = min(Z_BITS, 63 // n)
    if bits == 0:
        raise ValueError(f"too many zorder columns ({n}); max 63")

    aggs = []
    for c in cols:
        d = F.col(c).cast("double")
        clean = F.when(~F.isnan(d), d)  # NULL for both null and NaN
        aggs.append(F.min(clean).alias(f"_mn_{c}"))
        aggs.append(F.max(clean).alias(f"_mx_{c}"))
    stats = df.agg(*aggs).collect()[0]

    max_bucket = (1 << bits) - 1
    bucket_cols = []
    for c in cols:
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        if mn is None or mx is None or mx == mn:
            bucket_cols.append(F.lit(0).cast("long"))
            continue
        d = F.col(c).cast("double")
        scaled = (d - F.lit(float(mn))) / F.lit(float(mx - mn))
        bucket_cols.append(
            F.when(d.isNull() | F.isnan(d), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(max_bucket),
                    F.greatest(
                        F.lit(0),
                        F.floor(scaled * F.lit(float(max_bucket + 1))).cast("long"),
                    ),
                )
            )
            .cast("long")
        )
    # interleave: output bit (b*n + i) = bit b of column i's bucket
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, bc in enumerate(bucket_cols):
            bit = F.shiftright(bc, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    return df.withColumn(out, z)


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_mb: float = 128,
    min_files_saved: int = 4,
    dry_run: bool = False,
    zorder_by: list[str] | None = None,
) -> dict:
    """Rewrite ``table`` into ~``target_file_mb``-sized files.

    Skips (report only) unless the rewrite would eliminate at least
    ``min_files_saved`` files — compaction reads and rewrites every
    byte, so it must pay for itself. Partitioned tables repartition on
    their partition columns (each task writes whole partitions, so the
    per-partition file count collapses); unpartitioned tables
    repartition to the computed file count.

    ``zorder_by`` additionally clusters the rewrite on a Morton key over
    the given columns (``zorder_column``): a z-ordered rewrite ALWAYS
    runs (it changes layout, not just file count), range-repartitioned
    so files hold contiguous z-ranges and each file's min/max stats are
    tight on every clustered column.

    Returns a report dict: before/after stats + ``compacted`` flag.
    """
    _recover_orphans(spark, table)
    before = table_file_stats(spark, table)
    target_files = max(1, math.ceil(before["total_bytes"] / (target_file_mb * MB)))
    report = {
        "before": before,
        "target_files": target_files,
        "compacted": False,
    }
    if not zorder_by and before["n_files"] - target_files < min_files_saved:
        return report
    if dry_run:
        report["compacted"] = "dry_run"
        return report

    part_cols = [
        c.name for c in spark.catalog.listColumns(table) if c.isPartition
    ]
    df = spark.table(table)
    if zorder_by:
        # uniquified key name: a user column literally named _zval must
        # survive the rewrite untouched
        zcol = f"_zval_{uuid.uuid4().hex[:8]}"
        df = zorder_column(df, zorder_by, out=zcol)
        # On a hive-partitioned table the range partitioning must lead
        # with the partition columns: each task then holds few hive
        # partitions, so partitionBy on write doesn't split every task
        # into every partition (file-count explosion) and z-clustering
        # stays contiguous WITHIN each partition.
        range_cols = [*part_cols, zcol]
        df = (
            df.repartitionByRange(target_files, *range_cols)
            .sortWithinPartitions(*range_cols)
            .drop(zcol)
        )
        report["zorder_by"] = list(zorder_by)
    elif part_cols:
        df = df.repartition(target_files, *part_cols)
    else:
        df = df.repartition(target_files)

    token = swap_token()
    stage = f"{table}__opt_stage_{token}"
    backup = f"{table}__opt_backup_{token}"
    writer = df.write.format("parquet")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.saveAsTable(stage)
    # Crash-safe swap: target always exists under every prefix of this
    # sequence; _recover_orphans undoes a partial swap on the next run.
    safe_swap(spark, table, stage, backup)
    report["after"] = table_file_stats(spark, table)
    report["compacted"] = True
    return report


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> dict:
    """Compute table (and optionally column) statistics for the CBO.

    Row counts + sizes let Catalyst auto-broadcast genuinely small
    tables; column NDV/min/max feed join reordering and selectivity
    estimates. At 100 TB this is the difference between the optimizer
    guessing and knowing.
    """
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
    described = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    stats = next(
        (r.data_type for r in described if r.col_name.strip() == "Statistics"), ""
    )
    return {"table": table, "statistics": stats, "columns": columns or []}
