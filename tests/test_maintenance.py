"""Small-file compaction + statistics maintenance (mat/maintenance.py)."""

from pyspark.sql import functions as F

from bruin_spark.mat.maintenance import (
    analyze_table,
    compact_table,
    table_file_stats,
)


def _fragmented_table(spark, name, n_files=24, rows=2400, partitioned=False):
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    df = spark.range(rows).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("grp"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    w = df.repartition(n_files).write.format("parquet")
    if partitioned:
        w = w.partitionBy("grp")
    w.saveAsTable(name)


def test_compact_unpartitioned_reduces_files_preserves_rows(spark):
    _fragmented_table(spark, "opt_t1")
    before = table_file_stats(spark, "opt_t1")
    assert before["n_files"] >= 20
    checksum = spark.table("opt_t1").agg(
        F.count("*").alias("n"), F.sum(F.crc32("payload")).alias("ck")
    ).collect()[0]
    rep = compact_table(spark, "opt_t1", target_file_mb=128)
    assert rep["compacted"] is True
    assert rep["after"]["n_files"] < before["n_files"]
    assert rep["after"]["n_files"] <= rep["target_files"] + 1
    after = spark.table("opt_t1").agg(
        F.count("*").alias("n"), F.sum(F.crc32("payload")).alias("ck")
    ).collect()[0]
    assert (after["n"], after["ck"]) == (checksum["n"], checksum["ck"])
    # no stage/backup leftovers
    names = [t.name for t in spark.catalog.listTables()]
    assert not any("__opt_" in n for n in names)
    spark.sql("DROP TABLE opt_t1")


def test_compact_partitioned_preserves_partitioning(spark):
    _fragmented_table(spark, "opt_t2", partitioned=True)
    rep = compact_table(spark, "opt_t2", target_file_mb=128)
    assert rep["compacted"] is True
    part_cols = [c.name for c in spark.catalog.listColumns("opt_t2") if c.isPartition]
    assert part_cols == ["grp"]
    counts = {
        r["grp"]: r["n"]
        for r in spark.table("opt_t2").groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {0: 800, 1: 800, 2: 800}
    spark.sql("DROP TABLE opt_t2")


def test_compact_skips_when_not_worth_it(spark):
    spark.sql("DROP TABLE IF EXISTS opt_t3")
    spark.range(10).coalesce(1).write.format("parquet").saveAsTable("opt_t3")
    rep = compact_table(spark, "opt_t3")
    assert rep["compacted"] is False
    assert "after" not in rep
    spark.sql("DROP TABLE opt_t3")


def test_compact_dry_run_changes_nothing(spark):
    _fragmented_table(spark, "opt_t4")
    before = table_file_stats(spark, "opt_t4")
    rep = compact_table(spark, "opt_t4", dry_run=True)
    assert rep["compacted"] == "dry_run"
    assert table_file_stats(spark, "opt_t4")["n_files"] == before["n_files"]
    spark.sql("DROP TABLE opt_t4")


def test_recovery_sweep_restores_backup(spark):
    """A crash between the two renames leaves only the backup; the next
    compaction must restore the target before doing anything else."""
    _fragmented_table(spark, "opt_t5", n_files=6, rows=60)
    spark.sql("ALTER TABLE opt_t5 RENAME TO opt_t5__opt_backup_deadbeef")
    rep = compact_table(spark, "opt_t5")  # sweep restores, then evaluates
    assert spark.catalog.tableExists("opt_t5")
    assert spark.table("opt_t5").count() == 60
    assert not any(
        "__opt_" in t.name for t in spark.catalog.listTables()
    ), rep
    spark.sql("DROP TABLE opt_t5")


def test_analyze_table_records_stats(spark):
    _fragmented_table(spark, "opt_t6", n_files=2, rows=100)
    out = analyze_table(spark, "opt_t6", columns=["id"])
    assert "100 rows" in out["statistics"]
    spark.sql("DROP TABLE opt_t6")


def test_sweep_orphans_restores_cdc_backup_and_drops_stages(spark):
    """clean --sinks path: a __cdc_backup_ whose base table is missing is
    the only copy of the data — the sweep must RESTORE it, not drop it;
    orphan stages are dropped."""
    from bruin_spark.mat.maintenance import sweep_orphans

    for t in ("swp_t", "swp_t__cdc_backup_aa11", "swp_t__cdc_stage_bb22", "swp_u__opt_backup_cc33"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.range(7).write.saveAsTable("swp_t__cdc_backup_aa11")  # crash left only the backup
    spark.range(1).write.saveAsTable("swp_t__cdc_stage_bb22")
    spark.range(3).write.saveAsTable("swp_u__opt_backup_cc33")
    spark.range(9).write.saveAsTable("swp_u")  # live target: its backup is a leftover

    actions = sweep_orphans(spark)
    assert "restored:swp_t<-swp_t__cdc_backup_aa11" in actions
    assert spark.table("swp_t").count() == 7
    assert spark.table("swp_u").count() == 9  # leftover backup drop didn't touch it
    names = [t.name for t in spark.catalog.listTables()]
    assert not any("__cdc_" in n or "__opt_" in n for n in names)
    spark.sql("DROP TABLE swp_t")
    spark.sql("DROP TABLE swp_u")


def test_zorder_compaction_tightens_file_stats(spark):
    """compact --zorder: after the clustered rewrite, each parquet file
    covers a tight range of BOTH clustered columns (data-skipping
    evidence), and the data itself is unchanged."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from bruin_spark.mat.maintenance import compact_table

    spark.sql("DROP TABLE IF EXISTS opt_z")
    n = 8000
    # two correlated-free dimensions, written in random-ish order
    df = spark.range(n).select(
        F.col("id"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10) % 1000)
        .cast("long")
        .alias("x"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 7, 6), 16, 10) % 1000)
        .cast("long")
        .alias("y"),
    )
    df.repartition(8).write.format("parquet").saveAsTable("opt_z")

    def avg_x_span(table):
        spans = []
        for f in spark.table(table).inputFiles():
            meta = pq.read_metadata(f.replace("file:", ""))
            mn = min(meta.row_group(i).column(1).statistics.min for i in range(meta.num_row_groups))
            mx = max(meta.row_group(i).column(1).statistics.max for i in range(meta.num_row_groups))
            spans.append(mx - mn)
        return sum(spans) / len(spans)

    before_span = avg_x_span("opt_z")  # random layout: ~full [0,1000) range per file
    checksum = spark.table("opt_z").agg(F.sum(F.col("x") * F.col("y"))).collect()[0][0]
    rep = compact_table(spark, "opt_z", target_file_mb=0.02, zorder_by=["x", "y"])
    assert rep["compacted"] is True and rep["zorder_by"] == ["x", "y"]
    after = spark.table("opt_z")
    assert after.count() == n
    assert after.agg(F.sum(F.col("x") * F.col("y"))).collect()[0][0] == checksum
    assert len(after.inputFiles()) > 1  # fractional target => several files
    after_span = avg_x_span("opt_z")
    assert after_span < before_span * 0.8  # files now cover tight x ranges
    spark.sql("DROP TABLE opt_z")


def test_zorder_edge_cases(spark):
    """4+ columns stay within 63 key bits; NaN/NULL rows bucket low
    instead of poisoning the key; a user column named _zval survives;
    partitioned tables keep their layout without a file-count blowup."""
    from pyspark.sql import functions as F

    from bruin_spark.mat.maintenance import compact_table, zorder_column

    # 4-column key: bits shrink to 63//4=15 per dim; all z-values >= 0
    df = spark.range(100).select(
        "id", (F.col("id") % 7).alias("a"), (F.col("id") % 11).alias("b"),
        (F.col("id") % 13).alias("c"), (F.col("id") % 17).alias("d"),
    )
    z = zorder_column(df, ["a", "b", "c", "d"]).agg(
        F.min("_zval").alias("mn"), F.max("_zval").alias("mx")
    ).collect()[0]
    assert 0 <= z["mn"] <= z["mx"] < (1 << 63)

    # NaN in one column: other column still drives the key
    dfn = spark.createDataFrame(
        [(1, float("nan"), 1.0), (2, 2.0, 100.0), (3, 3.0, 200.0)],
        "id long, x double, y double",
    )
    rows = {r["id"]: r["_zval"] for r in zorder_column(dfn, ["x", "y"]).collect()}
    assert rows[3] > rows[2] > rows[1] >= 0  # y still separates the rows

    # user column literally named _zval is preserved through the rewrite
    spark.sql("DROP TABLE IF EXISTS opt_zuser")
    spark.range(3000).select("id", (F.col("id") % 5).alias("x"), F.lit(42).alias("_zval")) \
        .repartition(6).write.format("parquet").saveAsTable("opt_zuser")
    rep = compact_table(spark, "opt_zuser", target_file_mb=1, zorder_by=["x"])
    assert rep["compacted"] is True
    assert spark.table("opt_zuser").filter(F.col("_zval") == 42).count() == 3000
    spark.sql("DROP TABLE opt_zuser")

    # partitioned table: zorder rewrite keeps partitioning and REDUCES files
    spark.sql("DROP TABLE IF EXISTS opt_zpart")
    spark.range(6000).select(
        "id", (F.col("id") % 3).cast("int").alias("grp"), (F.col("id") % 97).alias("x")
    ).repartition(10).write.format("parquet").partitionBy("grp").saveAsTable("opt_zpart")
    before = len(spark.table("opt_zpart").inputFiles())
    rep = compact_table(spark, "opt_zpart", target_file_mb=1, zorder_by=["x"])
    after = len(spark.table("opt_zpart").inputFiles())
    assert rep["compacted"] is True and after < before
    assert spark.table("opt_zpart").count() == 6000
    part_cols = [c.name for c in spark.catalog.listColumns("opt_zpart") if c.isPartition]
    assert part_cols == ["grp"]
    spark.sql("DROP TABLE opt_zpart")
