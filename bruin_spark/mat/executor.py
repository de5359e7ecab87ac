"""Materialization executor: runs strategies against the Spark catalog.

Two execution paths share one semantics definition:

- **DML path** — when the table provider supports row-level ops
  (Delta / Iceberg), execute the SQL emitted by
  :mod:`bruin_spark.mat.strategies` directly. This is the 100 TB path:
  MERGE / DELETE touch only matching files, partition predicates prune.
- **Rewrite path** (default here; plain parquet has no ACID DML) —
  equivalent DataFrame programs. Incremental strategies compute the new
  table contents declaratively and swap via a staged managed table;
  when the table is partitioned **by the incremental key** we instead use
  dynamic partition overwrite (``INSERT OVERWRITE`` with
  ``partitionOverwriteMode=dynamic``) so only affected partitions are
  rewritten — the Spark analog of the reference's partition-scoped merge
  (ref: pkg/bigquery/materialization.go:137-324).

Time is injected (``now``) so SCD2 outputs are deterministic under test;
the DML SQL path uses CURRENT_TIMESTAMP() exactly like the reference.
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from bruin_spark.model.pipeline import (
    FULL_REFRESH_KEEP,
    Asset,
    MaterializationType,
    Strategy,
)
from bruin_spark.mat.strategies import (
    SCD2_VALID_UNTIL,
    MaterializationError,
    _validate_scd2,
    quote_ident,
    render_materialization,
)

_OPEN_END = datetime(9999, 12, 31)

#: serializes INSERT OVERWRITE writes: partitionOverwriteMode is a
#: session conf shared by all scheduler worker threads
_OVERWRITE_MODE_LOCK = threading.Lock()


class Materializer:
    def __init__(
        self,
        spark: SparkSession,
        full_refresh: bool = False,
        now: datetime | None = None,
        interval: tuple[str, str] | None = None,
    ):
        """``interval`` is the run's (start, end) window for time_interval
        assets, as strings in the asset's granularity format.  Passing it
        here (the scheduler does) keeps Asset objects immutable across
        runs; direct callers may instead set the legacy
        ``_interval_start``/``_interval_end`` asset parameters."""
        self.spark = spark
        self.full_refresh = full_refresh
        self.now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        self.interval = interval

    # -- public ------------------------------------------------------------

    def run(self, asset: Asset, rendered_query: str) -> None:
        """Materialize one asset from its rendered SELECT query."""
        mat = asset.materialization
        if mat.type != MaterializationType.VIEW:
            # Per-asset schema creation, so a prefixed dev environment (or
            # any fresh catalog) works without manual CREATE DATABASE
            # (ref: pkg/spark/operator.go:95 -> db.go:274
            # CreateSchemaIfNotExist).  Temp views need no schema.
            self._ensure_schema(asset.name)
        if mat.type == MaterializationType.NONE:
            for stmt in render_materialization(asset, rendered_query, self.full_refresh):
                self.spark.sql(stmt)
            return
        if mat.type == MaterializationType.VIEW:
            if "." in asset.name:
                # temp views cannot be schema-qualified; a dotted name
                # gets the reference's persistent CREATE OR REPLACE VIEW
                # (sail:58-61) in its schema
                self._ensure_schema(asset.name)
                self.spark.sql(
                    f"CREATE OR REPLACE VIEW {quote_ident(asset.name)} AS\n{rendered_query.rstrip(';')}"
                )
            else:
                self.spark.sql(
                    f"CREATE OR REPLACE TEMPORARY VIEW {quote_ident(asset.name)} AS\n{rendered_query.rstrip(';')}"
                )
            return

        strategy = mat.strategy or Strategy.CREATE_REPLACE
        if self.full_refresh and strategy not in FULL_REFRESH_KEEP:
            if strategy in (Strategy.SCD2_BY_COLUMN, Strategy.SCD2_BY_TIME):
                return self._scd2_full_refresh(asset, rendered_query, strategy)
            return self._create_replace(asset, rendered_query)

        handlers = {
            Strategy.CREATE_REPLACE: self._create_replace,
            Strategy.APPEND: self._append,
            Strategy.TRUNCATE_INSERT: self._truncate_insert,
            Strategy.DELETE_INSERT: self._delete_insert,
            Strategy.TIME_INTERVAL: self._time_interval,
            Strategy.MERGE: self._merge,
            Strategy.DDL: self._ddl,
            Strategy.SCD2_BY_COLUMN: self._scd2_by_column,
            Strategy.SCD2_BY_TIME: self._scd2_by_time,
            Strategy.DATAVAULT_HUB: self._datavault,
            Strategy.DATAVAULT_LINK: self._datavault,
            Strategy.DATAVAULT_SATELLITE: self._datavault,
        }
        handler = handlers.get(strategy)
        if handler is None:
            raise MaterializationError(f"unsupported strategy: {strategy}")
        handler(asset, rendered_query)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(quote_ident(name))

    # -- helpers -----------------------------------------------------------

    def _select(self, query: str) -> DataFrame:
        return self.spark.sql(query.rstrip().rstrip(";"))

    def _exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(name)

    def _ensure_schema(self, name: str) -> None:
        """CREATE SCHEMA IF NOT EXISTS for a 2/3-part asset name."""
        parts = name.split(".")
        if len(parts) < 2:
            return
        schema = ".".join(parts[:-1])
        self.spark.sql(f"CREATE SCHEMA IF NOT EXISTS {quote_ident(schema)}")

    def _clean_stale_location(self, name: str) -> None:
        """Remove an orphaned managed-table directory.

        The default in-memory catalog forgets tables between sessions but
        leaves their warehouse directories behind; a later CREATE then
        fails with LOCATION_ALREADY_EXISTS. Only fires when the catalog
        does NOT know the table — never deletes live table data.
        """
        if self._exists(name):
            return
        from urllib.parse import urlparse

        warehouse = urlparse(self.spark.conf.get("spark.sql.warehouse.dir", "")).path
        if not warehouse:
            return
        parts = name.lower().split(".")
        if len(parts) == 2:
            rel = f"{parts[0]}.db/{parts[1]}"
        elif len(parts) == 3:  # catalog.db.tbl — catalog is not a dir level
            rel = f"{parts[1]}.db/{parts[2]}"
        else:
            rel = parts[-1]  # default-db managed table
        path = os.path.join(warehouse, rel)
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)

    def _insert_into(
        self, name: str, df: DataFrame, overwrite: bool, dynamic: bool = False
    ) -> None:
        """insertInto is positional; align to the target's column order
        (partitioned tables store partition columns last). Matching is
        case-INSENSITIVE like Spark's own resolution — a case-mismatched
        source would otherwise skip the reorder and write columns into
        the wrong positions.

        Overwrite mode: ``partitionOverwriteMode`` only takes effect as
        a session conf for insertInto (the writer-level option is
        ignored), and the scheduler runs writes from several worker
        threads on ONE session — so every overwrite write pins the mode
        it needs under a process-wide lock. Without the lock, one
        thread's dynamic overwrite would silently turn another thread's
        truncate+insert into a partial overwrite (and vice versa)."""
        target_cols = self.spark.table(quote_ident(name)).columns
        by_lower = {c.lower(): c for c in df.columns}
        same_set = set(by_lower) == {c.lower() for c in target_cols}
        same_order = [c.lower() for c in target_cols] == [c.lower() for c in df.columns]
        if same_set and not same_order:
            df = df.select(*[by_lower[c.lower()] for c in target_cols])
        if not overwrite:
            df.write.insertInto(name, overwrite=False)
            return
        mode = "dynamic" if dynamic else "static"
        with _OVERWRITE_MODE_LOCK:
            prev = self.spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode)
            try:
                df.write.insertInto(name, overwrite=True)
            finally:
                self.spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )

    def _writer(self, asset: Asset, df: DataFrame):
        mat = asset.materialization
        # cluster_by → sort within partitions before write: file-level
        # clustering so min/max stats allow data skipping, the parquet
        # analog of Iceberg's WRITE ORDERED BY.
        cluster = [c for c in mat.cluster_by if c in df.columns]
        if cluster:
            df = df.sortWithinPartitions(*cluster)
        writer = df.write
        if mat.partition_by and mat.partition_by in df.columns:
            writer = writer.partitionBy(mat.partition_by)
        if mat.bucket_by and mat.buckets:
            # hash-bucketed + sorted layout: co-bucketed tables sort-merge
            # join with no Exchange (gated in tests/test_plans.py)
            cols = [c for c in mat.bucket_by if c in df.columns]
            if cols:
                writer = writer.bucketBy(mat.buckets, *cols).sortBy(*cols)
        return writer

    def _save_new(self, asset: Asset, df: DataFrame) -> None:
        """Create a fresh managed table (stale-location safe)."""
        self._clean_stale_location(asset.name)
        self._writer(asset, df).saveAsTable(asset.name)

    def _save_full(self, asset: Asset, df: DataFrame) -> None:
        """Full-table (over)write that is safe even when df reads the target.

        Stages into ``<name>__bruin_stage_<id>`` then swaps — never leaves a
        half-written target and avoids Spark's self-overwrite restriction.
        """
        name = asset.name
        if not self._exists(name):
            self._save_new(asset, df)
            return
        # stage lives in the TARGET's database: ALTER TABLE RENAME cannot
        # cross databases, and a cross-db stage would force the fallback
        db, _, base = name.rpartition(".")
        prefix = f"{db}." if db else ""
        stage = f"{prefix}{base}__bruin_stage_{uuid.uuid4().hex[:8]}"
        self._writer(asset, df).saveAsTable(stage)
        try:
            self.spark.sql(f"DROP TABLE IF EXISTS {quote_ident(name)}")
            self.spark.sql(f"ALTER TABLE {quote_ident(stage)} RENAME TO {quote_ident(name)}")
            # RENAME moves the data dir but leaves a partitioned table's
            # per-partition catalog locations at the old stage path
            from bruin_spark.mat.maintenance import sync_partitions

            sync_partitions(self.spark, quote_ident(name))
        except Exception:
            # catalogs without managed-table RENAME: copy (through the
            # SAME layout-preserving writer — a plain write would drop
            # partitioning/bucketing) + drop stage
            self._writer(asset, self.spark.table(quote_ident(stage))).saveAsTable(name)
            self.spark.sql(f"DROP TABLE IF EXISTS {quote_ident(stage)}")

    # -- strategies ----------------------------------------------------------

    def _create_replace(self, asset: Asset, query: str) -> None:
        self._save_full(asset, self._select(query))

    def _append(self, asset: Asset, query: str) -> None:
        df = self._select(query)
        if not self._exists(asset.name):
            self._save_new(asset, df)
        else:
            self._insert_into(asset.name, df, overwrite=False)

    def _truncate_insert(self, asset: Asset, query: str) -> None:
        df = self._select(query)
        if not self._exists(asset.name):
            self._save_new(asset, df)
        else:
            # keeps schema/layout; rewrites all partitions (TRUNCATE+INSERT)
            self._insert_into(asset.name, df, overwrite=True)

    def _ddl(self, asset: Asset, _query: str) -> None:
        self._clean_stale_location(asset.name)
        for stmt in render_materialization(asset, "", False):
            self.spark.sql(stmt)

    # .. incremental ..........................................................

    def _partition_aligned(self, asset: Asset) -> bool:
        mat = asset.materialization
        return bool(mat.partition_by) and mat.partition_by == mat.incremental_key

    def _dynamic_overwrite(self, asset: Asset, df: DataFrame) -> None:
        """Rewrite only the partitions present in the source (scale path).
        Per-write option, NOT session conf: other scheduler workers'
        concurrent overwrites keep their own semantics."""
        self._insert_into(asset.name, df, overwrite=True, dynamic=True)

    def _delete_insert(self, asset: Asset, query: str) -> None:
        mat = asset.materialization
        if not mat.incremental_key:
            raise MaterializationError("delete+insert strategy requires incremental_key")
        src = self._select(query)
        if not self._exists(asset.name):
            self._save_new(asset, src)
            return
        if self._partition_aligned(asset):
            # delete+insert keyed on the partition column ≡ dynamic
            # partition overwrite: no full-table rewrite, no shuffle.
            self._dynamic_overwrite(asset, src)
            return
        key = mat.incremental_key
        target = self.table(asset.name)
        # left_anti keeps target rows whose key is absent from the source;
        # the source side is aggregated to distinct keys (map-side combine)
        # and broadcast when small, so no full shuffle of the target.
        keys = src.select(key).distinct()
        kept = target.join(keys, on=key, how="left_anti")
        self._save_full(asset, kept.unionByName(src))

    def _time_interval(self, asset: Asset, query: str) -> None:
        mat = asset.materialization
        if not mat.incremental_key:
            raise MaterializationError("incremental_key is required for time_interval strategy")
        if mat.time_granularity not in ("date", "timestamp"):
            raise MaterializationError("time_granularity must be either 'date', or 'timestamp'")
        if self.interval is not None:
            start, end = self.interval
        else:
            start = asset.parameters.get("_interval_start")
            end = asset.parameters.get("_interval_end")
        if start is None or end is None:
            raise MaterializationError("time_interval requires the run interval in parameters")
        src = self._select(query)
        if not self._exists(asset.name):
            self._save_new(asset, src)
            return
        key = mat.incremental_key
        cast = "date" if mat.time_granularity == "date" else "timestamp"
        lo = F.lit(start).cast(cast)
        hi = F.lit(end).cast(cast)
        target = self.table(asset.name)
        kept = target.filter(~F.col(key).between(lo, hi) | F.col(key).isNull())
        self._save_full(asset, kept.unionByName(src))

    def _merge(self, asset: Asset, query: str) -> None:
        """Upsert keyed on primary keys (rewrite-path MERGE).

        Update set is limited to update_on_merge / merge_sql columns
        (ref: pkg/ansisql/materialization.go:10-21); merge_sql expressions
        reference `target.` / `source.` and are evaluated via F.expr on the
        aliased join.
        """
        if not asset.columns:
            raise MaterializationError("merge strategy requires the `columns` field to be set")
        pks = asset.primary_keys()
        if not pks:
            raise MaterializationError("merge strategy requires the `primary_key` field on at least one column")

        src = self._select(query)
        if not self._exists(asset.name):
            self._save_new(asset, src)
            return

        target = self.table(asset.name)
        cols = [c.name for c in asset.columns] or target.columns

        # MERGE cardinality: MERGE INTO errors only when multiple source
        # rows match the SAME target row; duplicate-PK source rows that
        # match no target row simply insert.  The per-PK count is a
        # window over the same keys the join shuffles on (exchange
        # reused, no second source scan); the assertion fires post-join
        # on MATCHED rows only, so unmatched duplicates fall through to
        # the insert branch exactly like real MERGE.  (Stricter-than-
        # MERGE corner: the count ignores incremental_predicate, so a
        # PK group where the predicate excludes all-but-one row from
        # matching still errors if any row matches.)
        from pyspark.sql import Window

        src = src.withColumn(
            "_bruin_pk_cnt", F.count(F.lit(1)).over(Window.partitionBy(*pks))
        )
        # constant probe column: NULL PK values in the source still count
        # as matched (eqNullSafe join), exactly like MERGE INTO
        src = src.withColumn("_s_present", F.lit(True))

        on = [F.col(f"target.{k}").eqNullSafe(F.col(f"source.{k}")) for k in pks]
        if asset.materialization.incremental_predicate:
            on.append(F.expr(asset.materialization.incremental_predicate))
        cond = on[0]
        for c in on[1:]:
            cond = cond & c

        joined = target.alias("target").join(src.alias("source"), cond, "left")
        matched = F.col("source._s_present").isNotNull()
        joined = joined.filter(
            F.assert_true(
                ~matched | (F.col("source._bruin_pk_cnt") == 1),
                F.lit("MERGE source has more than one row per primary key matching a target row"),
            ).isNull()
        )
        out_cols = []
        update_names = {c.name: c for c in asset.columns if c.update_on_merge or c.merge_sql}
        for name in cols:
            col_meta = update_names.get(name)
            if col_meta is not None:
                new_val = (
                    F.expr(col_meta.merge_sql) if col_meta.merge_sql else F.col(f"source.{name}")
                )
                out_cols.append(F.when(matched, new_val).otherwise(F.col(f"target.{name}")).alias(name))
            else:
                out_cols.append(F.col(f"target.{name}").alias(name))
        updated = joined.select(*out_cols)

        inserts = src.alias("source").join(
            target.alias("target"), cond, "left_anti"
        ).select(*[F.col(c) for c in cols])
        self._save_full(asset, updated.unionByName(inserts))

    # .. SCD2 .................................................................

    def _scd2_full_refresh(self, asset: Asset, query: str, strategy: Strategy) -> None:
        _validate_scd2(asset, strategy == Strategy.SCD2_BY_TIME)
        mat = asset.materialization
        src = self._select(query)
        if mat.incremental_key:
            valid_from = F.col(mat.incremental_key).cast("timestamp")
        else:
            valid_from = F.lit(self.now)
        df = src.select(
            valid_from.alias("_valid_from"),
            "*",
            F.lit(_OPEN_END).cast("timestamp").alias("_valid_until"),
            F.lit(True).alias("_is_current"),
        )
        self._save_full(asset, df)

    def _scd2_by_column(self, asset: Asset, query: str) -> None:
        self._scd2(asset, query, by_time=False)

    def _scd2_by_time(self, asset: Asset, query: str) -> None:
        self._scd2(asset, query, by_time=True)

    def _scd2(self, asset: Asset, query: str, by_time: bool) -> None:
        """Rewrite-path SCD2 with MERGE-equivalent semantics
        (ref: pkg/spark/materialization.go:287-436):

        - changed current rows (any non-PK column differs / newer
          incremental_key) are expired and a new version inserted
        - brand-new PKs are inserted as current
        - PKs absent from the source are expired at `now`
        - historical (non-current) rows pass through untouched
        """
        _validate_scd2(asset, by_time)
        mat = asset.materialization
        pks = asset.primary_keys()
        cols = [c.name for c in asset.columns]
        non_pk = [c.name for c in asset.columns if not c.primary_key]

        src = self._select(query)
        if not self._exists(asset.name):
            return self._scd2_full_refresh(
                asset, query, Strategy.SCD2_BY_TIME if by_time else Strategy.SCD2_BY_COLUMN
            )

        # Same cardinality guard as _merge: duplicate source PKs would
        # match one current target row twice — duplicated expired rows
        # and several _is_current versions per key, silently. Real MERGE
        # (and the reference's MERGE-based SCD2) errors; so do we.
        from pyspark.sql import Window

        dup = (
            src.withColumn(
                "_bruin_pk_cnt", F.count(F.lit(1)).over(Window.partitionBy(*pks))
            )
            .filter(F.col("_bruin_pk_cnt") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key_desc = ", ".join(f"{k}={dup[0][k]!r}" for k in pks)
            raise MaterializationError(
                f"scd2 source has multiple rows for primary key ({key_desc}); "
                "deduplicate the query (e.g. latest row per key)"
            )

        if by_time or mat.incremental_key:
            src_valid_from = F.col(f"s.{mat.incremental_key}").cast("timestamp")
        else:
            src_valid_from = F.lit(self.now)

        target = self.table(asset.name)
        current = target.filter(F.col("_is_current"))
        history = target.filter(~F.col("_is_current"))

        pk_cond = None
        for k in pks:
            c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
            pk_cond = c if pk_cond is None else (pk_cond & c)

        if by_time:
            changed = F.col("t._valid_from") < F.col(f"s.{mat.incremental_key}").cast("timestamp")
        else:
            ch = None
            for n in non_pk:
                c = ~F.col(f"t.{n}").eqNullSafe(F.col(f"s.{n}"))
                ch = c if ch is None else (ch | c)
            changed = ch if ch is not None else F.lit(False)

        # presence flags survive full-outer NULLs via a constant probe column
        t_df = current.withColumn("_t_present", F.lit(True)).alias("t")
        s_df = src.withColumn("_s_present", F.lit(True)).alias("s")
        j = t_df.join(s_df, pk_cond, "full_outer")
        t_present = F.col("_t_present").isNotNull() & F.col("_t_present")
        s_present = F.col("_s_present").isNotNull() & F.col("_s_present")

        open_end = F.lit(_OPEN_END).cast("timestamp")
        now_lit = F.lit(self.now).cast("timestamp")

        # 1) existing current rows: expired when changed or gone from source
        expire_at = src_valid_from if by_time or mat.incremental_key else now_lit
        kept_current = j.filter(t_present).select(
            *[F.col(f"t.{c}").alias(c) for c in cols],
            F.col("t._valid_from").alias("_valid_from"),
            F.when(s_present & changed, expire_at)
            .when(~s_present, now_lit)
            .otherwise(F.col("t._valid_until"))
            .alias("_valid_until"),
            F.when((s_present & changed) | (~s_present), F.lit(False))
            .otherwise(F.col("t._is_current"))
            .alias("_is_current"),
        )

        # 2) new versions: changed rows + brand-new PKs
        new_rows = j.filter(s_present & (~t_present | changed)).select(
            *[F.col(f"s.{c}").alias(c) for c in cols],
            src_valid_from.alias("_valid_from"),
            open_end.alias("_valid_until"),
            F.lit(True).alias("_is_current"),
        )

        self._save_full(asset, history.unionByName(kept_current).unionByName(new_rows))

    # .. Data Vault (insert-only: executable as SQL on parquet) ..............

    def _datavault(self, asset: Asset, query: str) -> None:
        if not self._exists(asset.name):
            self._clean_stale_location(asset.name)
            cols = ", ".join(f"{quote_ident(c.name)} {c.sql_type()}" for c in asset.columns)
            self.spark.sql(f"CREATE TABLE IF NOT EXISTS {quote_ident(asset.name)} ({cols})")
        for stmt in render_materialization(asset, query, False):
            self.spark.sql(stmt)
