"""Data-diff: schema comparison + per-column statistics with tolerance.

Re-expresses the reference's diff subsystem (cmd/datadiff.go:156-438,
pkg/diff/types.go:437-537) Spark-first: ALL columns' statistics compute
in ONE ``df.agg`` pass — one scan of the table regardless of column
count, with every aggregate codegen'd and combined map-side. The
reference issues per-column probe queries against each warehouse; at
100 TB one fused scan vs N scans is the whole ballgame.

Normalized type categories (types.go:10-22): numeric / string / boolean /
datetime / other. Stats per category:

- numeric:  count, null_count, min, max, avg, sum, stddev (sample)
- string:   count, null_count, distinct_count, min_length, max_length,
            avg_length, empty_count
- boolean:  count, null_count, true_count, false_count
- datetime: count, null_count, earliest (epoch s), latest (epoch s),
            unique_count
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _category(dtype: str) -> str:
    base = dtype.split("(")[0].lower()
    if base in _NUMERIC or base == "decimal":
        return "numeric"
    if base == "string":
        return "string"
    if base == "boolean":
        return "boolean"
    if base in ("date", "timestamp", "timestamp_ntz"):
        return "datetime"
    return "other"


def _agg_exprs(
    name: str, category: str, prefix: str, approx: bool = False
) -> dict[str, F.Column]:
    # approx=True swaps exact COUNT(DISTINCT) for approx_count_distinct
    # (HyperLogLog++): a multi-column exact-distinct agg plans an Expand
    # (one row copy per distinct aggregate — row multiplication at scan
    # width), while HLL sketches merge map-side with no Expand.  The
    # 100 TB profile mode; exact stays the oracle-parity default.
    cdist = F.approx_count_distinct if approx else F.count_distinct
    c = F.col(name)
    out: dict[str, F.Column] = {
        "count": F.count(c),
        "null_count": F.count(F.when(c.isNull(), 1)),
    }
    if category == "numeric":
        out.update(
            min=F.min(c).cast("double"),
            max=F.max(c).cast("double"),
            avg=F.avg(c).cast("double"),
            sum=F.sum(c).cast("double"),
            stddev=F.stddev_samp(c).cast("double"),
        )
    elif category == "string":
        out.update(
            distinct_count=cdist(c),
            min_length=F.min(F.length(c)),
            max_length=F.max(F.length(c)),
            avg_length=F.avg(F.length(c)).cast("double"),
            empty_count=F.count(F.when(F.length(c) == 0, 1)),
        )
    elif category == "boolean":
        out.update(
            true_count=F.count(F.when(c, 1)),
            false_count=F.count(F.when(~c, 1)),
        )
    elif category == "datetime":
        ts = c.cast("timestamp")
        out.update(
            earliest=F.min(ts).cast("double"),
            latest=F.max(ts).cast("double"),
            unique_count=cdist(c),
        )
    return {f"{prefix}{stat}": expr for stat, expr in out.items()}


@dataclass
class ColumnStat:
    column: str
    category: str
    stats: dict[str, float | int | None]


def profile(df: DataFrame, approx: bool = False) -> list[ColumnStat]:
    """Per-column statistics in one aggregation pass (one table scan).

    ``approx=True`` estimates the distinct counts with HyperLogLog++
    (rel. error ~2%) instead of exact COUNT(DISTINCT): the exact
    multi-distinct agg plans an Expand that multiplies every scanned
    row once per distinct aggregate — the scale-safe profile mode for
    wide tables (exact remains the default for oracle parity)."""
    exprs: list[F.Column] = []
    layout: list[tuple[str, str, str, str]] = []  # (col, category, stat, alias)
    for i, (name, dtype) in enumerate(df.dtypes):
        cat = _category(dtype)
        for alias, expr in _agg_exprs(name, cat, f"c{i}_", approx).items():
            exprs.append(expr.alias(alias))
            layout.append((name, cat, alias.split("_", 1)[1], alias))
    row = df.agg(*exprs).collect()[0].asDict()
    out: dict[str, ColumnStat] = {}
    for name, cat, stat, alias in layout:
        cs = out.setdefault(name, ColumnStat(column=name, category=cat, stats={}))
        cs.stats[stat] = row[alias]
    return list(out.values())


def profile_long(df: DataFrame, round_to: int = 4, approx: bool = False) -> DataFrame:
    """Profile as a (column_name, stat, value:double) DataFrame.

    Long form keeps one stable schema for any input table — the shape the
    correctness oracle compares.
    """
    spark = df.sparkSession
    rows = []
    for cs in profile(df, approx=approx):
        for stat, val in cs.stats.items():
            rows.append((cs.column, stat, float(val) if val is not None else None))
    out = spark.createDataFrame(rows, "column_name string, stat string, value double")
    # round in Spark (HALF_UP, matches DuckDB/SQL ROUND) — Python's round()
    # is banker's rounding and would disagree with a SQL oracle at ties
    return out.withColumn("value", F.round("value", round_to))


def top_values(
    df: DataFrame, n: int = 10, columns: list[str] | None = None
) -> DataFrame:
    """Top-``n`` most common values per string column, with frequencies
    — the reference's StringStatistics ``MostCommon`` / ``TopNDistinct``
    fields (pkg/diff/types.go:494-495), which its warehouse probes
    declare but `bruin data-diff` output never filled; here they are a
    first-class profile surface.

    Returns (column_name, value, cnt, rank) with rank 1..n per column,
    ordered by frequency DESC then value ASC (deterministic ties).
    NULLs are excluded (``null_count`` already covers them); empty
    strings count like any value.

    Plan (100 TB shape): per column, a map-side-combinable
    groupBy(value).count followed by orderBy+limit — Spark plans that
    as TakeOrderedAndProject: each partition keeps its local top-n and
    the driver merges ~partitions×n rows, never a full sort and never
    one hot reducer holding a column's whole domain.  Each branch's
    scan is column-pruned to the one column it profiles.  The final
    rank window runs on ≤n rows per column (post-limit), a bounded
    single-partition stage.
    """
    from pyspark.sql import Window

    cols = columns or [name for name, dt in df.dtypes if _category(dt) == "string"]
    if not cols:
        # a table with no string columns has an empty (not crashing)
        # most-common-values profile
        return df.sparkSession.createDataFrame(
            [], "column_name string, value string, cnt bigint, rank int"
        )
    parts = []
    w = Window.orderBy(F.desc("cnt"), F.asc("value"))
    for name in cols:
        top = (
            df.filter(F.col(name).isNotNull())
            .groupBy(F.col(name).alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("value"))
            .limit(int(n))
        )
        parts.append(
            top.withColumn("rank", F.row_number().over(w)).select(
                F.lit(name).alias("column_name"), "value", "cnt", "rank"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@dataclass
class DiffResult:
    schema_only_a: list[str]
    schema_only_b: list[str]
    type_mismatches: list[tuple[str, str, str]]  # (col, type_a, type_b)
    stat_diffs: list[tuple[str, str, float | None, float | None]]  # col, stat, a, b
    matched: bool


def schema_diff(a: DataFrame, b: DataFrame) -> tuple[list[str], list[str], list[tuple[str, str, str]]]:
    ta, tb = dict(a.dtypes), dict(b.dtypes)
    only_a = sorted(set(ta) - set(tb))
    only_b = sorted(set(tb) - set(ta))
    mismatch = [(c, ta[c], tb[c]) for c in sorted(set(ta) & set(tb)) if ta[c] != tb[c]]
    return only_a, only_b, mismatch


def diff_tables(
    a: DataFrame, b: DataFrame, tolerance: float = 0.0, approx: bool = False
) -> DiffResult:
    """Compare schemas + per-column stats of two tables.

    ``tolerance`` is relative (|a-b| <= tolerance * max(|a|,|b|)) for
    float stats; counts compare exactly.

    ``approx=True`` profiles with HyperLogLog++ distinct counts — the
    large-table default: the exact mode's multi-distinct aggregate
    plans an Expand (one duplicated input row per counted column),
    while the approx plan is Expand-free (one pass, constant-size
    sketches; plan-asserted in tests/test_diff.py).  Identical inputs
    produce identical sketches, so equal tables still MATCH; distinct
    counts of genuinely differing tables are estimates (±rsd), which
    is the usual CI tradeoff at 100 TB.
    """
    only_a, only_b, mismatch = schema_diff(a, b)
    pa = {c.column: c for c in profile(a, approx=approx)}
    pb = {c.column: c for c in profile(b, approx=approx)}
    diffs: list[tuple[str, str, float | None, float | None]] = []
    for col in sorted(set(pa) & set(pb)):
        sa, sb = pa[col].stats, pb[col].stats
        for stat in sorted(set(sa) & set(sb)):
            va, vb = sa[stat], sb[stat]
            if va is None and vb is None:
                continue
            if va is None or vb is None:
                diffs.append((col, stat, va, vb))
                continue
            va_f, vb_f = float(va), float(vb)
            if isinstance(va, int) and isinstance(vb, int):
                # counts compare exactly REGARDLESS of tolerance: the
                # tolerance exists for float aggregates (avg/stddev),
                # not to mask added/removed rows or null drift
                if va != vb:
                    diffs.append((col, stat, va_f, vb_f))
            else:
                bound = tolerance * max(abs(va_f), abs(vb_f))
                if abs(va_f - vb_f) > bound:
                    diffs.append((col, stat, va_f, vb_f))
    return DiffResult(
        schema_only_a=only_a,
        schema_only_b=only_b,
        type_mismatches=mismatch,
        stat_diffs=diffs,
        matched=not (only_a or only_b or mismatch or diffs),
    )


# -- row-level diff ------------------------------------------------------------


def diff_rows(
    a: DataFrame,
    b: DataFrame,
    pks: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff keyed on primary keys -> (pk..., change_type) with
    change_type in ('added', 'removed', 'changed').

    One full-outer join on the PKs (single shuffle, both sides keyed);
    'changed' uses null-safe inequality over the compared columns, so a
    NULL-vs-value difference counts as a change rather than vanishing.
    'added' means the row exists only in ``b``, 'removed' only in ``a``
    (a -> b reading direction, like the reference's source->target diff).
    Unchanged rows are filtered out BEFORE the result materializes —
    at 100 TB the output is proportional to the drift, not the table.
    """
    cols = compare_cols or [c for c in a.columns if c in set(b.columns) and c not in pks]
    la = a.alias("a").withColumn("_a_present", F.lit(True))
    lb = b.alias("b").withColumn("_b_present", F.lit(True))
    cond = None
    for k in pks:
        c = F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}"))
        cond = c if cond is None else (cond & c)
    j = la.join(lb, cond, "full_outer")
    a_present = F.col("_a_present").isNotNull()
    b_present = F.col("_b_present").isNotNull()
    changed = F.lit(False)
    for c in cols:
        changed = changed | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    change_type = (
        F.when(a_present & ~b_present, F.lit("removed"))
        .when(b_present & ~a_present, F.lit("added"))
        .when(changed, F.lit("changed"))
    )
    pk_cols = [
        F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k) for k in pks
    ]
    return (
        j.select(*pk_cols, change_type.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


# -- schema migration statements ----------------------------------------------


def generate_alter_statements(
    a: DataFrame,
    b: DataFrame,
    target_table: str,
    reverse: bool = False,
) -> list[str]:
    """ALTER TABLE statements that evolve ``target_table`` (shaped like
    ``a``) toward ``b``'s schema (ref: pkg/diff/alter.go:37-95
    GenerateAlterStatements; ``reverse`` swaps the direction).

    Spark DDL: ADD COLUMNS for missing ones, DROP COLUMN for extras,
    ALTER COLUMN TYPE for mismatches (type widening only on v2 tables —
    emitted with a comment when Spark cannot apply it in place).
    """
    if reverse:
        a, b = b, a
    only_a, only_b, mismatch = schema_diff(a, b)
    tb = dict(b.dtypes)
    stmts: list[str] = []
    adds = [f"{c} {tb[c]}" for c in only_b]
    if adds:
        stmts.append(f"ALTER TABLE {target_table} ADD COLUMNS ({', '.join(adds)})")
    for c in only_a:
        stmts.append(f"ALTER TABLE {target_table} DROP COLUMN {c}")
    for c, _ta, t_new in mismatch:
        stmts.append(
            f"ALTER TABLE {target_table} ALTER COLUMN {c} TYPE {t_new}"
            " -- in-place type change requires a v2 table (Delta/Iceberg)"
        )
    return stmts
