"""Docs-SQL EXECUTION sweep (r8 verdict ask #6): the parse sweep in
test_docs_sql_corpus.py proves the parser services accept every fenced
docs example; this proves the single-SELECT subset actually EXECUTES on
Spark — parse-clean but execute-broken SQL was the remaining gap class.

Binding: each statement's referenced tables are rewritten to flat view
names with the engine's own ``rename_tables`` (dogfooding the service),
then bound to EMPTY typed views whose columns are discovered by an
analysis-repair loop: run ``spark.sql``, read the UNRESOLVED_COLUMN
error, add the named column (name-heuristic type) to the right view,
retry.  Empty views make execution analysis-complete but row-free, so
``collect()`` exercises the full plan without runtime data hazards.

Genuinely non-Spark dialect constructs (Snowflake IFF /
CURRENT_ORGANIZATION_NAME, MySQL-style ungrouped aggregates, DuckDB
interval arithmetic in date_sub) are skip-listed BY PATTERN and
counted; everything else must reach zero analysis errors, with an
executed-count floor so the sweep can't silently shrink.
"""

import re

import pytest

from bruin_spark.parser import rename_tables, split_statements, used_tables
from bruin_spark.parser.sqlutil import is_single_select

from test_docs_sql_corpus import _FENCE, _BRUIN_HEADER, DOCS_GLOB, SKIP_PATTERNS

#: dialect constructs Spark does not implement — these docs examples
#: target other warehouses; the Spark engine never executes them.
#: Counted, never silently dropped.
EXEC_SKIP_PATTERNS = SKIP_PATTERNS + [
    r"(?i)\bIFF\s*\(",                     # Snowflake
    r"(?i)\bCURRENT_ORGANIZATION_NAME\b",  # Snowflake
    r"(?i)\bCURRENT_ACCOUNT_NAME\b",       # Snowflake
    r"(?i)\bdate_sub\s*\(\s*current_date\s*\(\s*\)\s*,\s*INTERVAL",  # duckdb/BQ
    r"(?i)\bTABLESAMPLE\b.*\bROWS\b",      # dialect sampling
    r"SYSTEM\$",                           # Snowflake system functions
    r"\[\s*'",  # pipeline-variable LIST rendered into SQL (docs show
    #             the template's rendered *context*, not runnable SQL)
    r"(?i)\biceberg_scan\s*\(",            # duckdb table-valued scan
    r"[>=<]\s*\d{4}-\d{2}-\d{2}",          # unquoted date literals (MSSQL-ish)
    r"\)\s*:\w+",                          # Snowflake JSON path (x):field
]

#: error classes that identify OTHER-warehouse SQL the docs embed
#: (Snowflake CURRENT_ROLE, ClickHouse toDate, MSSQL DATETIME2, duckdb
#: LATERAL UNNEST): counted as `dialect`, never as failures — but
#: ceilinged, so a Spark-function regression surfacing as
#: UNRESOLVED_ROUTINE would overflow the bucket and fail the sweep.
DIALECT_ERROR_CLASSES = (
    "UNRESOLVED_ROUTINE",
    "UNSUPPORTED_DATATYPE",
    "UNRESOLVABLE_TABLE_VALUED_FUNCTION",
)

#: examples that are invalid under ANSI semantics Spark enforces
#: (MySQL-style non-grouped select items); kept as a named list so a
#: regression that ADDS members is visible in review.
ANSI_INVALID_MARKERS = [
    "MISSING_GROUP_BY",
    # the builtins doc's combined-usage example selects bare `revenue`/
    # `sessions` beside `group by 1` — illustrative, not valid ANSI; it
    # only became renderable (and thus executable) once the `bruin.`
    # namespace landed
    "MISSING_AGGREGATION",
]


def _render_block(sql: str) -> str:
    """Render a docs example the way the ENGINE renders an asset —
    through its own Jinja environment (dogfooding render_sql), so
    `{% if full_refresh %}` branches collapse correctly instead of a
    regex leaving both branches' literals adjacent.  Docs examples
    referencing variables the default context lacks fall back to a
    quote-aware placeholder substitution."""
    from bruin_spark.render import RenderContext, render_sql

    try:
        return render_sql(sql, RenderContext(variables={"env": "dev"})), False
    except Exception:
        # quoted placeholders are VALUE positions -> a date literal;
        # bare ones may be identifier positions (aliases, column
        # refs, even trailing clauses) -> a bare identifier, which
        # the repair loop then materializes as a column if referenced.
        # Stripping {% for/if %} blocks can leave structurally broken
        # SQL (a loop emitting IN-list members) — mark those FRAGILE so
        # a parse error classifies as a binding artifact, not a bug.
        fragile = "{%" in sql
        sql = re.sub(r"['\"]\{\{.*?\}\}['\"]", "'2024-01-15'", sql)
        sql = re.sub(r"\{\{.*?\}\}", "bruin_docs_var", sql)
        return re.sub(r"\{%.*?%\}", " ", sql), fragile


def _exec_corpus() -> list[tuple[str, bool]]:
    import glob

    stmts: list[tuple[str, bool]] = []
    for path in sorted(glob.glob(DOCS_GLOB, recursive=True)):
        try:
            txt = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for block in _FENCE.findall(txt):
            sql, fragile = _render_block(_BRUIN_HEADER.sub("", block))
            sql = sql.strip()
            if sql:
                stmts.append((sql, fragile))
    return stmts


def _col_type(name: str) -> str:
    n = name.lower()
    if re.search(r"(date|_at$|time|timestamp|created|updated)", n):
        return "timestamp"
    if re.search(
        r"(amount|price|revenue|total|score|rate|pct|value|num|count|qty|quantity|size|age|salary|id$)",
        n,
    ):
        return "double"
    return "string"


#: the full (possibly qualified) name inside an UNRESOLVED_COLUMN
#: message — each segment is separately backticked (`t1`.`player_id`)
_UNRESOLVED_NAME = re.compile(r"name ((?:`[^`]+`\.)*`[^`]+`)")


def _repair_target(qualifier: str, q: str, views: dict) -> str:
    """Which view does an unresolved ``alias.col`` belong to?  The view
    itself if the qualifier IS a view name; else resolve the alias via
    a FROM/JOIN scan; else fall back to the first view."""
    if qualifier:
        if qualifier in views:
            return qualifier
        m = re.search(
            rf"(?is)\b(?:from|join)\s+(\w+)\s+(?:as\s+)?{re.escape(qualifier)}\b", q
        )
        if m and m.group(1) in views:
            return m.group(1)
    return next(iter(views))


def _try_execute(spark, stmt: str, fragile: bool = False, max_repairs: int = 60):
    """(status, detail): status in executed | ansi_invalid | dialect |
    placeholder | error."""
    from pyspark.errors import AnalysisException

    tables = used_tables(stmt)
    mapping = {t: "v_" + re.sub(r"\W", "_", t) for t in tables}
    q = rename_tables(stmt, mapping) if mapping else stmt
    views: dict[str, dict[str, str]] = {v: {} for v in mapping.values()}
    last = ""
    for _ in range(max_repairs):
        for v, cs in views.items():
            fields = ", ".join(f"`{c}` {t}" for c, t in cs.items()) or "`_dummy` string"
            spark.createDataFrame([], fields).createOrReplaceTempView(v)
        try:
            spark.sql(q).collect()
            return "executed", ""
        except Exception as e:  # noqa: BLE001 — classified below
            last = str(e).strip()
            if not isinstance(e, AnalysisException):
                # runtime errors on EMPTY inputs come from literal
                # folding (e.g. a malformed date literal) — report,
                # don't crash the sweep
                return "error", last.splitlines()[0][:160]
            name = _UNRESOLVED_NAME.search(last)
            if "UNRESOLVED_COLUMN" in last and name and views:
                segs = re.findall(r"`([^`]+)`", name.group(1))
                col, qualifier = segs[-1], ".".join(segs[:-1])
                tgt = _repair_target(qualifier, q, views)
                if col in views[tgt]:
                    break  # repair loop stopped converging
                views[tgt][col] = _col_type(col)
                continue
            if any(m in last for m in ANSI_INVALID_MARKERS):
                return "ansi_invalid", last.splitlines()[0][:120]
            break
    detail = last.splitlines()[0][:160] if last else "repair loop cap"
    if any(c in last for c in DIALECT_ERROR_CLASSES):
        return "dialect", detail
    if ("bruin_docs_var" in q or fragile) and (
        "PARSE_SYNTAX_ERROR" in last or "MISSING_AGGREGATION" in last
    ):
        # the identifier placeholder stood in for a Jinja variable that
        # the docs use as an EXPRESSION or list — artifact of binding,
        # not an engine failure
        return "placeholder", detail
    return "error", detail


@pytest.mark.usefixtures("spark")
def test_docs_single_selects_execute(spark):
    corpus = _exec_corpus()
    singles: list[tuple[str, bool]] = []
    n_skipped = 0
    for block, fragile in corpus:
        if any(re.search(p, block) for p in EXEC_SKIP_PATTERNS):
            n_skipped += 1
            continue
        try:
            for stmt in split_statements(block):
                if is_single_select(stmt):
                    singles.append((stmt, fragile))
        except Exception:
            pass  # parse failures are the parse sweep's jurisdiction

    counts = {"executed": 0, "ansi_invalid": 0, "dialect": 0, "placeholder": 0}
    errors: list[tuple[str, str]] = []
    for stmt, fragile in singles:
        status, detail = _try_execute(spark, stmt, fragile)
        if status in counts:
            counts[status] += 1
        else:
            errors.append((detail, stmt[:90].replace("\n", " ")))

    assert not errors, errors[:8]
    # floors: the sweep must stay substantial; ceilings: the counted
    # escape hatches must not quietly absorb new failures
    assert counts["executed"] >= 90, (counts, len(singles))
    assert counts["ansi_invalid"] <= 3, counts
    assert counts["dialect"] <= 12, counts
    assert counts["placeholder"] <= 5, counts
    assert n_skipped <= 15, n_skipped
    print(
        f"\ndocs exec: {counts} + {n_skipped} pattern-skipped "
        f"of {len(corpus)} blocks"
    )
