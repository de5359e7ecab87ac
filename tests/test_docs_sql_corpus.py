"""Docs-SQL corpus sweep (r6 ask #7): every fenced SQL example embedded
in the reference's documentation (RETRIEVED PUBLIC CONTENT, harvested at
test time — no code copied) runs through the parser services:
split_statements, used_tables, add_limit, rename_tables, and — for
SELECT-bearing statements — get_column_lineage.  None may raise; the
lineage resolver may report structured ``errors`` (schema-less `*`
expansion etc.) but must return.

Jinja placeholders ({{ start_date }} and {% ... %} blocks) are rendered
to literals first, the way the engine renders an asset before parsing;
warehouse-specific syntax that no Spark pipeline would feed the parser
is skip-listed BY PATTERN and counted, so new docs grow coverage by
default rather than silently skipping.
"""

import glob
import re

import pytest

from bruin_spark.parser import (
    add_limit,
    rename_tables,
    split_statements,
    used_tables,
)
from bruin_spark.parser.lineage import get_column_lineage

DOCS_GLOB = "/root/reference/docs/**/*.md"
_FENCE = re.compile(r"```(?:bruin-)?sql\s*\n(.*?)```", re.S)
_JINJA_EXPR = re.compile(r"\{\{.*?\}\}")
_JINJA_STMT = re.compile(r"\{%.*?%\}")
_BRUIN_HEADER = re.compile(r"/\*\s*@bruin.*?@bruin\s*\*/", re.S)

#: dialect-specific/extension syntax the Spark engine never feeds its
#: parser (counted, not silently dropped)
SKIP_PATTERNS = [
    r"(?i)^\s*EXPORT\s",          # duckdb EXPORT DATABASE
    r"(?i)\bMODEL\s*\(",          # BigQuery ML
    r"(?i)\bPREDICT\b",
    r"@@",                        # T-SQL variables
]


def _corpus() -> list[str]:
    stmts: list[str] = []
    for path in sorted(glob.glob(DOCS_GLOB, recursive=True)):
        try:
            txt = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for block in _FENCE.findall(txt):
            sql = _BRUIN_HEADER.sub("", block)
            sql = _JINJA_EXPR.sub("'2024-01-15'", sql)
            sql = _JINJA_STMT.sub(" ", sql)
            sql = sql.strip()
            if sql:
                stmts.append(sql)
    return stmts


CORPUS = _corpus()


def test_corpus_is_substantial():
    # the docs embed ~180 SQL examples; a collapse here means the
    # extraction regex broke, not that the docs shrank
    assert len(CORPUS) >= 150, len(CORPUS)


def test_docs_sql_through_parser_services():
    n_stmts = n_lineage = n_skipped = 0
    failures: list[str] = []
    for block in CORPUS:
        if any(re.search(p, block) for p in SKIP_PATTERNS):
            n_skipped += 1
            continue
        try:
            stmts = split_statements(block)
        except Exception as e:
            failures.append(f"split: {e}: {block[:80]!r}")
            continue
        for stmt in stmts:
            n_stmts += 1
            try:
                used_tables(stmt)
                add_limit(stmt, 100)
                rename_tables(stmt, {"my_table": "renamed.tbl"})
            except Exception as e:
                failures.append(f"{type(e).__name__}: {e}: {stmt[:80]!r}")
                continue
            if re.search(r"(?i)\bselect\b", stmt):
                try:
                    res = get_column_lineage(stmt)
                    assert isinstance(res["columns"], list)
                    n_lineage += 1
                except Exception as e:
                    failures.append(f"lineage {type(e).__name__}: {e}: {stmt[:80]!r}")
    assert not failures, failures[:10]
    # coverage floor: the sweep must actually exercise the services
    assert n_stmts >= 150, n_stmts
    assert n_lineage >= 120, n_lineage
    print(f"\ndocs corpus: {n_stmts} statements, {n_lineage} lineage-resolved, {n_skipped} dialect-skipped")
