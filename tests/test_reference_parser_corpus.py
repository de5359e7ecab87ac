"""Run the REFERENCE's own sqlglot-parser test tables
(pythonsrc/parser/main_test.py: `test_cases` column-lineage and
`test_cases_non_selected_columns`) against this repo's from-scratch
lineage resolver.

The tables are harvested at test time from the read-only reference
checkout (no code is copied; the dict literals are parsed with a
restricted AST evaluator). This is the direct compatibility bar for
`parser/lineage.py`: the reference delegates to sqlglot, we re-implement
the same behaviors without it.
"""

from __future__ import annotations

import ast
import os

import pytest

from bruin_spark.parser.lineage import get_column_lineage

REF = "/root/reference/pythonsrc/parser/main_test.py"

SCHEMA = {
    "orders": {
        "id": "bigint",
        "order_number": "string",
        "customer_id": "bigint",
        "shipping_country": "string",
    },
    "customers": {
        "id": "bigint",
        "name": "string",
        "age": "bigint",
        "country": "string",
    },
}


def _safe_eval(node):
    """Literals + Column(...) calls + the SCHEMA name — nothing else."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.List):
        return [_safe_eval(x) for x in node.elts]
    if isinstance(node, ast.Dict):
        return {_safe_eval(k): _safe_eval(v) for k, v in zip(node.keys, node.values)}
    if isinstance(node, ast.Call) and getattr(node.func, "id", "") == "Column":
        args = [_safe_eval(a) for a in node.args]
        kw = {k.arg: _safe_eval(k.value) for k in node.keywords}
        return {
            "name": args[0] if args else kw.get("name"),
            "table": args[1] if len(args) > 1 else kw.get("table", ""),
        }
    if isinstance(node, ast.Name) and node.id == "SCHEMA":
        return SCHEMA
    raise ValueError(f"unexpected node in reference table: {ast.dump(node)[:80]}")


def _harvest(var: str):
    src = open(REF, encoding="utf-8").read()
    start = src.index(f"{var} = [")
    off = start + len(f"{var} = ")
    depth = 0
    for i in range(off, len(src)):
        if src[i] == "[":
            depth += 1
        elif src[i] == "]":
            depth -= 1
            if depth == 0:
                return _safe_eval(ast.parse(src[off : i + 1], mode="eval").body)
    raise ValueError(f"unterminated {var}")


def _norm_cols(cols):
    return {
        c["name"].lower(): sorted(
            {(u["table"].lower(), u["column"].lower()) for u in c["upstream"]}
        )
        for c in cols
    }


pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout not present"
)


def _lineage_cases():
    return [pytest.param(c, id=c["name"].replace(" ", "_")[:60]) for c in _harvest("test_cases")]


def _nonsel_cases():
    return [
        pytest.param(c, id=c["name"].replace(" ", "_")[:60])
        for c in _harvest("test_cases_non_selected_columns")
    ]


@pytest.mark.parametrize("case", _lineage_cases() if os.path.exists(REF) else [])
def test_reference_lineage_case(case):
    res = get_column_lineage(case["query"], schema=case["schema"])
    assert res["errors"] == [], res["errors"]
    assert _norm_cols(res["columns"]) == _norm_cols(case["expected"])
    if "expected_non_selected" in case:
        assert _norm_cols(res["non_selected_columns"]) == _norm_cols(
            case["expected_non_selected"]
        )


@pytest.mark.parametrize("case", _nonsel_cases() if os.path.exists(REF) else [])
def test_reference_non_selected_case(case):
    res = get_column_lineage(case["query"], schema=case["schema"])
    got = {
        (u["table"].lower(), u["column"].lower())
        for ns in res["non_selected_columns"]
        for u in ns["upstream"]
        if u["table"]
    }
    want = {(e["table"].lower(), e["name"].lower()) for e in case["expected"]}
    assert got == want
