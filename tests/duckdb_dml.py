"""Execute the engine's rendered Spark DML (including MERGE INTO) on a
DuckDB connection, for differential-testing the rendered SQL text
against the executor's DataFrame path.

DuckDB 1.0 has no MERGE statement, so MERGE text is parsed (from the
actual rendered artifact — nothing is re-derived from the strategy) and
executed as the standard snapshot rewrite:

    __src  = materialized USING subquery        (before any mutation)
    __tgt0 = rowid-keyed snapshot of the target (original state)

    WHEN MATCHED            -> UPDATE t ... FROM __tgt0 AS <talias>, __src AS <salias>
    WHEN NOT MATCHED        -> INSERT ... SELECT FROM __src WHERE NOT EXISTS(__tgt0 match)
    WHEN NOT MATCHED BY SOURCE -> UPDATE t ... FROM __tgt0 WHERE NOT EXISTS(__src match)

All ON / condition / assignment text executes verbatim with the target
alias bound to the __tgt0 snapshot, which gives MERGE's
all-clauses-see-original-state semantics.
"""

from __future__ import annotations

import re

from bruin_spark.parser.sqlutil import _code_tokens, _tokens


def translate(sql: str, now: str) -> str:
    """Spark SQL dialect -> DuckDB dialect for the rendered statements."""
    out = []
    for kind, text, _s in _tokens(sql):
        if kind == "bq":
            out.append('"' + text[1:-1].replace('``', '`') + '"')
        elif kind == "word" and text.lower() == "current_timestamp":
            out.append(f"TIMESTAMP '{now}'")
        else:
            out.append(text)
    sql = "".join(out)
    # CURRENT_TIMESTAMP() -> the frozen literal already substituted; strip
    # the now-dangling call parens
    sql = re.sub(r"(TIMESTAMP '[^']*')\s*\(\s*\)", r"\1", sql)
    sql = sql.replace("<=>", "IS NOT DISTINCT FROM")
    return sql


def _top_level_spans(sql: str, phrases: list[list[str]]) -> list[tuple[int, int, int]]:
    """-> [(phrase_idx, char_start, char_end)] of depth-0 keyword phrases."""
    toks = _tokens(sql)
    code = _code_tokens(toks)
    words = [
        (toks[i][1].lower() if toks[i][0] == "word" else toks[i][1], toks[i][2], len(toks[i][1]))
        for i in code
    ]
    spans = []
    depth = 0
    for j, (w, s, ln) in enumerate(words):
        if w == "(":
            depth += 1
        elif w == ")":
            depth -= 1
        elif depth == 0:
            for pi, phrase in enumerate(phrases):
                if j + len(phrase) <= len(words) and all(
                    words[j + k][0] == phrase[k] for k in range(len(phrase))
                ):
                    last = words[j + len(phrase) - 1]
                    spans.append((pi, s, last[1] + last[2]))
                    break
    return spans


def run_merge(con, sql: str) -> None:
    """Parse one rendered MERGE INTO statement and execute it on DuckDB."""
    m = re.match(
        r"\s*MERGE\s+INTO\s+(?P<target>\S+)\s+(?:AS\s+)?(?P<talias>\w+)\s+USING\s*\(",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"unparseable MERGE header: {sql[:120]}")
    target, talias = m.group("target"), m.group("talias")
    # USING ( <src> ) <salias> ON <cond> — find the balanced close paren
    i = m.end() - 1
    depth = 0
    for j in range(i, len(sql)):
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
            if depth == 0:
                src = sql[i + 1 : j]
                rest = sql[j + 1 :]
                break
    else:
        raise ValueError("unbalanced USING subquery")
    m2 = re.match(r"\s*(?:AS\s+)?(?P<salias>\w+)\s+ON\s+", rest, re.IGNORECASE | re.DOTALL)
    if not m2:
        raise ValueError(f"unparseable USING alias/ON: {rest[:120]}")
    salias = m2.group("salias")
    rest = rest[m2.end() :]

    # split the remainder into ON-cond + WHEN clauses at depth 0
    phrases = [
        ["when", "not", "matched", "by", "source"],
        ["when", "not", "matched"],
        ["when", "matched"],
    ]
    spans = _top_level_spans(rest, phrases)
    if not spans:
        raise ValueError("MERGE without WHEN clauses")
    on_cond = rest[: spans[0][1]].strip()
    clauses = []
    for k, (pi, s, e) in enumerate(spans):
        end = spans[k + 1][1] if k + 1 < len(spans) else len(rest)
        body = rest[e:end].strip()
        kind = ["by_source", "not_matched", "matched"][pi]
        cond = None
        mc = re.match(r"\s*AND\s+", body, re.IGNORECASE)
        if mc:
            then = re.search(r"\bTHEN\b", body, re.IGNORECASE)
            cond = body[mc.end() : then.start()].strip()
            body = body[then.end() :].strip()
        else:
            body = re.sub(r"^\s*THEN\b", "", body, flags=re.IGNORECASE).strip()
        clauses.append((kind, cond, body))

    con.execute(f"CREATE OR REPLACE TEMP TABLE __src AS {src}")
    con.execute(f"CREATE OR REPLACE TEMP TABLE __tgt0 AS SELECT rowid AS _rid, * FROM {target}")
    for kind, cond, body in clauses:
        if kind == "matched":
            sets = _update_sets(body, talias)
            q = (
                f"UPDATE {target} SET {sets} FROM __tgt0 AS {talias}, __src AS {salias} "
                f"WHERE {target}.rowid = {talias}._rid AND ({on_cond})"
            )
            if cond:
                q += f" AND ({cond})"
            con.execute(q)
        elif kind == "not_matched":
            mi = re.match(
                r"\s*INSERT\s*\((?P<cols>[^)]*)\)\s*VALUES\s*\((?P<vals>.*)\)\s*$",
                body,
                re.IGNORECASE | re.DOTALL,
            )
            if not mi:
                raise ValueError(f"unparseable INSERT clause: {body[:120]}")
            where = f"NOT EXISTS (SELECT 1 FROM __tgt0 AS {talias} WHERE {on_cond})"
            if cond:
                where = f"({cond}) AND {where}"
            con.execute(
                f"INSERT INTO {target} ({mi.group('cols')}) "
                f"SELECT {mi.group('vals')} FROM __src AS {salias} WHERE {where}"
            )
        else:  # by_source
            sets = _update_sets(body, talias)
            where = f"NOT EXISTS (SELECT 1 FROM __src AS {salias} WHERE {on_cond})"
            if cond:
                where = f"({cond}) AND {where}"
            con.execute(
                f"UPDATE {target} SET {sets} FROM __tgt0 AS {talias} "
                f"WHERE {target}.rowid = {talias}._rid AND {where}"
            )


def _update_sets(body: str, talias: str) -> str:
    """'UPDATE SET t.a = x, t.b = y' -> 'a = x, b = y' (bare LHS)."""
    body = re.sub(r"^\s*UPDATE\s+SET\s+", "", body, flags=re.IGNORECASE)
    return re.sub(
        rf"(^|,)(\s*){re.escape(talias)}\.(\"[^\"]+\"|\w+)(\s*=)", r"\1\2\3\4", body
    )


def run_statements(con, statements: list[str], now: str, params: dict | None = None) -> None:
    """Execute a rendered statement list (translated) on DuckDB."""
    for stmt in statements:
        for k, v in (params or {}).items():
            stmt = stmt.replace("{{" + k + "}}", v)
        stmt = translate(stmt, now)
        if re.match(r"\s*MERGE\s+INTO\b", stmt, re.IGNORECASE):
            run_merge(con, stmt)
        else:
            con.execute(stmt)
