"""SQL analysis services: used tables, renames, limits, time freezing,
CTE surgery — the operations the reference delegates to a sqlglot
subprocess (pkg/sqlparser/parser.go:100-166; pythonsrc/parser/main.py).

sqlglot is not guaranteed in this environment, so the default
implementation is a small token scanner sufficient for these structural
rewrites (it does NOT build an AST; column-level lineage needs a real
parser and is exposed only when sqlglot is importable). All functions
preserve the original text outside the edited spans.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lcomment>--[^\n]*)
  | (?P<bcomment>/\*.*?\*/)
  | (?P<str>'(?:[^'\\]|''|\\.)*')
  | (?P<dq>"(?:[^"]|"")*")
  | (?P<bq>`(?:[^`]|``)*`)
  | (?P<word>[A-Za-z_][A-Za-z0-9_$]*)
  | (?P<num>\d+(?:\.\d*)?)
  | (?P<sym>.)
    """,
    re.VERBOSE | re.DOTALL,
)


def _tokens(sql: str) -> list[tuple[str, str, int]]:
    """-> [(kind, text, start_offset)]"""
    out = []
    for m in _TOKEN.finditer(sql):
        out.append((m.lastgroup, m.group(), m.start()))
    return out


def _code_tokens(toks):
    """Indices of non-whitespace/comment tokens."""
    return [i for i, (k, _t, _s) in enumerate(toks) if k not in ("ws", "lcomment", "bcomment")]


_FROMISH = {"from", "join"}
_STOPPERS = {
    "select", "where", "group", "order", "having", "limit", "on", "using",
    "union", "intersect", "except", "when", "then", "else", "end", "set",
    "values", "qualify", "window", "lateral", "cross", "inner", "left",
    "right", "full", "outer", "semi", "anti", "natural", "unnest",
}


def strip_sql_comments(sql: str) -> str:
    """Remove -- line and /* block */ comments, preserving string
    literals and quoted identifiers (a `--` inside '...'/"..."/`...` is
    data) and keeping the newlines a block comment spanned (reference:
    pkg/query StripSQLComments, extract_test.go TestStripSQLComments)."""
    out = []
    for kind, text, _start in _tokens(sql):
        if kind == "lcomment":
            continue
        if kind == "bcomment":
            out.append("\n" * text.count("\n"))
            continue
        out.append(text)
    return "".join(out)


def is_likely_result_query(sql: str) -> bool:
    """Does the statement produce a result set?  (ref: pkg/query/
    statement.go:9-18 IsLikelyResultQuery, table-pinned by
    tests/test_builtins_reference_cases.py): SELECT / WITH / SHOW /
    DESCRIBE / DESC / EXPLAIN / PRAGMA by first keyword, else any
    DML with a top-level RETURNING keyword — a 'returning' inside a
    string literal is data, not a keyword."""
    first = None
    for kind, text, _s in _tokens(sql):
        if kind in ("lcomment", "bcomment", "ws"):
            continue
        if kind == "word":
            first = text.upper()
        break
    if first in ("SELECT", "WITH", "SHOW", "DESCRIBE", "DESC", "EXPLAIN", "PRAGMA"):
        return True
    return any(
        kind == "word" and text.upper() == "RETURNING"
        for kind, text, _s in _tokens(sql)
    )


def split_statements(sql: str) -> list[str]:
    """Split on ';' outside strings/comments; drops empty statements."""
    toks = _tokens(sql)
    parts, cur = [], []
    for kind, text, _s in toks:
        if kind == "sym" and text == ";":
            stmt = "".join(cur).strip()
            if stmt:
                parts.append(stmt)
            cur = []
        else:
            cur.append(text)
    stmt = "".join(cur).strip()
    if stmt:
        parts.append(stmt)
    return parts


def _cte_names(toks, code) -> set[str]:
    """Names defined in WITH clauses anywhere in the statement."""
    names: set[str] = set()
    i = 0
    while i < len(code):
        k, t, _ = toks[code[i]]
        if k == "word" and t.lower() == "with":
            j = i + 1
            # name [(cols)] AS ( ... ) [, name AS ( ... )]*
            while j < len(code):
                kj, tj, _ = toks[code[j]]
                if kj == "word" and tj.lower() == "recursive":
                    j += 1
                    continue
                if kj not in ("word", "dq", "bq"):
                    break
                names.add(tj.strip('"`'))
                j += 1
                # optional column list
                if j < len(code) and toks[code[j]][1] == "(":
                    depth = 0
                    while j < len(code):
                        if toks[code[j]][1] == "(":
                            depth += 1
                        elif toks[code[j]][1] == ")":
                            depth -= 1
                            if depth == 0:
                                j += 1
                                break
                        j += 1
                if j < len(code) and toks[code[j]][1].lower() == "as":
                    j += 1
                if j < len(code) and toks[code[j]][1] == "(":
                    depth = 0
                    while j < len(code):
                        if toks[code[j]][1] == "(":
                            depth += 1
                        elif toks[code[j]][1] == ")":
                            depth -= 1
                            if depth == 0:
                                j += 1
                                break
                        j += 1
                if j < len(code) and toks[code[j]][1] == ",":
                    j += 1
                    continue
                break
            i = j
        else:
            i += 1
    return names


#: functions whose argument list contains a non-relational FROM keyword
#: (EXTRACT(day FROM x), SUBSTRING(s FROM 1), TRIM(BOTH ' ' FROM s), ...)
_FROM_ARG_FNS = {"extract", "substring", "trim", "position", "overlay"}

#: keywords that end a FROM list at the current nesting depth
_FROM_ENDERS = {
    "where", "group", "order", "having", "limit", "select", "union",
    "intersect", "except", "on", "using", "lateral", "window", "qualify",
    "set", "when", "then", "else", "end", "values",
    "distribute", "sort", "cluster",
}


def _table_refs(sql: str):
    """-> [(qualified_name, first_tok_idx, last_tok_idx)] of FROM/JOIN refs.

    Depth-tracking scan: a FROM/JOIN keyword opens a table-ref position,
    and a ',' while the current depth is still inside a FROM list opens
    another (mixed `FROM a, (SELECT..) b, c` lists resolve all physical
    names). FROMs inside EXTRACT/SUBSTRING/TRIM/POSITION/OVERLAY argument
    lists are expression syntax, not relations, and are ignored.
    """
    toks = _tokens(sql)
    code = _code_tokens(toks)
    refs = []
    in_from: dict[int, bool] = {}  # depth -> inside a FROM list
    special: list[bool] = []  # paren stack: inside a FROM-arg function call
    depth = 0
    prev_word = ""

    def read_ref(j: int, kind: str = "from") -> int:
        """Try to read a qualified table name at code index j; -> next j."""
        if kind == "ddl":
            # DDL targets: CREATE TABLE IF NOT EXISTS x / DROP TABLE IF EXISTS x
            while (
                j < len(code)
                and toks[code[j]][0] == "word"
                and toks[code[j]][1].lower() in ("if", "not", "exists")
            ):
                j += 1
        if j >= len(code):
            return j
        kj, tj, _ = toks[code[j]]
        if kj not in ("word", "dq", "bq") or tj.lower() in _STOPPERS:
            return j
        first = j
        name_parts = [tj.strip('"`')]
        j += 1
        while (
            j + 1 < len(code)
            and toks[code[j]][1] == "."
            and toks[code[j + 1]][0] in ("word", "dq", "bq")
        ):
            name_parts.append(toks[code[j + 1]][1].strip('"`'))
            j += 2
        last = j - 1  # last code index of the name itself
        # a TABLESAMPLE clause sits between the name and any alias in
        # Spark's grammar (relationPrimary sample? tableAlias), so skip
        # it; a rename back-alias must then be INSERTED after the sample
        # clause, not appended to the name span
        insert_after = code[last]
        while (
            j < len(code)
            and toks[code[j]][0] == "word"
            and toks[code[j]][1].lower() in ("tablesample", "repeatable")
        ):
            j += 1
            if j < len(code) and toks[code[j]][1] == "(":
                j = _skip_parens(toks, code, j)
                insert_after = code[j - 1]
        # does an explicit alias follow? (FROM refs only — rename uses
        # this to keep qualified column refs valid via a back-alias).
        # PIVOT/UNPIVOT read as "aliased": their output relation replaces
        # the base table, so qualified refs to it are gone anyway and a
        # back-alias would be a syntax error before the PIVOT keyword.
        has_alias = False
        if j < len(code):
            ka, ta, _ = toks[code[j]]
            if ka == "word" and ta.lower() == "as":
                has_alias = True
            elif ka in ("word", "dq", "bq") and ta.lower() not in _STOPPERS and ta.lower() not in _FROMISH:
                has_alias = True
        refs.append(
            (".".join(name_parts), code[first], code[last], kind, has_alias, insert_after)
        )
        return j

    # in MERGE INTO t USING s, USING introduces a relation (elsewhere it
    # is a join column list and ends the FROM list)
    is_merge = bool(code) and toks[code[0]][1].lower() == "merge"

    i = 0
    while i < len(code):
        k, t, _ = toks[code[i]]
        low = t.lower() if k == "word" else ""
        if is_merge and low == "using":
            i = read_ref(i + 1)
            prev_word = low
            continue
        if t == "(":
            special.append(prev_word in _FROM_ARG_FNS)
            depth += 1
        elif t == ")":
            in_from.pop(depth, None)
            depth -= 1
            if special:
                special.pop()
        elif k == "word" and low in _FROMISH:
            if not (special and special[-1]):
                in_from[depth] = True
                i = read_ref(i + 1)
                prev_word = low
                continue
        elif k == "word" and low in ("table", "into"):
            # DDL/DML targets count as used tables, matching the
            # reference's sqlglot find_all(exp.Table) behavior
            # (pkg/sqlparser/parser_test.go "transaction" case):
            # CREATE TABLE x AS / DROP TABLE x / INSERT INTO x
            if not (special and special[-1]):
                i = read_ref(i + 1, kind="ddl")
                prev_word = low
                continue
        elif k == "word" and low in _FROM_ENDERS:
            # ON/USING suspend the FROM list but a top-level comma at the
            # same depth resumes it (`FROM t1 JOIN t2 ON t1.x = t2.x, t3`
            # still lists t3 — the reference's sqlglot find_all(exp.Table)
            # returns it too); every other ender closes the list for good
            in_from[depth] = "cond" if low in ("on", "using") else False
        elif t == "," and in_from.get(depth):
            in_from[depth] = True
            i = read_ref(i + 1)
            prev_word = ""
            continue
        prev_word = low
        i += 1
    return toks, refs


def used_tables(sql: str) -> list[str]:
    """Distinct physical tables referenced (CTE names excluded), sorted."""
    out: set[str] = set()
    for stmt in split_statements(sql):
        toks, refs = _table_refs(stmt)
        ctes = _cte_names(toks, _code_tokens(toks))
        for name, _a, _b, _kind, _alias, _ins in refs:
            if name.split(".")[0] not in ctes and name not in ctes:
                out.add(name)
    return sorted(out)


def rename_tables(sql: str, mapping: dict[str, str]) -> str:
    """Rewrite FROM/JOIN/DDL-target table names per mapping (CTE refs
    untouched).

    When an UNALIASED FROM/JOIN ref's base name changes, a back-alias to
    the original base name is added (``FROM items`` with items->new_items
    becomes ``FROM new_items AS items``) so qualified column references
    elsewhere in the query keep resolving — the reference's sqlglot
    rename does the same (pkg/sqlparser/parser_test.go
    TestSqlParser_RenameTables "simple select should get an alias").
    DDL/DML targets (INSERT INTO x, CREATE TABLE x) never get an alias.
    """
    toks, refs = _table_refs(sql)
    code = _code_tokens(toks)
    ctes = _cte_names(toks, code)

    def match_source(name: str) -> str | None:
        """Mapping lookup with the reference's part semantics: a 1-part
        key matches any schema's table of that base name, a 2-part key
        matches regardless of catalog (rename.py:14-33)."""
        if name in mapping:
            return name
        for k in mapping:
            if name.endswith("." + k):
                return k
        return None

    spans = []  # (char_start, char_end, replacement)
    renamed_tok_ranges = []  # (first_tok_idx, last_tok_idx) of table refs
    renamed_sources = {}  # source key -> leaf name refs still resolve by
    for name, a, b, kind, has_alias, ins in refs:
        if name in ctes or name.split(".")[0] in ctes:
            continue
        renamed_tok_ranges.append((a, b))
        key = match_source(name)
        if key is not None:
            start = toks[a][2]
            end = toks[b][2] + len(toks[b][1])
            new = mapping[key]
            n_dest = len(new.split("."))
            name_parts = name.split(".")
            # a 1-part destination clears catalog AND schema (fixture CTE
            # case); a 2-part destination replaces schema.table but keeps
            # the ref's own catalog (rename.py:46-57)
            if n_dest == 2 and len(name_parts) > 2:
                new = ".".join(name_parts[:-2] + [new])
            old_base = name_parts[-1]
            # the back-alias must keep the original leaf token's quoting:
            # FROM "My Table" renames to `other AS "My Table"` — an
            # unquoted multi-word alias would be invalid SQL (the
            # reference's sqlglot rename re-emits a quoted alias too)
            leaf_kind, leaf_text = toks[b][0], toks[b][1]
            alias_txt = leaf_text if leaf_kind in ("dq", "bq") else old_base
            new_base = new.split(".")[-1].strip('`"')
            if kind == "from" and not has_alias and new_base != old_base:
                if ins == b:
                    new = f"{new} AS {alias_txt}"
                else:
                    # a TABLESAMPLE clause follows the name: Spark's
                    # grammar puts the alias AFTER the sample, so insert
                    # it there instead of extending the name span
                    pos = toks[ins][2] + len(toks[ins][1])
                    spans.append((pos, pos, f" AS {alias_txt}"))
            if kind == "from":
                renamed_sources[name] = alias_txt
            spans.append((start, end, new))

    # a renamed table loses its original schema/catalog, so a column
    # still qualified by the OLD schema (analytics.orders.amount) would
    # no longer resolve — drop that qualifier to the leaf table, which
    # stays reachable via the explicit or back-alias (rename.py:63-80)
    if renamed_sources:
        covered = set()
        for a, b in renamed_tok_ranges:
            covered.update(range(a, b + 1))
        i = 0
        while i < len(code):
            ti = code[i]
            if ti in covered or toks[ti][0] not in ("word", "dq", "bq"):
                i += 1
                continue
            parts = [toks[ti][1].strip('"`')]
            j = i
            while (
                j + 2 < len(code)
                and toks[code[j + 1]][1] == "."
                and toks[code[j + 2]][0] in ("word", "dq", "bq")
            ):
                parts.append(toks[code[j + 2]][1].strip('"`'))
                j += 2
            if len(parts) >= 3:  # schema.table.column or deeper
                qualifier = ".".join(parts[:-1])
                if qualifier in renamed_sources:
                    start = toks[ti][2]
                    last_q_tok = toks[code[j - 2]]  # last qualifier part
                    end = last_q_tok[2] + len(last_q_tok[1])
                    spans.append((start, end, renamed_sources[qualifier]))
            i = j + 1 if j > i else i + 1

    for start, end, rep in sorted(spans, reverse=True):
        sql = sql[:start] + rep + sql[end:]
    return sql


def add_limit(sql: str, limit: int) -> str:
    """Append/override LIMIT on a single-select query (SELECT ... LIMIT n)."""
    stmts = split_statements(sql)
    if len(stmts) != 1:
        raise ValueError("add_limit requires a single statement")
    stmt = stmts[0]
    toks = _tokens(stmt)
    code = _code_tokens(toks)
    # existing top-level LIMIT? (depth 0 only)
    depth = 0
    for pos, i in enumerate(code):
        k, t, s = toks[i]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and k == "word" and t.lower() == "limit":
            if pos + 1 < len(code) and toks[code[pos + 1]][0] == "num":
                n_tok = toks[code[pos + 1]]
                start, end = n_tok[2], n_tok[2] + len(n_tok[1])
                return stmt[:start] + str(limit) + stmt[end:]
    return f"{stmt.rstrip().rstrip(';')} LIMIT {limit}"


_NOW_FNS = {"now", "current_timestamp", "current_date", "current_time", "getdate"}


def freeze_time(sql: str, timestamp: str) -> str:
    """Replace now()/CURRENT_TIMESTAMP/CURRENT_DATE with literals.

    ``timestamp`` is an ISO 'YYYY-MM-DD HH:MM:SS' string; CURRENT_DATE
    freezes to its date part.
    """
    toks = _tokens(sql)
    code = _code_tokens(toks)
    spans = []
    date_part = timestamp.split(" ")[0].split("T")[0]
    for pos, i in enumerate(code):
        k, t, s = toks[i]
        if k != "word" or t.lower() not in _NOW_FNS:
            continue
        fn = t.lower()
        end = s + len(t)
        # swallow optional ()
        if pos + 1 < len(code) and toks[code[pos + 1]][1] == "(":
            if pos + 2 < len(code) and toks[code[pos + 2]][1] == ")":
                end = toks[code[pos + 2]][2] + 1
            else:
                continue  # function with args, not a now() call
        elif fn in ("now", "getdate"):
            continue  # bare word "now" without parens is an identifier
        if fn == "current_date":
            spans.append((s, end, f"CAST('{date_part}' AS DATE)"))
        else:
            spans.append((s, end, f"CAST('{timestamp}' AS TIMESTAMP)"))
    for start, end, rep in sorted(spans, reverse=True):
        sql = sql[:start] + rep + sql[end:]
    return sql


def is_single_select(sql: str) -> bool:
    stmts = split_statements(sql)
    if len(stmts) != 1:
        return False
    toks = _tokens(stmts[0])
    code = _code_tokens(toks)
    if not code:
        return False
    first = toks[code[0]][1].lower()
    if first == "with":
        # WITH can prefix DML (WITH ... INSERT INTO ...) — only a SELECT
        # body counts (ref: main.py is_single_select_query checks the
        # statement type, not the prefix)
        body = _after_with_clause(stmts[0])
        btoks = _tokens(body)
        bcode = _code_tokens(btoks)
        if not bcode:
            return False
        head = btoks[bcode[0]][1].lower()
        return head in ("select", "values", "(")
    return first in ("select", "values")


def extract_select(sql: str) -> str:
    """Reduce an asset statement to the read-only SELECT that produces
    its rows (ref: pkg/sqlparser/parser.go:423-435 ExtractSelect;
    pythonsrc/parser/main.py:604-659 extract_select — the reference's
    own parser_test.go ExtractSelect table is harvested in
    tests/test_parser.py).

    A ``materialization: none`` asset can be full DDL/DML — ``CREATE OR
    REPLACE VIEW x AS SELECT ...``, a CTAS, or ``INSERT INTO x SELECT
    ...``.  ``bruin query --asset`` and the unit-test builder exercise
    only the inner SELECT, so this unwraps the CREATE/INSERT wrapper; a
    statement that is already a SELECT (with or without a WITH clause)
    is returned unchanged.

    This is also the read-only guarantee of `bruin test`: anything that
    would write raises and is never executed — a top-level
    DELETE/UPDATE/MERGE/TRUNCATE/DROP (not a query), a write hidden in
    a data-modifying CTE or subquery, and ``SELECT ... INTO <table>``
    (the INTO is stripped so only the read runs).
    """
    stmts = split_statements(sql)
    if not stmts:
        raise ValueError("cannot parse query")
    if len(stmts) > 1:
        raise ValueError("asset has multiple statements; cannot reduce to one SELECT")
    stmt = stmts[0]
    toks = _tokens(stmt)
    code = _code_tokens(toks)
    if not code:
        raise ValueError("cannot parse query")
    kind0, first_tok, _ = toks[code[0]]
    first = first_tok.lower() if kind0 == "word" else first_tok
    starters = ("select", "with", "values")
    if first == "create":
        # CREATE [OR REPLACE] [TEMP] [MATERIALIZED] TABLE|VIEW name
        # [(col list)] AS <query> — the unwrap point is the first
        # depth-0 AS whose next token opens a query (a column-list AS
        # or alias AS never is)
        inner_start = None
        depth = 0
        for pos, i in enumerate(code):
            k, t, _s = toks[i]
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
            elif depth == 0 and k == "word" and t.lower() == "as" and pos + 1 < len(code):
                nk, nt, ns = toks[code[pos + 1]]
                if (nk == "word" and nt.lower() in starters) or nt == "(":
                    inner_start = ns
                    break
        if inner_start is None:
            raise ValueError("asset has no SELECT to unit test")
        inner = stmt[inner_start:]
    elif first == "insert":
        # INSERT [OVERWRITE] INTO tbl [(cols)] [BY NAME] <query>
        inner_start = None
        depth = 0
        for pos in range(1, len(code)):
            k, t, s = toks[code[pos]]
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
            elif depth == 0 and k == "word" and t.lower() in starters:
                inner_start = s
                break
        if inner_start is None:
            raise ValueError("asset has no SELECT to unit test")
        inner = stmt[inner_start:]
    elif (kind0 == "word" and first in starters) or first_tok == "(":
        inner = stmt
    else:
        raise ValueError(
            "asset is not a SELECT and has no inner SELECT to unit test"
        )
    return _reject_writes_and_strip_into(inner)


def _reject_writes_and_strip_into(inner: str) -> str:
    """Read-only enforcement for :func:`extract_select`'s result: reject
    writes hidden in a data-modifying CTE / writing subquery (keyword
    PAIRS — 'insert into', 'delete from', 'merge into', '(update' — so
    a column or alias merely NAMED like a verb never false-positives,
    while 'FOR UPDATE' row locking stays legal), and strip a top-level
    ``INTO <table>`` write target.  A bare ``INTO`` at any DEEPER
    nesting level (a subquery or CTE body) is itself a write — SQL has
    no read-only use of SELECT INTO — and is rejected rather than left
    to run."""
    # normalize a fully-parenthesized query — '(SELECT ... INTO t ...)'
    # — so the top-level INTO strip sees it at depth 0 instead of the
    # whole body hiding at depth 1 past the write checks
    inner = _unwrap_outer_parens(inner)
    toks = _tokens(inner)
    code = _code_tokens(toks)
    into_span: tuple[int, int] | None = None
    depth = 0
    for pos, i in enumerate(code):
        k, t, s = toks[i]
        if t == "(":
            depth += 1
            continue
        if t == ")":
            depth -= 1
            continue
        if k != "word":
            continue
        tl = t.lower()
        nxt = ""
        if pos + 1 < len(code):
            nk, ntok, _ = toks[code[pos + 1]]
            nxt = ntok.lower() if nk == "word" else ntok
        prev = toks[code[pos - 1]][1] if pos > 0 else ""
        if (
            (tl == "insert" and nxt in ("into", "overwrite"))
            or (tl == "delete" and nxt == "from")
            or (tl == "merge" and nxt == "into")
            or (tl == "update" and prev == "(")
            or (tl == "into" and depth > 0)
        ):
            raise ValueError(
                "asset contains a write statement and cannot be unit tested read-only"
            )
        if tl == "into" and depth == 0 and into_span is None and pos + 1 < len(code):
            # SELECT ... INTO <table> — consume ONE dotted target name
            # (name, then repeating ".part"); a bare word after it
            # (FROM, WHERE, ...) is the query continuing, not the name
            j = pos + 1
            end = s + len(t)
            jk, jt, js = toks[code[j]]
            if jk in ("word", "dq", "bq"):
                end = js + len(jt)
                j += 1
                while j + 1 < len(code) and toks[code[j]][1] == ".":
                    jk, jt, js = toks[code[j + 1]]
                    if jk not in ("word", "dq", "bq"):
                        break
                    end = js + len(jt)
                    j += 2
            into_span = (s, end)
    if into_span is not None:
        a, b = into_span
        inner = (inner[:a].rstrip() + " " + inner[b:].lstrip()).strip()
    return inner.strip()


def _unwrap_outer_parens(sql: str) -> str:
    """Strip parens that wrap the ENTIRE statement (repeatedly): the
    first code token is '(' and its matching ')' is the last one."""
    while True:
        toks = _tokens(sql)
        code = _code_tokens(toks)
        if len(code) < 2 or toks[code[0]][1] != "(" or toks[code[-1]][1] != ")":
            return sql
        depth = 0
        for pos, i in enumerate(code):
            if toks[i][1] == "(":
                depth += 1
            elif toks[i][1] == ")":
                depth -= 1
                if depth == 0 and pos != len(code) - 1:
                    return sql  # first '(' closes before the end
        open_end = toks[code[0]][2] + 1
        close_start = toks[code[-1]][2]
        sql = sql[open_end:close_start].strip()


def _cte_parts(sql: str) -> list[tuple[str, str | None, str]]:
    """-> [(name, column_list_text_or_None, body_sql)] for the
    statement's top-level WITH clause. The column list text is the
    original ``(c1, c2)`` span so rebuilders preserve output renames."""
    toks = _tokens(sql)
    code = _code_tokens(toks)
    out: list[tuple[str, str | None, str]] = []
    if not code or toks[code[0]][1].lower() != "with":
        return out
    j = 1
    while j < len(code):
        kj, tj, _ = toks[code[j]]
        if kj == "word" and tj.lower() == "recursive":
            j += 1
            continue
        if kj not in ("word", "dq", "bq"):
            break
        name = tj.strip('"`')
        j += 1
        col_list: str | None = None
        if j < len(code) and toks[code[j]][1] == "(":  # column list
            depth = 0
            start = toks[code[j]][2]
            while j < len(code):
                if toks[code[j]][1] == "(":
                    depth += 1
                elif toks[code[j]][1] == ")":
                    depth -= 1
                    if depth == 0:
                        col_list = sql[start : toks[code[j]][2] + 1]
                        j += 1
                        break
                j += 1
        if j < len(code) and toks[code[j]][1].lower() == "as":
            j += 1
        if j < len(code) and toks[code[j]][1] == "(":
            depth = 0
            body_start = None
            while j < len(code):
                tok = toks[code[j]]
                if tok[1] == "(":
                    depth += 1
                    if depth == 1:
                        body_start = tok[2] + 1
                elif tok[1] == ")":
                    depth -= 1
                    if depth == 0:
                        out.append((name, col_list, sql[body_start : tok[2]].strip()))
                        j += 1
                        break
                j += 1
        if j < len(code) and toks[code[j]][1] == ",":
            j += 1
            continue
        break
    return out


def extract_ctes(sql: str) -> dict[str, str]:
    """-> {cte_name: body_sql} for the statement's top-level WITH clause."""
    return {name: body for name, _cols, body in _cte_parts(sql)}


def select_from_cte(sql: str, cte_name: str) -> str:
    """Rewrite so the query returns the named CTE's rows (unit-test
    per-CTE assertions): keep the WITH prefix up to and including that
    CTE, select * from it."""
    parts = _cte_parts(sql)
    if cte_name not in {n for n, _c, _b in parts}:
        raise ValueError(f"CTE not found: {cte_name}")
    kept = []
    for name, cols, body in parts:
        kept.append(f"{name}{cols or ''} AS ({body})")
        if name == cte_name:
            break
    # preserve RECURSIVE: without it a self-referencing CTE is invalid
    import re as _re

    recursive = bool(
        _re.match(r"\s*with\s+recursive\b", sql, _re.IGNORECASE)
    )
    prefix = "WITH RECURSIVE " if recursive else "WITH "
    return prefix + ", ".join(kept) + f" SELECT * FROM {cte_name}"


def prepend_ctes(sql: str, fixtures: dict[str, str]) -> str:
    """Inject fixture CTEs ahead of the query's own WITH clause.

    fixtures: {name: select_sql}. Existing CTEs with the same name are
    shadowed (fixture wins — reference fixture-override semantics).
    """
    stmts = split_statements(sql)
    if len(stmts) != 1:
        raise ValueError("prepend_ctes requires a single statement")
    stmt = stmts[0]
    own = _cte_parts(stmt)
    # a shadowed CTE's declared column list is preserved around the
    # fixture body so downstream references to the renamed outputs hold
    col_lists = {n: c for n, c, _b in own}
    fixture_part = ", ".join(
        f"{name}{col_lists.get(name) or ''} AS ({body.rstrip().rstrip(';')})"
        for name, body in fixtures.items()
    )
    if not own:
        return f"WITH {fixture_part} {stmt}"
    # merge: fixtures first, then non-shadowed originals, then the body
    own_parts = [f"{n}{c or ''} AS ({b})" for n, c, b in own if n not in fixtures]
    body_after = _after_with_clause(stmt)
    all_parts = [fixture_part] + own_parts if own_parts else [fixture_part]
    return "WITH " + ", ".join(all_parts) + " " + body_after


def _skip_parens(toks, code, j: int) -> int:
    """Given code index j at '(', return index just past its match."""
    depth = 0
    while j < len(code):
        if toks[code[j]][1] == "(":
            depth += 1
        elif toks[code[j]][1] == ")":
            depth -= 1
            if depth == 0:
                return j + 1
        j += 1
    return j


def _after_with_clause(sql: str) -> str:
    """Text after the top-level WITH clause (the main SELECT)."""
    toks = _tokens(sql)
    code = _code_tokens(toks)
    if not code or toks[code[0]][1].lower() != "with":
        return sql
    j = 1
    while j < len(code):
        kj, tj, _ = toks[code[j]]
        if kj == "word" and tj.lower() == "recursive":
            j += 1
            continue
        if kj not in ("word", "dq", "bq"):
            break
        j += 1  # name
        if j < len(code) and toks[code[j]][1] == "(":  # optional column list
            j = _skip_parens(toks, code, j)
        if j < len(code) and toks[code[j]][1].lower() == "as":
            j += 1
        if j < len(code) and toks[code[j]][1] == "(":  # body
            j = _skip_parens(toks, code, j)
        if j < len(code) and toks[code[j]][1] == ",":
            j += 1
            continue
        break
    if j >= len(code):
        return ""
    return sql[toks[code[j]][2] :]


def missing_dependencies(sql: str, declared: list[str], known_assets: list[str]) -> list[str]:
    """Lint: tables the query references that are known assets but not
    declared as dependencies (ref: parser.go:515-596)."""
    used = set(used_tables(sql))
    declared_set = set(declared)
    known = set(known_assets)
    return sorted((used & known) - declared_set)


# -- column lineage (best-effort, top-level select list) -----------------------


def _top_level_select_items(sql: str) -> list[str]:
    """Split the OUTER select list into item strings (depth-0 commas)."""
    toks = _tokens(sql)
    code = _code_tokens(toks)
    # find the main SELECT: skip a WITH clause if present
    body = _after_with_clause(sql)
    if body is not sql:
        return _top_level_select_items(body)
    i = 0
    while i < len(code) and not (
        toks[code[i]][0] == "word" and toks[code[i]][1].lower() == "select"
    ):
        i += 1
    if i >= len(code):
        return []
    start = code[i] + 1
    depth = 0
    items: list[str] = []
    cur_start = None
    for j in range(i + 1, len(code)):
        k, t, s = toks[code[j]]
        if cur_start is None:
            cur_start = s
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and k == "word" and t.lower() in ("from", "where", "group", "order", "limit", "having", "qualify", "union", "intersect", "except", "window"):
            items.append(sql[cur_start:s].strip())
            return [x for x in items if x]
        elif depth == 0 and t == ",":
            items.append(sql[cur_start:s].strip())
            cur_start = None
            # next item's start = next code token
            nxt = j + 1
            cur_start = toks[code[nxt]][2] if nxt < len(code) else None
    if cur_start is not None:
        items.append(sql[cur_start:].strip())
    return [x for x in items if x]


_KEYWORD_BLOCKLIST = _STOPPERS | _FROMISH | {
    "as", "case", "cast", "distinct", "and", "or", "not", "in", "is", "null",
    "true", "false", "like", "between", "interval", "over", "partition", "by",
    "rows", "range", "preceding", "following", "unbounded", "current", "row",
    "asc", "desc", "nulls", "first", "last", "all", "exists", "any", "some",
    "day", "days", "month", "months", "year", "years", "hour", "minute", "second",
}


def column_lineage(sql: str) -> list[dict]:
    """Best-effort per-output-column upstream references.

    -> [{"name": out_col, "upstream": [{"table": t_or_alias_or_"", "column": c}]}]

    Token-level heuristic (a real parser — sqlglot — slots in when
    available): the last bare identifier of an item is its alias (or the
    column itself for plain refs); every identifier inside the expression
    that isn't a SQL keyword or function name counts as an upstream ref.
    """
    out = []
    for item in _top_level_select_items(sql):
        toks = _tokens(item)
        code = _code_tokens(toks)
        if not code:
            continue
        # output name: after AS, else last word token, else expression text
        name = item
        for pos in range(len(code) - 1, -1, -1):
            k, t, _ = toks[code[pos]]
            if k in ("word", "dq", "bq") and t.lower() not in _KEYWORD_BLOCKLIST:
                name = t.strip('"`')
                break
        refs: list[dict] = []
        seen: set[tuple[str, str]] = set()
        pos = 0
        while pos < len(code):
            k, t, _ = toks[code[pos]]
            if k in ("word", "dq", "bq") and t.lower() not in _KEYWORD_BLOCKLIST:
                # function call? (identifier immediately followed by '(')
                if pos + 1 < len(code) and toks[code[pos + 1]][1] == "(":
                    pos += 1
                    continue
                # qualified chain
                parts = [t.strip('"`')]
                q = pos + 1
                while (
                    q + 1 < len(code)
                    and toks[code[q]][1] == "."
                    and toks[code[q + 1]][0] in ("word", "dq", "bq")
                ):
                    parts.append(toks[code[q + 1]][1].strip('"`'))
                    q += 2
                # skip the alias occurrence (last token after AS)
                is_alias = q >= len(code) and pos > 0 and toks[code[pos - 1]][1].lower() == "as"
                if not is_alias:
                    table = ".".join(parts[:-1])
                    key = (table, parts[-1])
                    if key not in seen:
                        seen.add(key)
                        refs.append({"table": table, "column": parts[-1]})
                pos = q
            else:
                pos += 1
        # drop the output alias itself if it sneaked in as a bare ref and
        # equals the last ref with no table (alias after AS)
        out.append({"name": name, "upstream": refs})
    return out
