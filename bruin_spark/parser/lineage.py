"""Column-level lineage: a self-contained recursive resolver.

Produces the reference's lineage shape (pythonsrc/parser/main.py:278-460
``get_column_lineage`` and pkg/lineage/lineage.go:101-269) without
sqlglot, which is not installed here: a mini recursive-descent parser
for SELECT queries feeds a scope resolver that walks aliases, derived
tables, CTE chains, and set operations down to the PHYSICAL leaf tables,
expands ``*`` / ``alias.*`` (from subquery/CTE output lists, or from an
optional ``schema`` dict for physical tables, mirroring sqlglot's
``qualify`` needing a schema), and records non-selected columns used in
WHERE / JOIN ON / GROUP BY (main.py:23-54 extract_non_selected_columns).

Output::

    {"columns": [{"name", "upstream": [{"column", "table"}], "type"}],
     "non_selected_columns": [{"name", "upstream": [...]}],
     "errors": [...]}

Upstream entries always point at physical tables (never aliases or CTE
names); a reference that cannot be grounded resolves to table ``""``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from bruin_spark.parser.sqlutil import _code_tokens, _tokens, split_statements

# keywords that terminate an identifier chain / select item
_CLAUSE_KW = {
    "from", "where", "group", "order", "having", "limit", "qualify",
    "window", "union", "intersect", "except", "on", "using",
}
_JOIN_KW = {"join", "inner", "left", "right", "full", "cross", "outer", "semi", "anti", "natural", "lateral"}
_NOT_ALIAS = _CLAUSE_KW | _JOIN_KW | {"as", "select", "with", "set", "values", "when", "then", "else", "end", "and", "or", "not", "in", "is", "like", "between", "distinct", "all", "by", "tablesample", "pivot", "unpivot"}

_EXPR_KEYWORDS = {
    "as", "case", "when", "then", "else", "end", "cast", "try_cast", "distinct",
    "and", "or", "not", "in", "is", "null", "true", "false", "like", "ilike",
    "rlike", "between", "interval", "over", "partition", "by", "rows", "range",
    "preceding", "following", "unbounded", "current", "row", "asc", "desc",
    "nulls", "first", "last", "all", "exists", "any", "some", "escape",
    "day", "days", "month", "months", "year", "years", "hour", "hours",
    "minute", "minutes", "second", "seconds", "week", "weeks", "quarter",
    "filter", "within", "ignore", "respect", "from", "order", "group",
    "select", "where", "having", "limit", "union", "intersect", "except",
    "on", "using", "join", "inner", "left", "right", "full", "cross",
    "outer", "date", "timestamp", "time", "both", "leading", "trailing",
    # SUBSTRING(x FROM 1 FOR 3) / paren-less niladic functions
    "for", "current_timestamp", "current_date", "current_time",
    "localtime", "localtimestamp",
}

# SQL type names that appear as bare words inside CAST(x AS type)
_TYPE_WORDS = {
    "int", "integer", "bigint", "smallint", "tinyint", "float", "real",
    "double", "decimal", "numeric", "string", "varchar", "char", "text",
    "boolean", "binary", "date", "timestamp", "timestamp_ntz", "interval",
    "array", "map", "struct", "void", "precision",
}


@dataclass
class _Rel:
    """A FROM-clause source: physical table, CTE reference, subquery, or
    inline VALUES table."""

    name: str = ""
    alias: str = ""
    sub: "_Query | None" = None
    # declared column names of a (VALUES ...) AS v(c1, c2) inline table;
    # literal rows have no upstream lineage
    values_cols: "list[str] | None" = None
    # trailing PIVOT/UNPIVOT modifier: ("pivot"|"unpivot", inner tokens)
    mod: "tuple[str, list[tuple[str, str]]] | None" = None
    # right side of a SEMI/ANTI join: referencable in the ON condition
    # but NOT in the select list / output scope
    cond_only: bool = False


@dataclass
class _Select:
    items: list[tuple[str | None, list[tuple[str, str]]]] = field(default_factory=list)
    relations: list[_Rel] = field(default_factory=list)
    cond_toks: list[list[tuple[str, str]]] = field(default_factory=list)
    # JOIN ON / USING conditions, kept apart from WHERE/HAVING/QUALIFY:
    # a SEMI/ANTI right side is in scope for its ON condition but NOT
    # for post-join clauses (Spark resolves WHERE against the join
    # output, which drops the semi/anti right side)
    on_toks: list[list[tuple[str, str]]] = field(default_factory=list)
    # GROUP BY kept separate: ordinals there resolve through the select
    # list (GROUP BY 1 references item 1's source columns)
    group_toks: list[list[tuple[str, str]]] = field(default_factory=list)
    # JOIN ... USING(col): the column exists in BOTH sides; unqualified
    # refs and * expansion merge instead of reporting ambiguity
    using_cols: set[str] = field(default_factory=set)
    # WINDOW w AS (PARTITION BY ... ORDER BY ...): spec tokens by name,
    # so OVER w references still feed the item's upstream lineage
    window_specs: dict[str, list[tuple[str, str]]] = field(default_factory=dict)


@dataclass
class _Query:
    """A query expression: CTE prologue + select (+ set-op branches)."""

    ctes: list[tuple[str, list[str], "_Query"]] = field(default_factory=list)
    select: _Select | None = None
    branches: list["_Select | _Query"] = field(default_factory=list)


class _ParseError(ValueError):
    pass


class _Parser:
    """Recursive-descent over code tokens ``[(kind, text)]``."""

    def __init__(self, toks: list[tuple[str, str]]):
        self.t = toks
        self.i = 0

    def _peek(self, off: int = 0) -> tuple[str, str] | None:
        j = self.i + off
        return self.t[j] if j < len(self.t) else None

    def _text(self, off: int = 0) -> str:
        p = self._peek(off)
        return p[1].lower() if p and p[0] == "word" else (p[1] if p else "")

    def _kw(self, *words: str) -> bool:
        p = self._peek()
        if p and p[0] == "word" and p[1].lower() in words:
            self.i += 1
            return True
        return False

    def _expect(self, text: str) -> None:
        p = self._peek()
        if p is None or p[1].lower() != text:
            raise _ParseError(f"expected {text!r} at token {self.i}, got {p}")
        self.i += 1

    def _ident(self) -> str | None:
        p = self._peek()
        if p and p[0] in ("word", "dq", "bq") and p[1].lower() not in _NOT_ALIAS:
            self.i += 1
            return p[1].strip('"`')
        return None

    def _qualified(self) -> str | None:
        name = self._ident()
        if name is None:
            return None
        parts = [name]
        while self._text() == "." :
            p2 = self._peek(1)
            if p2 and p2[0] in ("word", "dq", "bq"):
                parts.append(p2[1].strip('"`'))
                self.i += 2
            else:
                break
        return ".".join(parts)

    def _skip_parens(self) -> list[tuple[str, str]]:
        """Consume a balanced (...) group, returning the inner tokens."""
        self._expect("(")
        depth = 1
        out: list[tuple[str, str]] = []
        while self.i < len(self.t):
            k, t = self.t[self.i]
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
                if depth == 0:
                    self.i += 1
                    return out
            out.append((k, t))
            self.i += 1
        raise _ParseError("unbalanced parentheses")

    # -- grammar ------------------------------------------------------------

    def parse_query(self) -> _Query:
        q = _Query()
        if self._kw("with"):
            self._kw("recursive")
            while True:
                name = self._ident()
                if name is None:
                    raise _ParseError("expected CTE name")
                cols: list[str] = []
                if self._text() == "(":
                    inner = self._skip_parens()
                    cols = [t.strip('"`') for k, t in inner if k in ("word", "dq", "bq")]
                self._expect("as")
                self._expect("(")
                body = self.parse_query()
                self._expect(")")
                q.ctes.append((name, cols, body))
                if self._text() == ",":
                    self.i += 1
                    continue
                break
        q.select = self._parse_operand()
        while True:
            p = self._peek()
            if p and p[0] == "word" and p[1].lower() in ("union", "intersect", "except"):
                self.i += 1
                self._kw("all", "distinct")
                q.branches.append(self._parse_operand())
            else:
                break
        return q

    def _parse_operand(self) -> "_Select | _Query":
        if self._text() == "(":
            self._expect("(")
            sub = self.parse_query()
            self._expect(")")
            return sub
        return self._parse_select()

    def _parse_select(self) -> _Select:
        s = _Select()
        self._expect("select")
        self._kw("distinct") or self._kw("all")
        s.items = self._parse_select_items()
        if self._kw("from"):
            self._parse_from(s)
        # trailing clauses; where/group/having/qualify/on feed non-selected
        while self.i < len(self.t):
            p = self._peek()
            if p is None or p[1] == ")" or (p[0] == "word" and p[1].lower() in ("union", "intersect", "except")):
                break
            word = p[1].lower() if p[0] == "word" else ""
            if word in ("where", "having", "qualify"):
                self.i += 1
                s.cond_toks.append(self._clause_tokens())
            elif word == "group":
                self.i += 1
                self._kw("by")
                s.group_toks.append(self._clause_tokens())
            elif word == "window":
                # WINDOW w AS (spec) [, w2 AS (spec2)]* — keep each spec's
                # tokens so `OVER w` in the select list can pull the
                # spec's PARTITION BY / ORDER BY columns into lineage
                self.i += 1
                for part in _split_top_commas(self._clause_tokens()):
                    name = None
                    as_j = None
                    for j, (k, t) in enumerate(part):
                        if name is None and k in ("word", "dq", "bq"):
                            name = t.strip('"`').lower()
                        elif k == "word" and t.lower() == "as":
                            as_j = j
                            break
                    if name is None or as_j is None:
                        continue
                    spec = part[as_j + 1 :]
                    if spec and spec[0][1] == "(" and spec[-1][1] == ")":
                        spec = spec[1:-1]
                    s.window_specs[name] = spec
            elif word in ("order", "limit", "distribute", "sort", "cluster"):
                self.i += 1
                self._kw("by")
                self._clause_tokens()  # consumed, not lineage-bearing
            else:
                self.i += 1  # defensive: skip stray token
        return s

    def _clause_tokens(self) -> list[tuple[str, str]]:
        """Tokens until the next top-level clause keyword / ')' / set op."""
        out: list[tuple[str, str]] = []
        depth = 0
        stop = {"where", "group", "order", "having", "qualify", "window", "limit",
                "union", "intersect", "except", "distribute", "sort", "cluster"}
        while self.i < len(self.t):
            k, t = self.t[self.i]
            if t == "(":
                depth += 1
            elif t == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and k == "word" and t.lower() in stop:
                break
            out.append((k, t))
            self.i += 1
        return out

    def _parse_select_items(self) -> list[tuple[str | None, list[tuple[str, str]]]]:
        items = []
        cur: list[tuple[str, str]] = []
        depth = 0
        while self.i < len(self.t):
            k, t = self.t[self.i]
            low = t.lower() if k == "word" else ""
            if t == "(":
                depth += 1
            elif t == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and low in ("from", "where", "group", "order", "having",
                                        "limit", "union", "intersect", "except", "qualify", "window"):
                break
            elif depth == 0 and t == ",":
                items.append(self._finish_item(cur))
                cur = []
                self.i += 1
                continue
            cur.append((k, t))
            self.i += 1
        if cur:
            items.append(self._finish_item(cur))
        return items

    @staticmethod
    def _finish_item(toks: list[tuple[str, str]]) -> tuple[str | None, list[tuple[str, str]]]:
        """Split a select item into (alias, expression tokens)."""
        # explicit AS at top level
        depth = 0
        for j, (k, t) in enumerate(toks):
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
            elif depth == 0 and k == "word" and t.lower() == "as" and j + 1 < len(toks):
                ak, at = toks[j + 1]
                if ak in ("word", "dq", "bq"):
                    return at.strip('"`'), toks[:j]
        # implicit alias: trailing identifier not part of a qualified
        # chain AND not the right operand of a binary operator — in
        # `price + tax` the `tax` is an operand, not an alias (the
        # previous token must END an expression: identifier, literal,
        # `)`, or `*`-as-operand is excluded separately)
        if len(toks) >= 2:
            lk, lt = toks[-1]
            pk, pt = toks[-2]
            prev_ends_expr = (
                pk in ("word", "dq", "bq", "num", "str") and pt != "."
            ) or pt == ")"
            if (
                lk in ("word", "dq", "bq")
                and lt.lower() not in _EXPR_KEYWORDS
                and lt.lower() not in _TYPE_WORDS
                and pt != "*"
                and prev_ends_expr
                and (pk != "word" or pt.lower() not in _EXPR_KEYWORDS)
            ):
                return lt.strip('"`'), toks[:-1]
        return None, toks

    def _parse_lateral_view(self, s: _Select) -> None:
        """LATERAL VIEW [OUTER] fn(args) tableAlias [AS col [, col]*] —
        registered as an inline table (the generator columns have no
        physical upstream); the function arguments are enclosing-scope
        refs and feed the non-selected set (Spark SQL ref:
        select-lateral-view)."""
        self.i += 2  # LATERAL VIEW
        self._kw("outer")
        self._qualified()  # generator function name
        if self._text() == "(":
            s.cond_toks.append(self._skip_parens())
        alias = self._ident() or ""
        cols: list[str] = []
        if self._kw("as"):
            while True:
                c = self._ident()
                if c is None:
                    break
                cols.append(c)
                if self._text() == ",":
                    self.i += 1
                    continue
                break
        s.relations.append(_Rel(alias=alias, values_cols=cols))

    def _parse_from(self, s: _Select) -> None:
        s.relations.append(self._parse_relation())
        while True:
            p = self._peek()
            if p is None:
                break
            t = p[1].lower() if p[0] == "word" else p[1]
            if t == ",":
                self.i += 1
                s.relations.append(self._parse_relation())
                continue
            if p[0] == "word" and t == "lateral" and self._text(1) == "view":
                self._parse_lateral_view(s)
                continue
            if p[0] == "word" and t in _JOIN_KW:
                kinds: set[str] = set()
                while True:
                    p2 = self._peek()
                    if p2 and p2[0] == "word" and p2[1].lower() in _JOIN_KW - {"join"}:
                        kinds.add(p2[1].lower())
                        self.i += 1
                        continue
                    break
                if not self._kw("join"):
                    break
                rel = self._parse_relation()
                rel.cond_only = bool(kinds & {"semi", "anti"})
                s.relations.append(rel)
                if self._kw("on"):
                    s.on_toks.append(self._clause_tokens_until_join())
                elif self._kw("using"):
                    inner = self._skip_parens()
                    s.on_toks.append(inner)
                    s.using_cols |= {
                        t.strip('"`').lower()
                        for k, t in inner
                        if k in ("word", "dq", "bq")
                    }
                continue
            break

    def _clause_tokens_until_join(self) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        depth = 0
        stop = _CLAUSE_KW | _JOIN_KW
        while self.i < len(self.t):
            k, t = self.t[self.i]
            if t == "(":
                depth += 1
            elif t == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and k == "word" and t.lower() in stop and t.lower() != "on":
                break
            out.append((k, t))
            self.i += 1
        return out

    def _relation_suffix(self, rel: _Rel) -> _Rel:
        """Trailing TABLESAMPLE / PIVOT / UNPIVOT modifiers + alias.

        Spark grammar: relationPrimary sample? (PIVOT|UNPIVOT clause)?
        tableAlias — the alias comes AFTER the modifiers."""
        while self._kw("tablesample", "repeatable"):
            if self._text() == "(":
                self._skip_parens()
        p = self._peek()
        if p and p[0] == "word" and p[1].lower() in ("pivot", "unpivot"):
            kind = p[1].lower()
            self.i += 1
            # UNPIVOT [INCLUDE NULLS | EXCLUDE NULLS] ( ... ) — the NULLS
            # modifier changes row filtering, not lineage; consume it so
            # the '(' group is found (Spark sqlBaseParser unpivotClause)
            if kind == "unpivot" and self._kw("include", "exclude"):
                self._kw("nulls")
            inner = self._skip_parens() if self._text() == "(" else []
            rel.mod = (kind, inner)
            self._kw("as")
            a = self._ident()
            if a is not None:
                rel.alias = a
        elif not rel.alias:
            if self._kw("as"):
                rel.alias = self._ident() or ""
            else:
                a = self._ident()
                if a is not None:
                    rel.alias = a
        return rel

    def _parse_relation(self) -> _Rel:
        if self._text() == "(":
            self._expect("(")
            if self._kw("values"):
                # inline literal table: (VALUES (...), ...) AS v(c1, c2)
                depth = 1
                while self.i < len(self.t) and depth > 0:
                    t = self._text()
                    if t == "(":
                        depth += 1
                    elif t == ")":
                        depth -= 1
                    self.i += 1
                self._kw("as")
                alias = self._ident() or ""
                cols: list[str] = []
                if self._text() == "(":
                    inner = self._skip_parens()
                    cols = [t.strip('"`') for k, t in inner if k in ("word", "dq", "bq")]
                return _Rel(alias=alias, values_cols=cols)
            sub = self.parse_query()
            self._expect(")")
            self._kw("as")
            alias = self._ident() or ""
            return self._relation_suffix(_Rel(alias=alias, sub=sub))
        name = self._qualified()
        if name is None:
            raise _ParseError(f"expected table reference at token {self.i}")
        alias = ""
        if self._kw("as"):
            alias = self._ident() or ""
        else:
            a = self._ident()
            if a is not None:
                alias = a
        return self._relation_suffix(_Rel(name=name, alias=alias))


# -- reference extraction from expression tokens ------------------------------


def _mask_subqueries(toks: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Drop tokens inside nested ``(SELECT ...)`` / ``(VALUES ...)``
    regions: their references live in the SUBQUERY's scope, and resolving
    them in the enclosing scope either errors on the inner aliases
    (correlated EXISTS) or misattributes inner columns. A full nested
    resolve is sqlglot territory; masking keeps the outer lineage sound."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(toks)
    while i < n:
        k, t = toks[i]
        if (
            t == "("
            and i + 1 < n
            and toks[i + 1][0] == "word"
            and toks[i + 1][1].lower() in ("select", "values")
        ):
            depth = 1
            i += 1
            while i < n and depth > 0:
                if toks[i][1] == "(":
                    depth += 1
                elif toks[i][1] == ")":
                    depth -= 1
                i += 1
            continue
        out.append((k, t))
        i += 1
    return out


def _subquery_regions(toks: list[tuple[str, str]]) -> list[list[tuple[str, str]]]:
    """Token lists of each nested ``(SELECT ...)`` region (the regions
    that _mask_subqueries drops), for correlated-subquery resolution."""
    out: list[list[tuple[str, str]]] = []
    i, n = 0, len(toks)
    while i < n:
        if (
            toks[i][1] == "("
            and i + 1 < n
            and toks[i + 1][0] == "word"
            and toks[i + 1][1].lower() == "select"
        ):
            depth = 1
            i += 1
            region: list[tuple[str, str]] = []
            while i < n and depth > 0:
                if toks[i][1] == "(":
                    depth += 1
                elif toks[i][1] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                region.append(toks[i])
                i += 1
            out.append(region)
        i += 1
    return out


def _split_top_commas(toks: list[tuple[str, str]]) -> list[list[tuple[str, str]]]:
    parts: list[list[tuple[str, str]]] = [[]]
    depth = 0
    for k, t in toks:
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif t == "," and depth == 0:
            parts.append([])
            continue
        parts[-1].append((k, t))
    return [p for p in parts if p]


def _expr_refs(toks: list[tuple[str, str]]) -> tuple[list[tuple[str | None, str]], bool]:
    """Column references in an expression: [(qualifier|None, column)].

    Returns (refs, has_bare_star).  ``alias.*`` comes back as
    (alias, "*"); a lone ``*`` sets has_bare_star.
    """
    toks = _mask_subqueries(toks)
    refs: list[tuple[str | None, str]] = []
    star = False
    i = 0
    n = len(toks)
    while i < n:
        k, t = toks[i]
        if t == "*" and (i == 0 or toks[i - 1][1] != ".") and (i == 0 or toks[i - 1][0] not in ("word", "dq", "bq", "num") or toks[i - 1][1].lower() in ("select", "(", ",")):
            # multiplication vs wildcard: '*' directly after an operand is
            # multiplication; after nothing/'('/','/keyword it is a wildcard
            prev = toks[i - 1][1] if i > 0 else ""
            if prev in ("", "(", ",") or (toks[i - 1][0] == "word" and prev.lower() in _EXPR_KEYWORDS):
                star = True
            i += 1
            continue
        if k in ("word", "dq", "bq") and t.lower() not in _EXPR_KEYWORDS and t.lower() not in _TYPE_WORDS:
            # OVER w (named-window reference): `w` names a WINDOW-clause
            # spec, not a column — skip it
            if (
                i > 0
                and toks[i - 1][0] == "word"
                and toks[i - 1][1].lower() == "over"
                and not (i + 1 < n and toks[i + 1][1] == "(")
            ):
                i += 1
                continue
            # function call: identifier immediately followed by '('
            if i + 1 < n and toks[i + 1][1] == "(":
                i += 2
                # COUNT(*)-style aggregate star: consumed here so it is
                # neither a wildcard (which would expand the select item
                # to every source column) nor a column ref
                if i < n and toks[i][1] == "*":
                    i += 1
                continue
            parts = [t.strip('"`')]
            j = i + 1
            while j + 1 < n and toks[j][1] == "." and toks[j + 1][0] in ("word", "dq", "bq"):
                parts.append(toks[j + 1][1].strip('"`'))
                j += 2
            # alias.* wildcard
            if j + 1 < n and toks[j][1] == "." and toks[j + 1][1] == "*":
                refs.append((".".join(parts), "*"))
                i = j + 2
                continue
            qualifier = ".".join(parts[:-1]) if len(parts) > 1 else None
            refs.append((qualifier, parts[-1]))
            i = j
            continue
        i += 1
    return refs, star


def _expand_window_spec(
    name: str,
    specs: dict[str, list[tuple[str, str]]],
    seen: set[str] | None = None,
) -> list[tuple[str, str]]:
    """Tokens of a named WINDOW spec, with a leading base-window reference
    (``WINDOW w2 AS (w1 ORDER BY y)``) expanded recursively."""
    seen = set() if seen is None else seen
    if name in seen:
        return []
    seen.add(name)
    spec = list(specs.get(name, []))
    if spec and spec[0][0] in ("word", "dq", "bq"):
        base = spec[0][1].strip('"`').lower()
        if base in specs:
            spec = _expand_window_spec(base, specs, seen) + spec[1:]
    return spec


# -- scope resolution ---------------------------------------------------------


@dataclass
class _Output:
    """Resolved output of a query: ordered columns with leaf upstreams."""

    columns: list[tuple[str, set[tuple[str, str]]]] = field(default_factory=list)

    def find(self, name: str) -> set[tuple[str, str]] | None:
        low = name.lower()
        for n, ups in self.columns:
            if n.lower() == low:
                return ups
        return None


class _Source:
    """A resolved FROM-clause source."""

    def __init__(self, key: str, physical: str = "", output: _Output | None = None,
                 schema_cols: list[str] | None = None):
        self.key = key                  # alias or name used for qualification
        self.physical = physical        # physical table name ("" for derived)
        self.output = output            # derived/CTE output (None for physical)
        self.schema_cols = schema_cols  # known physical columns (from schema)
        self.cond_only = False          # SEMI/ANTI right side: not in select scope

    def resolve_col(self, col: str) -> set[tuple[str, str]]:
        if self.output is not None:
            found = self.output.find(col)
            return found if found is not None else set()
        return {(self.physical, col)}

    def has_col(self, col: str) -> bool | None:
        """True/False when knowable, None when unknown (physical, no schema)."""
        if self.output is not None:
            return self.output.find(col) is not None
        if self.schema_cols is not None:
            return col.lower() in (c.lower() for c in self.schema_cols)
        return None

    def all_columns(self) -> list[tuple[str, set[tuple[str, str]]]] | None:
        if self.output is not None:
            return list(self.output.columns)
        if self.schema_cols is not None:
            return [(c, {(self.physical, c)}) for c in self.schema_cols]
        return None


class _Resolver:
    def __init__(self, schema: dict | None):
        self.schema = {k.lower(): v for k, v in (schema or {}).items()}
        self.errors: list[str] = []
        self.non_selected: list[tuple[str, str, str]] = []  # (as_written, leaf_table, leaf_col)

    def resolve_query(self, q: _Query, env: dict[str, _Output], outer=None) -> _Output:
        env = dict(env)
        for name, declared_cols, body in q.ctes:
            out = self.resolve_query(body, env)
            if declared_cols:
                out = _Output(
                    [(declared_cols[i] if i < len(declared_cols) else n, ups)
                     for i, (n, ups) in enumerate(out.columns)]
                )
            env[name.lower()] = out
        first = self._resolve_operand(q.select, env, outer)
        for br in q.branches:
            other = self._resolve_operand(br, env, outer)
            # set ops combine positionally; names come from the first branch
            merged = []
            for i, (n, ups) in enumerate(first.columns):
                extra = other.columns[i][1] if i < len(other.columns) else set()
                merged.append((n, ups | extra))
            first = _Output(merged)
        return first

    def _resolve_operand(self, op: "_Select | _Query", env: dict[str, _Output], outer=None) -> _Output:
        if isinstance(op, _Query):
            return self.resolve_query(op, env, outer)
        return self._resolve_select(op, env, outer)

    @staticmethod
    def _apply_pivot_mod(src: _Source, mod: tuple[str, list[tuple[str, str]]]) -> _Source:
        """Transform a source's output through a PIVOT/UNPIVOT modifier.

        PIVOT (AGG(val) FOR key IN (v1 AS n1, ...)): output = base columns
        minus {val, key} plus one column per IN item, each upstream of the
        aggregated value column. UNPIVOT (val FOR name IN (c1, c2)):
        output = base minus the IN columns, plus the name column (metadata,
        no upstream) and the value column (upstream = union of IN columns).
        Unknown base columns -> pass the source through unchanged (same
        degradation as `*` without schema)."""
        kind, inner = mod
        base_cols = src.all_columns()
        if base_cols is None or not inner:
            return src
        words = [(i, t.strip('"`')) for i, (k, t) in enumerate(inner) if k in ("word", "dq", "bq")]
        low = [(i, w.lower()) for i, w in words]
        try:
            for_pos = next(j for j, (_i, w) in enumerate(low) if w == "for")
            in_pos = next(j for j, (_i, w) in enumerate(low) if w == "in" and j > for_pos)
        except StopIteration:
            return src
        if kind == "pivot":
            # value column(s): identifier refs inside the aggregate call(s)
            # (everything before the FOR keyword)
            refs, _ = _expr_refs(inner[: words[for_pos][0]])
            key_col = words[for_pos + 1][1] if for_pos + 1 < len(words) else ""
            val_ups: set[tuple[str, str]] = set()
            for q, c in refs:
                if c != "*":
                    val_ups |= src.resolve_col(c)
            drop = {c.lower() for _q, c in refs} | {key_col.lower()}
            kept = [(n, u) for n, u in base_cols if n.lower() not in drop]
            # IN list: each item `lit [AS name]` contributes one output col
            in_toks = inner[words[in_pos][0] + 1 :]
            if in_toks and in_toks[0][1] == "(" and in_toks[-1][1] == ")":
                in_toks = in_toks[1:-1]
            out_names: list[str] = []
            for part in _split_top_commas(in_toks):
                flat = [t for t in part if t[1] not in ("(", ")")]
                alias = None
                for j, (k, t) in enumerate(flat):
                    if k == "word" and t.lower() == "as" and j + 1 < len(flat):
                        alias = flat[j + 1][1].strip('"`')
                if alias is None and flat:
                    alias = flat[-1][1].strip('"`') if flat[-1][0] in ("word", "dq", "bq") else flat[-1][1]
                if alias:
                    out_names.append(alias)
            return _Source(
                key=src.key,
                output=_Output(kept + [(n, set(val_ups)) for n in out_names]),
            )
        # unpivot
        val_name = words[0][1]
        name_col = words[for_pos + 1][1] if for_pos + 1 < len(words) else ""
        # IN list: each top-level-comma item is `col [AS label]` (or
        # `(c1, c2) AS label` in the multi-value form) — only the
        # identifiers BEFORE the AS are source columns; the label names
        # a string value of the key column, not a column
        in_toks = inner[words[in_pos][0] + 1 :]
        if in_toks and in_toks[0][1] == "(" and in_toks[-1][1] == ")":
            in_toks = in_toks[1:-1]
        in_cols: list[str] = []
        for part in _split_top_commas(in_toks):
            for k, t in part:
                if k == "word" and t.lower() == "as":
                    break
                if k in ("word", "dq", "bq"):
                    in_cols.append(t.strip('"`'))
        ups: set[tuple[str, str]] = set()
        for c in in_cols:
            ups |= src.resolve_col(c)
        drop = {c.lower() for c in in_cols}
        kept = [(n, u) for n, u in base_cols if n.lower() not in drop]
        return _Source(
            key=src.key,
            output=_Output(kept + [(name_col, set()), (val_name, ups)]),
        )

    def _resolve_select(self, s: _Select, env: dict[str, _Output], outer=None) -> _Output:
        sources: list[_Source] = []
        for rel in s.relations:
            if rel.values_cols is not None:
                # literal rows: declared names, no upstream lineage
                sources.append(
                    _Source(
                        key=rel.alias,
                        output=_Output([(c, set()) for c in rel.values_cols]),
                    )
                )
            elif rel.sub is not None:
                out = self.resolve_query(rel.sub, env)
                sources.append(_Source(key=rel.alias, output=out))
            elif rel.name.lower() in env:
                sources.append(_Source(key=rel.alias or rel.name, output=env[rel.name.lower()]))
            else:
                cols = self.schema.get(rel.name.lower())
                sources.append(
                    _Source(
                        key=rel.alias or rel.name,
                        physical=rel.name,
                        schema_cols=list(cols) if cols else None,
                    )
                )
            if rel.mod is not None:
                sources[-1] = self._apply_pivot_mod(sources[-1], rel.mod)
            sources[-1].cond_only = rel.cond_only
        # a SEMI/ANTI join's right side is referencable only inside the
        # join condition; unqualified select-list refs and * expansion
        # resolve over the VISIBLE sources
        visible = [s2 for s2 in sources if not s2.cond_only] or sources

        def find_source(qualifier: str) -> _Source | None:
            low = qualifier.lower()
            for src in sources:
                if src.key.lower() == low:
                    return src
            # 2/3-part qualified column against an unaliased 2/3-part
            # table — match whole name parts only ('users' must not
            # match 'myusers')
            for src in sources:
                phys = (src.physical or "").lower()
                if phys and (phys == low or phys.endswith("." + low)):
                    return src
            return None

        def try_resolve(qualifier: str | None, col: str, scope=None) -> set[tuple[str, str]] | None:
            """Local-scope resolution; None when this scope cannot bind it.

            ``scope`` is the source list unqualified refs search: the
            VISIBLE sources for select-list items (semi/anti right sides
            excluded), ALL sources for join conditions — Spark scopes the
            semi-join right side INTO the ON clause, only out of the
            select list."""
            scope = visible if scope is None else scope
            if qualifier:
                src = find_source(qualifier)
                if src is None:
                    # struct-field path: u.profile.email — the longest
                    # prefix that names a source wins, and the NEXT part
                    # is the column (the rest are struct fields), like
                    # sqlglot's qualify resolution
                    parts = qualifier.split(".")
                    for cut in range(len(parts) - 1, 0, -1):
                        s2 = find_source(".".join(parts[:cut]))
                        if s2 is not None:
                            return s2.resolve_col(parts[cut])
                    # unqualified struct path: profile.email where
                    # 'profile' is a known column of exactly one source
                    owners = [s2 for s2 in scope if s2.has_col(parts[0])]
                    if len(owners) == 1:
                        return owners[0].resolve_col(parts[0])
                    return None
                return src.resolve_col(col)
            if len(scope) == 1:
                return scope[0].resolve_col(col)
            owners = [s2 for s2 in scope if s2.has_col(col)]
            if len(owners) == 1:
                return owners[0].resolve_col(col)
            unknowns = [s2 for s2 in scope if s2.has_col(col) is None]
            if len(owners) == 0 and len(unknowns) == 1:
                return unknowns[0].resolve_col(col)
            if len(owners) > 1:
                # a JOIN ... USING column genuinely lives in both sides:
                # merge, don't report ambiguity (compare sqlglot qualify)
                merged = set().union(*(o.resolve_col(col) for o in owners))
                if col.lower() in s.using_cols:
                    return merged
                self.errors.append(f"ambiguous column {col!r}")
                return merged
            return None

        def resolve_ref(qualifier: str | None, col: str, scope=None) -> set[tuple[str, str]]:
            got = try_resolve(qualifier, col, scope)
            if got is not None:
                return got
            if outer is not None:
                # correlated subquery: fall back to the enclosing scope
                got = outer(qualifier, col)
                if got is not None:
                    return got
            if qualifier:
                self.errors.append(f"unknown table or alias {qualifier!r}")
            return {("", col)}

        def outer_chain(qualifier: str | None, col: str):
            got = try_resolve(qualifier, col)
            if got is None and outer is not None:
                return outer(qualifier, col)
            return got

        def expand_all_sources() -> list[tuple[str, set[tuple[str, str]]]]:
            """`*` over every source; JOIN..USING columns appear once
            with merged upstreams (SQL semantics: USING coalesces)."""
            cols_out: list[tuple[str, set[tuple[str, str]]]] = []
            seen_using: dict[str, int] = {}
            for src in visible:
                cols = src.all_columns()
                if cols is None:
                    self.errors.append(
                        f"cannot expand * on {src.physical or src.key!r} without schema"
                    )
                    cols_out.append(("*", {(src.physical, "*")}))
                    continue
                for n, ups in cols:
                    low = n.lower()
                    if low in s.using_cols:
                        if low in seen_using:
                            prev_n, prev_ups = cols_out[seen_using[low]]
                            cols_out[seen_using[low]] = (prev_n, prev_ups | ups)
                            continue
                        seen_using[low] = len(cols_out)
                    cols_out.append((n, ups))
            return cols_out

        out_cols: list[tuple[str, set[tuple[str, str]]]] = []
        for alias, toks in s.items:
            refs, bare_star = _expr_refs(toks)
            # correlated scalar subqueries in the select list resolve in a
            # child scope that falls back to THIS scope (compare.go has no
            # analog; sqlglot lineage resolves them — main.py:301-344)
            sub_ups: set[tuple[str, str]] = set()
            for sub in _subquery_regions(toks):
                try:
                    sq = _Parser(sub).parse_query()
                except _ParseError:
                    continue
                sub_out = self.resolve_query(sq, env, outer_chain)
                for _n, ups in sub_out.columns:
                    sub_ups |= ups
            if bare_star and not refs:
                out_cols.extend(expand_all_sources())
                continue
            star_refs = [r for r in refs if r[1] == "*"]
            if star_refs and len(refs) == len(star_refs):
                for qualifier, _ in star_refs:
                    src = find_source(qualifier or "")
                    if src is None:
                        self.errors.append(f"unknown table or alias {qualifier!r}")
                        continue
                    cols = src.all_columns()
                    if cols is None:
                        self.errors.append(
                            f"cannot expand {qualifier}.* without schema"
                        )
                        out_cols.append(("*", {(src.physical, "*")}))
                    else:
                        out_cols.extend(cols)
                continue
            ups: set[tuple[str, str]] = set(sub_ups)
            for qualifier, col in refs:
                ups |= resolve_ref(qualifier, col)
            # named-window reference: `... OVER w` pulls the WINDOW
            # clause spec's PARTITION BY / ORDER BY columns into this
            # item's upstream, same as the inline OVER (...) form
            if s.window_specs:
                for j, (k, t) in enumerate(toks):
                    if (
                        k in ("word", "dq", "bq")
                        and j > 0
                        and toks[j - 1][0] == "word"
                        and toks[j - 1][1].lower() == "over"
                        and t.strip('"`').lower() in s.window_specs
                    ):
                        spec = _expand_window_spec(t.strip('"`').lower(), s.window_specs)
                        srefs, _ = _expr_refs(spec)
                        for wq, wc in srefs:
                            if wc != "*":
                                ups |= resolve_ref(wq, wc)
            if alias:
                name = alias
            elif len(refs) == 1 and not star_refs:
                name = refs[0][1]
            else:
                name = "".join(t for _k, t in toks).strip()
            out_cols.append((name, ups))

        # non-selected: JOIN ON|USING resolve over ALL sources (a
        # semi/anti right side is in scope for its own ON condition);
        # WHERE / HAVING / QUALIFY / lateral-view args resolve over the
        # VISIBLE post-join scope only
        for scope, tok_lists in ((sources, s.on_toks), (None, s.cond_toks)):
            for ctoks in tok_lists:
                refs, _ = _expr_refs(ctoks)
                for qualifier, col in refs:
                    if col == "*":
                        continue
                    for table, leaf_col in resolve_ref(qualifier, col, scope=scope):
                        if table:
                            self.non_selected.append((col, table, leaf_col))
        # GROUP BY: an ordinal references a select item — its SOURCE
        # columns are the non-selected refs (GROUP BY 1 over
        # `t.location_code AS location` records location_code)
        for gtoks in s.group_toks:
            for part in _split_top_commas(gtoks):
                code = [p for p in part if p[0] not in ("ws",)]
                if len(code) == 1 and code[0][0] == "num":
                    idx = int(float(code[0][1])) - 1
                    if 0 <= idx < len(s.items):
                        irefs, _ = _expr_refs(s.items[idx][1])
                        for qualifier, col in irefs:
                            if col == "*":
                                continue
                            for table, leaf_col in resolve_ref(qualifier, col):
                                if table:
                                    self.non_selected.append((col, table, leaf_col))
                    continue
                refs, _ = _expr_refs(part)
                for qualifier, col in refs:
                    if col == "*":
                        continue
                    for table, leaf_col in resolve_ref(qualifier, col):
                        if table:
                            self.non_selected.append((col, table, leaf_col))
        return _Output(out_cols)


# -- public api ---------------------------------------------------------------


def get_column_lineage(query: str, schema: dict | None = None) -> dict:
    """Reference-shaped column lineage for one SELECT statement.

    ``schema``: optional ``{table: {column: type}}`` (or ``{table:
    [columns]}``) used to expand ``*`` over physical tables and to
    disambiguate unqualified columns in multi-table scopes — the same
    role the schema plays for sqlglot's qualify in the reference
    (pythonsrc/parser/main.py:301-344).
    """
    stmts = split_statements(query)
    if not stmts:
        return {"columns": [], "non_selected_columns": [], "errors": ["empty query"]}
    toks = _tokens(stmts[-1])
    code = [(toks[i][0], toks[i][1]) for i in _code_tokens(toks)]
    parser = _Parser(code)
    try:
        q = parser.parse_query()
    except _ParseError as e:
        return {"columns": [], "non_selected_columns": [], "errors": [f"Parse error: {e}"]}
    norm_schema = {
        t: (list(cols.keys()) if isinstance(cols, dict) else list(cols))
        for t, cols in (schema or {}).items()
    }
    resolver = _Resolver(norm_schema)
    out = resolver.resolve_query(q, {})

    columns = []
    seen_names: set[str] = set()
    for name, ups in out.columns:
        # duplicate output names keep the FIRST occurrence, matching the
        # reference's sqlglot lineage (main_test.py dashboard.report:
        # t1.col1 and t4.col1 both emit col1; table1 wins)
        if name.lower() in seen_names:
            continue
        seen_names.add(name.lower())
        upstream = [{"column": c, "table": t} for t, c in sorted(ups, key=lambda x: (x[1].lower(), x[0]))]
        columns.append({"name": name, "upstream": upstream, "type": ""})
    columns.sort(key=lambda c: c["name"].lower())

    ns: dict[str, list[dict]] = {}
    seen: set[tuple[str, str, str]] = set()
    for as_written, table, col in resolver.non_selected:
        if (as_written, table, col) in seen:
            continue
        seen.add((as_written, table, col))
        ns.setdefault(as_written, []).append({"column": col, "table": table})
    non_selected = [
        {"name": n, "upstream": sorted(u, key=lambda x: (x["column"].lower(), x["table"]))}
        for n, u in sorted(ns.items())
    ]
    return {"columns": columns, "non_selected_columns": non_selected, "errors": resolver.errors}
