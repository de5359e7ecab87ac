"""Grammar-based SQL generator for differential-fuzzing the hand-rolled
parser services (`parser/sqlutil.py`, `parser/lineage.py`) against
Spark's own parser/analyzer.

The generator is deterministic per seed and tracks ground truth while it
builds the query: which PHYSICAL tables it referenced, which top-level
CTE names it declared, and which leaf names (physical tables + inline
VALUES aliases) lineage may ground to. The property tests assert the
mini-parser's answers against this ground truth and assert that every
rewrite output still analyzes under ``spark.sql``.

Reference bar: the sqlglot behaviors in
/root/reference/pythonsrc/parser/main.py:278-460 (used tables, renames,
lineage grounding) — this suite is the sandbox substitute for sqlglot's
own test corpus.
"""

from __future__ import annotations

import random

# Physical catalog. All columns are BIGINT so every generated
# expression/type combination analyzes; two tables live in a real
# database (dotted names exercise qualified-ref handling).
CATALOG: dict[str, list[str]] = {
    "fz_orders": ["o_id", "o_cust", "o_amt", "o_ts", "o_flag"],
    "fz_cust": ["c_id", "c_name", "c_region"],
    "fz_events": ["e_id", "e_user", "e_kind", "e_ts"],
    "fzdb.fz_items": ["i_id", "i_order", "i_price"],
    "fzdb.fz_dim": ["d_id", "d_label"],
}

_JOIN_KINDS = ["JOIN", "INNER JOIN", "LEFT JOIN", "LEFT OUTER JOIN", "RIGHT JOIN", "FULL OUTER JOIN"]
_AGGS = ["SUM", "MIN", "MAX", "COUNT", "AVG"]
_SET_OPS = ["UNION ALL", "UNION", "INTERSECT", "EXCEPT"]


class _Rel:
    """One FROM-clause relation in scope: alias + output columns."""

    __slots__ = ("alias", "cols")

    def __init__(self, alias: str, cols: list[str]):
        self.alias = alias
        self.cols = cols


class Gen:
    def __init__(self, seed: int, spark_mode: bool = True):
        self.r = random.Random(seed)
        self.spark_mode = spark_mode  # restrict to Spark-analyzable SQL
        self.used: set[str] = set()  # physical tables referenced
        self.top_ctes: list[tuple[str, list[str]]] = []  # (name, cols)
        self.leaves: set[str] = set()  # physical + VALUES aliases
        self.has_now = False
        self.n = 0

    # -- naming --------------------------------------------------------
    def fresh(self, pfx: str) -> str:
        self.n += 1
        return f"{pfx}{self.n}"

    def quote_ident(self, name: str) -> str:
        """Sometimes backtick-quote an identifier (Spark treats double
        quotes as string literals, so spark_mode only uses backticks)."""
        if self.r.random() < 0.15:
            if self.spark_mode or self.r.random() < 0.5:
                return f"`{name}`"
            return f'"{name}"'
        return name

    def quote_table(self, name: str) -> str:
        if "." in name:
            if self.r.random() < 0.15:
                db, t = name.split(".", 1)
                return f"`{db}`.`{t}`"
            return name
        return self.quote_ident(name)

    # -- expressions ---------------------------------------------------
    def col_ref(self, scope: list[_Rel]) -> str:
        rel = self.r.choice(scope)
        col = self.r.choice(rel.cols)
        if len(scope) > 1 or self.r.random() < 0.4:
            return f"{rel.alias}.{col}"
        return col

    def scalar(self, scope: list[_Rel], depth: int) -> str:
        roll = self.r.random()
        if roll < 0.45 or not scope:
            return self.col_ref(scope) if scope else str(self.r.randint(0, 99))
        if roll < 0.6:
            return str(self.r.randint(0, 999))
        if roll < 0.7:
            a, b = self.scalar(scope, 0), self.scalar(scope, 0)
            op = self.r.choice(["+", "-", "*"])
            return f"({a} {op} {b})"
        if roll < 0.78:
            fn = self.r.choice(["ABS", "COALESCE", "GREATEST"])
            if fn == "ABS":
                return f"ABS({self.scalar(scope, 0)})"
            return f"{fn}({self.scalar(scope, 0)}, {self.scalar(scope, 0)})"
        if roll < 0.86:
            return (
                f"CASE WHEN {self.boolean(scope, 0)} THEN {self.scalar(scope, 0)} "
                f"ELSE {self.scalar(scope, 0)} END"
            )
        if roll < 0.92:
            return f"CAST({self.scalar(scope, 0)} AS BIGINT)"
        if depth > 0:
            # scalar subquery over a physical table; sometimes CORRELATED
            # to the enclosing scope (exercises outer-scope fallback)
            t = self.r.choice(list(CATALOG))
            c = self.r.choice(CATALOG[t])
            self.used.add(t)
            self.leaves.add(t)
            if scope and self.r.random() < 0.4:
                x = self.fresh("x")
                return (
                    f"(SELECT MAX({x}.{c}) FROM {self.quote_table(t)} {x} "
                    f"WHERE {x}.{c} = {self.col_ref(scope)})"
                )
            return f"(SELECT MAX({c}) FROM {self.quote_table(t)})"
        return self.col_ref(scope) if scope else "1"

    def boolean(self, scope: list[_Rel], depth: int) -> str:
        roll = self.r.random()
        if roll < 0.5 or depth <= 0:
            op = self.r.choice(["=", "<", ">", "<=", ">=", "<>"])
            return f"{self.scalar(scope, 0)} {op} {self.scalar(scope, 0)}"
        if roll < 0.62:
            return f"({self.boolean(scope, depth - 1)} AND {self.boolean(scope, depth - 1)})"
        if roll < 0.7:
            return f"({self.boolean(scope, depth - 1)} OR NOT {self.boolean(scope, depth - 1)})"
        if roll < 0.78:
            return f"{self.scalar(scope, 0)} BETWEEN 0 AND {self.r.randint(100, 999)}"
        if roll < 0.84 and scope:
            # correlated EXISTS
            t = self.r.choice(list(CATALOG))
            a = self.fresh("x")
            c = self.r.choice(CATALOG[t])
            self.used.add(t)
            self.leaves.add(t)
            neg = "NOT " if self.r.random() < 0.3 else ""
            return (
                f"{neg}EXISTS (SELECT 1 FROM {self.quote_table(t)} {a} "
                f"WHERE {a}.{c} = {self.col_ref(scope)})"
            )
        if roll < 0.9 and scope:
            t = self.r.choice(list(CATALOG))
            c = self.r.choice(CATALOG[t])
            self.used.add(t)
            self.leaves.add(t)
            return f"{self.col_ref(scope)} IN (SELECT {c} FROM {self.quote_table(t)})"
        if roll < 0.95:
            # timestamp predicate (freeze_time target); types self-contained
            self.has_now = True
            fn = self.r.choice(["CURRENT_TIMESTAMP", "now()", "current_timestamp()"])
            return f"{fn} > CAST('2020-01-01 00:00:00' AS TIMESTAMP)"
        self.has_now = True
        return "CURRENT_DATE >= CAST('2019-06-01' AS DATE)"

    # -- relations -----------------------------------------------------
    def relation(self, depth: int, ctes: list[tuple[str, list[str]]]) -> tuple[str, _Rel]:
        """-> (sql_fragment, rel)"""
        roll = self.r.random()
        alias = self.fresh("a")
        if roll < 0.5 or depth <= 0:
            if ctes and self.r.random() < 0.35:
                name, cols = self.r.choice(ctes)
                sep = " AS " if self.r.random() < 0.3 else " "
                return f"{name}{sep}{alias}", _Rel(alias, cols)
            t = self.r.choice(list(CATALOG))
            self.used.add(t)
            self.leaves.add(t)
            if self.r.random() < 0.1:
                # TABLESAMPLE sits between the name and the alias
                # (Spark grammar: relationPrimary sample? tableAlias)
                sample = self.r.choice(["90 PERCENT", "50 PERCENT", "5 ROWS"])
                return (
                    f"{self.quote_table(t)} TABLESAMPLE ({sample}) {alias}",
                    _Rel(alias, CATALOG[t]),
                )
            sep = " AS " if self.r.random() < 0.3 else " "
            return f"{self.quote_table(t)}{sep}{alias}", _Rel(alias, CATALOG[t])
        if roll < 0.56:
            # PIVOT: wrapped in a subquery because Spark's PIVOT relation
            # takes no trailing alias; output = other cols + value cols
            t = self.r.choice([t for t, cs in CATALOG.items() if len(cs) >= 3])
            self.used.add(t)
            self.leaves.add(t)
            cols = list(CATALOG[t])
            agg_col = cols[self.r.randrange(len(cols))]
            rest = [c for c in cols if c != agg_col]
            for_col = rest[self.r.randrange(len(rest))]
            others = [c for c in rest if c != for_col]
            p0, p1 = self.fresh("pv"), self.fresh("pv")
            frag = (
                f"(SELECT * FROM {self.quote_table(t)} PIVOT "
                f"({self.r.choice(_AGGS[:3])}({agg_col}) FOR {for_col} "
                f"IN (0 AS {p0}, 1 AS {p1}))) {alias}"
            )
            return frag, _Rel(alias, others + [p0, p1])
        if roll < 0.62:
            # UNPIVOT: wrapped in a subquery — as a bare join operand the
            # UNPIVOT suffix would bind to the WHOLE preceding join chain
            # in Spark's grammar (relation: relationPrimary (joinRelation
            # | pivot | unpivot)*), hiding earlier aliases. The STRING
            # name column is excluded from the exposed scope.
            t = self.r.choice([t for t, cs in CATALOG.items() if len(cs) >= 3])
            self.used.add(t)
            self.leaves.add(t)
            cols = list(CATALOG[t])
            n_in = self.r.choice([1, 2])
            in_cols = self.r.sample(cols, n_in)
            others = [c for c in cols if c not in in_cols]
            uval, uname = self.fresh("uv"), self.fresh("un")
            inner_alias = self.fresh("u")
            frag = (
                f"(SELECT {', '.join(others + [uval])} FROM {self.quote_table(t)} "
                f"UNPIVOT ({uval} FOR {uname} IN ({', '.join(in_cols)})) "
                f"{inner_alias}) {alias}"
            )
            return frag, _Rel(alias, others + [uval])
        if roll < 0.85:
            sub_sql, sub_cols = self.select(depth - 1, ctes)
            return f"({sub_sql}) AS {alias}", _Rel(alias, sub_cols)
        if roll < 0.93:
            # nested WITH inside a subquery (NOT a top-level CTE)
            sub_sql, sub_cols = self.query_body(depth - 1, ctes, allow_with=True)
            return f"({sub_sql}) {alias}", _Rel(alias, sub_cols)
        # inline VALUES table
        ncols = self.r.randint(1, 3)
        cols = [self.fresh("v") for _ in range(ncols)]
        rows = ", ".join(
            "(" + ", ".join(str(self.r.randint(0, 9)) for _ in range(ncols)) + ")"
            for _ in range(self.r.randint(1, 3))
        )
        self.leaves.add(alias)
        return f"(VALUES {rows}) AS {alias}({', '.join(cols)})", _Rel(alias, cols)

    # -- SELECT --------------------------------------------------------
    def select(
        self,
        depth: int,
        ctes: list[tuple[str, list[str]]],
        arity: int | None = None,
        allow_star: bool = True,
    ) -> tuple[str, list[str]]:
        """One SELECT ... FROM ... statement. -> (sql, out_cols).

        ``arity``: force this many plainly-aliased output columns (for
        set-operation branches).
        """
        scope: list[_Rel] = []
        frags: list[str] = []
        n_rel = 1 if depth <= 0 else self.r.choice([1, 1, 2, 2, 3])
        comma_style = self.r.random() < 0.2
        using_join = depth > 0 and not comma_style and self.r.random() < 0.12
        if using_join:
            # self-join USING(col): the shared column resolves to BOTH
            # sides (exercises the using_cols merge path in lineage)
            t = self.r.choice(list(CATALOG))
            self.used.add(t)
            self.leaves.add(t)
            a1, a2 = self.fresh("a"), self.fresh("a")
            col = self.r.choice(CATALOG[t])
            frags = [
                f"{self.quote_table(t)} {a1}",
                f" JOIN {self.quote_table(t)} {a2} USING ({col})",
            ]
            scope = [_Rel(a1, CATALOG[t]), _Rel(a2, CATALOG[t])]
            n_rel = 2
        else:
            f0, r0 = self.relation(depth, ctes)
            scope.append(r0)
            frags.append(f0)
            for _ in range(n_rel - 1):
                f, rel = self.relation(depth - 1, ctes)
                if comma_style:
                    frags.append(f", {f}")
                else:
                    kind = self.r.choice(
                        _JOIN_KINDS
                        + ["CROSS JOIN", "LEFT SEMI JOIN", "LEFT ANTI JOIN"]
                    )
                    if kind == "CROSS JOIN":
                        frags.append(f" CROSS JOIN {f}")
                    else:
                        cond = (
                            f"{scope[-1].alias}.{self.r.choice(scope[-1].cols)}"
                            f" = {rel.alias}.{self.r.choice(rel.cols)}"
                        )
                        frags.append(f" {kind} {f} ON {cond}")
                        if kind in ("LEFT SEMI JOIN", "LEFT ANTI JOIN"):
                            # semi/anti joins filter the left side: the
                            # right side's columns are NOT in scope after
                            continue
                scope.append(rel)
        lateral = ""
        if self.spark_mode and n_rel == 1 and self.r.random() < 0.1:
            lv = self.fresh("lv")
            lateral = f" LATERAL VIEW explode(sequence(1, 3)) {lv} AS {lv}_n"
            scope.append(_Rel(lv, [f"{lv}_n"]))
        from_clause = "FROM " + "".join(frags) + lateral

        where = ""
        if self.r.random() < 0.6:
            where = f" WHERE {self.boolean(scope, depth)}"

        group_by = self.r.random() < 0.3
        items: list[str] = []
        out_cols: list[str] = []
        windows: list[tuple[str, str]] = []  # named WINDOW clause specs
        if arity is not None:
            for _ in range(arity):
                name = self.fresh("out")
                items.append(f"{self.scalar(scope, 0)} AS {name}")
                out_cols.append(name)
            group_by = False
        elif group_by:
            n_keys = self.r.randint(1, 2)
            keys = []
            for _ in range(n_keys):
                rel = self.r.choice(scope)
                col = self.r.choice(rel.cols)
                keys.append(f"{rel.alias}.{col}" if len(scope) > 1 else col)
            for k in keys:
                name = self.fresh("out")
                items.append(f"{k} AS {name}")
                out_cols.append(name)
            for _ in range(self.r.randint(1, 2)):
                agg = self.r.choice(_AGGS)
                arg = "*" if agg == "COUNT" and self.r.random() < 0.5 else self.scalar(scope, 0)
                name = self.fresh("out")
                items.append(f"{agg}({arg}) AS {name}")
                out_cols.append(name)
            having = ""
            if self.r.random() < 0.4:
                having = f" HAVING {self.r.choice(_AGGS[:3])}({self.scalar(scope, 0)}) > 0"
            style = self.r.random()
            # Spark's Expand planning for CUBE/ROLLUP/GROUPING SETS
            # mis-resolves when ANY two columns in scope share a name
            # (self-join a1.d_id / a2.d_id): the Expand projection
            # dedupes by name and drops one side's raw attribute, so
            # aggregates over it fail with MISSING_ATTRIBUTES. Fall
            # back to a plain GROUP BY whenever scope has name dupes.
            all_cols = [c for rel in scope for c in rel.cols]
            if len(set(all_cols)) < len(all_cols) and style >= 0.22:
                style = 1.0
            if style < 0.22:
                # GROUP BY ordinals (resolve through the select list)
                group_by = ", ".join(str(i + 1) for i in range(n_keys))
            elif style < 0.32:
                group_by = f"CUBE ({', '.join(keys)})"
            elif style < 0.42:
                group_by = f"ROLLUP ({', '.join(keys)})"
            elif style < 0.52:
                # GROUPING SETS: prefix subsets of the keys + grand total
                sets = ["(" + ", ".join(keys[: i + 1]) + ")" for i in range(n_keys)]
                if self.r.random() < 0.5:
                    sets.append("()")
                group_by = f"GROUPING SETS ({', '.join(sets)})"
            else:
                group_by = ", ".join(keys)
            sql = (
                f"SELECT {', '.join(items)} {from_clause}{where} "
                f"GROUP BY {group_by}{having}"
            )
            return sql, out_cols
        else:
            if allow_star and self.r.random() < 0.1:
                rel = self.r.choice(scope)
                if self.r.random() < 0.5 and len(scope) == 1:
                    items.append("*")
                else:
                    items.append(f"{rel.alias}.*")
                out_cols.extend(rel.cols)
            for _ in range(self.r.randint(1, 3)):
                roll = self.r.random()
                if roll < 0.25:
                    # plain column ref, no alias (output name = column)
                    rel = self.r.choice(scope)
                    col = self.r.choice(rel.cols)
                    if col in out_cols:
                        continue
                    ref = f"{rel.alias}.{col}" if len(scope) > 1 or self.r.random() < 0.5 else col
                    items.append(ref)
                    out_cols.append(col)
                elif roll < 0.35 and self.r.random() < 0.7:
                    # window function
                    name = self.fresh("out")
                    wfn = self.r.choice(
                        ["ROW_NUMBER()", "RANK()", f"SUM({self.scalar(scope, 0)})"]
                    )
                    part = self.col_ref(scope)
                    order = self.col_ref(scope)
                    frame = ""
                    if wfn.startswith("SUM") and self.r.random() < 0.4:
                        frame = " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
                    spec = f"PARTITION BY {part} ORDER BY {order}{frame}"
                    if self.r.random() < 0.35:
                        # named WINDOW clause: OVER w ... WINDOW w AS (spec)
                        wname = self.fresh("w")
                        windows.append((wname, spec))
                        items.append(f"{wfn} OVER {wname} AS {name}")
                    else:
                        items.append(f"{wfn} OVER ({spec}) AS {name}")
                    out_cols.append(name)
                else:
                    name = self.fresh("out")
                    bare = self.r.random() < 0.2
                    q = self.quote_ident(name)
                    items.append(f"{self.scalar(scope, depth)}{' ' if bare else ' AS '}{q}")
                    out_cols.append(name)
        window_clause = ""
        if windows:
            window_clause = " WINDOW " + ", ".join(
                f"{n} AS ({spec})" for n, spec in windows
            )
        qualify = ""
        if not self.spark_mode and not windows and self.r.random() < 0.12:
            # QUALIFY is DuckDB/BigQuery/Snowflake surface — Spark has no
            # QUALIFY clause, so text-mode seeds only
            qualify = (
                f" QUALIFY ROW_NUMBER() OVER (PARTITION BY {self.col_ref(scope)} "
                f"ORDER BY {self.col_ref(scope)}) = 1"
            )
        distinct = "DISTINCT " if self.r.random() < 0.1 else ""
        sql = f"SELECT {distinct}{', '.join(items)} {from_clause}{where}{window_clause}{qualify}"
        return sql, out_cols

    # -- full query ----------------------------------------------------
    def query_body(
        self, depth: int, ctes: list[tuple[str, list[str]]], allow_with: bool = False
    ) -> tuple[str, list[str]]:
        """SELECT or set-op chain, optionally with its own (nested) WITH."""
        prefix = ""
        local_ctes = list(ctes)
        if allow_with and depth > 0 and self.r.random() < 0.5:
            name = self.fresh("icte")
            body, cols = self.select(depth - 1, local_ctes, allow_star=False)
            prefix = f"WITH {name} AS ({body}) "
            local_ctes.append((name, cols))
        if depth > 0 and self.r.random() < 0.25:
            arity = self.r.randint(1, 3)
            left, cols = self.select(depth - 1, local_ctes, arity=arity)
            op = self.r.choice(_SET_OPS)
            right, _ = self.select(depth - 1, local_ctes, arity=arity)
            return f"{prefix}{left} {op} {right}", cols
        sql, cols = self.select(depth, local_ctes, allow_star=not allow_with)
        return prefix + sql, cols

    def query(self, depth: int = 2) -> tuple[str, list[str]]:
        """Top-level statement: [WITH ...] body [ORDER BY] [LIMIT]."""
        ctes: list[tuple[str, list[str]]] = []
        with_part = ""
        if self.r.random() < 0.55:
            parts = []
            for _ in range(self.r.randint(1, 3)):
                name = self.fresh("cte")
                body, cols = self.query_body(depth - 1, ctes)
                if self.r.random() < 0.2:
                    # explicit column list renames the outputs
                    renamed = [self.fresh("r") for _ in cols]
                    parts.append(f"{name}({', '.join(renamed)}) AS ({body})")
                    cols = renamed
                else:
                    parts.append(f"{name} AS ({body})")
                ctes.append((name, cols))
                self.top_ctes.append((name, cols))
            with_part = "WITH " + ", ".join(parts) + " "
        body, cols = self.query_body(depth, ctes)
        tail = ""
        if cols and self.r.random() < 0.35:
            tail += f" ORDER BY {self.r.choice(cols)}"
            if self.r.random() < 0.3:
                tail += " DESC"
            if self.r.random() < 0.2:
                tail += " NULLS LAST"
        if self.r.random() < 0.25:
            tail += f" LIMIT {self.r.randint(1, 50)}"
        return with_part + body + tail, cols


def generate(seed: int, spark_mode: bool = True, depth: int = 2):
    """-> (sql, Gen) with ground-truth metadata populated."""
    g = Gen(seed, spark_mode=spark_mode)
    sql, cols = g.query(depth)
    g.out_cols = cols
    return sql, g
