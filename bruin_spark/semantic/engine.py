"""Semantic query compiler: Query -> one ANSI SELECT string.

Behavioral parity with the reference compiler
(semantic-engine/engine.go:251-283 GenerateSQL; windowSQL 526-566;
applyMetricFilter 605-633; buildWhereHaving 662-748; filterToSQL 790-849;
generateWrapped 426-493), re-implemented from scratch in Python. The
emitted SQL is deliberately dialect-neutral — Spark SQL and DuckDB both
execute it unchanged, which is exactly how the correctness oracle works.

Compilation shapes:

- simple: ``SELECT dims..., metrics... FROM t [JOIN ...] WHERE ...
  GROUP BY 1..n HAVING ... ORDER BY ... LIMIT n``
- wrapped (any window metric present): the plain aggregates compile into
  an inner grouped subquery ``base``; window/derived metrics are applied
  in the outer SELECT over ``base`` columns.

Metric kinds:
- plain: an aggregate expression, optional ``filter`` rewritten to
  ``AGG(CASE WHEN f THEN arg END)`` (DISTINCT and * handled).
- derived: expression over ``{metric_or_dim}`` refs, expanded
  recursively; a ref appearing as a divisor is wrapped in NULLIF(...,0).
- window: running_total | lag | lead | rank | percent_of_total over the
  grouped base rows.
"""

from __future__ import annotations

import re

from bruin_spark.semantic.model import (
    Dimension,
    DimensionRef,
    Filter,
    Metric,
    Model,
    Query,
    SortSpec,
)

_REF = re.compile(r"\{([A-Za-z_][A-Za-z0-9_.]*)\}")
_AGG_FNS = re.compile(
    r"\b(sum|count|avg|min|max|stddev|stddev_pop|stddev_samp|var_pop|var_samp|"
    r"approx_count_distinct|median|percentile_cont)\s*\(",
    re.IGNORECASE,
)
_OPERATOR = re.compile(r"[+\-*/]")


class SemanticError(ValueError):
    pass


def _fmt_value(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if v is None:
        return "NULL"
    return f"{v:g}" if isinstance(v, float) else str(v)


def _fmt_list(v) -> str:
    if not isinstance(v, (list, tuple)):
        v = [v]
    return ", ".join(_fmt_value(x) for x in v)


class SemanticEngine:
    """Compiles Queries against a primary model plus joinable models."""

    def __init__(self, model: Model, others: list[Model] | None = None):
        self.model = model
        self.models = {model.name: model}
        for m in others or []:
            self.models[m.name] = m
        self.dims: dict[str, Dimension] = {d.name: d for d in model.dimensions}
        self.metrics: dict[str, Metric] = {m.name: m for m in model.metrics}
        self.segments = {s.name: s for s in model.segments}
        self._has_joins_cache = False
        self._validate_model()

    # -- validation ----------------------------------------------------------

    def _validate_model(self) -> None:
        # construction-time validation, message spellings per the
        # reference's NewEngine (semantic-engine/engine_test.go
        # TestNewEngine_ValidationErrors)
        if not self.model.name:
            raise SemanticError("model name is required")
        if not self.model.table:
            raise SemanticError("source.table is required")
        seen: set[str] = set()
        for n in [d.name for d in self.model.dimensions] + [
            m.name for m in self.model.metrics
        ]:
            if n in seen:
                raise SemanticError(f"duplicate name: {n}")
            seen.add(n)
        for j in self.model.joins:
            if j.target_model not in self.models:
                raise SemanticError(f"join target model not found: {j.target_model}")
            if not j.sql and not j.foreign_key:
                raise SemanticError(f"join {j.name}: needs foreign_key or sql")
            target = self.models[j.target_model]
            if not j.sql and not (j.target_key or target.primary_key):
                raise SemanticError(
                    f'model "{self.model.name}": join "{j.name}" requires '
                    f'target_key or primary_key on target model "{j.target_model}"'
                )
        for s in self.model.segments:
            if not s.filter:
                raise SemanticError(f"segment {s.name}: filter is required")
        for m in self.model.metrics:
            if not m.expression:
                raise SemanticError(f"metric {m.name}: expression is required")
            for ref in _REF.findall(m.expression):
                if ref not in self.metrics:
                    raise SemanticError(
                        f"metric {m.name}: references unknown metric {{{ref}}}"
                    )
            if m.window:
                if m.window.type not in (
                    "running_total",
                    "lag",
                    "lead",
                    "rank",
                    "percent_of_total",
                ):
                    raise SemanticError(
                        f"metric {m.name}: unknown window.type {m.window.type}"
                    )
                # window metrics apply over exactly one referenced metric
                if not re.fullmatch(r"\{[A-Za-z_][A-Za-z0-9_.]*\}", m.expression.strip()):
                    raise SemanticError(
                        f"metric {m.name}: window expression must be exactly "
                        "a single {ref}"
                    )
                dim_names = {d.name for d in self.model.dimensions}
                # grain-suffixed aliases of time dimensions are valid
                # window fields too (`created_day` = created @ day), as
                # are metric names (ORDER BY a ranked measure) with an
                # optional ASC/DESC direction suffix
                for d in self.model.dimensions:
                    for g in d.granularities:
                        dim_names.add(f"{d.name}_{g}")
                field_names = dim_names | set(self.metrics)
                ob = m.window.order_by
                if ob:
                    parts = ob.split()
                    if len(parts) == 2 and parts[1].lower() in ("asc", "desc"):
                        ob = parts[0]
                if ob and ob not in field_names:
                    raise SemanticError(
                        f"metric {m.name}: window order_by references unknown "
                        f"dimension {m.window.order_by}"
                    )
                for p in m.window.partition_by:
                    if p not in dim_names:
                        raise SemanticError(
                            f"metric {m.name}: window partition_by references "
                            f"unknown dimension {p}"
                        )
                # the referenced chain must not mix {refs} with raw
                # aggregation (the wrapped form can only rebuild pure
                # ref-composed or pure aggregate expressions)
                stack = [_REF.findall(m.expression)[0]] if _REF.findall(m.expression) else []
                walked: set[str] = set()
                while stack:
                    cur = stack.pop()
                    if cur in walked or cur not in self.metrics:
                        continue
                    walked.add(cur)
                    expr = self.metrics[cur].expression
                    refs = _REF.findall(expr)
                    stripped = _REF.sub("", expr)
                    if refs and re.search(r"[A-Za-z_][A-Za-z0-9_]*\s*\(", stripped):
                        raise SemanticError(
                            f"metric {m.name}: window over metric {cur} mixes "
                            "{refs} with raw aggregation"
                        )
                    stack.extend(refs)
        # circular metric references
        state: dict[str, int] = {}

        def visit(name: str, trail: tuple[str, ...]) -> None:
            if state.get(name) == 2:
                return
            if state.get(name) == 1:
                raise SemanticError(
                    "circular dependency: " + " -> ".join(trail + (name,))
                )
            state[name] = 1
            for ref in _REF.findall(self.metrics[name].expression):
                if ref in self.metrics:
                    visit(ref, trail + (name,))
            state[name] = 2

        for m in self.model.metrics:
            visit(m.name, ())

    # -- public API ----------------------------------------------------------

    def generate_sql(self, q: Query) -> str:
        sql, _cols = self.generate_sql_with_columns(q)
        return sql

    def generate_sql_with_columns(self, q: Query) -> tuple[str, list[tuple[str, str]]]:
        """Returns (sql, [(output_name, referenced_field), ...])."""
        if not q.dimensions and not q.metrics:
            raise SemanticError("query must include at least one dimension or metric")
        self._validate_query(q)
        joins = self._needed_joins(q)
        if self._needs_window_wrap(q.metrics):
            sql = self._generate_wrapped(q, joins)
        else:
            sql = self._generate_simple(q, joins)
        cols = [(self._dim_alias(d), d.name) for d in q.dimensions]
        cols += [(m, m) for m in q.metrics]
        return sql, cols

    # -- resolution ----------------------------------------------------------

    def _resolve_dim(self, ref: DimensionRef) -> tuple[Model, str, Dimension]:
        """-> (owning model, relation alias ('' = primary), Dimension)."""
        if "." in ref.name:
            rel, dim_name = ref.name.split(".", 1)
            path = self._join_path(rel)
            if path is None:
                raise SemanticError(f"unknown relation: {rel}")
            for _owner, j in path:
                self._check_join_safe(j)
            join = path[-1][1]
            target = self.models[join.target_model]
            dim = next((d for d in target.dimensions if d.name == dim_name), None)
            if dim is None:
                raise SemanticError(f"dimension not found: {ref.name}")
            return target, rel, dim
        dim = self.dims.get(ref.name)
        if dim is None:
            # unambiguous unqualified joined dimension resolves through
            # the join graph (reference: graph.go bindDimension /
            # TestJoinGraphAllowsUnqualifiedDimensionWhenUnambiguous)
            owners = []
            for j in self.model.joins:
                target = self.models.get(j.target_model)
                if target is None:
                    continue
                d2 = next((d for d in target.dimensions if d.name == ref.name), None)
                if d2 is not None:
                    owners.append((target, j, d2))
            if len(owners) == 1:
                target, j, d2 = owners[0]
                self._check_join_safe(j)
                return target, j.name, d2
            if len(owners) > 1:
                raise SemanticError(f"ambiguous dimension: {ref.name}")
            raise SemanticError(f"dimension not found: {ref.name}")
        return self.model, "", dim

    @staticmethod
    def _check_join_safe(join) -> None:
        """Only non-fanout paths may join into an aggregating query: a
        one_to_many/many_to_many join duplicates base rows and silently
        inflates every aggregate (reference: graph.go safe-path check,
        TestJoinGraphRejectsFanoutPath)."""
        if join.relationship not in ("many_to_one", "one_to_one"):
            raise SemanticError(f"join not found or unsafe: {join.name}")

    def _join_path(self, rel: str) -> "list[tuple[str, object]] | None":
        """BFS through the join graph -> ordered [(owner_alias, Join)]
        hops ending at the join named ``rel`` (multi-hop: orders ->
        customers -> countries — reference graph.go safe-path walk /
        TestJoinGraphSupportsMultiHopSafePath). None when unreachable."""
        from collections import deque

        start = (self.model.name, self.model)
        q = deque([(start, [])])
        seen = {self.model.name}
        while q:
            (alias, model), path = q.popleft()
            for j in model.joins:
                hop = path + [(alias, j)]
                if j.name == rel:
                    return hop
                target = self.models.get(j.target_model)
                if target is None or j.name in seen:
                    continue
                seen.add(j.name)
                q.append(((j.name, target), hop))
        return None

    def _dim_alias(self, ref: DimensionRef) -> str:
        """Output alias: the dimension name itself. The granularity
        suffix appears only on joined (dotted) refs — a same-model time
        dimension at month grain still aliases as its own name
        (ref: graph.go:278-295 bindDimension)."""
        base = ref.name.replace(".", "_")
        if ref.granularity and "." in ref.name:
            return f"{base}_{ref.granularity}"
        return base

    def _dim_sql(self, ref: DimensionRef) -> str:
        model, rel, dim = self._resolve_dim(ref)
        expr = dim.expr(ref.granularity)
        alias = rel or self.model.name
        # qualify bare column references when joins are in play
        if self._has_joins_cache and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", expr):
            return f"{alias}.{expr}"
        return expr

    def _validate_query(self, q: Query) -> None:
        for d in q.dimensions:
            _model, _rel, dim = self._resolve_dim(d)
            if d.granularity:
                if dim.type != "time":
                    raise SemanticError(f"granularity on non-time dimension: {d.name}")
                if d.granularity not in dim.granularities:
                    raise SemanticError(
                        f'invalid granularity "{d.granularity}" for dimension {d.name}'
                    )
        for name in q.metrics:
            if name not in self.metrics:
                raise SemanticError(f"metric not found: {name}")
        for name in q.segments:
            if name not in self.segments:
                raise SemanticError(f"segment not found: {name}")
        for f in q.filters:
            if f.expression:
                continue
            if not f.dimension:
                raise SemanticError("filter dimension is required")
            ops = {
                "equals", "not_equals", "gt", "gte", "lt", "lte",
                "in", "not_in", "between", "is_null", "is_not_null",
            }
            if f.operator not in ops:
                raise SemanticError(f'invalid filter operator "{f.operator}"')
        for s in q.sort:
            if s.name not in q.metrics and not self._sortable_dim(q, s.name):
                # sorting by a metric that isn't in the select list would
                # emit ORDER BY on a nonexistent output column
                raise SemanticError(f"sort field not found: {s.name}")

    def _ref_for_alias(self, alias: str) -> DimensionRef | None:
        """Reverse an output alias to a DimensionRef (granularity-aware)."""
        if alias in self.dims:
            return DimensionRef(alias)
        for d in self.dims.values():
            for g in d.granularities:
                if f"{d.name}_{g}" == alias:
                    return DimensionRef(d.name, granularity=g)
        return None

    def _sortable_dim(self, q: Query, name: str) -> DimensionRef | None:
        for d in q.dimensions:
            if d.name == name or self._dim_alias(d) == name:
                return d
        return None

    # -- joins ---------------------------------------------------------------

    def _needed_joins(self, q: Query) -> list:
        rels: set[str] = set()
        for d in q.dimensions:
            if "." in d.name:
                rels.add(d.name.split(".", 1)[0])
            elif d.name not in self.dims:
                # unqualified joined dimension: the owning relation's
                # join is needed even without a dot in the ref
                _m, rel, _d = self._resolve_dim(d)
                if rel:
                    rels.add(rel)
        for f in q.filters:
            for ref in _REF.findall(f.expression or ""):
                if "." in ref:
                    rels.add(ref.split(".", 1)[0])
            if f.dimension and "." in f.dimension:
                rels.add(f.dimension.split(".", 1)[0])
        # segments are model-defined filters: their {relation.dim} refs
        # need the same joins as ad-hoc filters
        for name in q.segments:
            seg = self.segments.get(name)
            if seg is not None:
                for ref in _REF.findall(seg.filter or ""):
                    if "." in ref:
                        rels.add(ref.split(".", 1)[0])
        joins: list = []  # ordered (owner_alias, Join) hops, deduped
        have: set[str] = set()
        missing: list[str] = []
        for rel in sorted(rels):
            path = self._join_path(rel)
            if path is None:
                missing.append(rel)
                continue
            for owner, j in path:
                if j.name not in have:
                    have.add(j.name)
                    joins.append((owner, j))
        if missing:
            raise SemanticError(f"unknown relations: {sorted(missing)}")
        self._has_joins_cache = bool(joins)
        return joins

    @staticmethod
    def _rel_sql(table: str, alias: str) -> str:
        """A FROM-clause relation. A source may be a full derived table
        ('(SELECT ... ) AS x' — the reference's semantic fixtures inline
        data this way); wrapping it in SELECT * keeps OUR alias valid
        regardless of any alias the source text already carries
        (graph.go:197-215 wraps the same way)."""
        import re as _re

        if _re.search(r"[\s()]", table.strip()):
            return f"(SELECT * FROM {table}) AS {alias}"
        return f"{table} AS {alias}"

    def _from_sql(self, joins) -> str:
        out = f" FROM {self._rel_sql(self.model.table, self.model.name)}"
        for owner, j in joins:
            target = self.models[j.target_model]
            if j.sql:
                on = j.sql
            else:
                tk = j.target_key or target.primary_key
                on = f"{owner}.{j.foreign_key} = {j.name}.{tk}"
            out += f" LEFT JOIN {self._rel_sql(target.table, j.name)} ON {on}"
        return out

    # -- metric expansion ----------------------------------------------------

    def _is_derived(self, m: Metric) -> bool:
        return bool(_REF.search(m.expression)) and m.window is None

    def _expand_refs(self, expr: str, resolve) -> str:
        out, prev = [], 0
        for match in _REF.finditer(expr):
            out.append(expr[prev : match.start()])
            expanded = resolve(match.group(1))
            before = expr[: match.start()].rstrip()
            if before.endswith("/"):
                expanded = f"NULLIF({expanded}, 0)"
            out.append(expanded)
            prev = match.end()
        out.append(expr[prev:])
        return "".join(out)

    def _apply_metric_filter(self, expr: str, filt: str) -> str:
        """Rewrite the AGGREGATE call inside expr to filter via CASE WHEN.

        Targets the first aggregate function (not the first paren), so
        wrappers like ROUND(SUM(x), 2) filter the SUM, not the ROUND.
        """
        expr = expr.strip()
        m = _AGG_FNS.search(expr)
        if m is None:
            return expr
        open_i = expr.index("(", m.start())
        depth, close_i = 1, -1
        for i in range(open_i + 1, len(expr)):
            if expr[i] == "(":
                depth += 1
            elif expr[i] == ")":
                depth -= 1
                if depth == 0:
                    close_i = i
                    break
        if close_i == -1:
            return expr
        inner = expr[open_i + 1 : close_i].strip()
        if inner == "*":
            filtered = f"CASE WHEN {filt} THEN 1 ELSE NULL END"
        elif inner.upper().startswith("DISTINCT "):
            arg = inner[len("DISTINCT ") :].strip()
            return (
                expr[: open_i + 1]
                + f"DISTINCT CASE WHEN {filt} THEN {arg} ELSE NULL END"
                + expr[close_i:]
            )
        else:
            filtered = f"CASE WHEN {filt} THEN {inner} ELSE NULL END"
        return expr[: open_i + 1] + filtered + expr[close_i:]

    def _expand_simple(self, name: str, visited: frozenset = frozenset()) -> str:
        if name in visited:
            raise SemanticError(f"circular metric dependency: {name}")
        m = self.metrics.get(name)
        if m is None:
            raise SemanticError(f"metric not found: {name}")
        if m.window is not None:
            raise SemanticError(f"window metric {name!r} not usable here")
        if not self._is_derived(m):
            expr = m.expression
            if m.filter:
                filt = self._expand_filter_text(m.filter)
                return self._apply_metric_filter(expr, filt)
            return expr

        def resolve(ref: str) -> str:
            if ref in self.dims or "." in ref:
                return self._dim_sql(DimensionRef(ref))
            expanded = self._expand_simple(ref, visited | {name})
            return f"({expanded})" if _OPERATOR.search(expanded) else expanded

        return self._expand_refs(m.expression, resolve)

    def _expand_outer(self, name: str, visited: frozenset = frozenset()) -> str:
        if name in visited:
            raise SemanticError(f"circular metric dependency: {name}")
        m = self.metrics.get(name)
        if m is None:
            raise SemanticError(f"metric not found: {name}")
        if m.window is not None:
            return self._window_sql(m)
        if not self._is_derived(m):
            return f"base.{name}"

        def resolve(ref: str) -> str:
            if ref in self.dims or "." in ref:
                # dimension reference: the wrapped base subquery selects
                # it under its alias (same fallback _expand_simple has)
                return f"base.{self._dim_alias(DimensionRef(ref))}"
            expanded = self._expand_outer(ref, visited | {name})
            return f"({expanded})" if _OPERATOR.search(expanded) else expanded

        return self._expand_refs(m.expression, resolve)

    def _window_col(self, col: str) -> str:
        """Canonical inner alias for a window partition/order column:
        metric names and live aliases pass through; a granularity-
        suffixed dimension spelling ('created_day') maps to the
        dimension's output alias."""
        base = col.split()[0] if col else ""
        if not base or base in self.metrics or base in self.dims:
            return col
        ref = self._ref_for_alias(base)
        if ref is not None:
            return col.replace(base, self._dim_alias(ref), 1)
        return col

    def _window_sql(self, m: Metric) -> str:
        w = m.window
        refs = _REF.findall(m.expression)
        ref = refs[0] if refs else ""
        parts = ", ".join(f"base.{self._window_col(p)}" for p in w.partition_by)
        partition = f"PARTITION BY {parts} " if parts else ""
        order = f"base.{self._window_col(w.order_by)}"
        if w.type == "running_total":
            return f"SUM(base.{ref}) OVER ({partition}ORDER BY {order} ROWS UNBOUNDED PRECEDING)"
        if w.type == "lag":
            return f"LAG(base.{ref}, {w.offset}) OVER ({partition}ORDER BY {order})"
        if w.type == "lead":
            return f"LEAD(base.{ref}, {w.offset}) OVER ({partition}ORDER BY {order})"
        if w.type == "rank":
            return f"RANK() OVER ({partition}ORDER BY {order})"
        if w.type == "percent_of_total":
            over = f"({partition.strip()})" if partition else "()"
            return f"base.{ref} / NULLIF(SUM(base.{ref}) OVER {over}, 0)"
        raise SemanticError(f"unknown window type: {w.type}")

    def _needs_window_wrap(self, names: list[str]) -> bool:
        seen: set[str] = set()

        def check(n: str) -> bool:
            if n in seen:
                return False
            seen.add(n)
            m = self.metrics.get(n)
            if m is None:
                return False
            if m.window is not None:
                return True
            return any(check(r) for r in _REF.findall(m.expression) if r in self.metrics)

        return any(check(n) for n in names)

    # -- filters -------------------------------------------------------------

    def _filter_to_sql(self, f: Filter) -> str:
        if f.expression:
            return f.expression
        if not f.dimension:
            raise SemanticError("filter dimension is required when no expression is given")
        try:
            dim = self._dim_sql(DimensionRef(f.dimension))
        except SemanticError as e:
            # reference error spelling (engine_test.go QueryErrors table)
            raise SemanticError(f"filter dimension not found: {f.dimension}") from e
        op, v = f.operator, f.value
        if op == "equals":
            return f"{dim} = {_fmt_value(v)}"
        if op == "not_equals":
            return f"{dim} != {_fmt_value(v)}"
        if op == "gt":
            return f"{dim} > {_fmt_value(v)}"
        if op == "gte":
            return f"{dim} >= {_fmt_value(v)}"
        if op == "lt":
            return f"{dim} < {_fmt_value(v)}"
        if op == "lte":
            return f"{dim} <= {_fmt_value(v)}"
        if op == "in":
            return f"{dim} IN ({_fmt_list(v)})"
        if op == "not_in":
            return f"{dim} NOT IN ({_fmt_list(v)})"
        if op == "between":
            if isinstance(v, dict):
                # reference raises on malformed filters rather than rendering
                # BETWEEN NULL AND ... (semantic-engine/engine.go:790-849 filterToSQL)
                lo, hi = v.get("start"), v.get("end")
                if lo is None or hi is None:
                    raise SemanticError(f"invalid between filter value: {v!r}")
            elif isinstance(v, (list, tuple)) and len(v) == 2:
                lo, hi = v
                if lo is None or hi is None:
                    raise SemanticError(f"invalid between filter value: {v!r}")
            else:
                raise SemanticError(f"invalid between filter value: {v!r}")
            return f"{dim} BETWEEN {_fmt_value(lo)} AND {_fmt_value(hi)}"
        if op == "is_null":
            return f"{dim} IS NULL"
        if op == "is_not_null":
            return f"{dim} IS NOT NULL"
        raise SemanticError(f"invalid operator: {op}")

    def _expand_filter_text(self, expr: str) -> str:
        def resolve(ref: str) -> str:
            if ref in self.dims or "." in ref:
                return self._dim_sql(DimensionRef(ref))
            if ref in self.metrics:
                return self._expand_simple(ref)
            raise SemanticError(f"unknown reference {{{ref}}} in filter")

        return self._expand_refs(expr, resolve)

    def _filter_is_having(self, raw: str) -> bool:
        # aggregate functions outside {refs} OR references to metrics
        for ref in _REF.findall(raw):
            if ref in self.metrics:
                return True
        return bool(_AGG_FNS.search(_REF.sub("", raw)))

    def _where_having(self, q: Query) -> tuple[str, str]:
        where, having = [], []
        for f in q.filters:
            raw = f.expression or self._filter_to_sql(f)
            target = having if self._filter_is_having(raw) else where
            target.append(self._expand_filter_text(raw))
        for name in q.segments:
            raw = self.segments[name].filter
            target = having if self._filter_is_having(raw) else where
            target.append(self._expand_filter_text(raw))
        return " AND ".join(where), " AND ".join(having)

    # -- generation ----------------------------------------------------------

    def _order_limit(self, q: Query, outer: bool) -> str:
        s = ""
        if q.sort:
            parts = []
            for srt in q.sort:
                assert isinstance(srt, SortSpec)
                direction = (srt.direction or "asc").upper()
                name = srt.name
                d = self._sortable_dim(q, name)
                if d is not None:
                    name = self._dim_alias(d)
                    if outer:
                        name = f"base.{name}"
                parts.append(f"{name} {direction}")
            s += " ORDER BY " + ", ".join(parts)
        if q.limit:
            s += f" LIMIT {q.limit}"
        return s

    def _generate_simple(self, q: Query, joins) -> str:
        sel, group = [], []
        for i, d in enumerate(q.dimensions):
            sel.append(f"{self._dim_sql(d)} AS {self._dim_alias(d)}")
            group.append(str(i + 1))
        for name in q.metrics:
            sel.append(f"{self._expand_simple(name)} AS {name}")
        sql = "SELECT " + ", ".join(sel) + self._from_sql(joins)
        where, having = self._where_having(q)
        if where:
            sql += f" WHERE {where}"
        if group:
            sql += " GROUP BY " + ", ".join(group)
        if having:
            sql += f" HAVING {having}"
        return sql + self._order_limit(q, outer=False)

    def _inner_metrics(self, names: list[str]) -> list[str]:
        """Base (plain) metrics needed by the outer select, in first-use order."""
        out: list[str] = []
        seen: set[str] = set()

        def walk(n: str) -> None:
            if n in seen:
                return
            seen.add(n)
            m = self.metrics.get(n)
            if m is None:
                return
            if m.window is not None:
                # the window's OVER references base.<ref> directly, so
                # the referenced metric — derived or plain — must
                # materialize in the inner query itself (reference:
                # TestWindowMetricCanReferenceDerivedMetric)
                for r in _REF.findall(m.expression):
                    if r in self.metrics and r not in out:
                        seen.add(r)
                        out.append(r)
                return
            if self._is_derived(m):
                for r in _REF.findall(m.expression):
                    if r in self.metrics:
                        walk(r)
                return
            if n not in out:
                out.append(n)

        for n in names:
            walk(n)
        return out

    def _generate_wrapped(self, q: Query, joins) -> str:
        inner_metrics = self._inner_metrics(q.metrics)
        # inner dimensions: query dims + any window partition/order aliases
        inner_dims = list(q.dimensions)
        aliases = {self._dim_alias(d) for d in inner_dims}
        inner_metric_names = set(self._inner_metrics(q.metrics))
        for name in q.metrics:
            m = self.metrics[name]
            if m.window is None:
                continue
            for extra in [m.window.order_by, *m.window.partition_by]:
                # order_by may carry a direction ("revenue DESC") and may
                # name an inner METRIC (already selected) or a dimension
                col = extra.split()[0] if extra else ""
                if not col or col in aliases or col in inner_metric_names:
                    continue
                # granularity aliases ("order_date_month") resolve back to
                # the (dimension, granularity) pair they name; their
                # CANONICAL alias may already be selected (the reference
                # aliases same-model grains by dimension name alone)
                ref = self._ref_for_alias(col)
                if ref is None:
                    raise SemanticError(f"window column not found: {col}")
                ralias = self._dim_alias(ref)
                if ralias in aliases:
                    continue
                inner_dims.append(ref)
                aliases.add(ralias)

        sel, group = [], []
        for i, d in enumerate(inner_dims):
            sel.append(f"{self._dim_sql(d)} AS {self._dim_alias(d)}")
            group.append(str(i + 1))
        for name in inner_metrics:
            # a base metric whose own filter contains an aggregate (a
            # {metric} ref or a raw aggregate call) cannot be built in
            # the inner subquery: the per-row CASE WHEN can't evaluate
            # aggregates (reference: engine_test.go
            # TestFilterMetricFilterCannotReferenceAggregatesInWrappedQuery)
            filt = self.metrics[name].filter if name in self.metrics else ""
            if filt and (_REF.search(filt) or _AGG_FNS.search(filt)):
                raise SemanticError(
                    f"metric {name}: filter cannot reference aggregates "
                    "in a wrapped query"
                )
            sel.append(f"{self._expand_simple(name)} AS {name}")
        inner = "SELECT " + ", ".join(sel) + self._from_sql(joins)
        where, having = self._where_having(q)
        if where:
            inner += f" WHERE {where}"
        if group:
            inner += " GROUP BY " + ", ".join(group)
        if having:
            inner += f" HAVING {having}"

        outer_sel = [f"base.{self._dim_alias(d)}" for d in q.dimensions]
        outer_sel += [f"{self._expand_outer(n)} AS {n}" for n in q.metrics]
        sql = "SELECT " + ", ".join(outer_sel) + f" FROM ({inner}) base"
        return sql + self._order_limit(q, outer=True)
