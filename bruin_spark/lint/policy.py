"""User-defined lint policies (ref: pkg/lint/policy.go, policy_builtins.go).

``policy.yml`` next to the pipeline defines:

.. code-block:: yaml

    custom_rules:
      - name: asset-name-prefixed
        description: asset names must start with the team prefix
        criteria: asset.name.startswith("core.")
        target: asset            # asset | pipeline
    rulesets:
      - name: core-policy
        selector:                # ANDed; each entry is a single matcher
          - path: ".*/core/.*"   #   regex on asset file path
          - asset: "core\\..*"   #   regex on asset name
          - tag: "tier1"         #   exact tag
        rules: [asset-has-owner, asset-name-prefixed]

``criteria`` is a boolean expression evaluated against ``asset`` /
``pipeline`` / ``var`` — the Python analog of the reference's expr-lang
programs (policy.go:106-121).  Like expr-lang, criteria run SANDBOXED:
the expression AST is validated against a node-type whitelist (no
statements, imports, lambdas, or walrus) and every attribute/name
starting with an underscore is rejected, which closes the
``x.__class__.__init__.__globals__`` escape hatch — ``bruin lint`` is
safe to run on untrusted pipelines even when ``run`` is not.
"""

from __future__ import annotations

import ast
import logging
import os
import re
from dataclasses import dataclass, field
from typing import Any, Callable

import yaml

from bruin_spark.lint.rules import Issue
from bruin_spark.model.pipeline import resolve_variables as _resolve_variables
from bruin_spark.model.pipeline import Asset, Pipeline

_RULE_NAME_RE = re.compile(r"^[A-Za-z0-9\-]+$")

Validator = Callable[[Pipeline, Asset | None], list[Issue]]

_SNAKE = re.compile(r"^[a-z][a-z0-9_]*$")
_CAMEL = re.compile(r"^[a-z][a-zA-Z0-9]*$")
_PLACEHOLDERS = ("tbd", "todo", "fixme", "placeholder", "xxx", "n/a", "na", "???")

# Spark DDL types (column-type-is-valid-for-platform adapted to the one
# platform this engine targets)
_SPARK_TYPES = {
    "string", "varchar", "char", "boolean", "byte", "tinyint", "short",
    "smallint", "int", "integer", "long", "bigint", "float", "real",
    "double", "decimal", "numeric", "date", "timestamp", "timestamp_ntz",
    "binary", "array", "map", "struct", "interval", "void", "variant",
}


def _bad(name: str, asset: Asset | None, msg: str) -> list[Issue]:
    return [Issue(name, asset.name if asset else "<pipeline>", msg)]


def _builtin(name: str):
    """Builtin policy rules, keyed by the reference's ids
    (policy_builtins.go:171-520)."""

    def asset_rule(check: Callable[[Pipeline, Asset], str | None]) -> Validator:
        def run(p: Pipeline, a: Asset | None) -> list[Issue]:
            if a is None:
                return []
            msg = check(p, a)
            return _bad(name, a, msg) if msg else []

        return run

    def pipeline_rule(check: Callable[[Pipeline], str | None]) -> Validator:
        def run(p: Pipeline, a: Asset | None) -> list[Issue]:
            if a is not None:
                return []
            msg = check(p)
            return _bad(name, None, msg) if msg else []

        return run

    table = {
        "asset-name-is-lowercase": asset_rule(
            lambda p, a: None if a.name == a.name.lower() else "asset name must be lowercase"
        ),
        "asset-name-is-schema-dot-table": asset_rule(
            lambda p, a: None if a.name.count(".") == 1 else "asset name must be {schema}.{table}"
        ),
        "asset-has-description": asset_rule(
            lambda p, a: None if a.description.strip() else "asset must have a description"
        ),
        "asset-has-owner": asset_rule(
            lambda p, a: None if a.owner.strip() else "asset must have an owner"
        ),
        "asset-has-columns": asset_rule(
            lambda p, a: None if a.columns else "asset must have columns"
        ),
        "asset-has-primary-key": asset_rule(
            lambda p, a: None if a.primary_keys() else "asset must have a primary key"
        ),
        "asset-has-checks": asset_rule(
            lambda p, a: None
            if a.custom_checks or any(c.checks for c in a.columns)
            else "asset must have at least one check"
        ),
        "asset-has-tags": asset_rule(lambda p, a: None if a.tags else "asset must have tags"),
        "column-has-description": asset_rule(
            lambda p, a: next(
                (f"column {c.name} must have a description" for c in a.columns if not c.description.strip()),
                None,
            )
        ),
        "column-has-type": asset_rule(
            lambda p, a: next(
                (f"column {c.name} must have a type" for c in a.columns if not c.type.strip()),
                None,
            )
        ),
        "column-name-is-snake-case": asset_rule(
            lambda p, a: next(
                (f"column {c.name} must be snake_case" for c in a.columns if not _SNAKE.match(c.name)),
                None,
            )
        ),
        "column-name-is-camel-case": asset_rule(
            lambda p, a: next(
                (f"column {c.name} must be camelCase" for c in a.columns if not _CAMEL.match(c.name)),
                None,
            )
        ),
        "column-type-is-valid-for-platform": asset_rule(_column_type_valid),
        "description-must-not-be-placeholder": asset_rule(_no_placeholder),
        "asset-has-no-cross-pipeline-dependencies": asset_rule(
            lambda p, a: "asset must not have a cross-pipeline dependency"
            if any(getattr(u, "type", "asset") == "uri" for u in a.depends)
            else None
        ),
        "query-matches-columns": asset_rule(_query_matches_columns),
        "pipeline-has-notifications": pipeline_rule(
            lambda p: None
            if any((p.notifications or {}).get(k) for k in ("slack", "email", "ms_teams", "discord", "webhook"))
            else "pipeline must have at least one notification set up"
        ),
        "pipeline-has-retries": pipeline_rule(
            lambda p: None if p.retries > 0 else "pipeline must have retries > 0"
        ),
        "pipeline-has-start-date": pipeline_rule(
            lambda p: None if p.start_date.strip() else "pipeline must have a start date"
        ),
        "pipeline-has-metadata-push": pipeline_rule(
            lambda p: None
            if any((p.metadata_push or {}).values())
            else "pipeline must have metadata push enabled"
        ),
    }
    return table.get(name)


def _column_type_valid(p: Pipeline, a: Asset) -> str | None:
    for c in a.columns:
        t = c.type.strip().lower()
        if not t:
            continue  # column-has-type covers this
        base = t.split("(")[0].split("<")[0].strip()
        if base not in _SPARK_TYPES:
            return f"column {c.name} has invalid Spark type {c.type!r}"
    return None


def _no_placeholder(p: Pipeline, a: Asset) -> str | None:
    def bad(text: str) -> bool:
        return text.strip().lower() in _PLACEHOLDERS

    if bad(a.description):
        return "asset description is placeholder text"
    for c in a.columns:
        if bad(c.description):
            return f"column {c.name} description is placeholder text"
    return None


def _query_matches_columns(p: Pipeline, a: Asset) -> str | None:
    """Declared columns must appear in the query's top-level select
    (scanner-based; the reference uses its sqlglot service)."""
    if a.type not in ("spark.sql", "sql") or not a.query or not a.columns:
        return None
    try:
        from bruin_spark.parser.sqlutil import _top_level_select_items

        out: set[str] = set()
        for item in _top_level_select_items(a.query):
            item = item.strip()
            if item == "*" or item.endswith(".*"):
                return None  # asterisk output — cannot verify statically
            m = re.search(r"([A-Za-z_][A-Za-z0-9_]*)\s*$", item)
            if m:
                out.add(m.group(1).lower())
            elif (bq := re.search(r"`([^`]+)`\s*$", item)) is not None:
                out.add(bq.group(1).lower())
            else:
                # unaliased expression (ends in ')' etc.): the output
                # name is not statically known — bail rather than
                # false-error on declared columns
                return None
    except Exception:
        return None
    if not out:
        return None
    missing = [c.name for c in a.columns if c.name.lower() not in out]
    if missing:
        return f"declared columns missing from query output: {', '.join(missing)}"
    return None


BUILTIN_POLICY_RULES = [
    "asset-name-is-lowercase", "asset-name-is-schema-dot-table",
    "asset-has-description", "asset-has-owner", "asset-has-columns",
    "asset-has-primary-key", "asset-has-checks", "asset-has-tags",
    "column-has-description", "column-has-type", "column-name-is-snake-case",
    "column-name-is-camel-case", "column-type-is-valid-for-platform",
    "description-must-not-be-placeholder",
    "asset-has-no-cross-pipeline-dependencies", "query-matches-columns",
    "pipeline-has-notifications", "pipeline-has-retries",
    "pipeline-has-start-date", "pipeline-has-metadata-push",
]


# -- custom expression rules -----------------------------------------------------


class PolicyError(ValueError):
    pass


# Expression-only AST whitelist: enough for the reference's expr-lang
# surface (boolean logic, comparisons, arithmetic, method calls,
# indexing, literals, comprehensions, conditional expressions).
_ALLOWED_NODES: tuple[type, ...] = (
    ast.Expression,
    ast.BoolOp, ast.And, ast.Or,
    ast.UnaryOp, ast.Not, ast.USub, ast.UAdd,
    ast.BinOp, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv,
    ast.Mod, ast.Pow,
    ast.Compare, ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.In, ast.NotIn, ast.Is, ast.IsNot,
    ast.Call, ast.keyword, ast.Attribute, ast.Name, ast.Load,
    ast.Constant, ast.IfExp,
    ast.List, ast.Tuple, ast.Set, ast.Dict,
    ast.Subscript, ast.Slice, ast.Starred,
    ast.ListComp, ast.SetComp, ast.GeneratorExp, ast.DictComp,
    ast.comprehension, ast.Store,  # Store: comprehension loop targets
    ast.JoinedStr, ast.FormattedValue,
)


def _to_snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


class _DualCase:
    """expr-lang compatibility view over a model object: policy files
    written for the reference address Go-cased fields (``asset.Name``,
    ``asset.Columns``, ``asset.Tags`` — pkg/lint/policy.go evaluates
    expr-lang against the Go structs), while Python-dialect criteria use
    snake_case. Exact attribute first, CamelCase→snake_case fallback;
    nested model objects and lists wrap recursively. The sandbox's
    underscore ban keeps the wrapped object itself unreachable."""

    def __init__(self, obj):
        object.__setattr__(self, "_obj", obj)

    def __getattr__(self, name):
        obj = object.__getattribute__(self, "_obj")
        if hasattr(obj, name):
            return _dual_wrap(getattr(obj, name))
        snake = _to_snake(name)
        if hasattr(obj, snake):
            return _dual_wrap(getattr(obj, snake))
        raise AttributeError(name)


def _dual_wrap(v):
    import dataclasses as _dc

    if _dc.is_dataclass(v) and not isinstance(v, type):
        return _DualCase(v)
    if isinstance(v, list):
        return [_dual_wrap(x) for x in v]
    return v


class _VarView(dict):
    """Pipeline variables addressable both ways: ``var['message']`` and
    ``var.message`` (the reference's expr env exposes map fields as
    attributes)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc


def _index_of(seq, item) -> int:
    """expr-lang's indexOf: position or -1 (strings and lists)."""
    if isinstance(seq, str):
        return seq.find(str(item))
    try:
        return list(seq).index(item)
    except ValueError:
        return -1


def _validate_criteria_ast(rule_name: str, criteria: str) -> ast.Expression:
    """Parse and sandbox-check a criteria expression.

    Raises :class:`PolicyError` on any statement-level construct or any
    dunder/underscore attribute or name — the attribute escapes that
    make bare ``eval`` unsafe all require an underscore-prefixed hop.
    """
    try:
        tree = ast.parse(criteria, mode="eval")
    except SyntaxError as e:
        raise PolicyError(f"error compiling rule {rule_name}: {e}") from e
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise PolicyError(
                f"rule {rule_name}: disallowed construct "
                f"{type(node).__name__} in criteria"
            )
        if isinstance(node, ast.Attribute) and node.attr.startswith("_"):
            raise PolicyError(
                f"rule {rule_name}: underscore attribute "
                f"{node.attr!r} is not allowed in criteria"
            )
        if isinstance(node, ast.Name) and node.id.startswith("_"):
            raise PolicyError(
                f"rule {rule_name}: underscore name {node.id!r} "
                "is not allowed in criteria"
            )
        if isinstance(node, ast.Attribute) and node.attr in (
            "format",
            "format_map",
        ):
            # '{0.__class__}'.format(x) traverses dunders at RUNTIME,
            # inside the format string — the AST underscore ban never
            # sees them, so the methods themselves are off limits
            raise PolicyError(
                f"rule {rule_name}: str.{node.attr} is not allowed in "
                "criteria (format-string attribute traversal bypasses "
                "the sandbox); use f-string-free comparisons instead"
            )
    return tree


@dataclass
class RuleDefinition:
    name: str
    description: str
    criteria: str
    target: str = "asset"  # asset | pipeline
    _code: Any = field(default=None, repr=False)

    def validate(self) -> None:
        if not self.name.strip():
            raise PolicyError("rule name is empty")
        if not _RULE_NAME_RE.match(self.name):
            raise PolicyError(f"rule name {self.name!r}: only alphanumerics and dash allowed")
        if not self.description.strip():
            raise PolicyError(f"rule {self.name}: description is empty")
        if not self.criteria.strip():
            raise PolicyError(f"rule {self.name}: criteria is empty")
        if self.target not in ("asset", "pipeline"):
            raise PolicyError(f"rule {self.name}: no such target {self.target!r}")

    def compile(self) -> None:
        tree = _validate_criteria_ast(self.name, self.criteria)
        self._code = compile(tree, f"<policy:{self.name}>", "eval")

    def evaluate(self, pipeline: Pipeline, asset: Asset | None) -> bool:
        env = {
            "asset": _DualCase(asset) if asset is not None else None,
            "pipeline": _DualCase(pipeline),
            "var": _VarView(_resolve_variables(pipeline.variables or {})),
            "len": len, "any": any, "all": all, "str": str, "set": set,
            "sorted": sorted, "min": min, "max": max, "sum": sum,
            "re": re,
            "indexOf": _index_of,
        }
        # the compiled AST was validated by _validate_criteria_ast, so
        # eval here executes only whitelisted expression nodes with no
        # underscore attribute access and no builtins beyond `env`
        result = eval(self._code, {"__builtins__": {}}, env)  # noqa: S307
        return bool(result)


@dataclass
class RuleSet:
    name: str
    rules: list[str]
    selector: list[dict[str, str]] = field(default_factory=list)

    def validate(self) -> None:
        if not self.name.strip():
            raise PolicyError("ruleset name is empty")
        if not _RULE_NAME_RE.match(self.name):
            raise PolicyError(f"ruleset {self.name!r}: only alphanumerics and dash allowed")
        if not self.rules:
            raise PolicyError(f"ruleset {self.name}: no rules specified")

    def matches(self, asset: Asset | None, pipeline: Pipeline | None = None) -> bool:
        """All selector entries must match (asset-level matchers pass
        trivially at pipeline level, mirroring withSelector)."""
        for sel in self.selector:
            # pipeline-name selector applies at both levels
            if "pipeline" in sel and not re.fullmatch(
                sel["pipeline"], pipeline.name if pipeline else ""
            ):
                return False
        if asset is None:
            return not any("asset" in s or "path" in s or "tag" in s for s in self.selector)
        for sel in self.selector:
            if "path" in sel and not re.search(sel["path"], asset.file_path or ""):
                return False
            if "asset" in sel and not re.fullmatch(sel["asset"], asset.name):
                return False
            if "tag" in sel and sel["tag"] not in asset.tags:
                return False
        return True


@dataclass
class PolicySpecification:
    definitions: list[RuleDefinition] = field(default_factory=list)
    rulesets: list[RuleSet] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PolicySpecification":
        defs = [
            RuleDefinition(
                name=str(rd.get("name", "")),
                description=str(rd.get("description", "")),
                criteria=str(rd.get("criteria", "")),
                target=str(rd.get("target", "asset") or "asset"),
            )
            for rd in d.get("custom_rules", []) or []
        ]
        sets = [
            RuleSet(
                name=str(rs.get("name", "")),
                rules=[str(r) for r in rs.get("rules", []) or []],
                selector=[dict(s) for s in rs.get("selector", []) or []],
            )
            for rs in d.get("rulesets", []) or []
        ]
        return cls(definitions=defs, rulesets=sets)

    @classmethod
    def load(cls, pipeline_path: str) -> "PolicySpecification | None":
        """Nearest policy.yml at-or-above the pipeline dir — the
        reference keeps one policy file at the repo root governing every
        pipeline below it (pkg/lint/policy.go resolves upward); stop at
        a .git boundary."""
        start = os.path.abspath(pipeline_path)
        cur = start
        home = os.path.expanduser("~")
        for _ in range(16):  # bounded: never scan arbitrary ancestors
            for fn in ("policy.yml", "policy.yaml"):
                p = os.path.join(cur, fn)
                if os.path.exists(p):
                    if cur != start:
                        # an ancestor pickup changes lint results vs a
                        # pipeline-dir-only lookup — make it visible
                        logging.getLogger("bruin_spark.lint").info(
                            "policy resolved from ancestor: %s", p
                        )
                    with open(p, encoding="utf-8") as f:
                        return cls.from_dict(yaml.safe_load(f) or {})
            # a repo root, a project root (.bruin.yml), or the home dir
            # bounds the project — a policy above any belongs to someone
            # else
            if (
                os.path.isdir(os.path.join(cur, ".git"))
                or os.path.exists(os.path.join(cur, ".bruin.yml"))
                or os.path.exists(os.path.join(cur, ".bruin.yaml"))
                or cur == home
            ):
                return None
            parent = os.path.dirname(cur)
            if parent == cur:
                return None
            cur = parent
        return None

    def init(self) -> dict[str, RuleDefinition]:
        compiled: dict[str, RuleDefinition] = {}
        for rd in self.definitions:
            rd.validate()
            if rd.name in compiled:
                raise PolicyError(f"duplicate rule: {rd.name}")
            if _builtin(rd.name) is not None:
                raise PolicyError(f"rule is builtin: {rd.name}")
            rd.compile()
            compiled[rd.name] = rd
        return compiled

    def lint(self, pipeline: Pipeline) -> list[Issue]:
        compiled = self.init()
        issues: list[Issue] = []
        for rs in self.rulesets:
            rs.validate()
            for rule_name in rs.rules:
                rid = f"policy:{rs.name}:{rule_name}"
                custom = compiled.get(rule_name)
                builtin = _builtin(rule_name)
                if custom is None and builtin is None:
                    raise PolicyError(f"no such rule: {rule_name}")
                targets: list[Asset | None]
                if custom is not None:
                    targets = list(pipeline.assets) if custom.target == "asset" else [None]
                else:
                    targets = [None] + list(pipeline.assets)
                for a in targets:
                    if not rs.matches(a, pipeline):
                        continue
                    if custom is not None:
                        try:
                            ok = custom.evaluate(pipeline, a)
                        except Exception as e:  # noqa: BLE001
                            raise PolicyError(f"error evaluating rule {rule_name}: {e}") from e
                        if not ok:
                            issues.append(
                                Issue(rid, a.name if a else "<pipeline>", custom.description)
                            )
                    else:
                        for issue in builtin(pipeline, a):
                            issues.append(Issue(rid, issue.asset, issue.message))
        return issues


def lint_with_policies(pipeline: Pipeline, spark=None, **kwargs) -> list[Issue]:
    """Builtin rules + the pipeline directory's policy.yml (if present)."""
    from bruin_spark.lint.rules import lint_pipeline

    issues = lint_pipeline(pipeline, spark=spark, **kwargs)
    spec = PolicySpecification.load(pipeline.path) if pipeline.path else None
    if spec is not None:
        issues.extend(spec.lint(pipeline))
    return issues
