"""Semantic-layer model: metrics/dimensions/segments compiled to SQL.

Mirrors the reference's declared surface (semantic-engine/model.go:4-110):
a Model wraps a source table with typed dimensions (string/number/boolean/
time, time with named granularity expressions), metrics (plain aggregate,
derived via ``{ref}`` expressions, or windowed running_total/lag/lead/
rank/percent_of_total), reusable segment filters, and FK->PK joins to
other models. A Query names dimensions/metrics/filters/segments/sort/
limit and compiles to one ANSI SELECT.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Join:
    name: str  # relation name used in qualified dimension refs
    model: str = ""  # target model name (defaults to name)
    relationship: str = "many_to_one"  # one_to_one|many_to_one|one_to_many|many_to_many
    foreign_key: str = ""  # column on the joining model
    target_key: str = ""  # column on the target model (defaults to its primary_key)
    sql: str = ""  # raw ON clause override

    @property
    def target_model(self) -> str:
        return self.model or self.name


@dataclass
class Dimension:
    name: str
    type: str = "string"  # string|number|boolean|time
    expression: str = ""  # SQL expr; defaults to the column `name`
    granularities: dict[str, str] = field(default_factory=dict)  # name -> SQL expr
    hidden: bool = False

    def expr(self, granularity: str = "") -> str:
        if granularity and granularity in self.granularities:
            return self.granularities[granularity]
        return self.expression or self.name


@dataclass
class WindowSpec:
    type: str  # running_total|lag|lead|rank|percent_of_total
    order_by: str = ""  # dimension alias in the inner query
    partition_by: list[str] = field(default_factory=list)
    offset: int = 1


@dataclass
class Metric:
    name: str
    expression: str  # "SUM(amount)" or derived "{a} / {b}"
    filter: str = ""  # rewritten into CASE WHEN inside the aggregate
    window: WindowSpec | None = None
    hidden: bool = False


@dataclass
class Segment:
    name: str
    filter: str


@dataclass
class Model:
    name: str
    table: str  # source table (schema-qualified ok)
    primary_key: str = ""
    joins: list[Join] = field(default_factory=list)
    dimensions: list[Dimension] = field(default_factory=list)
    metrics: list[Metric] = field(default_factory=list)
    segments: list[Segment] = field(default_factory=list)


@dataclass
class DimensionRef:
    name: str  # "country" or qualified "customers.country"
    granularity: str = ""


@dataclass
class Filter:
    dimension: str = ""
    operator: str = ""  # equals|not_equals|gt|gte|lt|lte|in|not_in|between|is_null|is_not_null
    value: object = None
    expression: str = ""  # raw SQL alternative; may use {refs}


@dataclass
class SortSpec:
    name: str
    direction: str = "asc"


@dataclass
class Query:
    dimensions: list[DimensionRef] = field(default_factory=list)
    metrics: list[str] = field(default_factory=list)
    filters: list[Filter] = field(default_factory=list)
    segments: list[str] = field(default_factory=list)
    sort: list[SortSpec] = field(default_factory=list)
    limit: int = 0

    def __post_init__(self) -> None:
        self.dimensions = [
            DimensionRef(d) if isinstance(d, str) else d for d in self.dimensions
        ]
