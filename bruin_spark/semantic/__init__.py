from bruin_spark.semantic.engine import SemanticEngine
from bruin_spark.semantic.model import (
    Dimension,
    DimensionRef,
    Filter,
    Join,
    Metric,
    Model,
    Query,
    Segment,
    SortSpec,
    WindowSpec,
)

__all__ = [
    "Dimension",
    "DimensionRef",
    "Filter",
    "Join",
    "Metric",
    "Model",
    "Query",
    "Segment",
    "SemanticEngine",
    "SortSpec",
    "WindowSpec",
]
