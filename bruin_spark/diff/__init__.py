from bruin_spark.diff.diff import (
    ColumnStat,
    DiffResult,
    diff_tables,
    profile,
    profile_long,
    schema_diff,
)

__all__ = [
    "ColumnStat",
    "DiffResult",
    "diff_tables",
    "profile",
    "profile_long",
    "schema_diff",
]
