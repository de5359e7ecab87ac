from bruin_spark.diff.diff import (
    ColumnStat,
    DiffResult,
    diff_rows,
    diff_tables,
    generate_alter_statements,
    profile,
    profile_long,
    top_values,
    schema_diff,
)

__all__ = [
    "ColumnStat",
    "DiffResult",
    "diff_rows",
    "diff_tables",
    "generate_alter_statements",
    "profile",
    "profile_long",
    "top_values",
    "schema_diff",
]
