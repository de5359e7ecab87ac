from bruin_spark.parser.sqlutil import (
    add_limit,
    extract_ctes,
    extract_select,
    freeze_time,
    is_single_select,
    missing_dependencies,
    prepend_ctes,
    rename_tables,
    select_from_cte,
    split_statements,
    strip_sql_comments,
    used_tables,
)

__all__ = [
    "add_limit",
    "extract_ctes",
    "extract_select",
    "freeze_time",
    "is_single_select",
    "missing_dependencies",
    "prepend_ctes",
    "rename_tables",
    "select_from_cte",
    "split_statements",
    "strip_sql_comments",
    "used_tables",
]
