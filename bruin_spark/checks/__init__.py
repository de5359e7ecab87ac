from bruin_spark.checks.checks import (  # noqa: F401
    CheckError,
    CheckResult,
    run_asset_checks,
    run_column_check,
    run_custom_check,
    violation_expr,
)
