from bruin_spark.lint.rules import Issue, lint_pipeline

__all__ = ["Issue", "lint_pipeline"]
