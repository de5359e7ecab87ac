from bruin_spark.lint.policy import (
    PolicySpecification,
    lint_with_policies,
)
from bruin_spark.lint.rules import (
    Issue,
    lint_pipeline,
    lint_pipelines,
    rule_ids,
)

__all__ = [
    "Issue",
    "PolicySpecification",
    "lint_pipeline",
    "lint_pipelines",
    "lint_with_policies",
    "rule_ids",
]
