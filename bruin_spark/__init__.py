"""bruin_spark — a PySpark-native data-pipeline engine.

Re-expresses the capabilities of the reference pipeline framework
(bruin-data/bruin) on the Spark DataFrame / SQL / Catalyst stack:

- pipelines as directories of SQL / Python assets (YAML or embedded
  ``@bruin`` comment blocks), rendered through a Jinja interval context
- declarative materialization strategies (create+replace, append,
  truncate+insert, delete+insert, time_interval, merge, ddl,
  scd2_by_column, scd2_by_time, data-vault hub/link/satellite)
- built-in column / custom quality checks
- a dependency-aware concurrent scheduler with selectors, retries and
  resumable state
- a semantic layer compiling metrics/dimensions to Spark SQL
- column-level lineage + lint, SQL unit tests, seeds, sensors, data-diff
- large-scale training-data operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search,
  text analysis, multimodal column plumbing

Design: everything is declared through the DataFrame/SQL API so Catalyst
performs pushdown, pruning, join planning and whole-stage codegen; Python
UDFs appear only where semantics genuinely require them and are always
Arrow-batched (pandas UDFs).
"""

__version__ = "0.1.0"

from bruin_spark.session import get_spark  # noqa: F401
