from bruin_spark.mat.strategies import render_materialization  # noqa: F401
from bruin_spark.mat.executor import Materializer  # noqa: F401
