from bruin_spark.render.jinja import RenderContext, render_asset_query, render_sql  # noqa: F401
from bruin_spark.render import builtins as sql_builtins  # noqa: F401
