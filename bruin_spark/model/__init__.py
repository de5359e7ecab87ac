from bruin_spark.model.pipeline import (  # noqa: F401
    Asset,
    Column,
    ColumnCheck,
    CustomCheck,
    Materialization,
    Pipeline,
    Upstream,
)
from bruin_spark.model.loader import (  # noqa: F401
    load_asset_file,
    load_pipeline,
    parse_embedded_block,
)
