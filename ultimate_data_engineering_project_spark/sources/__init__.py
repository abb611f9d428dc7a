from ultimate_data_engineering_project_spark.sources.readers import (  # noqa: F401
    FIXTURE_TABLES,
    load_table,
    load_tables,
    register_temp_views,
)
from ultimate_data_engineering_project_spark.sources import (  # noqa: F401
    incremental,
    kafka,
    pysource,
    sinks,
)
