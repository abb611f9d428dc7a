from ultimate_data_engineering_project_spark.plans.catalog import (  # noqa: F401
    QuerySpec,
    oracle_sql,
    queries,
)
from ultimate_data_engineering_project_spark.plans.catalog import (  # noqa: F401
    catalog as query_catalog,
)
