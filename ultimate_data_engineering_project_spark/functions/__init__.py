from ultimate_data_engineering_project_spark.functions.scalar import (  # noqa: F401
    dsum,
    davg,
    money,
    weighted_choice,
)
