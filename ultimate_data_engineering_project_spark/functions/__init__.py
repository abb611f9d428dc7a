from ultimate_data_engineering_project_spark.functions.scalar import (  # noqa: F401
    dsum,
    davg,
    hash_split,
    md5_bucket,
    money,
    split_thresholds,
    weighted_choice,
)
