"""Operator library: pure DataFrame -> DataFrame functions.

Each module groups one family from SURVEY.md §2; every function is
built from declarative DataFrame ops so Catalyst can optimize the whole
plan (pushdown, pruning, broadcast selection, AQE).
"""

from ultimate_data_engineering_project_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    multimodal,
    relational,
    similarity,
    text,
    timeseries,
    windows,
)
