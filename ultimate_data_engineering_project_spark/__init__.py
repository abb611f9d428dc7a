"""ultimate_data_engineering_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference project ``jonuts100/ultimate-data-engineering-project`` (a
retail-banking OLTP simulation + medallion ingestion pipeline), extended
with the large-scale training-data operators (dedup, similarity search,
multimodal columns, text analysis) a 100 TB pipeline needs.

Design stance (see SURVEY.md §7):
  * everything is a pure ``DataFrame -> DataFrame`` function;
  * declarative DataFrame/SQL plans so Catalyst does pushdown, pruning,
    join selection and AQE re-planning;
  * no RDDs, no driver-side loops over rows, no row-at-a-time UDFs in
    hot paths;
  * custom operators (as-of join, MinHash dedup, ANN) are compositions
    of built-in ops, falling back to Arrow-batched pandas UDFs only
    where semantics demand.
"""

__version__ = "0.1.0"

from ultimate_data_engineering_project_spark.session import get_spark, configure_session  # noqa: F401
