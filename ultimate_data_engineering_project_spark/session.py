"""SparkSession factory and session-level configuration.

The reference delegates all execution to PostgreSQL through a pooled
SQLAlchemy engine (reference: OLTP_simulator/connectors/SQL/
connector_config.py:133-157).  Here the execution substrate is Spark:
this module owns the configs that make Catalyst/Tungsten/AQE do the
physical work the reference outsourced to Postgres.

Scale notes (100 TB design targets, tested on local[*]):
  * AQE on: runtime coalescing of shuffle partitions, skew-join
    splitting, and dynamic join-strategy demotion are what keep a fixed
    logical plan viable from sf0.001 to a 1000-executor cluster.
  * shuffle.partitions is a default for local runs; on a real cluster
    AQE's advisory target (64 MiB) takes over after the first exchange.
  * Arrow enabled so any pandas-UDF fallback is batch-vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied both to sessions we create and to
# externally provided sessions (the verify driver owns its own session).
_RUNTIME_CONFS = {
    # the driver fixtures' events.parquet stores TIMESTAMP(NANOS,false),
    # which Spark's parquet reader rejects by default; read as long ns.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic ns->NTZ conversion and timestamp semantics.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session.

    Safe to call repeatedly; used on the verify driver's session before
    reading fixtures.
    """
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # a static conf on this build — keep going, readers degrade
            # gracefully (events loader checks the actual column type).
            pass
    return spark


def get_spark(
    app_name: str = "ultimate-data-engineering-project-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract)
    or ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    # getOrCreate may have returned a pre-existing session: re-apply.
    return configure_session(spark)
