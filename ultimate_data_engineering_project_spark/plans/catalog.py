"""Query catalog: every named query the engine claims, as a pair of
(a) a PySpark DataFrame plan and (b) an equivalent ANSI-SQL oracle that
DuckDB can run over the same parquet (the driver's correctness gate —
see __spark_entry__.py).

Cross-engine hash-match rules baked into every entry:
  * every computed column is aliased identically on both sides;
  * double aggregation goes through exact DECIMAL accumulation
    (functions.scalar.dsum) so shuffle order cannot change the result;
  * computed integers are cast to BIGINT on both sides (Spark LongType);
  * the events.ts nanosecond column is ALWAYS truncated to microseconds
    on the oracle side (CAST(ts AS TIMESTAMP)) to match Spark's
    microsecond timestamps, and every ordering on ts carries an
    event_id tiebreak;
  * rankings order on ROUNDed similarity/measures with an id tiebreak
    so float ulp differences cannot flip neighbors.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    doc: str


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load() -> None:
    # import for side effect of registration; idempotent
    from ultimate_data_engineering_project_spark.plans import (  # noqa: F401
        advanced_queries,
        coverage_queries,
        extra_queries,
        fakestream_queries,
        llm_queries,
        relational_queries,
        window_queries,
    )


def catalog() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in catalog().items() if spec.oracle is not None
    }
