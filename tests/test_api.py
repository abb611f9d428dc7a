"""Engine facade: guarded SQL (S15), catalog introspection (S11)."""

import pytest

from ultimate_data_engineering_project_spark.api import (
    Engine,
    ReadOnlyStatementError,
    is_read_only_sql,
)


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine.for_fixtures(spark, sf_dir)


def test_guard_accepts_reads():
    assert is_read_only_sql("SELECT 1")
    assert is_read_only_sql("  with x as (select 1) select * from x")
    assert is_read_only_sql("-- comment\nSELECT 1")
    assert is_read_only_sql("/* c */ EXPLAIN SELECT 1")


def test_guard_rejects_writes():
    for bad in ["DROP TABLE t", "INSERT INTO t VALUES (1)", "UPDATE t SET x=1",
                "DELETE FROM t", "CREATE TABLE t (x INT)", ""]:
        assert not is_read_only_sql(bad)


def test_sql_runs_and_guards(engine):
    df = engine.sql("SELECT COUNT(*) AS n FROM orders")
    assert df.first()["n"] > 0
    with pytest.raises(ReadOnlyStatementError):
        engine.sql("DROP TABLE orders")


def test_introspection(engine):
    names = engine.table_names()
    assert {"orders", "lineitem", "events", "documents", "embeddings"} <= set(names)
    cols = {c["name"] for c in engine.table_columns("orders")}
    assert "o_orderkey" in cols
    info = engine.database_info()
    assert info["n_tables"] >= 10
    assert info["version"].startswith("Apache Spark")


def test_table_stats(engine):
    stats = engine.table_stats("orders")
    assert stats["n_rows"] == 1500
    assert stats["n_bytes"] > 0  # parquet-backed view: real file bytes
