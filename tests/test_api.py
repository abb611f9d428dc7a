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


def test_guard_rejects_with_wrapped_dml():
    """Spark's grammar is ``ctes? dmlStatementNoWith`` — a first-token
    check alone lets 'WITH … INSERT OVERWRITE DIRECTORY' (a real write,
    verified) through (r8).  Keywords inside strings/comments/backtick
    identifiers must NOT trip the guard."""
    for bad in [
        "WITH t AS (SELECT 1 AS a) INSERT OVERWRITE DIRECTORY '/tmp/x' "
        "USING parquet SELECT * FROM t",
        "with c as (select 1) insert into t select * from c",
        "WITH c AS (SELECT 1) DELETE FROM t WHERE x IN (SELECT * FROM c)",
        "WITH c AS (SELECT 1) UPDATE t SET x = 1",
        "WITH c AS (SELECT 1) MERGE INTO t USING c ON t.x = c.x "
        "WHEN MATCHED THEN DELETE",
    ]:
        assert not is_read_only_sql(bad), bad
    # quoted/commented occurrences are content, not statements
    assert is_read_only_sql("SELECT 'please insert this string' AS s")
    assert is_read_only_sql("SELECT x -- insert overwrite note\nFROM t")
    assert is_read_only_sql("SELECT `insert` FROM t")


def test_guard_backslash_escape_bypass_blocked():
    """Under Spark's default escapedStringLiterals=false, ``'\\''`` is
    ONE escaped quote inside a literal — a stripper unaware of
    backslash escapes ends the literal at ``\\'`` and swallows the
    following DML as string content.  Live-Spark verified: the payload
    below parses as InsertIntoStatement (r8).  The guard must scan
    under both escape interpretations and fail closed."""
    attack = r"WITH a AS (SELECT '\'' AS c) INSERT INTO tbl SELECT 'x' FROM a"
    assert not is_read_only_sql(attack)
    # the mirror hazard: a stripper aware ONLY of backslash escapes
    # mis-scopes literals when escapedStringLiterals=true ('' stays the
    # sole escape there); both modes must agree the statement is a read
    assert is_read_only_sql(r"SELECT '\'' AS quote_char")
    assert is_read_only_sql("SELECT 'it''s fine' AS s")


def test_guard_accepts_parenthesized_reads():
    assert is_read_only_sql("(SELECT 1) UNION (SELECT 2)")
    assert is_read_only_sql("  ((SELECT 1))")
    assert not is_read_only_sql("(INSERT INTO t VALUES (1))")


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


def test_engine_catalog_dispatch(spark, sf_dir):
    from ultimate_data_engineering_project_spark.api import Engine

    eng = Engine(spark=spark)
    names = eng.catalog_queries()
    assert "flagship_daily_order_volume" in names and len(names) >= 100
    df = eng.catalog_query("flagship_daily_order_volume", sf_dir)
    assert df.count() > 0
    import pytest

    with pytest.raises(KeyError):
        eng.catalog_query("no_such_query", sf_dir)


def test_frame_sample_plan_explodes_video_rows(spark):
    from pyspark.sql import functions as F

    from ultimate_data_engineering_project_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "vid a"), (2, "vid b")], ["doc_id", "text"]
    )
    media = multimodal.attach_fake_binary(docs).withColumn(
        "media_meta",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.when(F.col("doc_id") == 1, F.lit(2500).cast("long"))
            .otherwise(F.lit(None).cast("long"))
            .alias("duration_ms"),
        ),
    )
    frames = multimodal.frame_sample_plan(media, every_ms=1_000)
    got = sorted(
        (r["doc_id"], r["frame_ms"]) for r in frames.select("doc_id", "frame_ms").collect()
    )
    # doc 1: frames at 0,1000,2000 (+ terminal 2500 if inclusive); doc 2 (no duration) excluded
    assert all(d == 1 for d, _ in got)
    assert {f for _, f in got} >= {0, 1000, 2000}


def test_engine_explain_returns_full_plan(spark, sf_dir):
    from ultimate_data_engineering_project_spark.api import Engine

    eng = Engine(spark)
    p = eng.explain("filter_open_orders", sf_dir)
    assert "PushedFilters" in p and "ReadSchema" in p  # untruncated detail
    with pytest.raises(KeyError, match="unknown catalog query"):
        eng.explain("nope", sf_dir)
