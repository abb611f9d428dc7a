"""Custom Python DataSource (sources/pysource.py): the reference's
seeder (database_seeder.py:10-270) and OLTP tick (oltp_seeder.py:113-448)
as a Spark 4 batch + streaming source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ultimate_data_engineering_project_spark.sources import pysource


@pytest.fixture()
def registered(spark):
    pysource.register(spark)
    return spark


def _batch_df(spark, **opts):
    r = spark.read.format("fakestream_txn")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_deterministic_and_partitioned(registered):
    spark = registered
    df = _batch_df(spark, n_rows=5000, n_partitions=8)
    assert df.count() == 5000
    # partition-parallel: the scan carries the requested split count
    assert df.rdd.getNumPartitions() == 8
    # pure function of the id range: re-read is byte-identical
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in _batch_df(spark, n_rows=5000, n_partitions=8).collect())
    assert a == b
    # ids are the contiguous seed range exactly once
    ids = sorted(r["transaction_id"] for r in df.select("transaction_id").collect())
    assert ids == list(range(1, 5001))


def test_batch_read_matches_duckdb_reconstruction(registered):
    """The source itself is oracle-checkable: LCG arithmetic mod 2^31-1
    reproduces bit-for-bit in DuckDB (the catalog entry
    `fakestream_source_read` runs this same check through the driver's
    hash compare)."""
    import duckdb

    spark = registered
    got = sorted(
        tuple(r)
        for r in _batch_df(spark, n_rows=2000, n_accounts=1000).collect()
    )
    want = sorted(
        tuple(r) for r in duckdb.connect().execute(pysource._oracle_sql(2000, 1000)).fetchall()
    )
    assert got == want


def _run_bounded_stream(spark, tmp_path, tag: str, rows_per_batch: int):
    """Run the bounded (max_rows=100) stream to completion over several
    micro-batches and return the sink rows.  availableNow is NOT used:
    with a SimpleDataSourceStreamReader it snapshots only the first
    prefetched batch — so this drives a normal continuous trigger and
    stops once the source is drained."""
    import time

    out = str(tmp_path / f"out_{tag}")
    q = (
        spark.readStream.format("fakestream_txn")
        .option("rows_per_batch", rows_per_batch)
        .option("max_rows", 100)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 100:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.5)
    finally:
        q.stop()
    return spark.read.parquet(out)


def test_stream_microbatches_and_replay(registered, tmp_path):
    """Bounded stream: 100 rows at 40/batch arrive over multiple
    micro-batches; the sink sees every id exactly once, and a fresh run
    with a fresh checkpoint produces the identical rows (deterministic
    replay = exactly-once reprocessing without source-side state)."""
    spark = registered
    first = _run_bounded_stream(spark, tmp_path, "a", 40)
    ids = sorted(r["transaction_id"] for r in first.select("transaction_id").collect())
    assert ids == list(range(1, 101))
    again = _run_bounded_stream(spark, tmp_path, "b", 40)
    assert sorted(map(tuple, first.collect())) == sorted(map(tuple, again.collect()))


def test_stream_rows_match_batch_rows(registered, tmp_path):
    """Stream and batch readers share one generator: the streamed 100
    rows equal the first 100 batch rows (same pure function of id)."""
    spark = registered
    streamed = sorted(
        map(tuple, _run_bounded_stream(spark, tmp_path, "c", 64).collect())
    )
    batch = sorted(map(tuple, _batch_df(spark, n_rows=100).collect()))
    assert streamed == batch


def test_stream_source_through_windowed_pipeline(registered, tmp_path):
    """Integration: the simulator SOURCE feeds the engine's own
    watermarked streaming aggregation (simulator -> streaming analytics
    end-to-end in-container, no broker) and the result matches the
    batch twin over the same 100 generated rows."""
    import time

    from pyspark.sql import functions as F

    from ultimate_data_engineering_project_spark.streaming.pipelines import (
        stream_daily_volume,
    )

    spark = registered
    src = (
        spark.readStream.format("fakestream_txn")
        .option("rows_per_batch", 40)
        .option("max_rows", 100)
        .load()
        .select(
            F.col("created_at").alias("ts"),
            F.col("status").alias("event_type"),
            F.col("amount").alias("value"),
        )
    )
    # complete mode: append would only emit CLOSED windows, and a
    # bounded source never advances the watermark past its single day
    q2 = (
        stream_daily_volume(src)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("pysource_vol_complete")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql(
                "SELECT COALESCE(SUM(n_events), 0) AS n FROM pysource_vol_complete"
            ).first()["n"] >= 100:
                break
            time.sleep(0.5)
    finally:
        q2.stop()

    got = {
        (r["event_type"], str(r["window_start"])): (
            r["n_events"],
            round(r["sum_value"], 2),
        )
        for r in spark.sql("SELECT * FROM pysource_vol_complete").collect()
    }
    batch = (
        spark.read.format("fakestream_txn")
        .option("n_rows", 100)
        .load()
        .groupBy(
            F.window(F.col("created_at"), "1 day").alias("win"),
            F.col("status").alias("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("amount"), 2).alias("s"))
        .collect()
    )
    want = {
        (r["event_type"], str(r["win"]["start"])): (r["n"], r["s"]) for r in batch
    }
    assert got == want and sum(n for n, _ in got.values()) == 100
