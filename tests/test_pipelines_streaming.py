"""Incremental ingest (watermark persistence + idempotency), CDC apply,
Structured Streaming pipelines (AvailableNow), multimodal plumbing."""

import os

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from ultimate_data_engineering_project_spark.operators import multimodal
from ultimate_data_engineering_project_spark.sources.incremental import (
    WatermarkStore,
    ingest_increment,
)
from ultimate_data_engineering_project_spark.sources.sinks import merge_overwrite
from ultimate_data_engineering_project_spark.streaming.pipelines import (
    cdc_apply_batch,
    events_file_stream,
    parse_debezium_envelope,
    run_cdc_stream,
    stream_daily_volume,
    stream_dedup,
    stream_purchase_after_click,
    stream_running_totals,
    write_bronze_stream,
)


def ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_incremental_ingest_watermark(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    store = WatermarkStore(str(tmp_path / "state"))
    src1 = spark.createDataFrame(
        [
            Row(id=1, updated_at=ts("2024-01-01T10:00:00"), v="a"),
            Row(id=2, updated_at=ts("2024-01-01T11:00:00"), v="b"),
        ]
    )
    assert ingest_increment(src1, "t", bronze, store) == 2
    # re-run same source: idempotent (watermark advanced to max observed)
    assert ingest_increment(src1, "t", bronze, store) == 0
    # new rows + an OLD row committed late (ts <= wm) — the reference's
    # now()-advance bug would silently drop it; max-observed also skips
    # it (documented at-least-once boundary), new rows land.
    src2 = src1.union(
        spark.createDataFrame([Row(id=3, updated_at=ts("2024-01-01T12:00:00"), v="c")])
    )
    assert ingest_increment(src2, "t", bronze, store) == 1
    landed = spark.read.parquet(f"{bronze}/t")
    assert landed.count() == 3
    assert set(landed.columns) >= {"id", "updated_at", "v"}
    # watermark survives a new store instance (restart)
    store2 = WatermarkStore(str(tmp_path / "state"))
    assert store2.get("t") == ts("2024-01-01T12:00:00")


def test_merge_overwrite_upsert(spark):
    cur = spark.createDataFrame([Row(k=1, v="old"), Row(k=2, v="keep")])
    upd = spark.createDataFrame([Row(k=1, v="new"), Row(k=3, v="ins")])
    out = merge_overwrite(cur, upd, ["k"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_cdc_parse_and_apply(spark):
    row_schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.StringType())]
    )
    raw = spark.createDataFrame(
        [
            Row(value='{"op":"c","ts_ms":1,"before":null,"after":"{\\"k\\":1,\\"v\\":\\"a\\"}"}'),
            Row(value='{"op":"u","ts_ms":2,"before":"{\\"k\\":1,\\"v\\":\\"a\\"}","after":"{\\"k\\":1,\\"v\\":\\"b\\"}"}'),
            Row(value='{"op":"d","ts_ms":3,"before":"{\\"k\\":2,\\"v\\":\\"x\\"}","after":null}'),
            Row(value='{"op":"c","ts_ms":4,"before":null,"after":"{\\"k\\":3,\\"v\\":\\"c\\"}"}'),
        ]
    )
    changes = parse_debezium_envelope(raw, row_schema)
    current = spark.createDataFrame([Row(k=1, v="stale"), Row(k=2, v="x")])
    out = cdc_apply_batch(current, changes, keys=["k"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "b", 3: "c"}  # 1 upserted (latest wins), 2 deleted, 3 inserted


@pytest.mark.usefixtures("spark")
def test_streaming_daily_volume_availablenow(spark, sf_dir, tmp_path):
    # stage event parquet (micro-batch source) with micro-precision ts
    from ultimate_data_engineering_project_spark.sources.readers import load_table

    src = str(tmp_path / "events_src")
    out_dir = str(tmp_path / "bronze_events")
    ckpt = str(tmp_path / "ckpt")
    load_table(spark, sf_dir, "events").write.parquet(src)

    stream = events_file_stream(spark, src)
    assert stream.isStreaming
    agg = stream_daily_volume(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("daily_vol")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM daily_vol")
    # batch twin over the same data
    batch = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    # append mode only emits windows the watermark has closed; every
    # emitted row must match its batch twin
    bt = {
        (r["win"]["start"], r["event_type"]): r["n_events"] for r in batch.collect()
    }
    emitted = got.collect()
    assert len(emitted) > 0
    for r in emitted:
        assert bt[(r["window_start"], r["event_type"])] == r["n_events"]

    # T6 bronze file sink with checkpoint
    q2 = write_bronze_stream(events_file_stream(spark, src), out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == load_table(spark, sf_dir, "events").count()
    # restart with same checkpoint: no duplicates (exactly-once sink)
    q3 = write_bronze_stream(events_file_stream(spark, src), out_dir, ckpt)
    q3.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == load_table(spark, sf_dir, "events").count()


def test_stream_dedup_availablenow(spark, sf_dir, tmp_path):
    """Streaming exact dedup drops replayed rows within the watermark."""
    from ultimate_data_engineering_project_spark.sources.readers import load_table

    src = str(tmp_path / "dup_src")
    events = load_table(spark, sf_dir, "events").limit(200)
    # stage the same rows twice (an at-least-once replay)
    events.write.parquet(src)
    events.write.mode("append").parquet(src)
    assert spark.read.parquet(src).count() == 2 * events.count()

    deduped = stream_dedup(events_file_stream(spark, src), ["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_out")
    assert got.count() == events.count()
    assert got.distinct().count() == events.count()


def test_stream_stream_join_matches_batch_twin(spark, sf_dir, tmp_path):
    """T5: the streaming purchase←click interval self-join emits exactly
    the pairs the equivalent batch join produces."""
    from ultimate_data_engineering_project_spark.sources.readers import load_table

    src = str(tmp_path / "ss_src")
    events = load_table(spark, sf_dir, "events")
    events.write.parquet(src)

    joined = stream_purchase_after_click(events_file_stream(spark, src))
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }

    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    expected = {
        (r["purchase_id"], r["click_id"])
        for r in purchases.join(
            clicks,
            (F.col("pu") == F.col("cu"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 hour"))
            & (F.col("cts") < F.col("pts")),
        ).collect()
    }
    assert len(expected) > 0
    assert got == expected


def test_cdc_stream_foreachbatch(spark, tmp_path):
    """T1 end-to-end in streaming mode: envelope files → foreachBatch
    upsert → parquet table image, across two micro-batch rounds."""
    env_dir = tmp_path / "envelopes"
    env_dir.mkdir()
    table_dir = str(tmp_path / "table")
    ckpt = str(tmp_path / "cdc_ckpt")
    row_schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.StringType())]
    )
    (env_dir / "batch1.jsonl").write_text(
        '{"op":"c","ts_ms":1,"before":null,"after":"{\\"k\\":1,\\"v\\":\\"a\\"}"}\n'
        '{"op":"c","ts_ms":2,"before":null,"after":"{\\"k\\":2,\\"v\\":\\"x\\"}"}\n'
    )
    q = run_cdc_stream(spark, str(env_dir), row_schema, ["k"], table_dir, ckpt)
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in spark.read.parquet(table_dir).collect()}
    assert got == {1: "a", 2: "x"}

    # second drop: update 1, delete 2, insert 3; restart from checkpoint
    (env_dir / "batch2.jsonl").write_text(
        '{"op":"u","ts_ms":3,"before":"{\\"k\\":1,\\"v\\":\\"a\\"}","after":"{\\"k\\":1,\\"v\\":\\"b\\"}"}\n'
        '{"op":"d","ts_ms":4,"before":"{\\"k\\":2,\\"v\\":\\"x\\"}","after":null}\n'
        '{"op":"c","ts_ms":5,"before":null,"after":"{\\"k\\":3,\\"v\\":\\"c\\"}"}\n'
    )
    q2 = run_cdc_stream(spark, str(env_dir), row_schema, ["k"], table_dir, ckpt)
    q2.awaitTermination(120)
    got = {r["k"]: r["v"] for r in spark.read.parquet(table_dir).collect()}
    assert got == {1: "b", 3: "c"}


def test_stream_running_totals_stateful(spark, sf_dir, tmp_path):
    """applyInPandasWithState: per-key state accumulates across
    micro-batches; the final emitted state equals the batch fold."""
    from ultimate_data_engineering_project_spark.sources.readers import load_table

    src = str(tmp_path / "state_src")
    events = load_table(spark, sf_dir, "events")
    # several files => several micro-batches (maxFilesPerTrigger=8)
    events.repartition(16).write.parquet(src)

    totals = stream_running_totals(events_file_stream(spark, src))
    q = (
        totals.writeStream.format("memory")
        .queryName("run_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.sql("SELECT * FROM run_totals").collect()
    assert len(emitted) > 0
    # last update per user (highest n_events) must equal the batch fold
    final = {}
    for r in emitted:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]][1]:
            final[r["user_id"]] = (r["total"], r["n_events"])
    batch = {
        r["user_id"]: (r["t"], r["n"])
        for r in events.groupBy("user_id")
        .agg(F.sum("value").alias("t"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, (total, n) in final.items():
        assert n == batch[uid][1]
        assert abs(total - batch[uid][0]) < 1e-6


def test_multimodal_decode(spark, sf_dir):
    from ultimate_data_engineering_project_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = multimodal.attach_fake_binary(docs)
    feats = multimodal.decode_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    by_id = {r["doc_id"]: r for r in rows}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    import hashlib

    probe = next(iter(by_id))
    assert by_id[probe]["n_bytes"] == len(src[probe].encode())
    assert by_id[probe]["content_sha"] == hashlib.sha256(src[probe].encode()).hexdigest()
    assert len(by_id[probe]["feature"]) == multimodal.FEATURE_DIM
