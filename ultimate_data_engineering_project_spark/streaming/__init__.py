from ultimate_data_engineering_project_spark.streaming.pipelines import (  # noqa: F401
    cdc_apply_batch,
    events_file_stream,
    parse_debezium_envelope,
    run_cdc_stream,
    run_incremental_dedup_stream,
    split_envelope_quarantine,
    stream_daily_volume,
    stream_dedup,
    stream_sessionized,
    write_bronze_stream,
)
