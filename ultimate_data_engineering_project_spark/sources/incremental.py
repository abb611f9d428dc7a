"""Watermarked incremental ingestion (SURVEY.md S2/T2 — reference
batch_ingestion_pipeline.py:27-33,78-110).

The reference's loop has three documented flaws (SURVEY §3.2) that this
implementation fixes rather than replicates:
  (a) watermark initialized at process start and never persisted →
      restart loses position.  Here: persisted to a JSON state file in
      the checkpoint dir (the batch analog of a streaming checkpoint).
  (b) watermark advanced to ``now()`` after the read → rows committed
      mid-read are skipped forever.  Here: advanced to the max
      ``updated_at`` actually observed in the batch.
  (c) CSV sink erases types.  Here: parquet, partitioned by ingest
      date (partition pruning on re-reads).
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import DataFrame, functions as F


class WatermarkStore:
    """File-backed per-table watermark state (checkpoint-dir style)."""

    def __init__(self, state_dir: str) -> None:
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.state_dir, f"{table}.watermark.json")

    def get(self, table: str) -> datetime | None:
        path = self._path(table)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            raw = json.load(f)["watermark"]
        return datetime.fromisoformat(raw)

    def set(self, table: str, watermark: datetime) -> None:
        tmp = self._path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"watermark": watermark.isoformat()}, f)
        os.replace(tmp, self._path(table))  # atomic commit


def incremental_batch(
    source: DataFrame,
    table: str,
    store: WatermarkStore,
    ts_col: str = "updated_at",
) -> tuple[DataFrame, datetime | None]:
    """Rows with ``ts_col`` strictly beyond the stored watermark, plus
    the new watermark (max observed — NOT now()).

    The filter is a plain predicate → Catalyst pushes it into the scan
    (JDBC WHERE or parquet row-group pruning).  Returns (delta_df,
    new_watermark); call ``store.set`` only after the delta is durably
    written (write-then-commit, exactly-once for idempotent sinks).

    The delta is SNAPSHOTTED (eager localCheckpoint) before the
    watermark aggregate: against a LIVE source (JDBC), letting the
    caller's later write/count re-scan would see rows committed after
    this aggregate — rows the new watermark does not cover, so the next
    tick would re-select and duplicate them.  One scan, one consistent
    row set: the watermark is the max ts of exactly the rows the caller
    will write.
    """
    wm = store.get(table)
    delta = source if wm is None else source.filter(F.col(ts_col) > F.lit(wm))
    snap = delta.localCheckpoint(eager=True)
    new_wm = snap.agg(F.max(ts_col).alias("mx")).first()["mx"]
    return snap, new_wm


def ingest_increment(
    source: DataFrame,
    table: str,
    bronze_root: str,
    store: WatermarkStore,
    ts_col: str = "updated_at",
) -> int:
    """One incremental tick: read delta → append to bronze parquet
    partitioned by ingest date → commit watermark.  Returns rows landed.

    The write and the count both consume ``incremental_batch``'s
    checkpointed snapshot, so the live source is scanned ONCE per tick
    and the committed watermark covers exactly the written rows.
    """
    delta, new_wm = incremental_batch(source, table, store, ts_col)
    if new_wm is None:
        return 0
    out = delta.withColumn("_ingest_date", F.to_date(F.col(ts_col)))
    (
        out.write.mode("append")
        .partitionBy("_ingest_date")
        .parquet(f"{bronze_root}/{table}")
    )
    n = delta.count()
    store.set(table, new_wm)  # commit AFTER the write
    return n
