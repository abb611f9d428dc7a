"""Sinks (SURVEY.md S5-S8).

The reference lands pandas CSVs on S3 one object per batch
(psql_connector.py:136-166) and mutates rows with per-row UPDATEs
(oltp_seeder.py:483-487).  Spark-native equivalents:
  * typed, partitioned parquet append (bronze);
  * CSV kept only for compatibility;
  * ``merge_overwrite`` — the join+overwrite MERGE pattern replacing
    in-place UPDATE (SURVEY §7 hard part (a)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "append") -> None:
    """S5 compatibility sink (reference psql_connector.py:152-156) —
    header on, but parquet is the real bronze format (types survive)."""
    df.write.mode(mode).option("header", True).csv(path)


def merge_overwrite(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Set-oriented upsert: rows in ``updates`` replace same-key rows in
    ``current``; new keys append (S8 — the reference's keyed UPDATE,
    recast).  Anti-join + union: one shuffle each side on the key.

    The caller persists the result (full or partition-scoped overwrite);
    with a Delta/Iceberg table this becomes a real MERGE INTO — the
    algorithm is identical.
    """
    kept = current.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)
