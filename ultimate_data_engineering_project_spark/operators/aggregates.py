"""Aggregation operators (SURVEY.md §2.4): grouped rollups, conditional
multi-metric aggregation, top-k per group.

The reference runs each DQ metric as a separate COUNT(*) round-trip to
Postgres (polished_transactions.py:448-504 issues ~6 scans).  Here the
whole metric battery is ONE pass: conditional aggregation folds every
predicate into a single scan — the difference between 6 reads and 1 read
of a 100 TB fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def conditional_counts(df: DataFrame, conds: dict[str, Column]) -> DataFrame:
    """One-row frame: ``{name: count of rows satisfying cond}`` plus
    total_rows — the one-pass DQ report shape (A2/A8)."""
    aggs = [F.count(F.lit(1)).alias("total_rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(name) for name, cond in conds.items()
    ]
    return df.agg(*aggs)


def group_topk(
    df: DataFrame,
    group_keys: list[str],
    order_by: list[Column],
    k: int,
    rank_alias: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number (W-family ranking).  The
    window shuffle partitions on ``group_keys`` only — per-group state is
    O(k) after the sort, no global sort."""
    w = Window.partitionBy(*group_keys).orderBy(*order_by)
    return df.withColumn(rank_alias, F.row_number().over(w)).filter(
        F.col(rank_alias) <= k
    )


def topk(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k (O1).  orderBy().limit() plans TakeOrderedAndProject:
    each partition keeps a k-row heap, the driver merges k*P rows — never
    a full global sort."""
    return df.orderBy(*order_by).limit(k)


def hll_distinct_rollup(
    df: DataFrame,
    group_cols: list[str],
    count_col: str,
    *,
    lg_k: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """Mergeable distinct-count rollup via Datasketches HLL (A7 at
    100 TB): per-group sketches plus a grand total obtained by UNIONING
    the group sketches — never by rescanning the facts.

    This is the property plain ``approx_count_distinct`` lacks: its
    output is a number, so a gold-layer rollup cannot be re-aggregated
    to coarser grain without another pass over the source.  Sketches
    re-aggregate: daily → monthly → all-time each cost only a sketch
    union over the previous level's rows.

    Returns ``(per_group, total)``: per-group estimates and the
    union-merged global estimate.
    """
    sk = df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(count_col, F.lit(lg_k)).alias("__sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    per_group = sk.select(
        *group_cols,
        "n_rows",
        F.hll_sketch_estimate("__sk").alias("approx_distinct"),
    )
    total = sk.agg(
        F.hll_union_agg("__sk", F.lit(True)).alias("__u")
    ).select(F.hll_sketch_estimate("__u").alias("approx_distinct_total"))
    return per_group, total
