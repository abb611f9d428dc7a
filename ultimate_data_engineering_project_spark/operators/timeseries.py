"""Time-series similarity over the events stream (SURVEY.md §2.10 X6;
PAPERS.md streaming time-series similarity).

Per-entity series are built with one grouped sort (collect ordered
structs), then compared pairwise:
  * Euclidean / cosine on aligned prefixes — pure expressions (JVM);
  * DTW — a vectorized pandas UDF (numpy dynamic program), the
    documented case where built-in expressions genuinely cannot express
    the recurrence (§2.11 UDF policy).

Scale: series are bounded per entity (cap with slice); the pairwise
stage joins on a blocking key when entities are many — here entity
cardinality is small (events.user_id ~ tens), so a broadcast pair join
is the right plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def user_series(events: DataFrame, max_len: int = 1024) -> DataFrame:
    """(user_id, series array<double>) ordered by (ts, event_id).
    array_sort on (ts, event_id, value) structs gives a deterministic
    order without a window shuffle — one groupBy only."""
    return events.groupBy("user_id").agg(
        F.slice(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "value"))
                ),
                lambda s: s["value"],
            ),
            1,
            max_len,
        ).alias("series")
    )


def _aligned(a, b):
    n = F.least(F.size(a), F.size(b))
    return F.slice(a, 1, n), F.slice(b, 1, n)


def euclidean_prefix(a, b):
    """Euclidean distance on the aligned prefix (expression-only)."""
    sa, sb = _aligned(a, b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(sa, sb, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def series_pairs_euclidean(events: DataFrame, max_len: int = 256) -> DataFrame:
    """All user pairs with aligned-prefix Euclidean distance (X6 JVM
    path).  Small-cardinality entity set → broadcast pair join."""
    s = user_series(events, max_len)
    a = s.alias("a")
    b = s.alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.user_id") < F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.round(
                euclidean_prefix(F.col("a.series"), F.col("b.series")), 6
            ).alias("euclidean"),
        )
    )


_DTW_SCHEMA = T.StructType(
    [
        T.StructField("user_a", T.LongType()),
        T.StructField("user_b", T.LongType()),
        T.StructField("dtw", T.DoubleType()),
    ]
)


def series_pairs_dtw(
    events: DataFrame, max_len: int = 64, band: int = 8
) -> DataFrame:
    """Sakoe-Chiba-banded DTW over user pairs (X6 UDF path).

    The pair list is built JVM-side; only (user_a, user_b, two float
    series) reach Python, in Arrow batches, where numpy runs the DP.
    """
    s = user_series(events, max_len)
    a = s.alias("a")
    b = s.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.user_id") < F.col("b.user_id")).select(
        F.col("a.user_id").alias("user_a"),
        F.col("b.user_id").alias("user_b"),
        F.col("a.series").alias("series_a"),
        F.col("b.series").alias("series_b"),
    )

    def dtw_batch(it):
        import numpy as np

        for pdf in it:
            out = []
            for ua, ub, sa, sb in zip(
                pdf["user_a"], pdf["user_b"], pdf["series_a"], pdf["series_b"]
            ):
                x = np.asarray(sa, dtype=np.float64)
                y = np.asarray(sb, dtype=np.float64)
                n, m = len(x), len(y)
                big = np.inf
                D = np.full((n + 1, m + 1), big)
                D[0, 0] = 0.0
                for i in range(1, n + 1):
                    lo = max(1, i - band)
                    hi = min(m, i + band)
                    d_row = np.abs(x[i - 1] - y[lo - 1 : hi])
                    for off, j in enumerate(range(lo, hi + 1)):
                        c = d_row[off]
                        D[i, j] = c + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
                out.append((ua, ub, float(D[n, m])))
            yield pd.DataFrame(out, columns=["user_a", "user_b", "dtw"])

    return pairs.mapInPandas(dtw_batch, schema=_DTW_SCHEMA)


def series_topk_similar(
    events: DataFrame, k: int = 3, max_len: int = 256
) -> DataFrame:
    """Per-user top-k most similar other users by aligned-prefix
    Euclidean (symmetrized pair list → per-user window)."""
    from pyspark.sql import Window

    pairs = series_pairs_euclidean(events, max_len)
    sym = pairs.unionByName(
        pairs.select(
            F.col("user_b").alias("user_a"),
            F.col("user_a").alias("user_b"),
            "euclidean",
        )
    )
    w = Window.partitionBy("user_a").orderBy(F.col("euclidean"), F.col("user_b"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("user_a").alias("user_id"),
            F.col("user_b").alias("similar_user_id"),
            "euclidean",
            F.col("rank").cast("long").alias("rank"),
        )
    )
