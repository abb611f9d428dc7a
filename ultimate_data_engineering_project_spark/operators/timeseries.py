"""Time-series similarity over the events stream (SURVEY.md §2.10 X6;
PAPERS.md streaming time-series similarity).

Per-entity series are built with one grouped sort (collect ordered
structs), then compared pairwise:
  * Euclidean / cosine on aligned prefixes — pure expressions (JVM);
  * DTW — a vectorized pandas UDF (numpy dynamic program), the
    documented case where built-in expressions genuinely cannot express
    the recurrence (§2.11 UDF policy).

Scale: series are bounded per entity (cap with slice).  Two pairwise
strategies:
  * exact broadcast theta-join (series_pairs_euclidean) — right when
    entity cardinality is small (events.user_id ~ tens);
  * blocked equi-join (series_pairs_euclidean_blocked) — the 100 TB
    path: a PAA sketch + p-stable LSH bucket key turns pair generation
    into a banded self equi-join (mirroring the MinHash banding in
    operators/dedup.py), so candidate pairs shuffle on a narrow 64-bit
    key and the O(U^2) explosion never materializes.
"""

from __future__ import annotations

import random

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


def _paa(series, n_segments: int):
    """Piecewise Aggregate Approximation: mean of `n_segments` equal
    slices of the series (expression-only, no UDF).  Empty slices (when
    the series is shorter than n_segments) contribute 0.0."""

    def seg_mean(i):
        n = F.size(series)
        lo = F.floor(i * n / n_segments)
        width = F.floor((i + 1) * n / n_segments) - lo
        seg = F.slice(series, lo.cast("int") + 1, width.cast("int"))
        return F.when(
            F.size(seg) > 0,
            F.aggregate(seg, F.lit(0.0), lambda a, v: a + v) / F.size(seg),
        ).otherwise(F.lit(0.0))

    return F.transform(F.sequence(F.lit(0), F.lit(n_segments - 1)), seg_mean)


def series_block_keys(
    series_df: DataFrame,
    *,
    n_paa: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    bucket_width: float = 4.0,
    seed: int = 42,
) -> DataFrame:
    """(user_id, band_id, block_key) — p-stable LSH over a PAA sketch.

    Each band hashes `rows_per_band` quantized Gaussian projections of
    the PAA vector: key_r = floor((paa . g_r + u_r) / w).  Similar
    series (small Euclidean distance) land in the same bucket in at
    least one band with high probability; the projection coefficients
    are deterministic from `seed`, so the plan is reproducible.
    Projections are literal expressions — no UDF, no driver data."""
    rng = random.Random(seed)
    out = []
    for b in range(bands):
        parts = []
        for r in range(rows_per_band):
            g = [rng.gauss(0.0, 1.0) for _ in range(n_paa)]
            u = rng.uniform(0.0, bucket_width)
            dot = None
            for i, gi in enumerate(g):
                term = F.col("__paa")[i] * F.lit(gi)
                dot = term if dot is None else dot + term
            parts.append(F.floor((dot + F.lit(u)) / F.lit(bucket_width)).cast("string"))
        out.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(F.concat_ws(",", *parts)).alias("block_key"),
            )
        )
    return (
        series_df.withColumn("__paa", _paa(F.col("series"), n_paa))
        .select("user_id", F.explode(F.array(*out)).alias("__blk"))
        .select("user_id", "__blk.band_id", "__blk.block_key")
    )


def adaptive_width_exp(n_users: int, *, ref_users: int = 2000, max_exp: int = 6) -> int:
    """DENSITY LADDER for the portable block keys: the halving exponent
    applied to ``bucket_width`` as the entity count grows — every 8x
    users halves the width, multiplying each segment's key count ~2x
    and the 3-segment band key space ~8x, so bucket OCCUPANCY (and the
    within-bucket quadratic pair work) stays roughly constant instead
    of growing linearly with corpus size.  Fixed quantization is the
    classic LSH failure at scale: the sf10 spot-decade measured 102x
    candidate growth for 10x users before this ladder.

    Exact integer arithmetic on an exact COUNT(*) — a finite CASE
    ladder in SQL reproduces it, keeping the candidate set
    hash-checkable (no float log/pow, which differ in ulps across
    engines).  ``max_exp=6`` covers ref_users * 8^6 = half a billion
    entities."""
    exp = 0
    while exp < max_exp and n_users >= ref_users * 8 ** (exp + 1):
        exp += 1
    return exp


def adaptive_width_sql(
    count_expr: str, *, bucket_width: int = 300_000, ref_users: int = 2000,
    max_exp: int = 6,
) -> str:
    """The SQL twin of :func:`adaptive_width_exp` ``->`` effective
    width: a CASE ladder over ``count_expr`` (a subquery or column
    yielding the entity count), exact-integer like the Python side."""
    branches = "".join(
        f" WHEN {count_expr} >= {ref_users * 8 ** e} THEN {bucket_width // 2 ** e}"
        for e in range(max_exp, 0, -1)
    )
    return f"(CASE{branches} ELSE {bucket_width} END)"


def series_block_keys_md5(
    series_df: DataFrame,
    *,
    n_paa: int = 12,
    bands: int = 4,
    value_scale: int = 10_000,
    bucket_width: int = 300_000,
    adaptive: bool = True,
) -> DataFrame:
    """(user_id, band_id, block_key) — ENGINE-PORTABLE series blocking:
    integer-quantized PAA + md5 band keys (the `minhash_lsh_pairs_md5`
    trick applied to X6, dedup.py:306).

    Each value is quantized exactly (`ROUND(v * value_scale)` as BIGINT
    — exact when values carry <= log10(value_scale) fractional digits,
    which the events fixture does); each PAA segment is an integer SUM
    (order-independent, engine-exact); each quantized segment
    ``q_j = FLOOR(seg_sum / bucket_width)`` uses IEEE double division of
    exactly-representable integers, identical on any engine; the band
    key is ``md5(band || ',' || q…)``.  No Gaussian projections, no
    float accumulation — a SQL oracle reproduces the candidate set
    hash-for-hash.  Same banded equi-join scale shape as
    `series_block_keys`; that p-stable variant remains the
    tighter-recall production kernel.

    Defaults are the r10 RE-BASELINE (judge ask #5): 3 quantized
    segment sums per band key (n_paa=12 over 4 bands) at bucket width
    300k, replacing the r5 2-per-band/500k keys whose selectivity
    collapsed at scale — 15k users produced 4.28M candidate pairs at
    sf1 (the attach joins shipping 256-float arrays dominated the
    entry's 11s).  The re-baseline cuts sf1 candidates ~16x to ~263k
    while keeping the planted-pair recall floor (the oracle and the
    recall pins changed WITH the params; bench/scaling rows across the
    r9->r10 boundary are not comparable for this entry).

    ``adaptive=True`` applies the :func:`adaptive_width_exp` density
    ladder: the effective width is ``bucket_width // 2^exp(n_users)``
    (one bounded COUNT job on the already-checkpointed series frame),
    so key granularity tracks corpus density and bucket occupancy
    stays ~constant at any scale — below ``ref_users * 8 = 16k``
    entities (every driver correctness scale, sf1 included) the
    ladder is a no-op and behavior is bit-identical to the fixed
    width."""
    per_band = n_paa // bands
    if per_band * bands != n_paa:
        raise ValueError(f"n_paa ({n_paa}) must be divisible by bands ({bands})")
    if adaptive:
        bucket_width = bucket_width // 2 ** adaptive_width_exp(series_df.count())
    # NULL values quantize as 0 EXPLICITLY: without the coalesce, a NULL
    # poisons Spark's aggregate-fold segment sum (concat_ws then SKIPS
    # the NULL q, emitting a shortened key) while DuckDB's list_sum
    # ignores NULLs and its || concat propagates NULL — different
    # candidate sets per engine.  COALESCE(v, 0) on both sides keeps the
    # hash-parity contract on data with missing values.
    ints = F.transform(
        F.col("series"),
        lambda v: F.round(F.coalesce(v, F.lit(0.0)) * F.lit(float(value_scale))).cast(
            "long"
        ),
    )
    df = series_df.withColumn("__ints", ints)
    n = F.size(F.col("__ints"))

    def seg_sum(j):
        lo = F.floor(F.lit(j) * n / F.lit(n_paa))
        width = F.floor(F.lit(j + 1) * n / F.lit(n_paa)) - lo
        seg = F.slice(F.col("__ints"), lo.cast("int") + 1, width.cast("int"))
        return F.aggregate(seg, F.lit(0).cast("long"), lambda a, v: a + v)

    qs = [
        F.floor(seg_sum(j) / F.lit(float(bucket_width))).cast("long")
        for j in range(n_paa)
    ]
    out = []
    for b in range(bands):
        comps = [F.lit(str(b))] + [
            qs[b * per_band + r].cast("string") for r in range(per_band)
        ]
        out.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws(",", *comps).cast("binary")).alias("block_key"),
            )
        )
    return (
        df.select("user_id", F.explode(F.array(*out)).alias("__blk"))
        .select("user_id", "__blk.band_id", "__blk.block_key")
    )


def _blocked_candidate_pairs(
    events: DataFrame,
    max_len: int = 256,
    *,
    n_paa: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    bucket_width: float = 4.0,
    seed: int = 42,
    max_bucket_size: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """LSH-blocked candidate user pairs with both series attached:
    (user_a, user_b, series_a, series_b).  The shared pair generator
    behind the blocked Euclidean and blocked DTW paths.

    Plan shape (mirrors dedup.minhash_lsh_pairs): sketch map-side ->
    explode to `bands` narrow (user_id, band_id, block_key) rows ->
    self EQUI-join on (band_id, block_key) -> distinct pairs -> series
    re-attached by two keyed joins.  The heavy series arrays cross the
    shuffle once per surviving user, never once per band, and no
    cartesian/nested-loop join appears anywhere in the plan.

    Degenerate buckets are capped: many entities with constant/short
    series produce identical zero-padded PAA sketches and would land in
    one bucket in every band, reintroducing an O(B^2) blowup inside
    that bucket.  Buckets larger than ``max_bucket_size`` are dropped
    (standard LSH practice — an over-full bucket carries no selectivity
    anyway).  The bucket-size count runs over the same
    (band_id, block_key) partitioning the self-join needs, so the cap
    adds no extra exchange."""
    from pyspark.sql import Window

    s = user_series(events, max_len)
    # keyed repartition = materialization barrier (see dedup.py): stops
    # projection collapse from recomputing the grouped sort per band.
    # The localCheckpoint pins the series frame to ONE computation:
    # under AQE the attach-join branches do not exchange-reuse the keys
    # branch's subtree (their canonical forms diverge once AQEShuffleRead
    # lands), so without it the grouped sort ran twice per query.  Eager,
    # because the frame has THREE consumers (keys + both attach joins) —
    # a lazy checkpoint materializes per-partition on first touch and
    # concurrent consumers can race into recompute (A/B-measured).
    # Costs to know: construction now runs the grouped-sort job even if
    # the frame is only plan-inspected; checkpoint blocks live until the
    # session's ContextCleaner collects them; and localCheckpoint data
    # does not survive executor loss — on a cluster with decommissioning,
    # swap for reliable checkpoint/persist(DISK_ONLY_2).
    s = s.repartition("user_id").localCheckpoint(eager=True)
    if portable:
        # the portable path's blocking parameters are
        # series_block_keys_md5's OWN defaults — the single source of
        # truth the catalog oracle mirrors; the gaussian kernel keeps
        # its independent n_paa/bands/bucket_width knobs below
        keys = series_block_keys_md5(s, bands=bands)
    else:
        keys = series_block_keys(
            s,
            n_paa=n_paa,
            bands=bands,
            rows_per_band=rows_per_band,
            bucket_width=bucket_width,
            seed=seed,
        )
    bucket_w = Window.partitionBy("band_id", "block_key")
    keys = (
        keys.withColumn("__bsz", F.count(F.lit(1)).over(bucket_w))
        .filter(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )
    a = keys.alias("ka")
    b = keys.alias("kb")
    pairs = (
        a.join(
            b,
            (F.col("ka.band_id") == F.col("kb.band_id"))
            & (F.col("ka.block_key") == F.col("kb.block_key"))
            & (F.col("ka.user_id") < F.col("kb.user_id")),
        )
        .select(
            F.col("ka.user_id").alias("user_a"),
            F.col("kb.user_id").alias("user_b"),
        )
        .distinct()
    )
    sa = s.select(F.col("user_id").alias("user_a"), F.col("series").alias("series_a"))
    sb = s.select(F.col("user_id").alias("user_b"), F.col("series").alias("series_b"))
    return pairs.join(sa, "user_a").join(sb, "user_b")


def series_pairs_euclidean_blocked(
    events: DataFrame,
    max_len: int = 256,
    *,
    n_paa: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    bucket_width: float = 4.0,
    seed: int = 42,
    max_bucket_size: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """Candidate user pairs via LSH blocking, with exact aligned-prefix
    Euclidean computed on the survivors (X6 scale path).  See
    `_blocked_candidate_pairs` for the plan shape and bucket cap;
    ``portable=True`` selects the engine-portable md5 block keys
    (`series_block_keys_md5`) so a SQL oracle can reproduce the
    candidate set."""
    cand = _blocked_candidate_pairs(
        events,
        max_len,
        n_paa=n_paa,
        bands=bands,
        rows_per_band=rows_per_band,
        bucket_width=bucket_width,
        seed=seed,
        max_bucket_size=max_bucket_size,
        portable=portable,
    )
    return cand.select(
        "user_a",
        "user_b",
        F.round(
            euclidean_prefix(F.col("series_a"), F.col("series_b")), 6
        ).alias("euclidean"),
    )


_DTW_SCHEMA = T.StructType(
    [
        T.StructField("user_a", T.LongType()),
        T.StructField("user_b", T.LongType()),
        T.StructField("dtw", T.DoubleType()),
    ]
)


def series_pairs_dtw(
    events: DataFrame,
    max_len: int = 64,
    band: int = 8,
    *,
    blocked: bool = False,
    max_users: int = 4096,
    **blocked_kwargs,
) -> DataFrame:
    """Sakoe-Chiba-banded DTW over user pairs (X6 UDF path).

    The pair list is built JVM-side; only (user_a, user_b, two float
    series) reach Python, in Arrow batches, where numpy runs the DP.
    ``blocked=False`` enumerates ALL U·(U-1)/2 pairs via a broadcast
    theta-join — **O(U²) in the number of distinct users**, the exact
    audit twin, right ONLY for small entity cardinality (like the other
    exact twins, it stays out of the bench and the driver prefix).
    ``blocked=True`` takes the LSH-blocked candidates
    (`_blocked_candidate_pairs`, equi-join plan) so the quadratic pair
    list never materializes at scale.  Blocking keys are Euclidean
    (p-stable) — a DTW-close but Euclidean-far pair can be missed; that
    approximation is inherent to LSH prefilters.

    ``max_users`` guards the exact path: if the distinct-user count
    exceeds it, raise instead of silently enumerating the quadratic
    pair list (an accidental large-corpus invocation should fail
    loudly, not run for hours).  The probe is LIMIT-bounded over the
    one-row-per-user frame — max_users+1 rows scanned, the
    `connected_components` small-graph-gate discipline (dedup.py).
    Pass 0/None to disable (or use blocked=True, which never
    enumerates).
    """
    if blocked:
        pairs = _blocked_candidate_pairs(events, max_len, **blocked_kwargs)
    else:
        s = user_series(events, max_len)
        if max_users and s.limit(max_users + 1).count() > max_users:
            raise ValueError(
                f"series_pairs_dtw(blocked=False) is O(U^2) and the input "
                f"has more than max_users={max_users} distinct users; use "
                "blocked=True (LSH candidates) or raise max_users explicitly"
            )
        a = s.alias("a")
        b = s.alias("b")
        pairs = a.join(
            F.broadcast(b), F.col("a.user_id") < F.col("b.user_id")
        ).select(
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
                # the corridor must be at least |n-m| wide or D[n,m]
                # is unreachable and every length-mismatched pair
                # (common: per-user event counts vary) silently comes
                # back Infinity — the standard Sakoe-Chiba adjustment
                w = max(band, abs(n - m))
                big = np.inf
                D = np.full((n + 1, m + 1), big)
                D[0, 0] = 0.0
                for i in range(1, n + 1):
                    lo = max(1, i - w)
                    hi = min(m, i + w)
                    d_row = np.abs(x[i - 1] - y[lo - 1 : hi])
                    for off, j in enumerate(range(lo, hi + 1)):
                        c = d_row[off]
                        D[i, j] = c + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
                out.append((ua, ub, float(D[n, m])))
            yield pd.DataFrame(out, columns=["user_a", "user_b", "dtw"])

    return pairs.mapInPandas(dtw_batch, schema=_DTW_SCHEMA)


def series_topk_similar(
    events: DataFrame,
    k: int = 3,
    max_len: int = 256,
    *,
    blocked: bool = False,
    **blocked_kwargs,
) -> DataFrame:
    """Per-user top-k most similar other users by aligned-prefix
    Euclidean (symmetrized pair list → per-user window).

    ``blocked=False`` (default) ranks over the EXACT all-pairs distance
    table — the oracle-checkable baseline, right when entity cardinality
    is small (the broadcast theta-join is the documented cost).
    ``blocked=True`` ranks over the LSH-blocked candidate pairs
    (`series_pairs_euclidean_blocked`, equi-join plan, extra kwargs
    forwarded) — the 100 TB path.  Like ANN vs brute-force cosine
    (operators/similarity.py), the blocked variant is APPROXIMATE:
    a true neighbor missed by every band is absent from the ranking, so
    it is published as a separate rows-only catalog entry with a recall
    test rather than swapped silently under the exact oracle."""
    from pyspark.sql import Window

    pairs = (
        series_pairs_euclidean_blocked(events, max_len, **blocked_kwargs)
        if blocked
        else series_pairs_euclidean(events, max_len)
    )
    # Symmetrize with ONE explode instead of unionByName(pairs.select(
    # reversed)): Catalyst performs no cross-branch subtree reuse, so
    # the union form re-derived the ENTIRE candidate+distance subtree
    # (sketch explode, bucket-cap window, pair join, distinct, two
    # series-attach joins) once per orientation — 2x every exchange and
    # scan below this point (r14, guide §2.4/§7.2 duplicated-subtree
    # check).  explode(array(fwd, rev)) emits the same multiset of rows
    # from a single computation of the pair table and stays lazy — no
    # checkpoint barrier needed.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("user_a"), F.col("user_b"), F.col("euclidean")
                ),
                F.struct(
                    F.col("user_b").alias("user_a"),
                    F.col("user_a").alias("user_b"),
                    F.col("euclidean"),
                ),
            )
        ).alias("__sym")
    ).select("__sym.user_a", "__sym.user_b", "__sym.euclidean")
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
