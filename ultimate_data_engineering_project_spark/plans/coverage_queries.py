"""Coverage catalog entries: fuzzy dedup join (J6), GROUPING SETS /
CUBE (A5 extensions), UNPIVOT, correlated scalar subqueries, and
lexicon-based sentiment (X4) — the remaining SURVEY.md §2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ultimate_data_engineering_project_spark.functions.scalar import dsum, dsum_sql
from ultimate_data_engineering_project_spark.operators.relational import fuzzy_vocab_pairs
from ultimate_data_engineering_project_spark.plans.catalog import register
from ultimate_data_engineering_project_spark.sources.readers import load_table

_POS = ("fast", "big", "value")
_NEG = ("slow", "small", "error")


@register(
    "fuzzy_dedup_part_names",
    oracle="""
    WITH vocab AS (
        SELECT p_name, COUNT(*) AS n_rows
        FROM part
        GROUP BY p_name
    )
    SELECT a.p_name AS name_a,
           b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance,
           a.n_rows AS n_a,
           b.n_rows AS n_b
    FROM vocab a
    JOIN vocab b
      ON regexp_extract(a.p_name, '([a-z]+)$', 1) = regexp_extract(b.p_name, '([a-z]+)$', 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_dedup_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-duplicate detection, distinct-first (J6 — the reference's
    declared fuzzy customer dedup, polished_transactions.py:507).

    Rounds 1-4 ran the blocked Levenshtein self-join at ROW level; on a
    column whose vocabulary is tiny and heavily duplicated (p_name: 64
    distinct values at every SF) that amplifies each string-level match
    by k² row copies — 5.5M output pairs / 24.5s at sf0.1, growing
    quadratically with the table.  The scale-correct plan dedupes the
    vocabulary FIRST (GROUP BY p_name — sublinear in table size), runs
    the blocked thresholded edit distance over the vocabulary only, and
    reports value pairs with occurrence counts; assigning row ids is a
    broadcast join of this (tiny) pair map back onto the table.
    Blocking key: the name's last token (equi-join canopy), mirrored in
    the DuckDB oracle."""
    part = load_table(spark, sf_dir, "part")
    return fuzzy_vocab_pairs(
        part,
        "p_name",
        F.regexp_extract(F.col("p_name"), r"([a-z]+)$", 1),
        max_distance=2,
    )


@register(
    "grouping_sets_volume",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (A5 — per-status, per-priority, and grand
    total in one pass)."""
    orders = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders
        FROM {orders}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        orders=orders,
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           {total} AS total_amount
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """.format(total=dsum_sql("o_totalprice")),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (A5 — all 2^2 grouping combinations)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_amount"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_amount",
        )
    )


@register(
    "unpivot_region_metrics",
    oracle="""
    WITH wide AS (
        SELECT r.r_name,
               CAST(COUNT(*) AS DOUBLE) AS n_customers,
               {bal} AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    )
    SELECT r_name, metric, value
    FROM wide UNPIVOT (value FOR metric IN (n_customers, total_acctbal))
    """.format(bal=dsum_sql("c.c_acctbal")),
)
def unpivot_region_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: wide per-region metrics to long (metric, value) rows —
    the melt operation feeding generic dashboard sinks."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    wide = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )
    return wide.unpivot(
        ids=["r_name"],
        values=["n_customers", "total_acctbal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "correlated_order_share",
    oracle="""
    SELECT o_orderkey, o_custkey,
           o_totalprice / (SELECT CAST(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)
                           FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS spend_share
    FROM orders o
    WHERE o_orderkey % 25 = 0
    """,
)
def correlated_order_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each order's share of its customer's
    total spend).  The DataFrame plan uses a window over the customer
    partition — the decorrelated form Catalyst would produce anyway;
    the oracle keeps the correlated SQL shape."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    total = F.sum(F.col("o_totalprice").cast("decimal(25,10)")).over(w).cast("double")
    return (
        orders.withColumn("spend_share", F.col("o_totalprice") / total)
        .filter(F.col("o_orderkey") % 25 == 0)
        .select("o_orderkey", "o_custkey", "spend_share")
    )


@register(
    "docs_sentiment_lexicon",
    oracle="""
    SELECT doc_id,
           CAST(list_sum(list_transform(string_split(text, ' '),
                w -> CASE WHEN w IN ({pos}) THEN 1
                          WHEN w IN ({neg}) THEN -1
                          ELSE 0 END)) AS BIGINT) AS sentiment_sum,
           ROUND(CAST(list_sum(list_transform(string_split(text, ' '),
                w -> CASE WHEN w IN ({pos}) THEN 1
                          WHEN w IN ({neg}) THEN -1
                          ELSE 0 END)) AS DOUBLE)
                 / LENGTH(string_split(text, ' ')), 6) AS sentiment_score
    FROM documents
    """.format(
        pos=", ".join(f"'{w}'" for w in _POS),
        neg=", ".join(f"'{w}'" for w in _NEG),
    ),
)
def docs_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment scoring (X4 — the PAPERS.md Spark
    sentiment-analysis pattern, done as a pure expression: ±1 token
    votes normalized by length; a real lexicon would be a broadcast
    join against exploded tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    vote = F.aggregate(
        F.transform(
            toks,
            lambda w: F.when(w.isin(*_POS), 1).when(w.isin(*_NEG), -1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return docs.select(
        "doc_id",
        vote.cast("long").alias("sentiment_sum"),
        F.round(vote.cast("double") / F.size(toks), 6).alias("sentiment_score"),
    )


@register(
    "token_frequencies",
    oracle="""
    SELECT token, COUNT(*) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 20
    """,
)
def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies via explode/lateral view (X4 — the
    word-count shape: explode -> groupBy -> top-k).  Partial (map-side)
    aggregation makes the shuffle carry one row per (partition, token),
    not per occurrence."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    freq = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return freq.orderBy(F.col("n_occurrences").desc(), F.col("token")).limit(20)


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native PIVOT (A5) with pinned pivot values — pinning keeps the
    output schema static, which is also what makes pivot scale (no
    driver-side distinct-value discovery pass)."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("O"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("P"),
    )


@register(
    "correlated_small_quantity_revenue",
    oracle="""
    SELECT p.p_brand,
           {rev} / 7.0 AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (
        SELECT 0.2 * (SUM(l2.l_quantity) / COUNT(*))
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY p.p_brand
    """.format(rev=dsum_sql("l.l_extendedprice")),
)
def correlated_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped CORRELATED scalar subquery, run through
    Catalyst's own decorrelation (P-family coverage the hand-decorrelated
    `correlated_order_share` does not give): the SQL text carries the
    per-part correlated aggregate and the optimizer rewrites it into an
    aggregate + join — no nested-loop re-execution per outer row, which
    is what makes correlated SQL viable at 100 TB.  Decorrelation is
    plan-asserted in tests/test_physical_plans.py.

    Determinism: l_quantity is integer-valued (fixture domain 1..50),
    so SUM over doubles is exact in any order; the division,
    0.2-scaling, and comparison are single IEEE ops identical on both
    engines.  Revenue accumulates in DECIMAL (dsum)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # parameterized spark.sql (the grouping_sets_volume pattern), NOT
    # createOrReplaceTempView: session-global view names race when two
    # threads evaluate the catalog against different sf_dirs in one
    # SparkSession — silent wrong-scale results, no error
    return spark.sql(
        """
        SELECT p.p_brand,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,10))) AS DOUBLE)
                   / 7.0 AS avg_yearly,
               COUNT(*) AS n_small
        FROM {li} l
        JOIN {part} p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
            SELECT 0.2 * (SUM(l2.l_quantity) / COUNT(*))
            FROM {li} l2
            WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY p.p_brand
        """,
        li=li,
        part=part,
    )
