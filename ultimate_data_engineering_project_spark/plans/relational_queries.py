"""Relational query catalog entries (SURVEY.md §2.1-2.4, §2.6-2.8).

Each entry cites the reference operator(s) it re-expresses (IDs from
SURVEY.md §2, with reference file:line in that table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ultimate_data_engineering_project_spark.functions.scalar import davg, davg_sql, dsum, dsum_sql
from ultimate_data_engineering_project_spark.operators import aggregates, relational
from ultimate_data_engineering_project_spark.plans.catalog import register
from ultimate_data_engineering_project_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# A5 flagship: daily transaction-volume dashboard (reference README.md:36)
# ---------------------------------------------------------------------------
@register(
    "flagship_daily_order_volume",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS order_day,
           COUNT(*) AS n_orders,
           {total} AS total_amount
    FROM orders
    GROUP BY order_day
    """.format(total=dsum_sql("o_totalprice")),
)
def flagship_daily_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order volumes (A5 — the reference's #1 declared dashboard,
    README.md:36; analog of daily transaction volume over
    transactions.transaction_date)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.to_date("o_orderdate").alias("order_day")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_amount"),
    )


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           {sum_qty} AS sum_qty,
           {sum_base} AS sum_base_price,
           {sum_disc} AS sum_disc_price,
           {avg_qty} AS avg_qty,
           {avg_price} AS avg_price,
           {avg_disc} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_qty=dsum_sql("l_quantity"),
        sum_base=dsum_sql("l_extendedprice"),
        sum_disc=dsum_sql("l_extendedprice * (1 - l_discount)"),
        avg_qty=davg_sql("l_quantity"),
        avg_price=davg_sql("l_extendedprice"),
        avg_disc=davg_sql("l_discount"),
    ),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary (A2/A5 batched conditional
    aggregation — the one-pass version of the reference's per-metric
    scans, polished_transactions.py:448-504)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Filters / projections (P1-P11, S3-S4)
# ---------------------------------------------------------------------------
@register(
    "filter_open_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
    """,
)
def filter_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality + range filter with projection (P2/S4 — the reference's
    `WHERE status='active'` scans, oltp_seeder.py:355-359).  Both
    predicates and the 4-column projection push down to the parquet
    scan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000.0)
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@register(
    "filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_returnflag = 'R' AND l_discount >= 0.05) OR l_quantity >= 45.0
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive/conjunctive compound predicate (P9/P10 —
    oltp_seeder.py:245-253, polished_transactions.py:475-481)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "R") & (F.col("l_discount") >= 0.05))
        | (F.col("l_quantity") >= 45.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "filter_null_semantics",
    oracle="""
    SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_norm,
           COUNT(*) AS n
    FROM orders
    GROUP BY status_norm
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling semantics: NULLIF/COALESCE normalization (P4 — the
    reference's `phone IS NULL OR address IS NULL` DQ rule,
    polished_transactions.py:457, applied to a fixture column)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_norm"
        )
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "filter_recent_window",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {total} AS total_amount
    FROM orders
    WHERE o_orderdate > (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """.format(total=dsum_sql("o_totalprice")),
)
def filter_recent_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative time-window filter (P5 — `created_at > NOW() - INTERVAL
    '90 days'`, polished_transactions.py:163-165).  "now" is the table's
    own max event time so the query is deterministic; the scalar max is
    broadcast, not collected."""
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("__mx"))
    return (
        orders.join(F.broadcast(mx))
        .filter(F.col("o_orderdate") > F.col("__mx") - F.expr("INTERVAL 90 DAYS"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_amount"),
        )
    )


@register(
    "filter_month_bucket",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           COUNT(*) AS n_items,
           {qty} AS sum_qty
    FROM lineitem
    GROUP BY ship_month
    """.format(qty=dsum_sql("l_quantity")),
)
def filter_month_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date truncation bucketing (P8/F2 — `DATE(transaction_date) =
    CURRENT_DATE`, oltp_seeder.py:522-525, generalized to monthly
    buckets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("ship_month")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_quantity").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k (O1-O2)
# ---------------------------------------------------------------------------
@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (O1 — `ORDER BY created_at DESC LIMIT n`,
    database_seeder.py:136-139).  Plans TakeOrderedAndProject: per-
    partition k-heaps, no global sort."""
    orders = load_table(spark, sf_dir, "orders")
    return aggregates.topk(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    )


# ---------------------------------------------------------------------------
# Joins (J1-J8)
# ---------------------------------------------------------------------------
@register(
    "join_customers_per_region",
    oracle="""
    SELECT r.r_name,
           COUNT(*) AS n_customers,
           {bal} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """.format(bal=dsum_sql("c.c_acctbal")),
)
def join_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK equi-join chain with broadcast dimensions (J3 — the
    accounts↔customers FK walk, database_seeder.py:136-140).  nation and
    region are broadcast: the customer side never shuffles for the
    join."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = relational.fk_join(
        relational.fk_join(
            customer,
            nation.withColumnRenamed("n_nationkey", "c_nationkey"),
            "c_nationkey",
        ),
        region.withColumnRenamed("r_regionkey", "n_regionkey"),
        "n_regionkey",
    )
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("total_acctbal"),
    )


@register(
    "join_order_revenue_topk",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, {rev} AS revenue
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """.format(rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)")),
)
def join_order_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join + grouped revenue + top-k (J3+A5+O1).  Revenue
    is aggregated BEFORE the join (map-side partial per l_orderkey), and
    the top-k is taken BEFORE the join too: l_orderkey is a foreign key
    into orders, so ranking the aggregated revenue first shrinks the
    join's probe side from |orders| rows to k — the joined/attach step
    then broadcasts k rows instead of shuffling the whole fact table."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    top = aggregates.topk(rev, [F.col("revenue").desc(), F.col("o_orderkey")], 10)
    joined = orders.select("o_orderkey", "o_custkey").join(F.broadcast(top), "o_orderkey")
    return joined.select("o_orderkey", "o_custkey", "revenue").orderBy(
        F.col("revenue").desc(), F.col("o_orderkey")
    )


@register(
    "semi_join_customer_segments",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def semi_join_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (J1 — the reference's IN-subquery joins,
    polished_transactions.py:475-481)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    with_orders = relational.semi_join(
        customer, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    )
    return with_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (J7 — orphaned-record / referential-integrity
    detection, the reference's declared DQ issue #10, oltp_seeder.py:50)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return relational.anti_join(
        customer, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "self_join_same_day_orders",
    oracle="""
    SELECT a.o_custkey AS custkey,
           CAST(a.o_orderdate AS DATE) AS order_day,
           a.o_orderkey AS orderkey_a,
           b.o_orderkey AS orderkey_b
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND CAST(a.o_orderdate AS DATE) = CAST(b.o_orderdate AS DATE)
     AND a.o_orderkey < b.o_orderkey
    """,
)
def self_join_same_day_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self equi-join pairing (J5 — the circular-transfer fraud shape
    `A→B and B→A same day`, polished_transactions.py:364-375, expressed
    on the fixture: order pairs by the same customer on the same day).
    Equi-keys keep it a hash join, never cartesian."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_day", F.to_date("o_orderdate")
    )
    pairs = relational.self_pairs(orders, ["o_custkey", "order_day"], "o_orderkey")
    return pairs.select(
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.order_day").alias("order_day"),
        F.col("a.o_orderkey").alias("orderkey_a"),
        F.col("b.o_orderkey").alias("orderkey_b"),
    )


@register(
    "star_join_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           {rev} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """.format(rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)")),
)
def star_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (J8 — the Northwind star affordance,
    northwind.sql:3809-3858, on the fixture star schema; TPC-H Q5
    shape).  Dimension chain customer←nation←region broadcasts; only
    lineitem⋈orders shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    dims = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("c_custkey").alias("o_custkey"), "n_name")
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    facts = li.select(
        F.col("l_orderkey").alias("o_orderkey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
    ).join(o, "o_orderkey").join(F.broadcast(dims), "o_custkey")
    return facts.groupBy("n_name").agg(
        dsum(F.col("__rev")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A8)
# ---------------------------------------------------------------------------
@register(
    "conditional_dq_aggregate",
    oracle="""
    SELECT COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_discount,
           CAST(SUM(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_tax,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
           CAST(SUM(CASE WHEN l_quantity >= 48.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
    FROM lineitem
    """,
)
def conditional_dq_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass multi-metric conditional aggregation (A2/A8 — the
    reference's DQ report runs ~6 separate COUNT scans,
    polished_transactions.py:448-504; this is the single-scan recast —
    on 100 TB the difference between 1 read and 6)."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggregates.conditional_counts(
        li,
        {
            "n_high_discount": F.col("l_discount") > 0.08,
            "n_zero_tax": F.col("l_tax") == 0.0,
            "n_returned": F.col("l_returnflag") == "R",
            "n_bulk": F.col("l_quantity") >= 48.0,
        },
    )


@register(
    "agg_sum_coalesce",
    oracle="""
    SELECT COALESCE({bal}, 0.0) AS total_balance,
           COUNT(*) AS n_suppliers
    FROM supplier
    WHERE s_acctbal > 0.0
    """.format(bal=dsum_sql("s_acctbal")),
)
def agg_sum_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar SUM with NULL→0 coalesce (A3 — `SELECT SUM(balance) ...`
    with the Python-side `or 0`, oltp_seeder.py:519-520)."""
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.filter(F.col("s_acctbal") > 0.0).agg(
        F.coalesce(dsum("s_acctbal"), F.lit(0.0)).alias("total_balance"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )


@register(
    "group_topk_parts_by_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey
               ) AS BIGINT) AS rn
        FROM part
    )
    WHERE rn <= 3
    """,
)
def group_topk_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number (A-family ranking used by W2
    dedup-keep-latest, polished_transactions.py:507)."""
    part = load_table(spark, sf_dir, "part")
    out = aggregates.group_topk(
        part.select("p_brand", "p_partkey", "p_retailprice"),
        ["p_brand"],
        [F.col("p_retailprice").desc(), F.col("p_partkey")],
        3,
    )
    return out.withColumn("rn", F.col("rn").cast("long"))


@register(
    "rollup_order_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           {total} AS total_amount
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """.format(total=dsum_sql("o_totalprice")),
)
def rollup_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation (A5 extension — subtotal rows for
    the dashboards the reference declares, README.md:36-40)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
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
    "distinct_counts_lineitem",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def distinct_counts_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (A7 — the reference's driver-side
    `{row[0] for row in result}` uniqueness sets, oltp_seeder.py:107-108,
    distributed)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7)
# ---------------------------------------------------------------------------
@register(
    "set_except_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION + EXCEPT set algebra (§2.7 — dedup audit / incremental
    idempotency building blocks)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    auto = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    early = orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return relational.except_distinct(
        relational.union_distinct(building, auto), early
    )


@register(
    "set_intersect_customers",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
    """,
)
def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (§2.7): customers active in both 1997 and 1998."""
    orders = load_table(spark, sf_dir, "orders")

    def year_custs(y: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp_ntz"))
        ).select(F.col("o_custkey").alias("c_custkey"))

    return relational.intersect_distinct(year_custs(1997), year_custs(1998))


# ---------------------------------------------------------------------------
# Scalar function showcases (F1-F11)
# ---------------------------------------------------------------------------
@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           REPLACE(c_name, '#', '-') AS name_repl,
           LPAD(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
           REVERSE(c_mktsegment) AS segment_rev,
           CONCAT(c_mktsegment, ':', c_name) AS seg_name
    FROM customer
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (F5-F7 — the reference's replace/format/
    truncate string work, polished_transactions.py:106-119,397;
    oltp_seeder.py:274)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_repl"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.reverse("c_mktsegment").alias("segment_rev"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
           CAST(DAY(o_orderdate) AS BIGINT) AS order_dayofmonth,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(DATEDIFF('day', DATE '1997-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch97
    FROM orders
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery (F1-F3 — NOW()/DATE()/interval
    arithmetic, oltp_seeder.py:245-247, polished_transactions.py:165)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_dayofmonth"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        d.alias("order_date"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(d, F.lit("1997-01-01").cast("date")).cast("long").alias(
            "days_since_epoch97"
        ),
    )


@register(
    "math_functions",
    oracle="""
    SELECT p_partkey,
           ROUND(p_retailprice, 1) AS price_round1,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(ABS(p_size - 25) AS BIGINT) AS size_dev,
           GREATEST(p_retailprice, 1000.0) AS price_floor1000,
           LEAST(p_retailprice, 1500.0) AS price_cap1500,
           SQRT(p_retailprice) AS price_sqrt,
           CAST(p_size % 7 AS BIGINT) AS size_mod7
    FROM part
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery (F8-F11 — round/clamp/uniform arithmetic,
    oltp_seeder.py:418-432,462).  Only IEEE-exact ops (sqrt yes, log/pow
    no — libm rounding differs across engines)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_round1"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
        F.greatest(F.col("p_retailprice"), F.lit(1000.0)).alias("price_floor1000"),
        F.least(F.col("p_retailprice"), F.lit(1500.0)).alias("price_cap1500"),
        F.sqrt("p_retailprice").alias("price_sqrt"),
        (F.col("p_size") % 7).cast("long").alias("size_mod7"),
    )


@register(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k,
           CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON extraction (§2.8 — the events.props JSON
    column, FIXTURES.md; from_json/get_json_object family)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        F.sum(F.when(k.isNull(), 1).otherwise(0)).cast("long").alias("n_missing_k"),
    )
