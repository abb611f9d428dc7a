"""Advanced relational query shapes (SURVEY.md §2.3 J3/J8, §2.4 A5,
§2.5 W3, §2.8): correlated EXISTS, multi-way nation-pair flows,
scalar-subquery thresholds, outer-join distributions, window value
functions, time-range rolling frames, and array-function batteries.

These widen the catalog beyond the reference's literal SQL surface to
the query shapes its declared dashboards and transformation layer imply
(reference README.md:36-40; polished_transactions.py:506-513), each as
a DataFrame plan with a DuckDB oracle.

Scale notes: every dimension join broadcasts; every scalar subquery is
a one-row broadcast cross-join (never a global window over raw facts);
fact-fact joins pre-aggregate before joining where semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ultimate_data_engineering_project_spark.functions.scalar import dsum, dsum_sql
from ultimate_data_engineering_project_spark.operators import aggregates, relational
from ultimate_data_engineering_project_spark.plans.catalog import register
from ultimate_data_engineering_project_spark.sources.readers import load_table


@register(
    "exists_late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o.o_orderpriority
    """,
)
def exists_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS as a conditioned left-semi join (J1 — TPC-H Q4
    shape; the reference's IN-subquery pattern generalized to a
    non-equi correlation, polished_transactions.py:475-481)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    late = orders.join(li, cond, "left_semi")
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "nation_pair_trade_flows",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           {rev} AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE ns.n_name IN ('NATION_1', 'NATION_2') AND nc.n_name <> ns.n_name
    GROUP BY supp_nation, cust_nation, ship_year
    """.format(rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)")),
)
def nation_pair_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation → customer-nation trade flows by ship year (J8
    multi-way star join, TPC-H Q7 shape — the reference's Northwind
    star affordance, northwind.sql:3809-3858).  All four dimension
    sides broadcast; lineitem↔orders is the only shuffled join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation")
    )
    supp = F.broadcast(
        supplier.join(F.broadcast(ns), "s_nationkey")
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .select(F.col("s_suppkey").alias("l_suppkey"), "supp_nation")
    )
    cust = F.broadcast(
        customer.join(F.broadcast(nc), "c_nationkey").select(
            F.col("c_custkey").alias("o_custkey"), "cust_nation"
        )
    )
    flows = (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .join(supp, "l_suppkey")  # broadcast: prunes ~92% of lineitem early
        .join(orders, "o_orderkey")
        .join(cust, "o_custkey")
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return flows.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("ship_year"),
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "market_share_yearly",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
           {nat_rev} / {all_rev} AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'AMERICA'
    GROUP BY order_year
    """.format(
        nat_rev=dsum_sql(
            "CASE WHEN ns.n_name = 'NATION_5' "
            "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END"
        ),
        all_rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)"),
    ),
)
def market_share_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of a region's yearly revenue (TPC-H Q8 shape):
    conditional aggregation computes numerator and denominator in a
    single pass — no second scan, no self-join (A2 batching applied to
    the reference's per-metric report scans, oltp_seeder.py:513-525)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")

    cust_in_region = F.broadcast(
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(
                        region.filter(F.col("r_name") == "AMERICA").select(
                            F.col("r_regionkey").alias("n_regionkey")
                        )
                    ),
                    "n_regionkey",
                ).select(F.col("n_nationkey").alias("c_nationkey"))
            ),
            "c_nationkey",
        ).select("c_custkey")
    )
    supp_nation = F.broadcast(
        supplier.join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            "s_nationkey",
        ).select(F.col("s_suppkey").alias("l_suppkey"), "supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .join(orders, "o_orderkey")
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, "l_suppkey")
    )
    return joined.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year")
    ).agg(
        (
            dsum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(0.0))
            / dsum(rev)
        ).alias("mkt_share")
    )


@register(
    "part_value_share",
    oracle="""
    SELECT l_partkey, {rev} AS part_revenue
    FROM lineitem
    GROUP BY l_partkey
    HAVING {rev} > (
        SELECT 0.0008 * {rev_all} FROM lineitem
    )
    """.format(
        rev=dsum_sql("l_extendedprice * (1 - l_discount)"),
        rev_all=dsum_sql("l_extendedprice * (1 - l_discount)"),
    ),
)
def part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups exceeding a fraction of a global total (TPC-H Q11 shape —
    HAVING against a scalar subquery).  The global total is a one-row
    broadcast joined to the per-part aggregate: at 100 TB this is two
    passes over lineitem and zero global windows."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(dsum(rev).alias("part_revenue"))
    total = li.agg((F.lit(0.0008) * dsum(rev)).alias("__threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_revenue") > F.col("__threshold"))
        .select("l_partkey", "part_revenue")
    )


@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count histogram over customers (TPC-H Q13 shape: outer
    join preserving zero-order customers, then a distribution over the
    grouped counts — the reference's customer-acquisition dashboard
    affordance, README.md:37)."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    per_cust = customer.join(orders, "c_custkey", "left").groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "top_supplier_by_revenue",
    oracle="""
    WITH supplier_rev AS (
        SELECT l_suppkey AS s_suppkey, {rev} AS total_revenue
        FROM lineitem
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN supplier_rev r ON r.s_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM supplier_rev)
    """.format(rev=dsum_sql("l_extendedprice * (1 - l_discount)")),
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row(s) achieving a global MAX over an aggregate (TPC-H Q15
    shape).  The max is a one-row broadcast; equality is exact because
    both engines produce the identical decimal-accumulated double."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    best = rev.agg(F.max("total_revenue").alias("__best"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("__best"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")), "s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "brand_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type NOT LIKE 'PROMO%' AND p.p_size < 15
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per brand/type/size with NOT LIKE
    exclusion (TPC-H Q16 shape; A7 distinct-set aggregation made
    distributed — the reference's driver-side set dedup,
    oltp_seeder.py:107-108)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    filtered = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size") < 15)
    ).select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(filtered), "l_partkey")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "big_ticket_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {qty} AS total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING {qty_h} > 300.0
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """.format(qty=dsum_sql("l.l_quantity"), qty_h=dsum_sql("l_quantity")),
)
def big_ticket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold, with customer
    attached (TPC-H Q18 shape: IN-subquery over a grouped HAVING →
    aggregate-then-semi-join; J1+A5).  The qualifying keys are computed
    once and broadcast back against the facts."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300.0)
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    return (
        orders.join(F.broadcast(qualifying), "o_orderkey")
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@register(
    "wealthy_segment_summary",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           {bal} AS total_acctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT {avg_bal} FROM customer WHERE c_acctbal > 0.0
    )
    GROUP BY c_mktsegment
    """.format(
        bal=dsum_sql("c_acctbal"),
        avg_bal=dsum_sql("c_acctbal") + " / COUNT(c_acctbal)",
    ),
)
def wealthy_segment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter against a scalar-subquery average (TPC-H Q22 shape —
    A4's scalar-subquery pattern, polished_transactions.py:163-168).
    The average over positive balances is a one-row broadcast; the
    threshold double is bit-identical on both engines (decimal sum /
    bigint count)."""
    customer = load_table(spark, sf_dir, "customer")
    positive = customer.filter(F.col("c_acctbal") > 0.0)
    threshold = positive.agg(
        (dsum("c_acctbal") / F.count("c_acctbal")).alias("__avg_bal")
    )
    return (
        customer.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@register(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_price,
           LAG(o_totalprice, 1, 0.0) OVER w AS prev_price,
           LEAD(o_totalprice, 1) OVER w AS next_price
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value-function battery: first/last/nth value over an
    explicit full frame, lag with default, lead (W1-W3 support surface
    — SCD2 effective_to uses exactly this lead/lag machinery,
    oltp_seeder.py:159-232)."""
    orders = load_table(spark, sf_dir, "orders")
    order_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = order_w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(running).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
        # lag/lead take no frame spec (they address rows by offset)
        F.lag("o_totalprice", 1, 0.0).over(order_w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(order_w).alias("next_price"),
    )


@register(
    "range_rolling_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch_ms(o_orderdate)
               RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW
           ) AS VARCHAR) AS DOUBLE) AS rolling_30d_spend
    FROM orders
    """,
)
def range_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-customer 30-day rolling spend over
    event time (W3 — the trend-dashboard rolling aggregate, README.md:37,
    with a value-range frame instead of a row frame).  Ordering key is
    epoch millis so the frame is a true time interval; the in-frame sum
    is decimal-accumulated (frame content is deterministic, so the
    cross-engine hash matches)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # fixture timestamps are NTZ; session TZ is UTC, so the cast to
        # (UTC-)timestamp preserves the instant for unix_millis
        .orderBy(F.unix_millis(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * 86400 * 1000, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,10)"))
        .over(w)
        .cast("double")
        .alias("rolling_30d_spend"),
    )


@register(
    "interval_join_purchase_clicks",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           c.event_id AS click_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
     AND CAST(c.ts AS TIMESTAMP) <  CAST(p.ts AS TIMESTAMP)
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def interval_join_purchase_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval non-equi join (J9 family): every purchase paired
    with the same user's clicks in the preceding hour.  The equi half
    (user_id) keys the shuffle; the interval predicate filters within
    the hash-join match — never a cartesian.  Streaming twin:
    streaming/pipelines.stream_purchase_after_click (same plan under
    watermarks)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") < F.col("purchase_ts")),
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


@register(
    "range_join_error_windows",
    oracle="""
    WITH ev AS (
        SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
        FROM events
    )
    SELECT p.event_id AS purchase_id,
           e.event_id AS error_id,
           p.us AS purchase_us,
           e.us AS error_us
    FROM ev p
    JOIN ev e
      ON p.event_type = 'purchase'
     AND e.event_type = 'error'
     AND p.us >= e.us
     AND p.us < e.us + 600000000
    """,
)
def range_join_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with NO equi key (J9 hard case): every purchase paired
    with every system-wide error whose 10-minute impact window covers it.
    Unlike interval_join_purchase_clicks there is no per-user key to
    hash-partition on — incidents are global — so the naive inequality
    join is a BroadcastNestedLoopJoin comparing |purchases| x |errors|
    rows.  operators/relational.bin_range_join restores an equi key by
    time-bucketing: points land in one 10-minute bucket, windows explode
    into the (<=2) buckets they touch, and the exact predicate filters
    inside the hash match.  Plan-asserted nested-loop-free
    (tests/test_physical_plans.py).  DuckDB's IEJoin runs the same query
    natively — the oracle is the plain inequality join."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("us").alias("purchase_us")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("us").alias("error_us"),
        (F.col("us") + F.lit(600_000_000)).alias("win_end"),
    )
    return relational.bin_range_join(
        purchases,
        errors,
        point_col="purchase_us",
        start_col="error_us",
        end_col="win_end",
        bin_width=600_000_000,
    ).select("purchase_id", "error_id", "purchase_us", "error_us")


@register(
    "self_fk_supplier_hierarchy",
    oracle="""
    WITH employees AS (
        SELECT s_suppkey, s_name,
               CASE WHEN s_suppkey > 0 THEN s_suppkey // 2 END AS reports_to
        FROM supplier
    )
    SELECT e.s_suppkey, e.s_name, m.s_name AS manager_name
    FROM employees e
    LEFT JOIN employees m ON m.s_suppkey = e.reports_to
    """,
)
def self_fk_supplier_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-referencing FK traversal at TPC-H scale (J8): a binary-tree
    hierarchy derived deterministically over supplier, walked with a
    self left-join (the root keeps a NULL manager).  The same shape
    over the REAL Northwind employees rows is
    plans/northwind_queries.self_fk_manager_join."""
    supplier = load_table(spark, sf_dir, "supplier")
    employees = supplier.select(
        "s_suppkey",
        "s_name",
        F.when(F.col("s_suppkey") > 0, (F.col("s_suppkey") / 2).cast("long")).alias(
            "reports_to"
        ),
    )
    managers = employees.select(
        F.col("s_suppkey").alias("reports_to"), F.col("s_name").alias("manager_name")
    )
    return employees.join(F.broadcast(managers), "reports_to", "left").select(
        "s_suppkey", "s_name", "manager_name"
    )


@register(
    "agg_modern_battery",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
           bool_and(l_quantity > 0.0) AS all_positive_qty,
           bool_or(l_tax > 0.07) AS any_high_tax,
           median(l_quantity) AS median_qty,
           CAST(MIN(l_shipdate) AS TIMESTAMP) AS first_ship,
           CAST(MAX(l_shipdate) AS TIMESTAMP) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_modern_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern aggregate surface (A2 generalization): count_if,
    bool_and/bool_or, exact median, min/max over event time — one pass,
    conditional aggregation batched like the DQ report (A8)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_and(F.col("l_quantity") > 0.0).alias("all_positive_qty"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.median("l_quantity").alias("median_qty"),
        F.min(F.col("l_shipdate").cast("timestamp")).alias("first_ship"),
        F.max(F.col("l_shipdate").cast("timestamp")).alias("last_ship"),
    )


@register("approx_sketch_battery", oracle=None)
def approx_sketch_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based approximations (A7 scale path): HLL distinct counts
    and quantile sketches per group — the sub-linear-memory versions of
    COUNT(DISTINCT)/percentile for 100 TB cardinalities.  Rows-only:
    sketch estimates are engine-specific; tolerance vs exact values is
    asserted in tests/test_sinks_sketches.py.  Quantiles are projected
    as scalar p50/p90/p99 columns (the driver harness canonicalizes
    scalar cells; array cells are unhashable in pandas)."""
    li = load_table(spark, sf_dir, "lineitem")
    agged = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("__q"),
    )
    return agged.select(
        "l_returnflag",
        "approx_orders",
        "approx_parts",
        F.element_at("__q", 1).alias("p50"),
        F.element_at("__q", 2).alias("p90"),
        F.element_at("__q", 3).alias("p99"),
    )


@register(
    "array_functions_battery",
    oracle="""
    SELECT event_id,
           len(arr) AS arr_len,
           CAST(list_sum(arr) AS BIGINT) AS arr_sum,
           list_contains(arr, 3) AS has_three,
           arr[2] AS second_elem,
           list_reverse(arr)[1] AS last_elem
    FROM (
        SELECT event_id,
               generate_series(1, CAST(event_id % 5 + 1 AS BIGINT)) AS arr
        FROM events
    )
    """,
)
def array_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface (§2.8 — required by the driver fixtures'
    array<float> embeddings, SURVEY.md §1.5): sequence construction,
    size, fold-sum, membership, positional and reversed access.  All
    JVM-side expressions; the same kernels power the cosine/top-k ops
    (operators/similarity.py)."""
    events = load_table(spark, sf_dir, "events").select("event_id")
    arr = F.sequence(F.lit(1).cast("long"), F.col("event_id") % 5 + 1)
    with_arr = events.withColumn("arr", arr)
    return with_arr.select(
        "event_id",
        F.size("arr").alias("arr_len"),
        F.aggregate("arr", F.lit(0).cast("long"), lambda a, v: a + v).alias("arr_sum"),
        F.array_contains("arr", F.lit(3).cast("long")).alias("has_three"),
        F.try_element_at("arr", F.lit(2)).alias("second_elem"),
        F.try_element_at(F.reverse("arr"), F.lit(1)).alias("last_elem"),
    )


@register(
    "composite_pk_lineitem_returns",
    oracle=f"""
    WITH details AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        FROM lineitem
    ),
    returns AS (
        SELECT l_orderkey, l_linenumber, l_shipdate
        FROM lineitem
        WHERE l_returnflag = 'R'
    )
    SELECT d.l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_returned_lines,
           {dsum_sql('d.l_extendedprice')} AS returned_revenue,
           CAST(MIN(r.l_shipdate) AS DATE) AS first_return_ship
    FROM details d
    JOIN returns r
      ON d.l_orderkey = r.l_orderkey AND d.l_linenumber = r.l_linenumber
    GROUP BY d.l_partkey
    """,
)
def composite_pk_lineitem_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-primary-key equi-join at TPC-H scale: lineitem's
    (l_orderkey, l_linenumber) composite PK joins the detail rows to
    their return events on BOTH key columns — a 2-column shuffle-hash
    key, partition-pruned and never a row-multiplying single-key join.
    The same shape over the REAL Northwind order_details rows is
    plans/northwind_queries.composite_pk_order_details."""
    li = load_table(spark, sf_dir, "lineitem")
    details = li.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    returns = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    joined = details.join(returns, on=["l_orderkey", "l_linenumber"])
    return joined.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_returned_lines"),
        dsum("l_extendedprice").alias("returned_revenue"),
        F.min(F.col("l_shipdate").cast("date")).alias("first_return_ship"),
    )


def _pagerank_oracle(iters: int, damping: int = 850_000) -> str:
    """Unrolled power-iteration CTE chain mirroring graph.pagerank_int
    bit-for-bit: DuckDB prohibits aggregates in a recursive member, so
    a fixed iteration count unrolls into r1..rN (all arithmetic BIGINT
    floor division — `//` here, `div` in Spark, identical on
    non-negative operands)."""
    base = 1_000_000 - damping
    parts = [
        """
    WITH edges AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               COUNT(*) AS weight
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY src, dst
    ),
    outd AS (SELECT src, SUM(weight) AS w_out FROM edges GROUP BY src),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst AS node FROM edges
        )
    ),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    r{i} AS (
        SELECT n.node,
               CAST({base} + ({damping} * COALESCE(s.s, 0)) // 1000000
                    AS BIGINT) AS r
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, SUM((r.r * e.weight) // o.w_out) AS s
            FROM edges e
            JOIN r{i - 1} r ON e.src = r.node
            JOIN outd o ON e.src = o.src
            GROUP BY e.dst
        ) s ON n.node = s.node
    )"""
        )
    parts.append(
        f"""
    SELECT nn.n_name AS nation, r.r AS rank_ppm
    FROM r{iters} r JOIN nation nn ON nn.n_nationkey = r.node"""
    )
    return "".join(parts)


@register("nation_trade_pagerank", oracle=_pagerank_oracle(6))
def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation trade graph (iterative-algorithm
    family): nodes are nations, an edge supplier-nation → customer-
    nation weighted by lineitem count, 6 power iterations at damping
    0.85 in exact ppm fixed-point (see operators/graph.pagerank_int —
    the edge frame partitions on src ONCE and only the |V|-row rank
    frame moves per iteration; the oracle unrolls the same integer
    recurrence).  Integer weights (counts, not revenue) keep every
    engine's arithmetic exact."""
    from ultimate_data_engineering_project_spark.operators import graph

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    ranks = graph.pagerank_int(edges, iters=6, damping_ppm=850_000)
    return ranks.join(
        F.broadcast(nation), ranks.node == nation.n_nationkey
    ).select(F.col("n_name").alias("nation"), "rank_ppm")
