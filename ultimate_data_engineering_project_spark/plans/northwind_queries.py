"""Northwind catalog entries over the reference's ACTUAL rows.

The reference ships Northwind as its secondary dataset — a PostgreSQL
dump with 3,362 data rows (reference northwind.sql:250-3696; DDL at
:43-247).  tools/load_northwind.py freezes those rows to
``fixtures/northwind/*.parquet`` (same frozen-fixture convention as
fixtures/fakestream), and every entry here runs the Spark plan AND the
DuckDB oracle over those same bytes — full rows+schema+hash checks on
genuine Northwind data, not synthetic shapes.

The join surface these entries pin down (schemas.NORTHWIND_SCHEMAS):
  * order_details' composite PK (order_id, product_id)
    (northwind.sql:3745-3746) — 2-column equi-join;
  * employees.reports_to self-FK (northwind.sql:111,3905-3906) —
    hierarchy traversal with a NULL-manager root;
  * the products→categories/suppliers star (northwind.sql:3849-3862);
  * employee_territories' composite PK bridging orders to regions.

Scale notes: all Northwind dims are tiny and broadcast; the fact-side
plans (order_details) keep aggregation keyed on narrow int columns.
The frozen fixtures make these entries constant-size by design — the
100 TB behavior of the same join shapes is exercised by the TPC-H
catalog entries; these pin cross-engine semantics on real rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ultimate_data_engineering_project_spark.functions.scalar import dsum, dsum_sql
from ultimate_data_engineering_project_spark.plans.catalog import register

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NW_DIR = os.path.join(_REPO_ROOT, "fixtures", "northwind")


def _nw(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(_NW_DIR, f"{table}.parquet"))


def _nw_path(table: str) -> str:
    return os.path.join(_NW_DIR, f"{table}.parquet")


# net revenue of one order line — written identically on both engines.
# The true decimal product has <= 4 fractional digits (2-decimal price x
# integer qty x 2-decimal discount), so ROUND(.., 6) recovers that exact
# decimal from the double on BOTH engines (no half-way cases within the
# ~1e-12 float error) before the exact decimal sum; without it, the
# double->DECIMAL(25,10) quantization hits half-way expansions that
# Spark (HALF_UP) and DuckDB round differently.
def _revenue():
    # built lazily: Column construction needs an active SparkContext,
    # and this module is imported by the catalog before any session
    # exists (e.g. pytest collection)
    return F.round(
        F.col("unit_price") * F.col("quantity") * (F.lit(1.0) - F.col("discount")), 6
    )


def _revenue_sql(prefix: str = "") -> str:
    p = f"{prefix}." if prefix else ""
    return f"ROUND({p}unit_price * {p}quantity * (1.0 - {p}discount), 6)"


@register(
    "composite_pk_order_details",
    oracle=f"""
    WITH details AS (
        SELECT * FROM read_parquet('{_nw_path("order_details")}')
    ),
    discounted AS (
        SELECT order_id, product_id, discount
        FROM details WHERE discount > 0
    )
    SELECT d.product_id,
           CAST(COUNT(*) AS BIGINT) AS n_discounted_lines,
           {dsum_sql("ROUND(d.unit_price * d.quantity * (1.0 - d.discount), 6)")} AS discounted_revenue,
           MAX(x.discount) AS max_discount
    FROM details d
    JOIN discounted x
      ON d.order_id = x.order_id AND d.product_id = x.product_id
    GROUP BY d.product_id
    """,
)
def composite_pk_order_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-primary-key equi-join on the REAL Northwind
    order_details rows (PK (order_id, product_id),
    reference northwind.sql:3745-3746; 2,155 rows loaded by
    tools/load_northwind.py): the discounted subset re-joins the full
    detail table on BOTH key columns — a 2-column shuffle-hash key that
    can never row-multiply, then per-product revenue with exact decimal
    accumulation."""
    details = _nw(spark, "order_details")
    discounted = details.filter(F.col("discount") > 0).select(
        "order_id", "product_id", F.col("discount").alias("x_discount")
    )
    joined = details.join(discounted, on=["order_id", "product_id"])
    return joined.groupBy("product_id").agg(
        F.count(F.lit(1)).alias("n_discounted_lines"),
        dsum(_revenue()).alias("discounted_revenue"),
        F.max("x_discount").alias("max_discount"),
    )


@register(
    "self_fk_manager_join",
    oracle=f"""
    WITH e AS (SELECT * FROM read_parquet('{_nw_path("employees")}'))
    SELECT e.employee_id,
           e.last_name,
           e.first_name,
           e.title,
           m.last_name AS manager_last_name,
           CAST(cnt.n_reports AS BIGINT) AS n_direct_reports
    FROM e
    LEFT JOIN e m ON m.employee_id = e.reports_to
    LEFT JOIN (
        SELECT reports_to AS employee_id, COUNT(*) AS n_reports
        FROM e WHERE reports_to IS NOT NULL GROUP BY reports_to
    ) cnt ON cnt.employee_id = e.employee_id
    """,
)
def self_fk_manager_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-referencing FK traversal over the REAL Northwind employees
    (reports_to → employee_id, reference northwind.sql:111,3905-3906;
    9 rows: Fuller is the NULL-manager root with 5 direct reports,
    Buchanan manages 3): each employee joined to their manager plus a
    direct-report count — broadcast self-joins on the hierarchy key."""
    e = _nw(spark, "employees")
    managers = e.select(
        F.col("employee_id").alias("reports_to"),
        F.col("last_name").alias("manager_last_name"),
    )
    counts = (
        e.filter(F.col("reports_to").isNotNull())
        .groupBy(F.col("reports_to").alias("employee_id"))
        .agg(F.count(F.lit(1)).alias("n_direct_reports"))
    )
    return (
        e.join(F.broadcast(managers), "reports_to", "left")
        .join(F.broadcast(counts), "employee_id", "left")
        .select(
            "employee_id",
            "last_name",
            "first_name",
            "title",
            "manager_last_name",
            "n_direct_reports",
        )
    )


@register(
    "northwind_category_supplier_star",
    oracle=f"""
    SELECT c.category_name,
           s.country AS supplier_country,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {dsum_sql(_revenue_sql('od'))} AS revenue
    FROM read_parquet('{_nw_path("order_details")}') od
    JOIN read_parquet('{_nw_path("products")}') p ON od.product_id = p.product_id
    JOIN read_parquet('{_nw_path("categories")}') c ON p.category_id = c.category_id
    JOIN read_parquet('{_nw_path("suppliers")}') s ON p.supplier_id = s.supplier_id
    GROUP BY c.category_name, s.country
    """,
)
def northwind_category_supplier_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join over the REAL Northwind rows (J8): order_details fact
    × products → categories + suppliers dims (reference
    northwind.sql:3849-3862 FKs), revenue by category × supplier
    country.  All three dims broadcast (8/77/29 rows); the fact table
    aggregates on narrow join keys — the canonical small-dim star the
    reference's declared gold layer would build."""
    od = _nw(spark, "order_details")
    p = _nw(spark, "products").select("product_id", "category_id", "supplier_id")
    c = _nw(spark, "categories").select("category_id", "category_name")
    s = _nw(spark, "suppliers").select(
        "supplier_id", F.col("country").alias("supplier_country")
    )
    return (
        od.join(F.broadcast(p), "product_id")
        .join(F.broadcast(c), "category_id")
        .join(F.broadcast(s), "supplier_id")
        .groupBy("category_name", "supplier_country")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(_revenue()).alias("revenue"),
        )
    )


@register(
    "northwind_territory_sales",
    oracle=f"""
    SELECT r.region_description,
           CAST(COUNT(DISTINCT o.order_id) AS BIGINT) AS n_orders,
           {dsum_sql(_revenue_sql('od'))} AS revenue
    FROM read_parquet('{_nw_path("orders")}') o
    JOIN read_parquet('{_nw_path("order_details")}') od ON od.order_id = o.order_id
    JOIN read_parquet('{_nw_path("employees")}') e ON e.employee_id = o.employee_id
    JOIN (
        SELECT employee_id, MIN(territory_id) AS territory_id
        FROM read_parquet('{_nw_path("employee_territories")}')
        GROUP BY employee_id
    ) et ON et.employee_id = e.employee_id
    JOIN read_parquet('{_nw_path("territories")}') t ON t.territory_id = et.territory_id
    JOIN read_parquet('{_nw_path("region")}') r ON r.region_id = t.region_id
    GROUP BY r.region_description
    """,
)
def northwind_territory_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake traversal over the REAL Northwind geography
    (orders → employees → employee_territories (composite PK,
    northwind.sql:3737-3738) → territories → region): revenue per
    sales region, each employee attributed to their first territory so
    the bridge table cannot fan out order lines.  Five broadcast dims
    around the order_details fact."""
    o = _nw(spark, "orders").select("order_id", "employee_id")
    od = _nw(spark, "order_details")
    et = (
        _nw(spark, "employee_territories")
        .groupBy("employee_id")
        .agg(F.min("territory_id").alias("territory_id"))
    )
    t = _nw(spark, "territories").select("territory_id", "region_id")
    r = _nw(spark, "region")
    return (
        od.join(F.broadcast(o), "order_id")
        .join(F.broadcast(et), "employee_id")
        .join(F.broadcast(t), "territory_id")
        .join(F.broadcast(r), "region_id")
        .groupBy("region_description")
        .agg(
            F.count_distinct("order_id").alias("n_orders"),
            dsum(_revenue()).alias("revenue"),
        )
    )
