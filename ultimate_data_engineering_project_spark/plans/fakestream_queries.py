"""Fakestream catalog entries (rows-only checks).

These run the reference's own data model (customers/accounts/
transactions with injected defects — FIXTURES.md Family B) generated
in-engine, so there is no fixture parquet and no DuckDB oracle; the
driver records row-count-only checks and tests/test_fakestream.py
asserts the semantics (expected defect rates, ledger invariants,
circular-pair construction) locally.

Volumes are kept small here (these run inside the driver's correctness
pass); the generator itself is O(rows/partition) and scales to any n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ultimate_data_engineering_project_spark import generator, pipelines, quality
from ultimate_data_engineering_project_spark.fraud import circular_transfer_pairs
from ultimate_data_engineering_project_spark.operators import multimodal
from ultimate_data_engineering_project_spark.operators.windows import ledger_running_balance
from ultimate_data_engineering_project_spark.plans.catalog import register
from ultimate_data_engineering_project_spark.sources.readers import load_table

_N_CUST, _N_ACCT, _N_TRX = 2_000, 200, 2_000


def _fakestream(spark: SparkSession):
    return generator.gen_fakestream(spark, _N_CUST, _N_ACCT, _N_TRX, seed=42)


@register("fakestream_dq_report", oracle=None)
def fakestream_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row DQ summary over the seeded fakestream triple (A8 —
    the reference's quality report, polished_transactions.py:448-515,
    detectors mirroring all ten injected defect classes)."""
    t = _fakestream(spark)
    return quality.dq_report(t["customers"], t["accounts"], t["transactions"])


@register("fakestream_ledger", oracle=None)
def fakestream_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-balance ledger over generated transactions (X7 — signed
    deltas, transfer double-legs, completed-only; the declarative form
    of oltp_seeder.py:450-487)."""
    t = _fakestream(spark)
    return ledger_running_balance(t["transactions"])


@register("fakestream_current_balances", oracle=None)
def fakestream_current_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final balance per account — the reference's mutable
    accounts.balance column recomputed from the ledger."""
    t = _fakestream(spark)
    return pipelines.account_balances(t["transactions"])


@register("fakestream_circular_transfers", oracle=None)
def fakestream_circular_transfers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular-transfer fraud pairs (J5 — A→B / B→A same day,
    polished_transactions.py:364-375,511)."""
    t = _fakestream(spark)
    return circular_transfer_pairs(t["transactions"])


@register("fakestream_scd2_customers", oracle=None)
def fakestream_scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 customer dimension built from a simulated change feed (W1):
    15%/day churn on phone/address (polished_transactions.py:163-192),
    versioned with effective_from/to + is_current."""
    t = _fakestream(spark)
    base = t["customers"]
    # simulate one day of churn: 15% of customers get an updated row
    churned = (
        base.filter(F.rand(7) < 0.15)
        .withColumn("phone", F.format_string("+1-999-%07d", F.pmod(F.xxhash64("customer_id"), 10_000_000)))
        .withColumn("updated_at", F.col("updated_at") + F.expr("INTERVAL 1 DAY"))
    )
    change_log = base.unionByName(churned)
    return pipelines.silver_customers_scd2(change_log)


@register("fakestream_silver_customers", oracle=None)
def fakestream_silver_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver customer build: typo-normalized email, dedup-keep-latest
    on the duplicate-injection key, DQ quarantine flags."""
    t = _fakestream(spark)
    return pipelines.silver_customers(t["customers"])


@register("fakestream_gold_dashboards", oracle=None)
def fakestream_gold_dashboards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-layer daily transaction volume (dashboard #1,
    README.md:36) over the generated facts."""
    t = _fakestream(spark)
    return pipelines.gold_daily_transaction_volume(t["transactions"])


@register("multimodal_decode_features", oracle=None)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing (X5): binary media column →
    Arrow-batched mapInPandas decode/featurize (decode kernel stubbed —
    codecs not in this container; schema/batching/partitioning real)."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_fake_binary(docs)
    return multimodal.decode_features(media)
