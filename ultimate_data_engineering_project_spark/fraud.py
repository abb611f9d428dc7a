"""Fraud-detection rules (SURVEY.md J5/W4/X7): circular transfers and
ledger anomaly checks.

The reference *generates* circular transfers (polished_transactions.py:
364-375: ``recent_transfers[from]=to`` then a same-day B→A echo) and
*declares* their detection (:511).  The declarative detection is a self
equi-join on the swapped (account, counterparty) key pair plus the day
— a hash join on composite keys, no window state, no cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def circular_transfer_pairs(transactions: DataFrame) -> DataFrame:
    """A→B and B→A transfers on the same day (J5).

    Join condition is fully equi (swapped key pair + date): Catalyst
    plans a shuffled hash join keyed on (account, related, day) —
    at 100 TB this scales with transfers per key-day, never n².
    """
    t = transactions.filter(
        (F.col("transaction_type") == "Transfer")
        & F.col("related_account_id").isNotNull()
    ).select(
        "transaction_id",
        "account_id",
        "related_account_id",
        F.to_date("transaction_date").alias("day"),
        "amount",
    )
    a = t.alias("a")
    b = t.alias("b")
    return a.join(
        b,
        on=[
            F.col("a.account_id") == F.col("b.related_account_id"),
            F.col("a.related_account_id") == F.col("b.account_id"),
            F.col("a.day") == F.col("b.day"),
            F.col("a.transaction_id") < F.col("b.transaction_id"),
        ],
    ).select(
        F.col("a.transaction_id").alias("transaction_id_out"),
        F.col("b.transaction_id").alias("transaction_id_back"),
        F.col("a.account_id").alias("account_a"),
        F.col("a.related_account_id").alias("account_b"),
        F.col("a.day").alias("day"),
        F.col("a.amount").alias("amount_out"),
        F.col("b.amount").alias("amount_back"),
    )


def velocity_alerts(
    transactions: DataFrame,
    *,
    max_per_day: int = 10,
    max_amount_per_day: float = 50_000.0,
) -> DataFrame:
    """Per-account daily velocity rule (the standard companion rule to
    the circular check; dashboard 'fraud alerts', reference
    README.md:39): accounts whose daily count or total exceeds limits.
    """
    daily = transactions.filter(F.col("status") == "completed").groupBy(
        "account_id", F.to_date("transaction_date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_trx"),
        F.sum("amount").alias("total_amount"),
    )
    return daily.filter(
        (F.col("n_trx") > max_per_day)
        | (F.col("total_amount") > max_amount_per_day)
    )
