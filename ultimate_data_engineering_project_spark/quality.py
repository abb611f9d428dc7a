"""Data-quality detectors (SURVEY.md §7 step 4): one detector per
injected defect class, plus a one-pass ``dq_report``.

The reference *injects* ten defect classes (polished_transactions.py:
26-40) and then recounts some of them with separate SQL scans
(:448-504).  Here each detector is a pure DataFrame predicate/join and
the report folds every row-local rule into a single scan per table
(conditional aggregation) — at 100 TB, 1 pass instead of N.

Detector → injected defect mapping (reference lines):
  dup_customers          :100-110  same name, different email
  missing_contact        :114-115  NULL phone / address
  email_typos            :118-119  a→4 / e→3 substitutions
  invalid_dob            :122-125  impossibly young customers
  negative_balances      :241-244
  impossible_amounts     :344-349
  late_arriving          :377-383  transaction_date ≪ created_at
  future_dated           :386-390  transaction_date > created_at
  inactive_account_trx   :330-334  activity on non-active accounts
  orphan_transactions    oltp_seeder.py:50 (referential integrity)
  circular_transfers     :364-375  (see fraud.py)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ultimate_data_engineering_project_spark.operators.aggregates import conditional_counts
from ultimate_data_engineering_project_spark.operators.relational import anti_join, semi_join


# --- row-local predicates (composable into one-pass reports) -----------

def missing_phone() -> Column:
    return F.col("phone").isNull()


def missing_address() -> Column:
    return F.col("address").isNull()


def email_typo() -> Column:
    """Digits in the name part of the address (before the '-id' unique
    suffix) — the generator's a→4/e→3 substitution signature."""
    return F.split(F.split(F.col("email"), "@")[0], "-")[0].rlike("[34]")


def invalid_dob(min_age_years: int = 10) -> Column:
    return F.col("date_of_birth") > F.date_sub(
        F.to_date("created_at"), min_age_years * 365
    )


def negative_balance() -> Column:
    return F.col("balance") < 0


def impossible_amount() -> Column:
    return (
        (F.col("transaction_type") == "Withdrawal") & (F.col("amount") >= 10_000)
    ) | (F.col("amount") >= 100_000)


def late_arriving(days: int = 5) -> Column:
    # <= not <: the injected defect class draws integer day offsets
    # randint(5, 30) (reference polished_transactions.py:381; our
    # generator mirrors the inclusive lower bound), so the 5-days-exact
    # boundary rows are in-class and a strict < misses ~1/25 of them
    return F.col("transaction_date") <= F.col("created_at") - F.expr(
        f"INTERVAL {days} DAYS"
    )


def future_dated() -> Column:
    return F.col("transaction_date") > F.col("created_at")


# --- join-based detectors ---------------------------------------------

def duplicate_customer_pairs(customers: DataFrame) -> DataFrame:
    """Same full_name, different email (the dup-injection signature).
    Equi-join on the name key — blocking comes free; never O(n²)."""
    a = customers.alias("a")
    b = customers.alias("b")
    return a.join(
        b,
        on=[
            F.col("a.full_name") == F.col("b.full_name"),
            F.col("a.customer_id") < F.col("b.customer_id"),
            F.col("a.email") != F.col("b.email"),
        ],
    ).select(
        F.col("a.customer_id").alias("customer_id_a"),
        F.col("b.customer_id").alias("customer_id_b"),
        F.col("a.full_name").alias("full_name"),
        F.col("a.email").alias("email_a"),
        F.col("b.email").alias("email_b"),
    )


def inactive_account_transactions(
    transactions: DataFrame, accounts: DataFrame
) -> DataFrame:
    """Transactions hitting non-active accounts (J1 — the reference's
    IN-subquery, polished_transactions.py:475-481)."""
    inactive = accounts.filter(F.col("status") != "active").select("account_id")
    return semi_join(transactions, inactive, "account_id")


def orphan_transactions(transactions: DataFrame, accounts: DataFrame) -> DataFrame:
    """Transactions referencing no existing account (J7 anti-join)."""
    return anti_join(transactions, accounts.select("account_id"), "account_id")


# --- one-pass reports --------------------------------------------------

def customer_dq_report(customers: DataFrame) -> DataFrame:
    return conditional_counts(
        customers,
        {
            "n_missing_phone": missing_phone(),
            "n_missing_address": missing_address(),
            "n_missing_contact": missing_phone() | missing_address(),
            "n_email_typos": email_typo(),
            "n_invalid_dob": invalid_dob(),
        },
    )


def account_dq_report(accounts: DataFrame) -> DataFrame:
    return conditional_counts(
        accounts,
        {
            "n_negative_balance": negative_balance(),
            "n_inactive": F.col("status") != "active",
        },
    )


def transaction_dq_report(transactions: DataFrame) -> DataFrame:
    return conditional_counts(
        transactions,
        {
            "n_impossible_amount": impossible_amount(),
            "n_late_arriving": late_arriving(),
            "n_future_dated": future_dated(),
            "n_pending": F.col("status") == "pending",
            "n_failed": F.col("status") == "failed",
        },
    )


def dq_report(
    customers: DataFrame, accounts: DataFrame, transactions: DataFrame
) -> DataFrame:
    """The full DQ summary as one row (A8 — the reference's per-run
    quality report, polished_transactions.py:448-515, minus its N
    round-trips).  Row-local rules: one scan per table; join-based
    rules: one semi/anti/self join each."""
    from ultimate_data_engineering_project_spark.fraud import circular_transfer_pairs

    c = customer_dq_report(customers).withColumnRenamed("total_rows", "n_customers")
    a = account_dq_report(accounts).withColumnRenamed("total_rows", "n_accounts")
    t = transaction_dq_report(transactions).withColumnRenamed(
        "total_rows", "n_transactions"
    )
    # join-based detectors as 1-row aggregates, composed with crossJoins
    # into the SAME plan — one job, no driver-side .count() round-trips.
    joins = (
        duplicate_customer_pairs(customers)
        .agg(F.count(F.lit(1)).alias("n_duplicate_customer_pairs"))
        .crossJoin(
            inactive_account_transactions(transactions, accounts).agg(
                F.count(F.lit(1)).alias("n_inactive_account_trx")
            )
        )
        .crossJoin(
            orphan_transactions(transactions, accounts).agg(
                F.count(F.lit(1)).alias("n_orphan_transactions")
            )
        )
        .crossJoin(
            circular_transfer_pairs(transactions).agg(
                F.count(F.lit(1)).alias("n_circular_transfer_pairs")
            )
        )
    )
    return c.crossJoin(a).crossJoin(t).crossJoin(joins)
