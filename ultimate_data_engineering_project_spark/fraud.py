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


def fraud_training_frame(transactions: DataFrame) -> DataFrame:
    """Per-account features + rule-derived label for the Phase-5 fraud
    scorer: integer velocity features (completed-transaction count,
    large-amount count) and ``is_circular`` = 1 when the account
    appears on either side of a same-day circular transfer
    (`circular_transfer_pairs` — the repo's rule-based detector acts as
    the labeling function, the standard weak-supervision bootstrap when
    no hand-labeled fraud exists).

    One aggregate over transactions + one tiny distinct-account join;
    features are exact integers so the downstream closed-form trainer
    is engine-reproducible.

    The account universe is the FULL union of the two populations:
    features come from completed transactions, the label from transfer
    pairs of ANY status (a failed/pending circular attempt is still a
    fraud signal), so an account whose only activity is a non-completed
    circular pair keeps its row with zero-filled features instead of
    being silently dropped by a features-side left join (r8) — the
    docstring's "appears on either side" contract now actually holds."""
    completed = transactions.filter(F.col("status") == "completed")
    feats = completed.groupBy("account_id").agg(
        F.count(F.lit(1)).alias("n_trx"),
        F.sum((F.col("amount") >= 5000).cast("long")).alias("n_big"),
    )
    pairs = circular_transfer_pairs(transactions)
    circ = (
        pairs.select(F.col("account_a").alias("account_id"))
        .unionByName(pairs.select(F.col("account_b").alias("account_id")))
        .distinct()
        .withColumn("__circ", F.lit(1).cast("long"))
    )
    return (
        feats.join(circ, "account_id", "full")
        .withColumn("n_trx", F.coalesce(F.col("n_trx"), F.lit(0).cast("long")))
        .withColumn("n_big", F.coalesce(F.col("n_big"), F.lit(0).cast("long")))
        .withColumn("is_circular", F.coalesce(F.col("__circ"), F.lit(0).cast("long")))
        .drop("__circ")
    )


def linear_fraud_scores(transactions: DataFrame) -> DataFrame:
    """Phase-5 fraud-scoring model (the reference DECLARES an ML fraud
    detector beyond its rule set, reference README.md:44-48; this is
    its oracle-checkable analog): a linear-probability model over the
    velocity features, trained in CLOSED FORM from exact integer sums
    so any engine reproduces the coefficients bit-for-bit.

    Training is the 3x3 normal-equation solve for
    y ~ b0 + b1*n_trx + b2*n_big via Cramer's rule: one hash aggregate
    accumulates n, Σx1, Σx2, Σx1², Σx2², Σx1x2, Σy, Σx1y, Σx2y as
    longs (exact — no float accumulation order to diverge), the four
    3x3 determinants are integer arithmetic on those sums, and the only
    float ops are the final IEEE divisions b_j = det_j/det and the
    scoring polynomial — both bit-identical across engines, which is
    what lets DuckDB reproduce the trained model exactly (same trick as
    the `user_value_trends` OLS entry).

    Scale shape: ONE pass over transactions for features, a 1-row
    coefficient frame broadcast back over the feature frame (the
    scalar-subquery pattern — the nested loop's build side is exactly
    one row).  No iteration, no driver-side math, no collect.

    Exactness bound: the nine sums accumulate exactly as int64, then
    every determinant term is formed in DECIMAL(38,0) — ~126 bits, the
    same range as the HUGEINT DuckDB promotes SUM(BIGINT) to — so the
    two engines stay bit-identical while det terms < 10^38 (with
    x ≤ 1e4 that holds to ~2e7 accounts: n·Σx²·Σx² ≈ n³x⁴).  Past the
    bound Spark's decimal overflow yields NULL (non-ANSI), which the
    assert_true guard turns into a LOUD plan-level error instead of
    silently-wrapped coefficients; quantize or cap features upstream
    if a new feature trips it.  A singular normal-equation matrix
    (det = 0: degenerate/constant features) yields NULL coefficients
    on both engines rather than leaning on IEEE div-by-zero."""
    labeled = fraud_training_frame(transactions)
    s = labeled.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_trx").alias("s1"),
        F.sum("n_big").alias("s2"),
        F.sum(F.col("n_trx") * F.col("n_trx")).alias("s11"),
        F.sum(F.col("n_big") * F.col("n_big")).alias("s22"),
        F.sum(F.col("n_trx") * F.col("n_big")).alias("s12"),
        F.sum("is_circular").alias("sy"),
        F.sum(F.col("n_trx") * F.col("is_circular")).alias("s1y"),
        F.sum(F.col("n_big") * F.col("is_circular")).alias("s2y"),
    )

    def _d(name: str):
        return F.col(name).cast("decimal(38,0)")

    n, s1, s2 = _d("n"), _d("s1"), _d("s2")
    s11, s22, s12 = _d("s11"), _d("s22"), _d("s12")
    sy, s1y, s2y = _d("sy"), _d("s1y"), _d("s2y")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    # assert_true evaluates to NULL when the condition holds (left
    # operand of the AND, so it runs first): a decimal-overflowed
    # (NULL) determinant aborts the job loudly instead of silently
    # producing garbage coefficients; det = 0 yields NULL coefficients.
    overflow_guard = F.assert_true(
        det.isNotNull()
        & det0.isNotNull()
        & det1.isNotNull()
        & det2.isNotNull(),
        F.lit(
            "fraud-model normal-equation determinant overflowed "
            "decimal(38,0); quantize or cap feature magnitudes upstream"
        ),
    )

    def _coef(det_j):
        return F.when(
            overflow_guard.isNull() & (det != 0),
            det_j.cast("double") / det.cast("double"),
        )

    coef = s.select(
        _coef(det0).alias("b0"),
        _coef(det1).alias("b1"),
        _coef(det2).alias("b2"),
    )
    return labeled.crossJoin(F.broadcast(coef)).select(
        "account_id",
        "n_trx",
        "n_big",
        "is_circular",
        F.round(
            F.col("b0")
            + F.col("b1") * F.col("n_trx")
            + F.col("b2") * F.col("n_big"),
            6,
        ).alias("fraud_score"),
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
