"""Fakestream catalog entries — hash-checked against DuckDB oracles.

These run the reference's own data model (customers/accounts/
transactions with injected defects — FIXTURES.md Family B).  The seeded
Spark-native generator (generator.gen_fakestream) is frozen once to
``fixtures/fakestream/*.parquet`` (tools/gen_fixtures.py) so that the
Spark plan and the DuckDB oracle read the very same bytes: every entry
here is a full rows+schema+hash driver check, not a rows-only run.
Generator semantics themselves (defect rates, ledger invariants,
circular-pair construction) are asserted in tests/test_fakestream.py.

Cross-engine conventions (see plans/catalog.py docstring): money is
accumulated in DECIMAL and cast to DOUBLE at the output edge; counts
are BIGINT on both sides; window orders carry full deterministic
tiebreaks (the ledger's ``leg`` column breaks the same-account transfer
tie).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ultimate_data_engineering_project_spark import pipelines, quality
from ultimate_data_engineering_project_spark import fraud
from ultimate_data_engineering_project_spark.fraud import circular_transfer_pairs
from ultimate_data_engineering_project_spark.operators import multimodal
from ultimate_data_engineering_project_spark.operators.windows import ledger_running_balance
from ultimate_data_engineering_project_spark.plans.catalog import register
from ultimate_data_engineering_project_spark.sources.readers import load_table

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_FIXTURE_DIR = os.path.join(_REPO_ROOT, "fixtures", "fakestream")
_CUST = os.path.join(_FIXTURE_DIR, "customers.parquet")
_ACCT = os.path.join(_FIXTURE_DIR, "accounts.parquet")
_TRX = os.path.join(_FIXTURE_DIR, "transactions.parquet")


def _fx(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# shared oracle fragment: the signed ledger legs (operators/windows.py
# _ledger_legs, declaratively)
_LEGS_SQL = f"""
    WITH t AS (SELECT * FROM read_parquet('{_TRX}') WHERE status = 'completed'),
    legs AS (
        SELECT account_id, transaction_id, transaction_date, 0 AS leg,
               CASE WHEN transaction_type IN ('Deposit', 'Refund') THEN amount
                    WHEN transaction_type IN ('Withdrawal', 'Payment', 'Transfer')
                         THEN -amount
                    ELSE 0 END AS delta
        FROM t
        UNION ALL
        SELECT related_account_id AS account_id, transaction_id,
               transaction_date, 1 AS leg, amount AS delta
        FROM t
        WHERE transaction_type = 'Transfer' AND related_account_id IS NOT NULL
    )
"""


@register(
    "fakestream_dq_report",
    oracle=f"""
    SELECT
      CAST((SELECT COUNT(*) FROM read_parquet('{_CUST}')) AS BIGINT) AS n_customers,
      CAST((SELECT count_if(phone IS NULL) FROM read_parquet('{_CUST}')) AS BIGINT) AS n_missing_phone,
      CAST((SELECT count_if(address IS NULL) FROM read_parquet('{_CUST}')) AS BIGINT) AS n_missing_address,
      CAST((SELECT count_if(phone IS NULL OR address IS NULL) FROM read_parquet('{_CUST}')) AS BIGINT) AS n_missing_contact,
      CAST((SELECT count_if(regexp_matches(string_split(string_split(email, '@')[1], '-')[1], '[34]')) FROM read_parquet('{_CUST}')) AS BIGINT) AS n_email_typos,
      CAST((SELECT count_if(date_of_birth > CAST(created_at AS DATE) - 3650) FROM read_parquet('{_CUST}')) AS BIGINT) AS n_invalid_dob,
      CAST((SELECT COUNT(*) FROM read_parquet('{_ACCT}')) AS BIGINT) AS n_accounts,
      CAST((SELECT count_if(balance < 0) FROM read_parquet('{_ACCT}')) AS BIGINT) AS n_negative_balance,
      CAST((SELECT count_if(status <> 'active') FROM read_parquet('{_ACCT}')) AS BIGINT) AS n_inactive,
      CAST((SELECT COUNT(*) FROM read_parquet('{_TRX}')) AS BIGINT) AS n_transactions,
      CAST((SELECT count_if((transaction_type = 'Withdrawal' AND amount >= 10000) OR amount >= 100000) FROM read_parquet('{_TRX}')) AS BIGINT) AS n_impossible_amount,
      CAST((SELECT count_if(transaction_date <= created_at - INTERVAL 5 DAY) FROM read_parquet('{_TRX}')) AS BIGINT) AS n_late_arriving,
      CAST((SELECT count_if(transaction_date > created_at) FROM read_parquet('{_TRX}')) AS BIGINT) AS n_future_dated,
      CAST((SELECT count_if(status = 'pending') FROM read_parquet('{_TRX}')) AS BIGINT) AS n_pending,
      CAST((SELECT count_if(status = 'failed') FROM read_parquet('{_TRX}')) AS BIGINT) AS n_failed,
      CAST((SELECT COUNT(*) FROM read_parquet('{_CUST}') a JOIN read_parquet('{_CUST}') b
            ON a.full_name = b.full_name AND a.customer_id < b.customer_id
               AND a.email <> b.email) AS BIGINT) AS n_duplicate_customer_pairs,
      CAST((SELECT COUNT(*) FROM read_parquet('{_TRX}')
            WHERE account_id IN (SELECT account_id FROM read_parquet('{_ACCT}')
                                 WHERE status <> 'active')) AS BIGINT) AS n_inactive_account_trx,
      CAST((SELECT COUNT(*) FROM read_parquet('{_TRX}')
            WHERE account_id NOT IN (SELECT account_id FROM read_parquet('{_ACCT}'))) AS BIGINT) AS n_orphan_transactions,
      CAST((SELECT COUNT(*)
            FROM (SELECT transaction_id, account_id, related_account_id,
                         CAST(transaction_date AS DATE) AS day
                  FROM read_parquet('{_TRX}')
                  WHERE transaction_type = 'Transfer'
                        AND related_account_id IS NOT NULL) a
            JOIN (SELECT transaction_id, account_id, related_account_id,
                         CAST(transaction_date AS DATE) AS day
                  FROM read_parquet('{_TRX}')
                  WHERE transaction_type = 'Transfer'
                        AND related_account_id IS NOT NULL) b
            ON a.account_id = b.related_account_id
               AND a.related_account_id = b.account_id
               AND a.day = b.day
               AND a.transaction_id < b.transaction_id) AS BIGINT) AS n_circular_transfer_pairs
    """,
)
def fakestream_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row DQ summary over the frozen fakestream triple (A8 —
    the reference's quality report, polished_transactions.py:448-515,
    detectors mirroring all ten injected defect classes), one scan per
    table + one semi/anti/self join each, composed into a single plan."""
    return quality.dq_report(
        _fx(spark, _CUST), _fx(spark, _ACCT), _fx(spark, _TRX)
    )


# shared by the plain ledger and its skew-safe chunked twin — ONE
# oracle, so the driver's hash check proves the chunked-prefix-sum
# recomposition bit-equal to the single-window ledger.
_LEDGER_SQL = _LEGS_SQL + """
    SELECT account_id, transaction_id, transaction_date,
           CAST(leg AS INT) AS leg,
           CAST(delta AS DOUBLE) AS delta,
           CAST(SUM(delta) OVER (
               PARTITION BY account_id
               ORDER BY transaction_date, transaction_id, leg
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS balance
    FROM legs
    """


@register("fakestream_ledger", oracle=_LEDGER_SQL)
def fakestream_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-balance ledger over the frozen transactions (X7 — signed
    deltas, transfer double-legs, completed-only; the declarative form
    of oltp_seeder.py:450-487).  DECIMAL accumulation inside, DOUBLE at
    the output edge per the catalog's hash-match conventions."""
    ledger = ledger_running_balance(_fx(spark, _TRX))
    return ledger.select(
        "account_id",
        "transaction_id",
        "transaction_date",
        F.col("leg").cast("int").alias("leg"),
        F.col("delta").cast("double").alias("delta"),
        F.col("balance").cast("double").alias("balance"),
    )


@register("fakestream_ledger_chunked", oracle=_LEDGER_SQL)
def fakestream_ledger_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-SAFE ledger (windows.ledger_running_balance_chunked):
    signed legs identical to fakestream_ledger, but the running balance
    is a chunked prefix sum — phase 1 within (account, 7-day chunk),
    phase 2 a per-chunk offset from the tiny chunk-total summary — so
    one account holding 10% of a 100 TB transaction table spreads over
    its chunks instead of one unsplittable window task.  The oracle is
    IDENTICAL to fakestream_ledger's: one hash check proves the
    recomposition bit-equal to the single-window X7 semantics
    (oltp_seeder.py:450-487)."""
    from ultimate_data_engineering_project_spark.operators.windows import (
        ledger_running_balance_chunked,
    )

    ledger = ledger_running_balance_chunked(_fx(spark, _TRX))
    return ledger.select(
        "account_id",
        "transaction_id",
        "transaction_date",
        F.col("leg").cast("int").alias("leg"),
        F.col("delta").cast("double").alias("delta"),
        F.col("balance").cast("double").alias("balance"),
    )


@register("fakestream_ledger_auto", oracle=_LEDGER_SQL)
def fakestream_ledger_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-AWARE ledger dispatch
    (windows.ledger_running_balance_auto) on the reference's own
    workload shape: the probe reads the per-account LEG histogram and
    picks the single-window or chunked-prefix-sum ledger — the choice
    the balance loop (oltp_seeder.py:483-487) can't make in advance
    because the hot account appears mid-stream.  The oracle is
    IDENTICAL to both siblings': whichever plan the probe picks, the
    hash check proves the balances unchanged."""
    from ultimate_data_engineering_project_spark.operators.windows import (
        ledger_running_balance_auto,
    )

    ledger = ledger_running_balance_auto(_fx(spark, _TRX))
    return ledger.select(
        "account_id",
        "transaction_id",
        "transaction_date",
        F.col("leg").cast("int").alias("leg"),
        F.col("delta").cast("double").alias("delta"),
        F.col("balance").cast("double").alias("balance"),
    )


@register(
    "fakestream_current_balances",
    oracle=_LEGS_SQL
    + """
    SELECT account_id, CAST(SUM(delta) AS DOUBLE) AS current_balance
    FROM legs
    GROUP BY account_id
    """,
)
def fakestream_current_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final balance per account — the reference's mutable
    accounts.balance column recomputed from the signed legs with one
    partial-aggregating groupBy (no window sort needed for the total)."""
    out = pipelines.account_balances(_fx(spark, _TRX))
    return out.select(
        "account_id", F.col("current_balance").cast("double").alias("current_balance")
    )


@register(
    "fakestream_circular_transfers",
    oracle=f"""
    WITH tr AS (
        SELECT transaction_id, account_id, related_account_id,
               CAST(transaction_date AS DATE) AS day, amount
        FROM read_parquet('{_TRX}')
        WHERE transaction_type = 'Transfer' AND related_account_id IS NOT NULL
    )
    SELECT a.transaction_id AS transaction_id_out,
           b.transaction_id AS transaction_id_back,
           a.account_id AS account_a,
           a.related_account_id AS account_b,
           a.day AS day,
           CAST(a.amount AS DOUBLE) AS amount_out,
           CAST(b.amount AS DOUBLE) AS amount_back
    FROM tr a
    JOIN tr b
      ON a.account_id = b.related_account_id
     AND a.related_account_id = b.account_id
     AND a.day = b.day
     AND a.transaction_id < b.transaction_id
    """,
)
def fakestream_circular_transfers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular-transfer fraud pairs (J5 — A→B / B→A same day,
    polished_transactions.py:364-375,511): composite-key self equi-join,
    never a cartesian."""
    out = circular_transfer_pairs(_fx(spark, _TRX))
    return out.select(
        "transaction_id_out",
        "transaction_id_back",
        "account_a",
        "account_b",
        "day",
        F.col("amount_out").cast("double").alias("amount_out"),
        F.col("amount_back").cast("double").alias("amount_back"),
    )


# The weak-supervision training frame both fraud-model oracles share:
# circular-transfer label + velocity features, FULL-joined so a
# circular account with no completed transaction keeps its row (zero
# features) — mirrors fraud.fraud_training_frame's population contract.
_LABELED_CTES = f"""
    tf AS (
        SELECT transaction_id, account_id, related_account_id,
               CAST(transaction_date AS DATE) AS day
        FROM read_parquet('{_TRX}')
        WHERE transaction_type = 'Transfer' AND related_account_id IS NOT NULL
    ),
    pairs AS (
        SELECT a.account_id AS acc1, a.related_account_id AS acc2
        FROM tf a
        JOIN tf b
          ON a.account_id = b.related_account_id
         AND a.related_account_id = b.account_id
         AND a.day = b.day
         AND a.transaction_id < b.transaction_id
    ),
    circ AS (
        SELECT DISTINCT account_id FROM (
            SELECT acc1 AS account_id FROM pairs
            UNION ALL
            SELECT acc2 AS account_id FROM pairs
        )
    ),
    feats AS (
        SELECT account_id,
               CAST(COUNT(*) AS BIGINT) AS n_trx,
               CAST(count_if(amount >= 5000) AS BIGINT) AS n_big
        FROM read_parquet('{_TRX}')
        WHERE status = 'completed'
        GROUP BY account_id
    ),
    labeled AS (
        SELECT COALESCE(f.account_id, c.account_id) AS account_id,
               COALESCE(f.n_trx, 0) AS n_trx,
               COALESCE(f.n_big, 0) AS n_big,
               CAST(CASE WHEN c.account_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                   AS is_circular
        FROM feats f FULL JOIN circ c ON f.account_id = c.account_id
    )"""


@register(
    "fakestream_fraud_scores",
    oracle=f"""
    WITH {_LABELED_CTES},
    s AS (
        SELECT COUNT(*) AS n,
               SUM(n_trx) AS s1, SUM(n_big) AS s2,
               SUM(n_trx * n_trx) AS s11, SUM(n_big * n_big) AS s22,
               SUM(n_trx * n_big) AS s12,
               SUM(is_circular) AS sy,
               SUM(n_trx * is_circular) AS s1y,
               SUM(n_big * is_circular) AS s2y
        FROM labeled
    ),
    dets AS (
        -- SUM(BIGINT) is HUGEINT here, mirroring Spark's decimal(38,0)
        -- determinant arithmetic (~126 bits on both engines)
        SELECT
          n * (s11 * s22 - s12 * s12)
            - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2) AS det,
          sy * (s11 * s22 - s12 * s12)
            - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y) AS det0,
          n * (s1y * s22 - s12 * s2y)
            - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2) AS det1,
          n * (s11 * s2y - s1y * s12)
            - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2) AS det2
        FROM s
    ),
    coef AS (
        -- singular normal equations (det = 0) => NULL coefficients on
        -- both engines, never IEEE div-by-zero
        SELECT
          CASE WHEN det <> 0
               THEN CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) END AS b0,
          CASE WHEN det <> 0
               THEN CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) END AS b1,
          CASE WHEN det <> 0
               THEN CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) END AS b2
        FROM dets
    )
    SELECT l.account_id, l.n_trx, l.n_big, l.is_circular,
           ROUND(b0 + b1 * l.n_trx + b2 * l.n_big, 6) AS fraud_score
    FROM labeled l, coef
    """,
)
def fakestream_fraud_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase-5 fraud-scoring model, trained and applied in one plan
    (reference README.md:44-48 declares an ML fraud detector beyond its
    rules; this is the oracle-checkable analog — see
    fraud.linear_fraud_scores): velocity features per account, circular
    -transfer involvement as the weak label, closed-form normal-
    equation linear-probability fit from exact integer sums, scores
    broadcast back over every account.  The DuckDB oracle re-derives
    the identical coefficients (integer determinants, one IEEE division
    each), so the TRAINED MODEL itself is hash-checked, not just the
    feature plumbing."""
    return fraud.linear_fraud_scores(_fx(spark, _TRX))


def _trained_fraud_oracle(steps: int) -> str:
    """Unrolled Newton/IRLS chain mirroring fraud.trained_fraud_scores
    bit-for-bit (the pagerank-oracle pattern — DuckDB prohibits
    aggregates in a recursive member, so a fixed step count unrolls
    into w0..wN): per step, micro-quantized BIGINT Hessian/gradient
    sums (order-free exact), HUGEINT Cramer determinants (DuckDB's
    SUM(BIGINT) promotion ≈ Spark's decimal(38,0)), one IEEE division
    per coefficient, re-quantize."""
    sig = "1.0 / (1.0 + EXP(-((w.w0 + w.w1 * l.n_trx + w.w2 * l.n_big) / 1000000.0)))"
    xs = ["1", "p.n_trx", "p.n_big"]
    parts = [
        f"""
    WITH {_LABELED_CTES},
    w0_ AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                   CAST(0 AS BIGINT) AS w2)"""
    ]
    for t in range(1, steps + 1):
        hg = []
        for i in range(3):
            for j in range(i, 3):
                hg.append(
                    f"SUM(CAST(ROUND(p.wd * {xs[i]} * {xs[j]} * 1000000) "
                    f"AS BIGINT)) AS h{i}{j}"
                )
        for i in range(3):
            hg.append(
                f"SUM(CAST(ROUND(p.resid * {xs[i]} * 1000000) AS BIGINT)) "
                f"AS g{i}"
            )
        parts.append(
            f""",
    s{t} AS (
        SELECT w0, w1, w2, {', '.join(hg)}
        FROM (
            SELECT w.w0, w.w1, w.w2, l.n_trx, l.n_big,
                   ({sig}) * (1.0 - ({sig})) AS wd,
                   l.is_circular - ({sig}) AS resid
            FROM labeled l, w{t - 1}_ w
        ) p
        GROUP BY w0, w1, w2
    ),
    d{t} AS (
        SELECT w0, w1, w2, g0, g1, g2,
          h00 * (h11 * h22 - h12 * h12)
            - h01 * (h01 * h22 - h12 * h02)
            + h02 * (h01 * h12 - h11 * h02) AS det,
          g0 * (h11 * h22 - h12 * h12)
            - h01 * (g1 * h22 - h12 * g2)
            + h02 * (g1 * h12 - h11 * g2) AS det0,
          h00 * (g1 * h22 - h12 * g2)
            - g0 * (h01 * h22 - h12 * h02)
            + h02 * (h01 * g2 - g1 * h02) AS det1,
          h00 * (h11 * g2 - g1 * h12)
            - h01 * (h01 * g2 - g1 * h02)
            + g0 * (h01 * h12 - h11 * h02) AS det2
        FROM s{t}
    ),
    w{t}_ AS (
        SELECT
          CASE WHEN det <> 0 THEN w0 + CAST(ROUND(
            CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) * 1000000
          ) AS BIGINT) END AS w0,
          CASE WHEN det <> 0 THEN w1 + CAST(ROUND(
            CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) * 1000000
          ) AS BIGINT) END AS w1,
          CASE WHEN det <> 0 THEN w2 + CAST(ROUND(
            CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) * 1000000
          ) AS BIGINT) END AS w2
        FROM d{t}
    )"""
        )
    parts.append(
        f"""
    SELECT l.account_id, l.n_trx, l.n_big, l.is_circular,
           w.w0, w.w1, w.w2,
           ROUND({sig}, 6) AS fraud_score
    FROM labeled l, w{steps}_ w"""
    )
    return "".join(parts)


@register("fraud_model_trained", oracle=_trained_fraud_oracle(4))
def fraud_model_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ITERATIVELY-TRAINED Phase-5 fraud model (reference
    README.md:47-53; fakestream_fraud_scores is the closed-form linear
    probe, this is the logistic upgrade): 4 Newton/IRLS steps from
    w = 0, each step a micro-quantized exact Hessian/gradient
    aggregate + a Cramer 3x3 solve — the iterative-algorithm family's
    trained-model member, fixed-point and hash-checked like PageRank.
    The DuckDB oracle re-runs the identical unrolled recurrence, so
    the TRAINED COEFFICIENTS themselves are verified cross-engine
    (they ride on every output row as w0/w1/w2 micro-units)."""
    return fraud.trained_fraud_scores(_fx(spark, _TRX))


_DEBEZIUM_TXN_SCHEMA = """
{"type": "record", "name": "transactions", "namespace": "fakestream.public",
 "fields": [
  {"name": "transaction_id", "type": "long"},
  {"name": "account_id", "type": "long"},
  {"name": "transaction_type", "type": "string"},
  {"name": "amount",
   "type": {"type": "bytes", "logicalType": "decimal",
            "precision": 15, "scale": 2}},
  {"name": "refund_amount",
   "type": ["null", {"type": "bytes", "logicalType": "decimal",
                     "precision": 15, "scale": 2}]},
  {"name": "transaction_date",
   "type": {"type": "long", "logicalType": "timestamp-micros"}},
  {"name": "settled_at",
   "type": ["null", {"type": "long", "logicalType": "timestamp-millis"}]},
  {"name": "related_account_id", "type": ["null", "long"]},
  {"name": "status", "type": "string"},
  {"name": "day", "type": {"type": "int", "logicalType": "date"}}
 ]}
"""


@register(
    "avro_debezium_txn_roundtrip",
    oracle=f"""
    SELECT CAST(21 AS INTEGER) AS schema_id,
           transaction_id,
           account_id,
           transaction_type,
           CAST(amount AS VARCHAR) AS amount,
           CAST(CASE WHEN transaction_type = 'Refund' THEN amount END
                AS DOUBLE) AS refund_amount,
           transaction_date,
           CASE WHEN status = 'completed'
                THEN date_trunc('second', transaction_date) END AS settled_at,
           related_account_id,
           status,
           CAST(transaction_date AS DATE) AS day
    FROM read_parquet('{_TRX}')
    """,
)
def avro_debezium_txn_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's OWN transactions table through the executable
    Confluent-Avro CDC path, logical types included (S13): Debezium's
    AvroConverter serializes `Numeric(15,2)` as ``bytes``+``decimal``
    and `DateTime` as ``long``+``timestamp-micros``/``millis``
    (reference schemas.py:37,53,59-60; docker-compose.yaml:74-97), so a
    codec without those types cannot decode the reference's actual
    envelope.  Here every fixture transaction is Avro-encoded with the
    Debezium-shaped schema (two's-complement unscaled decimals, epoch
    micro/millisecond timestamps, epoch-day dates, null unions on the
    optional columns), Confluent-framed, stripped, and decoded back by
    the pure-Python codec — and the DuckDB oracle reads the same typed
    values straight from parquet, so every decimal byte and timestamp
    tick must survive the wire bit-exactly to hash-match."""
    from ultimate_data_engineering_project_spark.sources import avro_py

    rows = _fx(spark, _TRX).select(
        "transaction_id",
        "account_id",
        "transaction_type",
        "amount",
        F.when(F.col("transaction_type") == "Refund", F.col("amount"))
        .alias("refund_amount"),
        "transaction_date",
        F.when(
            F.col("status") == "completed",
            F.date_trunc("second", F.col("transaction_date")),
        ).alias("settled_at"),
        "related_account_id",
        "status",
        F.to_date("transaction_date").alias("day"),
    )
    frames = avro_py.encode_confluent_frames(rows, _DEBEZIUM_TXN_SCHEMA, 21)
    decoded = avro_py.decode_confluent_avro_py(frames, _DEBEZIUM_TXN_SCHEMA)
    return decoded.select(
        "schema_id",
        "transaction_id",
        "account_id",
        "transaction_type",
        # decimal leaves as its exact STRING form ('1021.70'): DuckDB's
        # pandas bridge degrades DECIMAL to float64, so the string cast
        # is what keeps the scale-2 exactness inside the hash check
        F.col("amount").cast("string").alias("amount"),
        # nullable money leaves as DOUBLE (catalog convention); its
        # union branch + decimal wire coverage rides `amount` above
        F.col("refund_amount").cast("double").alias("refund_amount"),
        "transaction_date",
        "settled_at",
        "related_account_id",
        "status",
        "day",
    )


_DEBEZIUM_ENVELOPE_SCHEMA = """
{"type": "record", "name": "Envelope",
 "namespace": "fakestream.public.transactions",
 "fields": [
  {"name": "before", "type": ["null", {"type": "record", "name": "Value",
   "fields": [
      {"name": "transaction_id", "type": "long"},
      {"name": "account_id", "type": "long"},
      {"name": "amount",
       "type": {"type": "bytes", "logicalType": "decimal",
                "precision": 15, "scale": 2}},
      {"name": "transaction_date",
       "type": {"type": "long", "logicalType": "timestamp-micros"}},
      {"name": "status", "type": ["null", "string"]}
  ]}]},
  {"name": "after", "type": ["null", "Value"]},
  {"name": "source", "type": {"type": "record", "name": "Source",
   "fields": [
      {"name": "connector", "type": "string"},
      {"name": "ts_ms", "type": "long"}
  ]}},
  {"name": "op", "type": "string"},
  {"name": "ts_ms", "type": ["null", "long"]}
 ]}
"""


@register(
    "avro_debezium_envelope_decode",
    oracle=f"""
    SELECT CAST(33 AS INTEGER) AS schema_id,
           CASE WHEN transaction_id % 10 = 0 THEN 'd' ELSE 'c' END AS op,
           transaction_id,
           account_id,
           CAST(amount AS VARCHAR) AS amount,
           transaction_date,
           status,
           'postgresql' AS connector,
           epoch_ms(CAST(created_at AS TIMESTAMP)) AS src_ts_ms
    FROM read_parquet('{_TRX}')
    """,
)
def avro_debezium_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Debezium change-event envelope through the pure-Python
    Avro path (S13): before/after as positional ``["null", "Value"]``
    unions with ``Value`` defined once and referenced by NAME, a nested
    ``source`` metadata record, and decimal/timestamp logical types
    inside the row image — byte-for-byte the schema shape Debezium's
    AvroConverter registers for the reference's transactions table
    (reference docker-compose.yaml:74-97; schemas.py:37-60).

    Every 10th transaction becomes a DELETE (row image in ``before``,
    ``after`` null) and the rest are creates, so BOTH union branches
    carry real nested records in the same frame.  Encode -> Confluent
    frame -> strip -> decode, then the consumer-side
    ``coalesce(after, before)`` read; the DuckDB oracle recomputes the
    same rows straight from parquet, so the whole nested wire format —
    union indexes, sub-record field order, unscaled decimal bytes,
    epoch-micro timestamps — must survive bit-exactly to hash-match."""
    from ultimate_data_engineering_project_spark.sources import avro_py

    trx = _fx(spark, _TRX)
    fields = avro_py.parse_flat_schema(_DEBEZIUM_ENVELOPE_SCHEMA)
    value_t = avro_py.spark_schema_for(fields)["before"].dataType
    image = F.struct(
        "transaction_id",
        "account_id",
        "amount",
        "transaction_date",
        "status",
    )
    is_del = F.col("transaction_id") % 10 == 0
    null_image = F.lit(None).cast(value_t)
    envelopes = trx.select(
        F.when(is_del, image).otherwise(null_image).alias("before"),
        F.when(~is_del, image).otherwise(null_image).alias("after"),
        F.struct(
            F.lit("postgresql").alias("connector"),
            F.unix_millis(F.col("created_at").cast("timestamp")).alias("ts_ms"),
        ).alias("source"),
        F.when(is_del, F.lit("d")).otherwise(F.lit("c")).alias("op"),
        F.unix_millis(F.col("created_at").cast("timestamp")).alias("ts_ms"),
    )
    frames = avro_py.encode_confluent_frames(
        envelopes, _DEBEZIUM_ENVELOPE_SCHEMA, 33
    )
    decoded = avro_py.decode_confluent_avro_py(
        frames, _DEBEZIUM_ENVELOPE_SCHEMA
    )
    img = F.coalesce(F.col("after"), F.col("before"))
    return decoded.select(
        "schema_id",
        "op",
        img["transaction_id"].alias("transaction_id"),
        img["account_id"].alias("account_id"),
        img["amount"].cast("string").alias("amount"),
        img["transaction_date"].alias("transaction_date"),
        img["status"].alias("status"),
        F.col("source.connector").alias("connector"),
        F.col("source.ts_ms").alias("src_ts_ms"),
    )


_SCD2_SENTINEL = "2200-01-01 00:00:00"


@register(
    "fakestream_scd2_customers",
    oracle=f"""
    WITH base AS (SELECT * FROM read_parquet('{_CUST}')),
    churned AS (
        SELECT customer_id, full_name, email,
               printf('+1-999-%07d', (customer_id * 7919) % 10000000) AS phone,
               address, date_of_birth, created_at,
               updated_at + INTERVAL 1 DAY AS updated_at
        FROM base
        WHERE customer_id % 7 = 0
    ),
    log AS (SELECT * FROM base UNION ALL SELECT * FROM churned)
    SELECT customer_id, full_name, email, phone, address, date_of_birth,
           created_at, updated_at,
           updated_at AS effective_from,
           COALESCE(LEAD(updated_at) OVER w,
                    TIMESTAMP '{_SCD2_SENTINEL}') AS effective_to,
           LEAD(updated_at) OVER w IS NULL AS is_current
    FROM log
    WINDOW w AS (PARTITION BY customer_id ORDER BY updated_at)
    """,
)
def fakestream_scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 customer dimension from a simulated change feed (W1):
    deterministic one-day churn (customer_id % 7 ⇒ ~14%, the
    reference's 15%/day phone churn, polished_transactions.py:163-192),
    versioned with effective_from/to + is_current.  The far-future
    sentinel stays inside pandas' ns timestamp range."""
    base = _fx(spark, _CUST)
    churned = (
        base.filter(F.col("customer_id") % 7 == 0)
        .withColumn(
            "phone",
            F.format_string("+1-999-%07d", (F.col("customer_id") * 7919) % 10_000_000),
        )
        .withColumn("updated_at", F.col("updated_at") + F.expr("INTERVAL 1 DAY"))
    )
    return pipelines.silver_customers_scd2(base.unionByName(churned))


@register(
    "fakestream_silver_customers",
    oracle=f"""
    WITH normed AS (
        SELECT *,
               lower(translate(email, '43', 'ae')) AS email_norm,
               lower(full_name) AS name_norm
        FROM read_parquet('{_CUST}')
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY name_norm
            ORDER BY updated_at DESC, customer_id DESC
        ) AS __rn
        FROM normed
    )
    SELECT customer_id, full_name, email, phone, address, date_of_birth,
           created_at, updated_at, email_norm, name_norm,
           ((phone IS NULL AND address IS NULL)
            OR date_of_birth > CAST(created_at AS DATE) - 3650) AS dq_quarantine
    FROM ranked
    WHERE __rn = 1
    """,
)
def fakestream_silver_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver customer build: typo-normalized email, dedup-keep-latest
    on the duplicate-injection key, DQ quarantine flags."""
    return pipelines.silver_customers(_fx(spark, _CUST))


@register(
    "fakestream_gold_dashboards",
    oracle=f"""
    SELECT CAST(transaction_date AS DATE) AS day,
           transaction_type,
           CAST(COUNT(*) AS BIGINT) AS n_transactions,
           CAST(SUM(amount) AS DOUBLE) AS total_amount
    FROM read_parquet('{_TRX}')
    GROUP BY 1, 2
    """,
)
def fakestream_gold_dashboards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-layer daily transaction volume (dashboard #1,
    README.md:36) over the frozen facts."""
    out = pipelines.gold_daily_transaction_volume(_fx(spark, _TRX))
    return out.select(
        "day",
        "transaction_type",
        "n_transactions",
        F.col("total_amount").cast("double").alias("total_amount"),
    )


@register(
    "multimodal_resize_thumbs",
    oracle="""
    SELECT doc_id,
           CAST(8 AS INTEGER) AS out_width,
           CAST(8 AS INTEGER) AS out_height,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_in,
           substr(sha256(text || ':0') || sha256(text || ':1'), 1, 128)
               AS thumb_hex
    FROM documents
    """,
)
def multimodal_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal RESIZE plumbing (X5): binary media -> fixed-size
    grayscale thumbnail via Arrow-batched mapInPandas
    (operators/multimodal.resize_images).  kernel='fallback' pins the
    deterministic pseudo-thumbnail (sha256 counter chunks truncated to
    width*height bytes), which the oracle reproduces hex-for-hex; the
    PIL LANCZOS path rides kernel='auto' in the operator API."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_fake_binary(docs)
    return multimodal.resize_images(media, kernel="fallback")


def _multimodal_oracle() -> str:
    """Reproduce the deterministic decode kernel in SQL: media bytes =
    UTF-8(text); feature[i] = float32(byte_i(sha256)/255.0).  Hex chars
    are parsed positionally and every float32 rounding step is
    replicated with CAST(... AS REAL), so f_first/f_norm hash-match
    bit-for-bit."""
    hx = "0123456789abcdef"

    def byte_expr(i: int) -> str:
        hi = f"(strpos('{hx}', substr(sha, {2 * i + 1}, 1)) - 1)"
        lo = f"(strpos('{hx}', substr(sha, {2 * i + 2}, 1)) - 1)"
        return (
            f"CAST(CAST(({hi} * 16 + {lo}) / 255.0 AS REAL) AS DOUBLE)"
        )

    sq_sum = " + ".join(f"(f{i} * f{i})" for i in range(16))
    feats = ",\n               ".join(
        f"{byte_expr(i)} AS f{i}" for i in range(16)
    )
    return f"""
    WITH b AS (
        SELECT doc_id, sha256(text) AS sha,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    ),
    f AS (
        SELECT doc_id, sha, n_bytes,
               {feats}
        FROM b
    )
    SELECT doc_id, n_bytes, sha AS content_sha,
           ROUND(f0, 6) AS f_first,
           ROUND(sqrt({sq_sum}), 6) AS f_norm
    FROM f
    """


@register("multimodal_decode_features", oracle=_multimodal_oracle())
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing (X5): binary media column →
    Arrow-batched mapInPandas decode/featurize (operators/multimodal.py).
    The catalog entry pins ``kernel='fallback'`` (the sha256-derived
    deterministic featurizer) so the result is environment-independent
    and the mapInPandas output — byte counts, content hash, and float32
    feature values — is verified bit-for-bit by a SQL oracle; the
    PIL-backed image kernel stays on ``kernel='auto'`` in the operator
    API.  Scalar projection only (the harness cannot canonicalize array
    cells); the array form stays in the operator API."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_fake_binary(docs)
    decoded = multimodal.decode_features(media, kernel="fallback")
    return decoded.select(
        "doc_id",
        "n_bytes",
        "content_sha",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f_first"),
        F.round(
            F.sqrt(
                F.aggregate(
                    "feature",
                    F.lit(0.0),
                    lambda acc, v: acc + v.cast("double") * v.cast("double"),
                )
            ),
            6,
        ).alias("f_norm"),
    )


@register(
    "fakestream_velocity_alerts",
    oracle=f"""
    SELECT account_id, day,
           CAST(n_trx AS BIGINT) AS n_trx,
           CAST(total_amount AS DOUBLE) AS total_amount
    FROM (
        SELECT account_id, CAST(transaction_date AS DATE) AS day,
               COUNT(*) AS n_trx, SUM(amount) AS total_amount
        FROM read_parquet('{_TRX}')
        WHERE status = 'completed'
        GROUP BY 1, 2
    )
    WHERE n_trx > 10 OR total_amount > 50000
    """,
)
def fakestream_velocity_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-account daily velocity rule (dashboard #4 'fraud alerts',
    reference README.md:39 — the standard companion to the circular
    check): accounts whose daily count or total exceeds limits.  One
    partial-aggregating groupBy, then a post-aggregation filter."""
    from ultimate_data_engineering_project_spark.fraud import velocity_alerts

    out = velocity_alerts(_fx(spark, _TRX))
    return out.select(
        "account_id",
        "day",
        F.col("n_trx").cast("long").alias("n_trx"),
        F.col("total_amount").cast("double").alias("total_amount"),
    )


@register(
    "fakestream_balance_histogram",
    oracle=f"""
    SELECT CAST(floor(balance / 1000) * 1000 AS BIGINT) AS balance_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_accounts
    FROM read_parquet('{_ACCT}')
    GROUP BY 1
    """,
)
def fakestream_balance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance-distribution histogram in fixed-width buckets (dashboard
    #3, reference README.md:38) — bucketing is a map-side expression, so
    the plan is one partial-aggregating groupBy on the bucket id."""
    return pipelines.gold_balance_distribution(_fx(spark, _ACCT))


@register(
    "fakestream_silver_transactions",
    oracle=f"""
    SELECT t.transaction_id, t.account_id, t.transaction_type,
           CAST(t.amount AS DOUBLE) AS amount, t.currency,
           t.transaction_date, t.description, t.related_account_id,
           t.status, t.created_at, t.updated_at,
           t.transaction_date <= t.created_at - INTERVAL 5 DAY AS dq_late,
           t.transaction_date > t.created_at AS dq_future,
           ((t.transaction_type = 'Withdrawal' AND t.amount >= 10000)
            OR t.amount >= 100000) AS dq_impossible_amount,
           i.account_id IS NOT NULL AS dq_inactive_account
    FROM read_parquet('{_TRX}') t
    LEFT JOIN (SELECT account_id FROM read_parquet('{_ACCT}')
               WHERE status <> 'active') i
           ON t.account_id = i.account_id
    """,
)
def fakestream_silver_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validated silver fact table: DQ flags as columns (late / future /
    impossible amount / inactive account), never silent drops — the
    inactive-account check is a broadcast left join against the tiny
    flagged-account set."""
    out = pipelines.silver_transactions(_fx(spark, _TRX), _fx(spark, _ACCT))
    return out.withColumn("amount", F.col("amount").cast("double"))
