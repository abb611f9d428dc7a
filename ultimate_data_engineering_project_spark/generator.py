"""Spark-native fakestream OLTP generator (SURVEY.md §2.11, FIXTURES.md
Family B).

The reference generates its banking data with driver-side Python loops
(Faker + random; database_seeder.py:103-253, oltp_seeder.py:113-448) —
one row at a time through a connection pool.  Here generation is a
DataFrame program: ``spark.range(n)`` plus deterministic column
expressions, so a 10^10-row seed is the same code as a 10^4-row seed,
scaled by partitions.  `rand(seed)` + lookup arrays replace Faker
(SURVEY §2.11: element_at over literal vocab arrays).

Defect injection reproduces the reference's documented quality issues at
the documented rates (polished_transactions.py:26-40, BASELINE.md
"Injected DQ rates") so the quality detectors have known expected
counts:
  * 8%  duplicate customers (same name, variant email)     (:100-110)
  * 2-5% email typos a→4, e→3                              (:118-119)
  * 30% missing phone, 20% missing address                 (:114-115)
  * 1%  impossible date_of_birth (age 1-5)                 (:122-125)
  * 2%  negative balances                                  (:241-244)
  * 1%  impossible amounts                                 (:344-349)
  * 5%  late-arriving (5-30 d), 1% future-dated (1-7 d)    (:377-390)
  * 3%  transactions on inactive accounts                  (:330-334)
  * 2%  of transfers circular A→B / B→A same day           (:364-375)

Determinism note: every random draw is MATERIALIZED as a column once
and then referenced — two ``F.rand(seed)`` expression instances are
independent streams in Spark even with the same seed, so branching on
``rand() < a`` and ``rand() >= a`` in separate expressions would not
partition the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ultimate_data_engineering_project_spark.functions.scalar import weighted_choice

_FIRST = (
    "James Mary Robert Patricia John Jennifer Michael Linda David Elizabeth "
    "William Barbara Richard Susan Joseph Jessica Thomas Sarah Charles Karen "
    "Christopher Lisa Daniel Nancy Matthew Betty Anthony Margaret Mark Sandra"
).split()
_LAST = (
    "Smith Johnson Williams Brown Jones Garcia Miller Davis Rodriguez "
    "Martinez Hernandez Lopez Gonzalez Wilson Anderson Thomas Taylor Moore "
    "Jackson Martin Lee Perez Thompson White Harris Sanchez Clark Ramirez "
    "Lewis Robinson"
).split()
_STREETS = (
    "Main Oak Pine Maple Cedar Elm Washington Lake Hill Park Second Third "
    "Fourth Fifth Sunset River Church Spring North South"
).split()
_WORDS = (
    "payment for services rendered monthly subscription invoice settlement "
    "online purchase grocery utilities rent salary bonus refund adjustment "
    "transfer between accounts recurring standing order"
).split()

BASE_TS = "2024-01-01 00:00:00"


def _pick(arr: list[str], rand_col) -> F.Column:
    """Deterministic vocab lookup: element_at(lit_array, 1-based idx)."""
    lit_arr = F.array(*[F.lit(x) for x in arr])
    return F.element_at(lit_arr, (rand_col * len(arr)).cast("int") + 1)


def _with_rands(df: DataFrame, seed: int, n: int) -> DataFrame:
    """Materialize n independent uniform draws as columns __r1..__rn."""
    for k in range(1, n + 1):
        df = df.withColumn(f"__r{k}", F.rand(seed + k))
    return df


def gen_customers(
    spark: SparkSession, n: int = 10_000, seed: int = 42
) -> DataFrame:
    """customers table (reference schemas.py:16-27; volumes
    database_seeder.py:107)."""
    df = _with_rands(
        spark.range(1, n + 1).withColumnRenamed("id", "customer_id"), seed, 9
    )
    r = lambda k: F.col(f"__r{k}")  # noqa: E731

    # name: deterministic function of a "name key"; dup injection reuses
    # an earlier id's key (8%, same name different email).
    dup = (r(1) < 0.08) & (F.col("customer_id") > 20)
    name_key = F.when(
        dup,
        F.pmod(F.xxhash64(F.col("customer_id")), (F.col("customer_id") / 2).cast("long") + 1) + 1,
    ).otherwise(F.col("customer_id"))
    first = _pick(_FIRST, F.pmod(F.xxhash64(name_key * 7), 1000) / 1000.0)
    last = _pick(_LAST, F.pmod(F.xxhash64(name_key * 13), 1000) / 1000.0)
    full_name = F.concat_ws(" ", first, last)

    # email: typo-able name part, then a unique '-id' suffix (digit-free
    # name part keeps the typo detector exact: digits before '-' ⇒ typo)
    local = F.concat(F.lower(first), F.lit("."), F.lower(last))
    local = F.when(r(2) < 0.035, F.translate(local, "ae", "43")).otherwise(local)
    email = F.concat(local, F.lit("-"), F.col("customer_id"), F.lit("@example.com"))

    phone = F.when(r(3) < 0.30, F.lit(None).cast("string")).otherwise(
        F.format_string("+1-555-%07d", F.pmod(F.xxhash64("customer_id"), 10_000_000))
    )
    address = F.when(r(4) < 0.20, F.lit(None).cast("string")).otherwise(
        F.concat_ws(
            ", ",
            F.concat(
                (r(5) * 9899 + 100).cast("int").cast("string"),
                F.lit(" "),
                _pick(_STREETS, r(6)),
                F.lit(" St"),
            ),
            F.lit("Springfield"),
        )
    )

    base = F.lit(BASE_TS).cast("timestamp_ntz")
    age_days = F.when(r(7) < 0.01, (r(8) * 4 + 1) * 365).otherwise(
        (r(9) * 62 + 18) * 365
    )
    dob = F.to_date(
        F.expr(f"TIMESTAMP_NTZ '{BASE_TS}'") - F.make_dt_interval(age_days.cast("int"))
    )
    created = base + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), F.col("customer_id") % 86_400
    )
    return df.select(
        "customer_id",
        full_name.alias("full_name"),
        email.alias("email"),
        phone.alias("phone"),
        address.alias("address"),
        dob.alias("date_of_birth"),
        created.alias("created_at"),
        created.alias("updated_at"),
    )


def gen_accounts(
    spark: SparkSession,
    n: int = 1_000,
    n_customers: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    """accounts table (reference schemas.py:30-44; status mix
    oltp_seeder.py:268, balance defects polished_transactions.py:241-244)."""
    df = _with_rands(
        spark.range(1, n + 1).withColumnRenamed("id", "account_id"), seed * 31, 5
    )
    r = lambda k: F.col(f"__r{k}")  # noqa: E731

    balance = F.when(r(1) < 0.02, -(r(2) * 4900 + 100)).otherwise(r(3) * 24_950 + 50)
    base = F.lit(BASE_TS).cast("timestamp_ntz")
    opened = base + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), F.col("account_id") % 86_400
    )
    status = weighted_choice(
        r(4), [("active", 0.83), ("inactive", 0.11), ("suspended", 0.06)]
    )
    return df.select(
        "account_id",
        (F.pmod(F.xxhash64("account_id"), n_customers) + 1).alias("customer_id"),
        F.format_string("ACC-%08d", F.col("account_id")).alias("account_number"),
        weighted_choice(
            r(5),
            [("Savings", 0.3), ("Checking", 0.4), ("Investment", 0.2), ("Credit", 0.1)],
        ).alias("account_type"),
        F.round(balance, 2).cast("decimal(15,2)").alias("balance"),
        F.lit("USD").alias("currency"),
        status.alias("status"),
        opened.alias("opened_at"),
        F.lit(None).cast("timestamp_ntz").alias("closed_at"),
        opened.alias("created_at"),
        opened.alias("updated_at"),
    )


def gen_transactions(
    spark: SparkSession,
    n: int = 10_000,
    n_accounts: int = 1_000,
    seed: int = 42,
) -> DataFrame:
    """transactions table (reference schemas.py:47-61; type weights
    oltp_seeder.py:382-388; defect rates polished_transactions.py:
    330-390).

    Circular transfers: 2% of transfers are generated as mirrored
    same-day pairs — consecutive ids (2k, 2k+1) carry A→B and B→A
    (the set-oriented equivalent of the reference's
    ``recent_transfers`` bookkeeping, polished_transactions.py:364-375).
    """
    df = _with_rands(
        spark.range(1, n + 1).withColumnRenamed("id", "transaction_id"), seed * 97, 11
    )
    r = lambda k: F.col(f"__r{k}")  # noqa: E731

    # circular pairing: decide at the pair level so both siblings agree.
    pair_id = (F.col("transaction_id") - (F.col("transaction_id") % 2)).cast("long")
    pair_rand = F.pmod(F.xxhash64(pair_id * 17), 1000) / 1000.0
    is_circ = pair_rand < 0.01  # 2% of ~50% transfers => ~1% of pairs
    is_second = F.col("transaction_id") % 2 == 1

    t_type = F.when(is_circ, F.lit("Transfer")).otherwise(
        weighted_choice(
            r(1),
            [
                ("Deposit", 0.35),
                ("Withdrawal", 0.30),
                ("Transfer", 0.25),
                ("Payment", 0.08),
                ("Refund", 0.02),
            ],
        )
    )

    acct_a = F.pmod(F.xxhash64(pair_id * 23), n_accounts) + 1
    acct_b = (
        F.pmod(acct_a + F.pmod(F.xxhash64(pair_id * 29), n_accounts - 1), n_accounts)
        + 1
    )
    normal_acct = F.pmod(F.xxhash64(F.col("transaction_id") * 41), n_accounts) + 1
    account_id = (
        F.when(is_circ & is_second, acct_b).when(is_circ, acct_a).otherwise(normal_acct)
    )

    normal_rel = (
        F.pmod(normal_acct + (r(2) * (n_accounts - 1)).cast("long"), n_accounts) + 1
    )
    related = (
        F.when(is_circ & is_second, acct_a)
        .when(is_circ, acct_b)
        .when(t_type == "Transfer", normal_rel)
        .otherwise(F.lit(None).cast("long"))
    )

    # amounts: type-dependent ranges (oltp_seeder.py:423-432), 1%
    # impossible (polished_transactions.py:344-349)
    base_amt = (
        F.when(t_type == "Deposit", r(3) * 4900 + 100)
        .when(t_type == "Withdrawal", r(3) * 1980 + 20)
        .when(t_type == "Transfer", r(3) * 2950 + 50)
        .when(t_type == "Payment", r(3) * 990 + 10)
        .otherwise(r(3) * 490 + 10)
    )
    impossible = r(4) < 0.01
    amount = (
        F.when(impossible & (t_type == "Withdrawal"), r(5) * 89_999 + 10_000)
        .when(impossible, r(5) * 899_999 + 100_000)
        .otherwise(base_amt)
    )

    base = F.lit(BASE_TS).cast("timestamp_ntz")
    created = base + F.make_dt_interval(
        F.lit(0),
        F.lit(0),
        F.lit(0),
        F.when(is_circ, pair_id % 86_400).otherwise(F.col("transaction_id") % 86_400),
    )
    late = r(6) < 0.05
    future = (r(6) >= 0.05) & (r(6) < 0.06)
    tdate = (
        F.when(late, created - F.make_dt_interval(((r(7) * 25) + 5).cast("int")))
        .when(future, created + F.make_dt_interval(((r(7) * 6) + 1).cast("int")))
        .otherwise(created)
    )

    desc = F.substring(
        F.concat_ws(" ", _pick(_WORDS, r(8)), _pick(_WORDS, r(9)), _pick(_WORDS, r(10))),
        1,
        100,
    )
    return df.select(
        "transaction_id",
        account_id.cast("long").alias("account_id"),
        t_type.alias("transaction_type"),
        F.round(amount, 2).cast("decimal(15,2)").alias("amount"),
        F.lit("USD").alias("currency"),
        tdate.alias("transaction_date"),
        desc.alias("description"),
        related.alias("related_account_id"),
        weighted_choice(
            r(11), [("completed", 0.87), ("pending", 0.08), ("failed", 0.05)]
        ).alias("status"),
        created.alias("created_at"),
        created.alias("updated_at"),
    )


def gen_fakestream(
    spark: SparkSession,
    n_customers: int = 10_000,
    n_accounts: int = 1_000,
    n_transactions: int = 10_000,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """The full seeded triple, reference volumes by default
    (database_seeder.py:107,175,238)."""
    return {
        "customers": gen_customers(spark, n_customers, seed),
        "accounts": gen_accounts(spark, n_accounts, n_customers, seed),
        "transactions": gen_transactions(spark, n_transactions, n_accounts, seed),
    }
