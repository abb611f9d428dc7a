"""Custom Python DataSource: the reference's seeder/simulator as a
first-class Spark source (SURVEY.md §3.3 entry point 3 — one-shot bulk
seed, database_seeder.py:10-270 — and §3.1's hourly OLTP tick,
oltp_seeder.py:113-448).

The reference seeds with driver-side Faker loops through a connection
pool; `generator.gen_fakestream` already re-expresses that as a
DataFrame program.  This module adds the API front door Spark 4
provides for exactly this job — the Python DataSource API:

  * ``spark.read.format("fakestream_txn").option("n_rows", ...)`` —
    batch seed, generated PARTITION-PARALLEL (each input partition
    fills its own id range with vectorized numpy, shipped as one Arrow
    batch — no driver-side row loop, no Python-per-row cost);
  * ``spark.readStream.format("fakestream_txn")`` — the OLTP
    simulator as a real Structured Streaming source: each micro-batch
    is the next ``rows_per_batch`` ids.  Offsets are plain row
    counters and every row is a pure function of its id, so a replayed
    offset range regenerates BYTE-IDENTICAL rows — exactly-once
    reprocessing holds end-to-end with zero source-side state.

All draws are LCG arithmetic mod the Mersenne prime 2^31-1 (values
< 2^62, no overflow in int64 or BIGINT), so a SQL engine reproduces
the exact output: the catalog entry `fakestream_source_read` hash-
checks this source against a DuckDB reconstruction over range(n).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_P = 2_147_483_647  # Mersenne31; all LCG state stays < 2^31
_A = 1_103_515_245
_B = 12_345
_CURRENCIES = ("USD", "EUR", "GBP", "JPY")
_BASE_EPOCH = 1_704_067_200  # 2024-01-01 00:00:00 UTC

_SCHEMA = (
    "transaction_id BIGINT, account_id BIGINT, counterparty_id BIGINT, "
    "amount DOUBLE, currency STRING, status STRING, created_at TIMESTAMP"
)


def _gen_batch(start: int, end: int, n_accounts: int):
    """One pyarrow RecordBatch for global row ids [start, end) — pure
    function of the id range, vectorized, no per-row Python."""
    import numpy as np
    import pyarrow as pa

    i = np.arange(start, end, dtype=np.int64)
    h1 = (i * _A + _B) % _P
    h2 = (h1 * _A + _B) % _P
    amount = (h2 % 1_000_000) / 100.0
    status_code = h2 % 100
    status = np.where(
        status_code < 2, "failed", np.where(status_code < 5, "pending", "completed")
    )
    ts = (_BASE_EPOCH + (i % 86_400)) * 1_000_000  # microseconds
    return pa.record_batch(
        [
            pa.array(i + 1, type=pa.int64()),
            pa.array(h1 % n_accounts, type=pa.int64()),
            pa.array(h2 % n_accounts, type=pa.int64()),
            pa.array(amount, type=pa.float64()),
            pa.array(np.asarray(_CURRENCIES)[h1 % len(_CURRENCIES)]),
            pa.array(status),
            pa.array(ts, type=pa.timestamp("us")),
        ],
        names=[
            "transaction_id",
            "account_id",
            "counterparty_id",
            "amount",
            "currency",
            "status",
            "created_at",
        ],
    )


def _oracle_sql(n_rows: int, n_accounts: int) -> str:
    """DuckDB SQL regenerating the identical rows (shared constants)."""
    return f"""
    SELECT i + 1 AS transaction_id,
           ((i * {_A} + {_B}) % {_P}) % {n_accounts} AS account_id,
           (((i * {_A} + {_B}) % {_P}) * {_A} + {_B}) % {_P} % {n_accounts}
               AS counterparty_id,
           ((((i * {_A} + {_B}) % {_P}) * {_A} + {_B}) % {_P} % 1000000) / 100.0
               AS amount,
           ['USD', 'EUR', 'GBP', 'JPY'][
               CAST(((i * {_A} + {_B}) % {_P}) % 4 AS INT) + 1] AS currency,
           CASE WHEN (((i * {_A} + {_B}) % {_P}) * {_A} + {_B}) % {_P} % 100 < 2
                    THEN 'failed'
                WHEN (((i * {_A} + {_B}) % {_P}) * {_A} + {_B}) % {_P} % 100 < 5
                    THEN 'pending'
                ELSE 'completed' END AS status,
           TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i % 86400) SECOND
               AS created_at
    FROM range(0, {n_rows}) t(i)
    """


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _positive(options, key: str, default: int) -> int:
    v = int(options.get(key, default))
    if v <= 0:
        raise ValueError(f"option {key!r} must be positive, got {v}")
    return v


class FakestreamBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = _positive(options, "n_rows", 10_000)
        self.n_accounts = _positive(options, "n_accounts", 1_000)
        self.n_partitions = _positive(options, "n_partitions", 8)

    def partitions(self):
        per = max(1, -(-self.n_rows // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition):
        yield _gen_batch(partition.start, partition.end, self.n_accounts)


class FakestreamStreamReader(SimpleDataSourceStreamReader):
    """The hourly OLTP tick as a micro-batch source.  Offset = next
    unread row id; read(start) hands out the next slice and the engine
    persists the range -> replays regenerate identical rows."""

    def __init__(self, options):
        self.rows_per_batch = _positive(options, "rows_per_batch", 1_000)
        self.max_rows = int(options.get("max_rows", 0))  # 0 = unbounded
        if self.max_rows < 0:
            raise ValueError(f"option 'max_rows' must be >= 0, got {self.max_rows}")
        self.n_accounts = _positive(options, "n_accounts", 1_000)

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = lo + self.rows_per_batch
        if self.max_rows:
            hi = min(hi, self.max_rows)
        if hi <= lo:
            return [], {"next": lo}
        # a LIST, not a generator: the engine's prefetch cache
        # copy.copy()s the returned iterator when planning partitions,
        # and generators are not copyable
        batch = _gen_batch(lo, hi, self.n_accounts)
        rows = [tuple(r.values()) for r in batch.to_pylist()]
        return rows, {"next": hi}

    def readBetweenOffsets(self, start, end):
        batch = _gen_batch(start["next"], end["next"], self.n_accounts)
        return [tuple(r.values()) for r in batch.to_pylist()]


class FakestreamDataSource(DataSource):
    """``fakestream_txn`` — deterministic transactions, batch + stream."""

    @classmethod
    def name(cls):
        return "fakestream_txn"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return FakestreamBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return FakestreamStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the fakestream_txn format."""
    spark.dataSource.register(FakestreamDataSource)
