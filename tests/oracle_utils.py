"""Local replica of the driver's Spark-vs-DuckDB comparison so oracle
parity is verified before the driver ever runs (order-insensitive,
column-name-sorted, value-level)."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # partial fixture dirs exist by design (.scaling/sf10 carries
        # ONLY events+documents — the spot-decade inputs); absent
        # tables just get no view, and an oracle referencing one fails
        # with DuckDB's own missing-table error
        if not os.path.exists(path):
            continue
        # Spark-written tables are DIRECTORIES of part files (the
        # .scaling/sf1 upscale); driver testdata are single files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _normalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, out


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(oracle)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")

    _, sn = _normalize(s_cols, s_rows)
    cols, dn = _normalize(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            detail = []
            for c, x, y in zip(cols, a, b):
                if x != y:
                    detail.append(f"{c}: spark={x!r} duck={y!r}")
            problems.append(f"row {i}: " + "; ".join(detail))
            if len(problems) > 5:
                problems.append("... (truncated)")
                break
    return problems
