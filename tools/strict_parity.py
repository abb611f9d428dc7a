#!/usr/bin/env python
"""Strict driver-canonicalizer replica: pandas-level, dtype-sensitive.

tests/oracle_utils.compare normalizes Decimal->float before comparing,
which hides exactly the class of mismatch that cost round 1 a red row
(DuckDB count_if -> HUGEINT -> pandas float64 8963.0 vs Spark int64
8963: equal in Python, different canonical hashes).  This tool mirrors
the driver more closely: Spark result via toPandas(), oracle via
duckdb .df(), columns sorted by name, rows sorted, every cell compared
on its STRING form (so 8963.0 != 8963) plus a dtype-kind check.

Usage: python tools/strict_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(pdf):
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), key=lambda s: s.map(str)).reset_index(
            drop=True
        )
    return pdf


def cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    try:
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
    except Exception:
        pass
    if hasattr(v, "item"):
        v = v.item()
    if str(v) == "NaT":
        return "NULL"
    # The driver's canonicalizer equates Spark object-dates with
    # DuckDB midnight timestamps (proven: case_pivot_priority emitted a
    # DATE column and hash-matched in round 1) — mirror that.
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def compare_strict(spark_df, duck_pdf) -> list[str]:
    probs: list[str] = []
    s = canon(spark_df.toPandas())
    d = canon(duck_pdf)
    if list(s.columns) != list(d.columns):
        return [f"columns: spark={list(s.columns)} duck={list(d.columns)}"]
    if len(s) != len(d):
        probs.append(f"rows: spark={len(s)} duck={len(d)}")
    for col in s.columns:
        sk, dk = s[col].dtype.kind, d[col].dtype.kind
        if sk != dk and "O" not in (sk, dk):  # object-vs-typed resolves per cell
            probs.append(f"dtype[{col}]: spark={s[col].dtype} duck={d[col].dtype}")
    n_bad = 0
    for i in range(min(len(s), len(d))):
        for col in s.columns:
            a, b = cell(s[col].iloc[i]), cell(d[col].iloc[i])
            if a != b:
                probs.append(f"row{i} {col}: spark={a!r} duck={b!r}")
                n_bad += 1
                if n_bad > 4:
                    probs.append("...")
                    return probs
    return probs


_SKETCH_EXACT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99
FROM lineitem GROUP BY l_returnflag
"""


def check_sketch_tolerance(spark_df, con) -> list[str]:
    """approx_sketch_battery cannot hash-match an exact oracle by
    design (sketch estimates are engine-specific), but it CAN be bound:
    every estimate must land within the sketch's documented error of
    DuckDB's exact answer.  HLL (approx_count_distinct, default
    rsd=0.05) gets |approx-exact|/exact <= 0.15 (3 sigma); the KLL-style
    percentile_approx(accuracy=10000) gets 5% relative value error
    (rank error 1e-4 on a smooth price distribution is far tighter —
    the bound is deliberately loose so only a broken sketch trips it).
    """
    eps = {
        ("approx_orders", "exact_orders"): 0.15,
        ("approx_parts", "exact_parts"): 0.15,
        ("p50", "p50"): 0.05,
        ("p90", "p90"): 0.05,
        ("p99", "p99"): 0.05,
    }
    s = spark_df.toPandas().set_index("l_returnflag")
    exact = con.execute(_SKETCH_EXACT_SQL).df().set_index("l_returnflag")
    probs: list[str] = []
    if set(s.index) != set(exact.index):
        return [f"group keys differ: spark={sorted(s.index)} duck={sorted(exact.index)}"]
    for flag in sorted(exact.index):
        for (a_col, e_col), bound in eps.items():
            a = float(s.loc[flag, a_col])
            e = float(exact.loc[flag, e_col])
            rel = abs(a - e) / e
            # inverted comparison so a NaN estimate FAILS: `NaN > bound`
            # is False and would record a broken sketch as tolerance_ok
            if not (rel <= bound):
                probs.append(
                    f"{flag}.{a_col}: approx={a} exact={e} rel={rel:.4f} > {bound}"
                )
    return probs


#: rows-only entries that still carry an executable correctness bound
TOLERANCE_CHECKS = {"approx_sketch_battery": check_sketch_tolerance}


def main() -> None:
    from pyspark.sql import SparkSession

    from tests.oracle_utils import duck_connection
    from ultimate_data_engineering_project_spark.plans.catalog import catalog

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        # sf1 sweeps OOM the 1g default driver heap (local mode holds
        # executors in the driver JVM)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    n_ok = n_bad = 0
    results: dict[str, dict] = {}
    for name, spec in catalog().items():
        if only and name not in only:
            continue
        if spec.oracle is None:
            if name in TOLERANCE_CHECKS:
                try:
                    probs = TOLERANCE_CHECKS[name](spec.fn(spark, sf_dir), con)
                except Exception as e:  # noqa: BLE001
                    probs = [f"EXC {e!r}"[:200]]
                if probs:
                    n_bad += 1
                    results[name] = {
                        "status": "TOLERANCE_FAIL",
                        "problems": probs[:6],
                    }
                    print(
                        f"TOLERANCE-FAIL {name}: " + " | ".join(probs[:4]),
                        flush=True,
                    )
                else:
                    n_ok += 1
                    results[name] = {"status": "tolerance_ok", "problems": None}
            else:
                results[name] = {"status": "no_oracle", "problems": None}
            continue
        try:
            probs = compare_strict(spec.fn(spark, sf_dir), con.execute(spec.oracle).df())
        except Exception as e:  # noqa: BLE001
            probs = [f"EXC {e!r}"[:200]]
        if probs:
            n_bad += 1
            results[name] = {"status": "FAIL", "problems": probs[:6]}
            print(f"STRICT-FAIL {name}: " + " | ".join(probs[:4]), flush=True)
        else:
            n_ok += 1
            results[name] = {"status": "ok", "problems": None}
    print(f"strict parity: {n_ok} ok, {n_bad} failing", flush=True)
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "oracles_ok": n_ok,
                    "oracles_failing": n_bad,
                    "no_oracle": sorted(
                        k for k, v in results.items() if v["status"] == "no_oracle"
                    ),
                    "entries": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
