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


def _numpy_float_repr_matches_python() -> bool:
    """The fast float path renders via ndarray.astype(str), which on
    modern numpy is the same shortest-repr as Python's str(float).
    Probe it once; if a numpy ever disagrees, fall back to cell()."""
    import numpy as np

    probe = [0.1, 1e16, 1.0 / 3, -0.0, 1e-308]
    return np.array(probe).astype(str).tolist() == [str(v) for v in probe]


_FAST_FLOAT = _numpy_float_repr_matches_python()


def render_col(s):
    """Vectorized cell(): render one pandas column to an object ndarray
    of canonical strings, value-for-value identical to mapping cell()
    (the per-cell path remains the fallback for object/decimal/date
    columns).  This is what makes million-row compares minutes-not-
    hours: the old per-cell iloc loop paid ~2us per access over
    |rows| x |cols| x 2 frames."""
    import numpy as np
    import pandas as pd

    k = s.dtype.kind
    if k == "f" and _FAST_FLOAT:
        a = s.to_numpy()
        out = a.astype(str).astype(object)
        out[np.isnan(a)] = "NaN"
        return out
    if k in "iu" or k == "b":
        return s.to_numpy().astype(str).astype(object)
    if k == "M":
        if getattr(s.dtype, "tz", None) is not None:
            s = s.dt.tz_localize(None)
        iso = s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f").str.replace(
            r"\.000000$", "", regex=True
        )
        # cell() collapses midnight timestamps to dates (driver rule)
        mid = (
            s.dt.hour.eq(0)
            & s.dt.minute.eq(0)
            & s.dt.second.eq(0)
            & s.dt.microsecond.eq(0)
            & s.dt.nanosecond.eq(0)
        )
        iso = iso.where(~mid, s.dt.strftime("%Y-%m-%d"))
        iso = iso.where(~s.isna(), "NULL")
        return iso.to_numpy(dtype=object)
    return np.array([cell(v) for v in s.to_numpy(dtype=object)], dtype=object)


def canon_render(pdf):
    """Columns sorted by name; rows sorted by the RENDERED row key (the
    compare key and the sort key are the same strings, so positional
    equality after sorting == multiset equality of rendered rows)."""
    import numpy as np

    cols = sorted(pdf.columns)
    rendered = {c: render_col(pdf[c]) for c in cols}
    if len(pdf) and cols:
        order = np.lexsort([rendered[c] for c in reversed(cols)])
        rendered = {c: rendered[c][order] for c in cols}
    return cols, rendered, len(pdf)


def compare_strict(spark_df, duck_pdf) -> list[str]:
    import numpy as np

    probs: list[str] = []
    s_pdf = spark_df.toPandas()
    s_cols, s_r, ns = canon_render(s_pdf)
    d_cols, d_r, nd = canon_render(duck_pdf)
    if s_cols != d_cols:
        return [f"columns: spark={s_cols} duck={d_cols}"]
    if ns != nd:
        probs.append(f"rows: spark={ns} duck={nd}")
    for col in s_cols:
        sk, dk = s_pdf[col].dtype.kind, duck_pdf[col].dtype.kind
        if sk != dk and "O" not in (sk, dk):  # object-vs-typed resolves per cell
            probs.append(
                f"dtype[{col}]: spark={s_pdf[col].dtype} duck={duck_pdf[col].dtype}"
            )
    n = min(ns, nd)
    n_bad = 0
    for col in s_cols:
        neq = s_r[col][:n] != d_r[col][:n]
        for i in np.nonzero(neq)[0]:
            probs.append(
                f"row{i} {col}: spark={s_r[col][i]!r} duck={d_r[col][i]!r}"
            )
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
