#!/usr/bin/env python
"""Freeze the seeded fakestream triple to fixtures/fakestream/*.parquet.

The generator (generator.gen_fakestream) is Spark-native and seeded,
but `F.rand(seed)` draws depend on partition layout, so the catalog's
fakestream entries read this FROZEN parquet instead of re-generating:
that makes them deterministic across environments and lets the driver's
DuckDB oracle read the very same bytes (read_parquet on the same path).

Run once and commit the output; re-running regenerates (volumes and
seed are fixed to the catalog's values).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

N_CUSTOMERS, N_ACCOUNTS, N_TRANSACTIONS, SEED = 2_000, 200, 2_000, 42


def main() -> None:
    from ultimate_data_engineering_project_spark import generator
    from ultimate_data_engineering_project_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "fixtures", "fakestream")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="udep-gen-fixtures")
    spark.sparkContext.setLogLevel("ERROR")
    triple = generator.gen_fakestream(
        spark, N_CUSTOMERS, N_ACCOUNTS, N_TRANSACTIONS, seed=SEED
    )
    for name, df in triple.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        # single plain parquet FILE (not a Spark directory) so DuckDB's
        # read_parquet and spark.read.parquet address the same path
        pq.write_table(df.toArrow(), path)
        print(f"wrote {path}: {pq.read_metadata(path).num_rows} rows")
    spark.stop()


if __name__ == "__main__":
    main()
