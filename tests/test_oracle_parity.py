"""Every catalog query with an oracle must match DuckDB value-for-value
at sf0.001 — the local pre-flight for the driver's sf0.01 gate."""

import pytest

from ultimate_data_engineering_project_spark.plans.catalog import catalog
from tests.oracle_utils import compare, duck_connection

SPECS = catalog()
ORACLE_NAMES = [n for n, s in SPECS.items() if s.oracle is not None]
ROWS_ONLY_NAMES = [n for n, s in SPECS.items() if s.oracle is None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, duck, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    problems = compare(df, duck, spec.oracle)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    # must produce a stable schema and execute without error
    assert df.columns
    assert df.count() >= 0
