"""Driver-contract gate: every registered query matches its DuckDB oracle.

Runs the exact comparison the external driver applies (row count, column
names, order-insensitive values) at sf0.001 for speed; the driver repeats
it at sf0.01. Queries without an oracle get a smoke-run instead.
"""

from __future__ import annotations

import os

import pytest

from crypto_exchange_etl_spark.queries import ORACLES, QUERIES

from oracle_harness import compare, duck_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLES:
        errs = compare(df, duck, ORACLES[name], name)
        assert not errs, "\n".join(errs)
    else:
        # rows-only contract: runs, stable schema, non-degenerate result
        assert df.columns
        assert df.count() >= 0
