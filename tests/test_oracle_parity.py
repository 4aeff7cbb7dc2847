"""The local correctness gate: every query in the harness registry must
hash-match its DuckDB oracle at sf0.001 (the driver repeats this at
sf0.01). A query without an oracle gets a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from etl_tj_project_spark import harness
from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(harness.REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    entry = harness.REGISTRY[name]
    df = entry.spark(spark, SF_SMOKE)
    if entry.oracle is None:
        # Non-SQL-expressible: execute and require a stable schema + rows.
        rows = df.collect()
        assert df.columns, name
        assert rows is not None
        return
    compare(df, duck, entry.oracle)
