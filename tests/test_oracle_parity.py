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


@pytest.fixture(scope="module")
def pinned_pairs():
    # Exactly what the driver sees: pinned builders + pinned oracle SQL,
    # in driver-window order.
    return harness.queries(), harness.oracle_sql()


@pytest.mark.parametrize("name", sorted(harness.REGISTRY))
def test_query_matches_oracle(spark, duck, name, pinned_pairs):
    qs, oracles = pinned_pairs
    df = qs[name](spark, SF_SMOKE)
    if name not in oracles:
        # Non-SQL-expressible: execute and require a stable schema + rows.
        rows = df.collect()
        assert df.columns, name
        assert rows is not None
        return
    compare(df, duck, oracles[name])


def test_driver_window_is_first_50():
    ordered = list(harness.ordered_registry())
    assert ordered[:50] == harness.DRIVER_WINDOW
    assert len(harness.DRIVER_WINDOW) == 50
    assert set(ordered) == set(harness.REGISTRY)
