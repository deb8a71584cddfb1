"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from python_btc_etl_spark import plans
from tools.selfcheck import check_query, duck_con

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(plans.REGISTRY))
def test_query_matches_oracle(spark, con, name):
    ok, msg = check_query(spark, con, name, SF_SMALL)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as ep

    df = ep.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"day", "open", "high", "low", "close", "volume", "vwap", "n_trades"}


def test_registry_contract():
    qs = plans.queries()
    os_ = plans.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20
