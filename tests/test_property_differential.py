"""Property-based differential testing: random predicates over lineitem
evaluated by BOTH Spark and DuckDB must agree on the matching row count.

The reference has no property tests (SURVEY.md §5); this goes beyond
its truth-table style by sampling the predicate space — comparison
operators x columns x constants, conjunction/disjunction/negation —
so filter-pushdown rewrites, ANSI casts, and null handling are checked
against an independent engine on every example.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from python_btc_etl_spark.catalog import load

from .conftest import SF_SMALL

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
OPS = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def predicates(draw) -> str:
    """A random SQL predicate valid in both engines."""

    def leaf() -> str:
        if draw(st.booleans()):
            col = draw(st.sampled_from(NUM_COLS))
            op = draw(st.sampled_from(OPS))
            if col == "l_quantity":
                const = draw(st.integers(0, 55))
            else:
                const = round(draw(st.floats(0, 110000, allow_nan=False)), 2)
            return f"{col} {op} {const}"
        col = draw(st.sampled_from(STR_COLS))
        op = draw(st.sampled_from(["=", "<>"]))
        val = draw(st.sampled_from(["A", "N", "R", "O", "F", "ZZ"]))
        return f"{col} {op} '{val}'"

    a, b = leaf(), leaf()
    combo = draw(st.sampled_from(["{a}", "({a}) AND ({b})", "({a}) OR ({b})", "NOT ({a})"]))
    return combo.format(a=a, b=b)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_SMALL}/lineitem.parquet')"
    )
    return con


@given(pred=predicates())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_filter_counts_match(spark, duck, pred):
    li = load(spark, SF_SMALL, "lineitem")
    got = li.filter(pred).count()
    want = duck.execute(f"SELECT count(*) FROM lineitem WHERE {pred}").fetchone()[0]
    assert got == want, pred


@given(
    col=st.sampled_from(NUM_COLS),
    pred=predicates(),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_filtered_aggregate_matches(spark, duck, col, pred):
    """min/max are order-independent even in floating point — safe to
    compare exactly under arbitrary predicates."""
    li = load(spark, SF_SMALL, "lineitem")
    row = li.filter(pred).selectExpr(f"min({col})", f"max({col})").collect()[0]
    want = duck.execute(f"SELECT min({col}), max({col}) FROM lineitem WHERE {pred}").fetchone()
    assert (row[0], row[1]) == want, (pred, col)
