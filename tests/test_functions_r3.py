"""Property tests for round-3 helper functions: the Morton spread must
be a bijection (decodable back to both keys), and non-distinct grams
must preserve multiplicity and order. Each property is checked against
an independent pure-Python reference, then the Spark expression is
spot-checked against the same reference through the engine."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from python_btc_etl_spark.plans.scale import Z_BITS, _sql_z_expr, with_zval


def _interleave_ref(a: int, b: int) -> int:
    """Bit-at-a-time reference interleave (the spec the magic masks
    must equal)."""
    z = 0
    for i in range(Z_BITS):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def _deinterleave_ref(z: int) -> tuple[int, int]:
    a = b = 0
    for i in range(Z_BITS):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


@given(
    st.integers(min_value=0, max_value=(1 << Z_BITS) - 1),
    st.integers(min_value=0, max_value=(1 << Z_BITS) - 1),
)
@settings(max_examples=300, deadline=None)
def test_morton_bijection(a, b):
    z = _interleave_ref(a, b)
    assert _deinterleave_ref(z) == (a, b)
    assert 0 <= z < 1 << (2 * Z_BITS)


@given(
    st.integers(min_value=0, max_value=(1 << 30) - 1),
    st.integers(min_value=0, max_value=(1 << 30) - 1),
)
@settings(max_examples=200, deadline=None)
def test_morton_masks_to_z_bits(a, b):
    """Inputs wider than Z_BITS must be masked, not corrupt high bits —
    the invariant both engine expressions rely on."""
    z = _interleave_ref(a & ((1 << Z_BITS) - 1), b & ((1 << Z_BITS) - 1))
    assert z < 1 << (2 * Z_BITS)


def test_spark_and_duckdb_exprs_equal_reference(spark):
    """The magic-mask Spark expression and the DuckDB fold both equal
    the bit-at-a-time reference on a deterministic sample."""
    import duckdb

    vals = [(i * 7919 % (1 << Z_BITS), i * 104729 % (1 << Z_BITS)) for i in range(64)]
    df = spark.createDataFrame(vals, "a long, b long")
    got = [
        r["z"]
        for r in with_zval(df, "a", "b", "z").select("a", "b", "z").orderBy("a", "b").collect()
    ]
    want = [_interleave_ref(a, b) for a, b in sorted(vals)]
    assert got == want
    con = duckdb.connect()
    duck = [
        con.execute(f"SELECT {_sql_z_expr(str(a), str(b))}").fetchone()[0]
        for a, b in sorted(vals)
    ]
    assert duck == want


def test_grams_all_multiplicity(spark):
    """grams_all keeps duplicates and document order; shingles is its
    distinct projection."""
    from pyspark.sql import functions as F

    from python_btc_etl_spark.functions.text import grams_all, shingles, words

    df = spark.createDataFrame(
        [("a b c a b c a b",), ("x y",), ("",)], "text string"
    )
    out = df.select(
        grams_all(words(F.col("text"))).alias("g"),
        shingles(words(F.col("text"))).alias("s"),
    ).collect()
    g0, s0 = out[0]["g"], out[0]["s"]
    assert g0 == ["a b c", "b c a", "c a b", "a b c", "b c a", "c a b"]
    assert sorted(set(g0)) == sorted(s0)
    assert out[1]["g"] == [] and out[2]["g"] == []
