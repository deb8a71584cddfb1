"""Differential self-check: run every registered query on Spark AND its
DuckDB oracle, compare row count + schema + order-insensitive values.

Mirrors the driver's correctness gate so mismatches are caught before a
round ends. Usage:

    python tools/selfcheck.py [sf_dir] [query ...]

Exit code 0 iff every checked query matches exactly (after the same
rounding the queries themselves apply).
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from python_btc_etl_spark import plans  # noqa: E402
from python_btc_etl_spark.catalog import TABLES  # noqa: E402
from python_btc_etl_spark.session import get_spark  # noqa: E402


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows_key(rows):
    return sorted((tuple(_norm(v) for v in r) for r in rows), key=lambda t: tuple(map(repr, t)))


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def complex_output_cols(sdf) -> list[str]:
    """Columns whose type the driver's pandas canonicalizer cannot hash.

    The driver sorts/hashes result cells as scalars; an Array/Map/Struct
    output column crashes it (round-3 `user_type_set_arrays` err:
    ``TypeError: unhashable type: 'list'``).  Queries must present
    collections as canonical scalars (e.g. ``array_join(sort_array(...))``).
    """
    from pyspark.sql import types as T

    bad = (T.ArrayType, T.MapType, T.StructType)
    return [f.name for f in sdf.schema.fields if isinstance(f.dataType, bad)]


def check_query(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    spec = plans.REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    nonscalar = complex_output_cols(sdf)
    if nonscalar:
        return False, (
            f"NONSCALAR output columns {nonscalar} — driver canonicalizer "
            "cannot hash Array/Map/Struct; emit a sorted scalar instead"
        )
    s_cols = sorted(sdf.columns)
    s_rows = [tuple(r[c] for c in s_cols) for r in sdf.collect()]
    if spec.oracle is None:
        return True, f"rows-only ({len(s_rows)} rows)"
    res = con.execute(spec.oracle)
    d_cols_raw = [d[0] for d in res.description]
    d_cols = sorted(d_cols_raw)
    d_rows_raw = res.fetchall()
    d_rows = [tuple(r[d_cols_raw.index(c)] for c in d_cols) for r in d_rows_raw]
    if s_cols != d_cols:
        return False, f"SCHEMA cols spark={s_cols} duck={d_cols}"
    if len(s_rows) != len(d_rows):
        return False, f"ROWCOUNT spark={len(s_rows)} duck={len(d_rows)}"
    sk, dk = _rows_key(s_rows), _rows_key(d_rows)
    if sk != dk:
        bad = next((i, a, b) for i, (a, b) in enumerate(zip(sk, dk)) if a != b)
        return False, f"VALUES first-diff @sorted[{bad[0]}]\n  spark={bad[1]}\n  duck ={bad[2]}\n  cols={s_cols}"
    return True, f"OK ({len(s_rows)} rows)"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or list(plans.REGISTRY)
    spark = get_spark("selfcheck")
    con = duck_con(sf_dir)
    failures = 0
    for name in names:
        try:
            ok, msg = check_query(spark, con, name, sf_dir)
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"ERROR {type(exc).__name__}: {exc}"
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {name}: {msg}")
        failures += 0 if ok else 1
    print(f"\n{len(names) - failures}/{len(names)} queries match at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
