"""Query registry: every supported query is a named (Spark fn, oracle SQL)
pair.

The driver contract (``__spark_entry__.py``) wants ``queries()`` →
``{name: fn(spark, sf_dir) -> DataFrame}`` and ``oracle_sql()`` →
``{name: ANSI SQL}`` runnable by DuckDB on the same parquet tables. This
module is the single source of truth both draw from; tests iterate it too.

Determinism rules every query here follows (so the driver's
order-insensitive value-hash matches):

- every computed column is aliased identically on both sides;
- floating aggregates are rounded (sum order differs between Spark's
  parallel partial aggregation and DuckDB's sequential scan);
- top-k sorts always carry a unique tie-break key;
- integer sums are cast explicitly (DuckDB widens SUM(BIGINT) to
  HUGEINT, Spark keeps BIGINT);
- group keys prefer DATE/VARCHAR over raw TIMESTAMP to avoid
  timezone-representation drift between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a query under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
