"""Query plan registry. Importing this package registers every query."""

from __future__ import annotations

from . import (  # noqa: F401  (registration side-effect)
    analytics,
    annstream,
    dedup,
    extended,
    graph,
    ingest,
    mmstream,
    modern,
    multimodal,
    ordered_stats,
    partitioned,
    pipeline,
    relational,
    scale,
    similarity,
    stream,
    subqueries,
    text,
    timeseries,
    tpch_extra,
)
from .registry import REGISTRY, QuerySpec, oracle_sql, queries, query  # noqa: F401

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql", "query"]
