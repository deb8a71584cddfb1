"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``python_btc_etl_spark.plans`` — the query registry is
the single source of truth for queries and their DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_btc_etl_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: daily OHLCV + VWAP over events at sf0.001."""
    return plans.REGISTRY["ohlcv_daily_vwap"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
