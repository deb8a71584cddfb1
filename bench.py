"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (executes the
full plan, all columns, no driver collect, no disk) after one untimed
warm-up of the session (JVM + parquet footer caches), mirroring the
reference's timing methodology (reference tests/benchmark.py:40-45 times
the pipeline after a reset, not cold-start).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_btc_etl_spark import plans  # noqa: E402
from python_btc_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _cleanup(spark) -> None:
    """Reset session state between queries so each timing is
    self-contained: drop the streaming memory-sink tables (two of them
    pin ~1M rows each in the block manager by late-bench) and unpersist
    caches. Without this, queries measured late in the run pay the
    accumulated heap/GC pressure of everything before them — observed
    as 10-20x inflation on otherwise sub-second queries."""
    for t in spark.catalog.listTables():
        if t.isTemporary and t.name.startswith(("stream_", "v_")):
            spark.catalog.dropTempView(t.name)
    spark.catalog.clearCache()


def main() -> int:
    sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
    spark = get_spark("bench")
    # Warm-up: JVM JIT + parquet footers, outside the timed region.
    _run(plans.REGISTRY["ohlcv_daily_vwap"].fn(spark, SF_DIR))

    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = only.split(",") if only else list(plans.REGISTRY)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        _run(plans.REGISTRY[name].fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"[bench] {name}: {timings[name]:.2f}s", file=sys.stderr, flush=True)
        _cleanup(spark)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
