"""One-off 100x scale probe (judge r12 #4): time the suite's most
expensive queries at sf1 (100x the sf0.01 data the per-round scaling
pass uses as its small side) and stamp the measured ratios into a
committed artifact — the measurement behind the "designed for 100 TB"
claims the per-round 10x pass cannot back on its own.

The sf1 slice is generated once by tools/make_sf1.py (replication is
structure-preserving: cross-replica text/embedding relationships are
deliberately broken so dedup/ANN pair counts grow linearly — see that
module's docstring). Flag bar = 1.2 * measured data growth, the same
20%-headroom-over-linear rule bench.py's scaling pass applies at 10x;
fixed per-query overhead makes real ratios sit far below it.

Usage: python tools/scale_probe.py [out.json]
Env: SPARK_GRAFT_SCALE_BIG (default .scale_probe/sf1),
     SPARK_GRAFT_SCALE_SMALL (default /root/testdata/sf0.01),
     SPARK_GRAFT_SCALE_TOPN (default 10),
     SPARK_GRAFT_SCALE_QUERIES (comma list, overrides top-N pick).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from python_btc_etl_spark import plans  # noqa: E402
from python_btc_etl_spark.session import get_spark  # noqa: E402

BIG = os.environ.get(
    "SPARK_GRAFT_SCALE_BIG", os.path.join(ROOT, ".scale_probe", "sf1")
)
SMALL = os.environ.get("SPARK_GRAFT_SCALE_SMALL", "/root/testdata/sf0.01")
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "SCALE100_r13.json")


def _run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _pick_queries() -> list[str]:
    only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    if only:
        return only.split(",")
    topn = int(os.environ.get("SPARK_GRAFT_SCALE_TOPN", "10"))
    with open(os.path.join(ROOT, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)
    ranked = sorted(
        detail["queries"].items(), key=lambda kv: kv[1], reverse=True
    )
    return [name for name, _ in ranked[:topn]]


def _growth() -> float:
    import duckdb

    ratios = []
    for t in ("documents", "lineitem", "embeddings", "orders", "events"):
        a = duckdb.sql(f"SELECT count(*) FROM '{BIG}/{t}.parquet'").fetchone()[0]
        b = duckdb.sql(f"SELECT count(*) FROM '{SMALL}/{t}.parquet'").fetchone()[0]
        if a and b:
            ratios.append(a / b)
    return max(ratios) if ratios else 100.0


def main() -> int:
    from bench import _calibrate, _cleanup

    names = _pick_queries()
    spark = get_spark("scale_probe")
    # warm-up: JVM + Arrow worker pool, untimed (bench.py's rationale)
    _run(plans.REGISTRY["ohlcv_daily_vwap"].fn(spark, SMALL))
    n = spark.sparkContext.defaultParallelism
    _run(spark.range(n).repartition(n).mapInPandas(lambda it: it, "id long"))
    cal_start = _calibrate(spark)
    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = None

    big_t: dict[str, float] = {}
    small_t: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        # small side FIRST, best-of-2 (an inflated small sample reads
        # as a LOW ratio — the masking direction)
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                _run(plans.REGISTRY[name].fn(spark, SMALL))
                s = round(time.perf_counter() - t0, 3)
                if name not in small_t or s < small_t[name]:
                    small_t[name] = s
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"small: {type(exc).__name__}: {exc}"[:300]
                break
            _cleanup(spark)
        if name in errors:
            continue
        t0 = time.perf_counter()
        try:
            _run(plans.REGISTRY[name].fn(spark, BIG))
            big_t[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"big: {type(exc).__name__}: {exc}"[:300]
        _cleanup(spark)
        if name in big_t:
            print(
                f"[probe] {name}: small {small_t[name]:.2f}s "
                f"big {big_t[name]:.2f}s "
                f"ratio {big_t[name] / small_t[name]:.1f}",
                file=sys.stderr,
                flush=True,
            )

    growth = _growth()
    flag_bar = round(1.2 * growth, 2)
    sf_ratio = {
        n: round(big_t[n] / small_t[n], 2)
        for n in big_t
        if small_t.get(n, 0) > 0
    }
    superlinear = sorted(n for n, r in sf_ratio.items() if r > flag_bar)
    cal_end = _calibrate(spark)
    out = {
        "probe": "scale100",
        "big_dir": BIG,
        "small_dir": SMALL,
        "growth_factor": round(growth, 2),
        "flag_bar": flag_bar,
        "queries_big_sec": big_t,
        "queries_small_sec": small_t,
        "sf_ratio": sf_ratio,
        "superlinear": superlinear,
        "errors": errors,
        "loadavg": loadavg,
        "calibration_sec": {"start": cal_start, "end": cal_end},
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("growth_factor", "flag_bar", "sf_ratio", "superlinear",
                       "errors", "loadavg")}))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
