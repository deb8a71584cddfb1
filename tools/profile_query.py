"""Per-action profiling for one registered query (optimization rounds).

Runs a query end-to-end the way bench.py does (noop sink) and reports
where the DRIVER-BLOCKING time goes: every py4j-backed action (collect,
count, parquet write, localCheckpoint, cache materialization) shows up in
the cProfile cumulative listing, so a query composed of many actions can
be attributed step by step without the (disabled) Spark UI.

Usage:
    python tools/profile_query.py <query> [sf_dir] [--explain out.txt]

The query runs ONCE untimed (warm JVM, parquet footers, Python workers)
then ONCE under cProfile; the profile of the second run is printed.
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

from python_btc_etl_spark import plans  # noqa: E402
from python_btc_etl_spark.session import get_spark  # noqa: E402


def _run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/root/testdata/sf0.1"
    explain_out = None
    if "--explain" in sys.argv:
        explain_out = sys.argv[sys.argv.index("--explain") + 1]

    spark = get_spark("profile")
    fn = plans.REGISTRY[name].fn

    # warm-up (untimed)
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    _run(df)
    print(f"[profile] warm-up: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    if explain_out:
        with open(explain_out, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"[profile] plan -> {explain_out}", file=sys.stderr)

    spark.catalog.clearCache()
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    _run(fn(spark, sf_dir))
    pr.disable()
    wall = time.perf_counter() - t0
    print(f"[profile] timed run: {wall:.2f}s", file=sys.stderr)

    s = io.StringIO()
    st = pstats.Stats(pr, stream=s)
    st.sort_stats("cumulative")
    st.print_stats(60)
    # keep only the informative lines: py4j round-trips + our own modules
    for line in s.getvalue().splitlines():
        ls = line.strip()
        if not ls:
            continue
        if any(k in line for k in (
            "ncalls", "function calls", "Ordered by",
            "plans/", "functions/", "sources/", "streaming/", "catalog.py",
            "dataframe.py", "readwriter.py", "java_gateway.py:1(",
        )) or "{method" in line:
            print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
