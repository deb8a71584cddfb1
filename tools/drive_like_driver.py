"""Drive __spark_entry__ exactly the way the driver does: a VANILLA
SparkSession (none of our tuned confs), entry() smoke, then every
queries()[name] vs oracle_sql()[name] through DuckDB at sf0.01.

Env knobs for iteration speed:
- SPARK_GRAFT_DRIVE_QUERIES=a,b,c  check only these queries
- SPARK_GRAFT_DRIVE_CPUS=16        session core count (default 16)
- SPARK_GRAFT_SWEEP_OUT=path.json  also write a machine-readable
  per-query record (judge r11 #6: the driver samples only 50/round,
  so the full sweep must exist as a diffable committed artifact —
  SWEEP_r{N}.json — not only as COVERAGE.md prose)
"""

from __future__ import annotations

import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ep  # noqa: E402
from tools.selfcheck import _rows_key  # noqa: E402

SF = "/root/testdata/sf0.01"

_cpus = os.environ.get("SPARK_GRAFT_DRIVE_CPUS", "16")
spark = SparkSession.builder.master(f"local[{_cpus}]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

out = ep.entry(spark)
rows = out.collect()
print(f"entry(): {len(rows)} rows, schema={out.schema.simpleString()}")
assert len(rows) > 0

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, osql = ep.queries(), ep.oracle_sql()
only = os.environ.get("SPARK_GRAFT_DRIVE_QUERIES")
if only:
    qs = {n: qs[n] for n in only.split(",")}
fails = 0
record: dict[str, dict] = {}
for name, fn in qs.items():
    try:
        sdf = fn(spark, SF)
        cols = sorted(sdf.columns)
        s_rows = [tuple(r[c] for c in cols) for r in sdf.collect()]
        if name not in osql:
            print(f"[rows-only] {name}: {len(s_rows)} rows")
            record[name] = {"status": "rows-only", "rows": len(s_rows)}
            continue
        res = con.execute(osql[name])
        d_raw = [d[0] for d in res.description]
        d_rows = [tuple(r[d_raw.index(c)] for c in sorted(d_raw)) for r in res.fetchall()]
        ok = sorted(d_raw) == cols and len(s_rows) == len(d_rows) and _rows_key(s_rows) == _rows_key(d_rows)
        print(f"[{'PASS' if ok else 'FAIL'}] {name}: {len(s_rows)} rows")
        record[name] = {
            "status": "PASS" if ok else "FAIL",
            "rows": len(s_rows),
            "oracle_rows": len(d_rows),
        }
        fails += 0 if ok else 1
    except Exception as exc:  # noqa: BLE001
        print(f"[FAIL] {name}: {type(exc).__name__}: {exc}")
        record[name] = {
            "status": "FAIL",
            "err": f"{type(exc).__name__}: {exc}"[:300],
        }
        fails += 1
print(f"\nfails={fails}")
sweep_out = os.environ.get("SPARK_GRAFT_SWEEP_OUT")
if sweep_out:
    import json

    with open(sweep_out, "w") as fh:
        json.dump(
            {
                "sf_dir": SF,
                "n_queries": len(record),
                "n_fails": fails,
                "queries": record,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"sweep record written to {sweep_out}")
sys.exit(1 if fails else 0)
