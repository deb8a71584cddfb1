"""Generate the one-off sf1 slice for the 100x scale probe (judge
r12 #4): 10 structure-preserving replicas of /root/testdata/sf0.1,
written to .scale_probe/sf1 (gitignored — only the probe's measured
artifact is committed).

Replication rules (the point is LINEAR workload growth — naive
replication would make every replica a near-duplicate of replica 0
and blow the dedup/ANN pair counts up QUADRATICALLY, flagging
superlinearity that the engine doesn't have):

- ids shift by a per-table stride > max(id); the doc/vec stride is a
  multiple of every residue modulus the planted-copy and grouping
  constructions use (4, 3, 5, 50, 150, 200), so each replica carries
  the same planted structure as the original;
- foreign keys shift consistently (lineitem follows orders/part/
  supplier, orders follows customer, events' user_id follows its own
  stride); nation/region stay single copies (FK targets);
- document TEXT gets a per-replica bijective token remap (suffix
  r{k} on every word): within-replica shingle relationships are
  preserved exactly, cross-replica shingle sets are disjoint;
- EMBEDDINGS get a per-replica deterministic +/-1 sign mask:
  within-replica cosines are bit-identical, cross-replica cosines
  are scrambled (no two replicas share a mask);
- timestamps are left unchanged (per-window row counts grow 10x —
  the realistic shape of more traffic over the same period).

Usage: python tools/make_sf1.py [src_dir] [dst_dir] [n_replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".scale_probe", "sf1")
)
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# per-table id strides (> max id at sf0.1; doc/vec stride divisible by
# 4, 3, 5, 50, 150, 200 so residue-class structure survives per replica)
STRIDES = {
    "documents": 6000,
    "embeddings": 6000,
    "customer": 15000,
    "supplier": 1000,
    "part": 20000,
    "orders": 150000,
    "lineitem": 150000,  # follows orders on l_orderkey
    "events": 100000,
}


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):  # FK-target dimensions: single copy
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"[make_sf1] {t}: copied")

    def replicate(t: str, select_for_k) -> None:
        parts = " UNION ALL ".join(select_for_k(k) for k in range(N))
        con.execute(
            f"COPY ({parts}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"[make_sf1] {t}: {n} rows")

    d = STRIDES
    replicate(
        "documents",
        lambda k: (
            f"SELECT doc_id + {k * d['documents']} AS doc_id, "
            + (
                "text, n_chars"
                if k == 0
                else rf"regexp_replace(text, '(\S+)', '\1r{k}', 'g') AS text,"
                f" n_chars + (len(string_split(text, ' ')) * {len(str(k)) + 1})"
                " AS n_chars"
            )
            + f", lang, source FROM read_parquet('{SRC}/documents.parquet')"
        ),
    )
    replicate(
        "embeddings",
        lambda k: (
            f"SELECT vec_id + {k * d['embeddings']} AS vec_id, "
            + (
                "embedding"
                if k == 0
                else f"list_transform(embedding, (x, i) -> x * (CASE WHEN"
                f" ((i - 1) // {k}) % 2 = 0 THEN -1 ELSE 1 END))::FLOAT[]"
                " AS embedding"
            )
            + f", label FROM read_parquet('{SRC}/embeddings.parquet')"
        ),
    )
    replicate(
        "customer",
        lambda k: f"SELECT c_custkey + {k * d['customer']} AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment "
        f"FROM read_parquet('{SRC}/customer.parquet')",
    )
    replicate(
        "supplier",
        lambda k: f"SELECT s_suppkey + {k * d['supplier']} AS s_suppkey, "
        f"s_name, s_nationkey, s_acctbal FROM read_parquet('{SRC}/supplier.parquet')",
    )
    replicate(
        "part",
        lambda k: f"SELECT p_partkey + {k * d['part']} AS p_partkey, p_name, "
        "p_brand, p_type, p_size, p_retailprice "
        f"FROM read_parquet('{SRC}/part.parquet')",
    )
    replicate(
        "orders",
        lambda k: f"SELECT o_orderkey + {k * d['orders']} AS o_orderkey, "
        f"o_custkey + {k * d['customer']} AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority "
        f"FROM read_parquet('{SRC}/orders.parquet')",
    )
    replicate(
        "lineitem",
        lambda k: f"SELECT l_orderkey + {k * d['orders']} AS l_orderkey, "
        f"l_partkey + {k * d['part']} AS l_partkey, "
        f"l_suppkey + {k * d['supplier']} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate "
        f"FROM read_parquet('{SRC}/lineitem.parquet')",
    )
    replicate(
        "events",
        lambda k: f"SELECT event_id + {k * d['events']} AS event_id, ts, "
        f"user_id + {k * 1500} AS user_id, event_type, value, props "
        f"FROM read_parquet('{SRC}/events.parquet')",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
