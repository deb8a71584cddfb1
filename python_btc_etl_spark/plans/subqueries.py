"""Subquery-shaped relational coverage: correlated scalar subqueries,
NOT EXISTS anti-semantics, double aggregation over outer joins,
disjunctive join predicates, and nation-pair multi-way joins — the TPC-H
Q7/Q13/Q17/Q19/Q22 plan shapes, adapted to the driver's star schema
(no partsupp / comment / container columns, see TESTDATA.md).

The reference implements no joins or subqueries at all (SURVEY.md §2.B);
this module extends the relational surface with the decorrelation-heavy
plan shapes Catalyst rewrites into joins.

Scale notes (100 TB):
- correlated scalar subqueries (q17) are expressed as an explicit
  aggregate + equi-join rather than a per-row subquery — the exact
  rewrite Catalyst's decorrelation performs, stated declaratively so the
  per-part aggregate is a partial-agg shuffle, not N scalar lookups;
- NOT EXISTS (q22) is a left-anti join — at scale the anti side shuffles
  once on the join key; no per-row probes;
- q13's LEFT OUTER + conditional join predicate keeps the filter inside
  the join condition (not a post-filter), so unmatched customers survive
  with count 0 — semantics an outer-join post-filter would silently break;
- q19's OR-of-conjunctions predicate stays a single equi-join on
  p_partkey with the disjunction as residual filter — Catalyst pushes the
  shared p_partkey equality down, avoiding a cross product;
- q7 joins two nation copies through different foreign keys; both nation
  sides and supplier are broadcast, so only lineitem⋈orders⋈customer
  shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .exprs import dsum, sql_dsum
from .registry import query


@query(
    "q7_region_volume",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           year(l.l_shipdate) AS ship_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS volume,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer cu ON cu.c_custkey = o.o_custkey
    JOIN nation n1   ON n1.n_nationkey = cu.c_nationkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation n2   ON n2.n_nationkey = s.s_nationkey
    WHERE (n1.n_regionkey = 0 AND n2.n_regionkey = 1)
       OR (n1.n_regionkey = 1 AND n2.n_regionkey = 0)
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    ORDER BY cust_nation, supp_nation, ship_year
    """,
    doc="TPC-H Q7-style cross-region trade volume: six-way join with two "
    "distinct roles for the nation table (customer side vs supplier side), "
    "disjunctive region-pair predicate, group by nation pair and ship year.",
)
def q7_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
        F.col("n_regionkey").alias("s_rkey"),
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), cu.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .filter(
            ((F.col("c_rkey") == 0) & (F.col("s_rkey") == 1))
            | ((F.col("c_rkey") == 1) & (F.col("s_rkey") == 0))
        )
    )
    return (
        joined.groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13-style customer order-count distribution: LEFT OUTER "
    "join with a non-equi predicate inside the join condition (so "
    "zero-order customers survive), then a second aggregation over the "
    "first's result (histogram of counts).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly, count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
        FROM lineitem GROUP BY l_partkey
    ) pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12' AND l.l_quantity < pa.half_avg_qty
    """,
    doc="TPC-H Q17-style small-quantity revenue: correlated scalar "
    "subquery (per-part average quantity) expressed as its decorrelated "
    "form — aggregate-then-join — so the per-part avg is one partial-agg "
    "shuffle instead of a per-row lookup. Single-row global aggregate "
    "output.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(p.filter(F.col("p_brand") == "Brand#12")), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (dsum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19-style disjunctive-predicate join: OR of three "
    "conjunction branches mixing build-side (part) and probe-side "
    "(lineitem) columns. The shared p_partkey equality is the join key; "
    "the disjunction stays a residual filter — no cross product.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q22_dormant_high_balance",
    oracle="""
    WITH threshold AS (
        SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey AS nationkey,
           count(*) AS n_custs,
           CAST(CAST(sum(CAST(CAST(c.c_acctbal AS VARCHAR) AS DECIMAL(24,6)))
                AS VARCHAR) AS DOUBLE) AS total_bal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c.c_nationkey
    ORDER BY nationkey
    """,
    doc="TPC-H Q22-style dormant high-balance customers: uncorrelated "
    "scalar subquery (global avg positive balance, a 1-row broadcast "
    "cross join) + NOT EXISTS with a predicate (left-anti join against "
    "urgent orders), grouped by nation.",
)
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    threshold = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("nationkey")
    )


@query(
    "skyline_parts_pareto",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size <= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    ORDER BY p.p_partkey
    """,
    doc="Skyline / Pareto-frontier query: parts not dominated on "
    "(retailprice, size) — no other part is <= on both dimensions and "
    "strictly better on one. The oracle is the textbook quadratic "
    "NOT-EXISTS self-join; the engine runs the O(n log n) 2-D sweep "
    "instead: collapse to one (price, min_size) row per distinct price, "
    "take the running minimum of size over all STRICTLY cheaper prices "
    "(one ordered window on a price-distinct table), and keep a part "
    "iff its size equals its price group's minimum AND beats every "
    "cheaper group's best. The full part table never self-joins — only "
    "the distinct-price spine (tiny) sorts globally, then one broadcast "
    "join back. A 100 TB catalog scan stays linear where the naive "
    "plan is a BroadcastNestedLoopJoin.",
)
def skyline_parts_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    by_price = p.groupBy("p_retailprice").agg(F.min("p_size").alias("min_size"))
    w = PW.orderBy("p_retailprice").rowsBetween(PW.unboundedPreceding, -1)
    spine = by_price.withColumn("prev_best", F.min("min_size").over(w))
    keep = p.join(F.broadcast(spine), "p_retailprice").filter(
        (F.col("p_size") == F.col("min_size"))
        & (F.col("prev_best").isNull() | (F.col("prev_best") > F.col("p_size")))
    )
    return keep.select("p_partkey", "p_retailprice", "p_size").orderBy("p_partkey")
