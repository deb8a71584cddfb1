"""Relational operator coverage: scans, filters, projections, joins
(inner/semi/anti/broadcast), hash aggregation, distinct, rollup/cube,
window functions, top-k, set ops, scalar functions, JSON extraction.

The reference implements none of these at runtime (SURVEY.md §2.B); this
module is the new engine's relational surface, expressed declaratively so
Catalyst plans them (predicate pushdown, column pruning, broadcast
selection, partial aggregation all come from the optimizer — see
SURVEY.md §4).

Float determinism follows the decimal-sum policy in ``exprs.py`` (no
rounding anywhere — see that module's rationale).

Scale notes:
- joins against ``BROADCAST_DIMS`` use an explicit ``F.broadcast`` hint —
  at 100 TB the fact side never shuffles for dimension joins;
- aggregations are plain ``groupBy``: Catalyst inserts map-side partial
  aggregation, AQE coalesces post-shuffle partitions;
- top-k uses ``orderBy().limit(k)`` → planned as TakeOrderedAndProject
  (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from .exprs import davg, dsum, sql_davg, sql_dsum
from .registry import query

# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')}                                        AS sum_qty,
           {sql_dsum('l_extendedprice')}                                   AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')}                AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}  AS sum_charge,
           {sql_davg('l_quantity')}                                        AS avg_qty,
           {sql_davg('l_extendedprice')}                                   AS avg_price,
           {sql_davg('l_discount')}                                        AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: filter + 8-agg hash aggregate.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_distinct_orders",
    oracle=f"""
    SELECT o_orderpriority,
           count(*)                    AS n_orders,
           count(DISTINCT o_custkey)   AS n_customers,
           {sql_dsum('o_totalprice')}  AS total_price,
           min(o_totalprice)           AS min_price,
           max(o_totalprice)           AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Hash aggregate with COUNT DISTINCT (expand-based distinct agg).",
)
def agg_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum("o_totalprice").alias("total_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE                      AS within_tolerance
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++) — the 100 TB-scale path for "
    "distinct counting. The HLL sketch value is engine-specific, so the "
    "checkable contract is: exact distinct count (hash-compared to the "
    "oracle) plus a within_tolerance flag asserting |approx-exact|/exact "
    "<= 5% (rsd=0.01, ~5-sigma bound) — the oracle expects TRUE.",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= 0.05
            ).alias("within_tolerance"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "rollup_region_nation",
    oracle=f"""
    SELECT coalesce(r_name, 'ALL')  AS region,
           coalesce(n_name, 'ALL')  AS nation,
           count(*)                 AS n_customers,
           {sql_dsum('c_acctbal')}  AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region, nation
    """,
    doc="ROLLUP hierarchy totals (region → nation → grand total).",
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_acctbal",
        )
        .orderBy("region", "nation")
    )


@query(
    "cube_status_priority",
    oracle=f"""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                         AS n_orders,
           {sql_dsum('o_totalprice')}       AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    doc="CUBE over two dimensions with subtotals in every combination.",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q3_top_orders",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(o_orderdate AS DATE)                        AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: 3-way join + filter + agg + top-k with unique "
    "tie-break (planned as TakeOrderedAndProject, no global sort).",
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cut = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o.filter(F.col("o_orderdate") < cut), c.c_custkey == o.o_custkey)
        .join(li.filter(F.col("l_shipdate") > cut), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"), "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5-style 6-table star join; dims broadcast, fact side "
    "joins planned by Catalyst/AQE. Timing note (r3→r4 audit): the "
    "recorded r2→r3 regression (1.75→2.44 s) is box noise — four "
    "identical warm sf0.1 runs on one session measured 1.65–4.59 s "
    "with an unchanged plan; the minimum beats the r2 number.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return (
        c.join(o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)), c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "broadcast_brand_revenue",
    oracle=f"""
    SELECT p_brand,
           count(*)                                         AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           {sql_davg('p_retailprice')}                      AS avg_retail
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="Fact-to-dim broadcast hash join: the part side is hinted with "
    "F.broadcast so the lineitem fact table never shuffles.",
)
def broadcast_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            davg("p_retailprice").alias("avg_retail"),
        )
        .orderBy("p_brand")
    )


@query(
    "semi_join_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal AS acctbal
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    ORDER BY c_custkey
    """,
    doc="LEFT SEMI join (relational EXISTS) — the set-membership shape of "
    "the reference's Redis processed-files check (reference utils.py:24-29).",
)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", F.col("c_acctbal").alias("acctbal"))
        .orderBy("c_custkey")
    )


@query(
    "anti_join_orderless_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="LEFT ANTI join (NOT EXISTS) — the relational form of the "
    "reference's skip-if-processed idempotence (SURVEY.md §2.A D1).",
)
def anti_join_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_rank_orders",
    oracle="""
    SELECT o_orderkey, o_custkey,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)               AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)               AS drnk
    FROM orders
    ORDER BY o_custkey, rn
    """,
    doc="Ranking window functions: row_number with unique tie-break, "
    "rank/dense_rank over a tie-heavy key (deterministic by definition).",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    by_price = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    by_prio = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.row_number().over(by_price).alias("rn"),
            F.rank().over(by_prio).alias("rnk"),
            F.dense_rank().over(by_prio).alias("drnk"),
        )
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(sum(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(25,6))) OVER w AS VARCHAR) AS DOUBLE) AS running_total,
           lag(o_totalprice)  OVER w2                                      AS prev_price,
           lead(o_totalprice) OVER w2                                      AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Analytic window functions: running sum (decimal-exact, engines "
    "may use different frame accumulation structures) + lag/lead over a "
    "unique ordering.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(frame).cast("double").alias("running_total"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "topk_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice AS retailprice
    FROM (
        SELECT *, row_number() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    )
    WHERE rn <= 3
    ORDER BY p_brand, retailprice DESC, p_partkey
    """,
    doc="Top-K per group via ranking window — the distributed top-k "
    "pattern (no driver-side collect).",
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", F.col("p_retailprice").alias("retailprice"))
        .orderBy("p_brand", F.desc("retailprice"), "p_partkey")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "setops_customer_segments",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big_spenders AS (
             SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
         )
    SELECT c_custkey FROM (
        (SELECT c_custkey FROM building UNION SELECT c_custkey FROM big_spenders)
        EXCEPT
        (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big_spenders)
    )
    ORDER BY c_custkey
    """,
    doc="UNION / INTERSECT / EXCEPT composition (symmetric difference of "
    "two customer sets).",
)
def setops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("c_custkey")).distinct()
    union = building.union(big).distinct()
    inter = building.intersect(big)
    return union.exceptAll(inter).distinct().orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------


@query(
    "scalar_string_math",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           length(p_name)                                  AS name_len,
           substr(p_name, 1, 5)                            AS name_prefix,
           concat(p_brand, ':', p_type)                    AS brand_type,
           regexp_extract(p_name, '([a-z]+)$', 1)          AS last_word,
           p_retailprice * CAST(1.1 AS DOUBLE)             AS price_up,
           sqrt(CAST(p_size AS DOUBLE))                    AS size_sqrt,
           abs(p_size - 25)                                AS size_dist,
           CAST(p_size % 7 AS INTEGER)                     AS size_mod,
           CASE WHEN p_retailprice > 1500 THEN 'premium'
                WHEN p_retailprice > 800  THEN 'standard'
                ELSE 'budget' END                          AS tier
    FROM part
    ORDER BY p_partkey
    """,
    doc="String / math scalar function coverage — all JVM-codegen'd "
    "expressions, no UDFs (replaces the reference's row-at-a-time lambda, "
    "reference btc_etl.py:163). IEEE ops on identical inputs are "
    "bit-identical across engines, so no rounding.",
)
def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
            (F.col("p_retailprice") * F.lit(1.1)).alias("price_up"),
            F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
            F.abs(F.col("p_size") - 25).alias("size_dist"),
            (F.col("p_size") % 7).cast("int").alias("size_mod"),
            F.when(F.col("p_retailprice") > 1500, "premium")
            .when(F.col("p_retailprice") > 800, "standard")
            .otherwise("budget")
            .alias("tier"),
        )
        .orderBy("p_partkey")
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                        AS orderdate,
           CAST(year(o_orderdate) AS INTEGER)               AS order_year,
           CAST(month(o_orderdate) AS INTEGER)              AS order_month,
           CAST(day(o_orderdate) AS INTEGER)                AS order_day,
           CAST(quarter(o_orderdate) AS INTEGER)            AS order_quarter,
           dayname(o_orderdate)                             AS order_dow,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)      AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="Date/time scalar coverage: extraction, arithmetic, day names. "
    "Session timezone pinned UTC so both engines agree (SURVEY.md §7 risk).",
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
            F.quarter("o_orderdate").cast("int").alias("order_quarter"),
            F.date_format("o_orderdate", "EEEE").alias("order_dow"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
            F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
                "days_to_y2k"
            ),
        )
        .orderBy("o_orderkey")
    )


@query(
    "json_event_props",
    oracle="""
    SELECT event_type,
           count(*)                                                                  AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)    AS sum_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
               / count(*)                                                            AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="JSON extraction from the events.props string column + aggregate "
    "(get_json_object → JVM-side JSON path evaluation).",
)
def json_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k.cast("bigint")).cast("bigint").alias("sum_k"),
            (F.sum(k.cast("bigint")).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@query(
    "sql_cte_top_nations",
    oracle=f"""
    WITH nation_rev AS (
        SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
               {sql_dsum('o.o_totalprice')} AS revenue
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_regionkey, n.n_name
    ),
    ranked AS (
        SELECT regionkey, nation, revenue,
               dense_rank() OVER (PARTITION BY regionkey
                                  ORDER BY revenue DESC, nation) AS rnk
        FROM nation_rev
    )
    SELECT regionkey, nation, revenue, rnk
    FROM ranked WHERE rnk <= 2
    ORDER BY regionkey, rnk, nation
    """,
    doc="Pure spark.sql() surface: the same multi-CTE + window + join "
    "text a SQL-first user would write, executed verbatim over temp "
    "views — proving the SQL entry point produces the identical plan "
    "family as the DataFrame API (Catalyst sees one logical plan). "
    "Top-2 nations by revenue per region via dense_rank.",
)
def sql_cte_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        WITH nation_rev AS (
            SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
                   CAST(sum(CAST(o.o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue
            FROM v_orders o
            JOIN v_customer c ON c.c_custkey = o.o_custkey
            JOIN v_nation n   ON n.n_nationkey = c.c_nationkey
            GROUP BY n.n_regionkey, n.n_name
        ),
        ranked AS (
            SELECT regionkey, nation, revenue,
                   dense_rank() OVER (PARTITION BY regionkey
                                      ORDER BY revenue DESC, nation) AS rnk
            FROM nation_rev
        )
        SELECT regionkey, nation, revenue, rnk
        FROM ranked WHERE rnk <= 2
        ORDER BY regionkey, rnk, nation
        """
    )


@query(
    "topk_with_ties_parts",
    oracle="""
    WITH r AS (
        SELECT p_brand, p_partkey, p_retailprice,
               dense_rank() OVER (
                   PARTITION BY p_brand ORDER BY p_retailprice DESC) AS dr
        FROM part
    )
    SELECT p_brand, p_partkey, p_retailprice, dr
    FROM r WHERE dr <= 2
    ORDER BY p_brand, p_retailprice DESC, p_partkey
    """,
    doc="Top-k WITH TIES (dense_rank <= k): every part sharing the two "
    "highest prices per brand survives — the tie-inclusive contract "
    "(ANSI FETCH FIRST ... WITH TIES), vs topk_parts_per_brand's "
    "row_number form that arbitrarily tie-breaks to exactly k rows. "
    "Same single window pass; result size is data-dependent, which is "
    "precisely the semantic difference this pins.",
)
def topk_with_ties_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    p = load(spark, sf_dir, "part")
    w = PW.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        p.withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice", "dr")
        .orderBy("p_brand", F.desc("p_retailprice"), "p_partkey")
    )
