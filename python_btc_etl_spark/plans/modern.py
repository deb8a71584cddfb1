"""Modern SQL-surface coverage (Spark 4.x engine features): recursive
CTEs, LATERAL correlated subqueries, the VARIANT semi-structured type,
and re-aggregatable HLL sketch algebra.

These are engine capabilities a user migrating from any contemporary
warehouse expects; each is exercised through the same oracle-checked
registry contract as every other operator. The reference has no
analogue (its SQL surface is SQLAlchemy ORM inserts, reference
btc_etl.py:60-88) — this module is pure §2.B extension surface.

Scale notes:

- The recursive CTE executes as Spark's iterative UNION-ALL loop — one
  join per round, exactly the hand-rolled label-propagation loop in
  plans/graph.py but planned by the engine; rounds are bounded by the
  dup-DAG depth (edges always point small→large doc_id, so the
  recursion provably terminates without UNION-dedup support).
- LATERAL top-k decorrelates into a ranked window join — no per-row
  subquery execution at scale.
- VARIANT keeps semi-structured data in a binary columnar encoding;
  extraction pushes into the scan stage (no JSON string re-parse per
  field at 100 TB).
- HLL sketches are the mergeable-state story: per-partition partial
  sketches union associatively, so distinct-count rollups re-aggregate
  from stored sketches instead of raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .dedup import EXACT_EVERY, EXACT_OFFSET, TRUNC_EVERY, TRUNC_OFFSET
from .exprs import sql_dsum
from .registry import query


def _rec_closure_sql(sha_fn: str) -> str:
    """Shared recursive-closure text; ``sha_fn`` is the dialect's sha-256
    function invocation over column ``text``."""
    return f"""
    WITH RECURSIVE aug AS (
        SELECT doc_id, lower(text) AS text FROM documents
        UNION ALL
        SELECT doc_id + {EXACT_OFFSET}, lower(text) FROM documents
        WHERE doc_id % {EXACT_EVERY} = 0
    ),
    sha AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY {sha_fn}) AS canon
        FROM aug
    ),
    edges AS (
        SELECT canon AS src, doc_id AS dst FROM sha WHERE doc_id <> canon
        UNION ALL
        SELECT doc_id, doc_id + {TRUNC_OFFSET} FROM aug
        WHERE doc_id % {TRUNC_EVERY} = 0 AND doc_id < {TRUNC_OFFSET}
    ),
    reach(anc, node) AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT r.anc, e.dst FROM reach r JOIN edges e ON e.src = r.node
    ),
    roots AS (SELECT node, min(anc) AS root FROM reach GROUP BY node),
    nodes AS (
        SELECT DISTINCT doc_id FROM (
            SELECT doc_id FROM aug
            UNION ALL SELECT src FROM edges
            UNION ALL SELECT dst FROM edges
        ) u
    ),
    labeled AS (
        SELECT n.doc_id, coalesce(r.root, n.doc_id) AS component_id
        FROM nodes n LEFT JOIN roots r ON r.node = n.doc_id
    )
    SELECT component_id, count(*) AS n_members,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM labeled GROUP BY component_id
    HAVING count(*) > 1
    ORDER BY component_id
    """


@query(
    "recursive_cte_components",
    oracle=_rec_closure_sql("sha256(text)"),
    doc="NATIVE recursive CTE (Spark 4 WITH RECURSIVE): transitive "
    "closure over the duplicate-document DAG — the same component "
    "semantics as dedup_connected_components, but the iteration is "
    "planned and executed by the engine's recursive-union operator "
    "instead of a driver loop. Spark supports UNION ALL recursion "
    "only, so the query is shaped for it: edges always point "
    "small→large doc_id (canon = group min), making the graph a DAG "
    "whose closure terminates in diameter rounds with no dedup "
    "needed; per-node min(ancestor) then names the component. Both "
    "engines run the IDENTICAL query text modulo the sha-256 function "
    "name. Cites: reference has no graph ops; recursion shape follows "
    "plans/graph.py:75-117's oracle.",
)
def recursive_cte_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_rec_closure_sql("sha2(text, 256)"))


@query(
    "lateral_top2_orders",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) l
    ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey
    """,
    doc="LATERAL correlated subquery with ORDER BY + LIMIT (top-2 orders "
    "per customer): the modern SQL spelling of per-group top-k. "
    "Catalyst decorrelates the lateral into a ranked window join — "
    "verify with .explain(): no per-customer subquery execution "
    "remains, so the plan scales as one shuffle on the join key. Both "
    "engines run the identical query text. Inner joins drop orderless "
    "customers (LATERAL without OUTER), pinned by the oracle.",
)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) l
        ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey
        """
    )


@query(
    "variant_event_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           min(CAST(json_extract(props, '$.k') AS INTEGER))  AS min_k,
           max(CAST(json_extract(props, '$.k') AS INTEGER))  AS max_k,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="VARIANT semi-structured type (Spark 4): parse the JSON props "
    "column once into the binary VARIANT encoding, extract a typed "
    "field with variant_get, and aggregate — the open-schema "
    "event-payload pattern. Against a 100 TB event lake the payload is "
    "STORED as VARIANT, so extraction is columnar shredding in the "
    "scan, not a JSON string parse per row per field (the "
    "json_event_props query shows the legacy string path). Integer "
    "aggregates — bit-identical across engines.",
)
def variant_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@query(
    "hll_union_region_customers",
    oracle="""
    SELECT r.r_name AS region,
           count(DISTINCT o.o_custkey) AS exact_customers,
           TRUE AS within_tolerance
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    ORDER BY region
    """,
    doc="HLL sketch ALGEBRA (Datasketches, Spark 4): build one "
    "hll_sketch_agg(o_custkey) per nation, then hll_union_agg the "
    "nation sketches up to region and estimate — the re-aggregatable "
    "rollup pattern: at 100 TB the nation-level sketches are computed "
    "once (or stored), and every coarser rollup unions kilobyte "
    "sketches instead of re-scanning raw orders. Like "
    "approx_distinct_parts, the checkable contract is the exact "
    "distinct count plus a within-tolerance flag (lgConfigK=12 => "
    "relative error ~1.6%, flag bound 5%).",
)
def hll_union_region_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    enriched = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    per_nation = enriched.groupBy("r_name", "n_nationkey").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk"),
        F.expr("count(DISTINCT o_custkey)").alias("exact_nation"),
    )
    return (
        per_nation.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx"),
            F.sum("exact_nation").alias("_sum_nation"),
        )
        .join(
            enriched.groupBy(F.col("r_name").alias("region")).agg(
                F.countDistinct("o_custkey").alias("exact_customers")
            ),
            "region",
        )
        .select(
            "region",
            "exact_customers",
            (
                F.abs(F.col("approx") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= 0.05
            ).alias("within_tolerance"),
        )
        .orderBy("region")
    )


@query(
    "pipe_sql_order_stats",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(CAST(sum(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(24,2)))
                AS VARCHAR) AS DOUBLE) AS revenue,
           max(o_totalprice) AS max_price
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="SQL PIPE syntax (Spark 4, the |> operator-chain form from "
    "Google's 'SQL Has Problems' paper): FROM |> WHERE |> AGGREGATE "
    "|> ORDER BY reads in execution order instead of inside-out. "
    "Parses to the identical logical plan as the nested form — the "
    "oracle is the classic spelling, proving the two surfaces "
    "equivalent. Exact decimal revenue fold as everywhere.",
)
def pipe_sql_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus <> 'F'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(CAST(sum(CAST(CAST(o_totalprice AS STRING)
                          AS DECIMAL(24,2))) AS STRING) AS DOUBLE) AS revenue,
                     max(o_totalprice) AS max_price
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


XML_EVERY = 20  # orders subset for the row-level XML round-trip


@query(
    "xml_roundtrip_orders",
    oracle=f"""
    SELECT o_orderkey,
           o_orderstatus AS status_rt,
           o_totalprice AS price_rt,
           strftime(o_orderdate, '%Y-%m-%d') AS date_rt,
           0 AS n_parse_errors
    FROM orders
    WHERE o_orderkey % {XML_EVERY} = 0
    ORDER BY o_orderkey
    """,
    doc="Native XML support (Spark 4 built-in, no spark-xml package): "
    "each selected order is serialized with to_xml(struct(...)) and "
    "parsed back with from_xml against an explicit schema; the "
    "row-level differential compares the ROUND-TRIPPED values against "
    "the oracle's direct read of the base table, so serializer, "
    "parser, and schema mapping are all inside the check "
    "(n_parse_errors pins from_xml's PERMISSIVE null-on-failure at "
    "zero). The XML *file* datasource leg (spark.read.format('xml'), "
    "rowTag) is exercised in tests/test_formats.py. Both directions "
    "are JVM-side expressions — at 100 TB XML ingest parallelizes "
    "per-file/per-row with no Python involved.",
)
def xml_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % XML_EVERY == 0)
    xml = o.select(
        "o_orderkey",
        F.to_xml(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("price"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            )
        ).alias("payload"),
    )
    parsed = xml.select(
        "o_orderkey",
        F.from_xml("payload", "status STRING, price DOUBLE, odate STRING").alias("s"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("s.status").alias("status_rt"),
        F.col("s.price").alias("price_rt"),
        F.col("s.odate").alias("date_rt"),
        # Real per-row parse check, not a literal: any failed/partial parse
        # shows as 1 here and breaks the differential against the oracle's 0.
        F.when(
            F.col("s").isNull()
            | F.col("s.status").isNull()
            | F.col("s.price").isNull()
            | F.col("s.odate").isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("n_parse_errors"),
    ).orderBy("o_orderkey")


@query(
    "sql_udf_revenue",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_lines,
           CAST(CAST(sum(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS VARCHAR)
                              AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="SQL-defined scalar UDF (Spark 4 CREATE FUNCTION ... RETURN "
    "<expr>): the discount-revenue expression is declared once as a "
    "named SQL function and used inside an aggregate. Unlike external "
    "UDFs, SQL UDFs are MACRO-EXPANDED by the analyzer into the plan — "
    "the aggregate still runs fully inside WholeStageCodegen with zero "
    "per-row call overhead, so this is the correct way to share "
    "business expressions at 100 TB (the function is free; a Python "
    "UDF here would serialize every row). Oracle inlines the same "
    "expression; the session-scoped function name is namespaced to "
    "avoid cross-query collisions.",
)
def sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import ensure_session_confs

    ensure_session_confs(spark)
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("sqludf_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pbe_disc_rev(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_lines,
               CAST(CAST(sum(CAST(CAST(pbe_disc_rev(l_extendedprice, l_discount)
                                  AS STRING) AS DECIMAL(24,6))) AS STRING) AS DOUBLE)
                   AS revenue
        FROM sqludf_lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "scan_file_provenance",
    oracle="""
    SELECT 'events.parquet' AS file_name,
           count(*) AS n_rows,
           min(event_id) AS id_lo,
           max(event_id) AS id_hi
    FROM events
    GROUP BY 1
    ORDER BY file_name
    """,
    doc="Hidden _metadata scan column: per-source-file row counts and "
    "key ranges pulled from the parquet reader's file-provenance "
    "struct (_metadata.file_name) — no path parsing, works under "
    "splittable reads where input_file_name() semantics get murky. "
    "The lineage primitive for incremental processing at 100 TB: "
    "which files fed this result, and what key range each "
    "contributed (file-level min/max is exactly what manifest-based "
    "incremental engines store). The oracle pins the known corpus "
    "layout (one file per table in the test data).",
)
def scan_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("_metadata.file_name").alias("file_name"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("event_id").alias("id_lo"),
            F.max("event_id").alias("id_hi"),
        )
        .orderBy("file_name")
    )


def _bom_sql(int_div: str) -> str:
    """Shared recursive BOM text; ``int_div`` is the dialect's integer
    division operator (Spark ``div``, DuckDB ``//``)."""
    return f"""
    WITH RECURSIVE edges AS (
        -- synthetic assembly DAG over part keys: every part with key >= 10
        -- is a component of part (key {int_div} 10), used qty (1 + key % 3)
        -- times. Integer-division trees terminate in ~log10(maxkey) levels.
        SELECT (p_partkey {int_div} 10) AS parent,
               p_partkey AS child,
               1 + p_partkey % 3 AS qty
        FROM part
        WHERE p_partkey >= 10
    ),
    reach(root, node, path_qty, depth) AS (
        SELECT parent, child, qty, 1 FROM edges
        UNION ALL
        SELECT r.root, e.child, r.path_qty * e.qty, r.depth + 1
        FROM reach r JOIN edges e ON e.parent = r.node
    )
    SELECT root,
           count(*) AS n_descendants,
           CAST(sum(path_qty) AS BIGINT) AS total_units,
           max(depth) AS max_depth
    FROM reach
    WHERE root < 10
    GROUP BY root
    ORDER BY root
    """


@query(
    "bom_explosion_rollup",
    oracle=_bom_sql("//"),
    doc="Bill-of-materials explosion with MULTIPLICATIVE quantity rollup "
    "through a recursive CTE: per-edge quantities multiply along every "
    "root→descendant path (path_qty), then roots aggregate descendant "
    "counts, total exploded units, and assembly depth — the classic "
    "manufacturing/requirements query, and the arithmetic-carrying "
    "recursion that recursive_cte_components (pure reachability) "
    "doesn't exercise. The synthetic DAG (child → key div 10, qty "
    "1 + key mod 3) is a forest of integer-division trees, so the "
    "UNION-ALL recursion provably terminates in log10(max_key) "
    "rounds. Identical query text both engines modulo the integer-"
    "division spelling (div vs //).",
)
def bom_explosion_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_bom_sql("div"))


PARAM_MIN_BAL = 5000.0
PARAM_SEGMENT = "BUILDING"


@query(
    "parameterized_sql_filter",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(CAST(sum(CAST(CAST(c_acctbal AS VARCHAR) AS DECIMAL(20,2))) AS VARCHAR)
                AS DOUBLE) AS total_balance
    FROM customer
    WHERE c_acctbal >= {PARAM_MIN_BAL} AND c_mktsegment <> '{PARAM_SEGMENT}'
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Parameterized SQL (spark.sql(query, args=...)): named ':min_bal' "
    "and ':seg' markers bound server-side as typed literals — the "
    "injection-safe way to template queries, and Catalyst constant-"
    "folds the bound values so pushdown/pruning see real literals "
    "(verify with .explain(): the parquet PushedFilters carry the "
    "bound c_acctbal bound). The oracle inlines the same constants.",
)
def parameterized_sql_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("param_customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(CAST(sum(CAST(CAST(c_acctbal AS STRING) AS DECIMAL(20,2))) AS STRING)
                    AS DOUBLE) AS total_balance
        FROM param_customer
        WHERE c_acctbal >= :min_bal AND c_mktsegment <> :seg
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """,
        args={"min_bal": PARAM_MIN_BAL, "seg": PARAM_SEGMENT},
    )


# ---------------------------------------------------------------------------
# approx_top_k (Spark 4.1 heavy-hitter sketch aggregate)
# ---------------------------------------------------------------------------

TOPK_K = 3
# Default maxItemsTracked (10000) >> |event_type domain| (5): the sketch
# is in its EXACT region — every distinct item has a tracked counter, so
# counts equal the true frequencies and the differential against the
# exact GROUP BY oracle is legitimate. Past the tracked capacity the
# sketch degrades to approximate heavy-hitters (counts within the
# documented error of true frequency) and the oracle would need the
# tolerance-flag treatment the CMS/KLL audits use.


@query(
    "approx_topk_sketch_audit",
    oracle=f"""
    SELECT event_type, count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY n_events DESC, event_type
    LIMIT {TOPK_K}
    """,
    doc="approx_top_k heavy-hitter sketch (Spark 4.1 aggregate): one "
    "bounded-size sketch buffer per partition, merged associatively — "
    "the top-k-frequent-items answer with NO shuffle of raw rows and "
    "no full group-by materialization, which is the 100 TB shape for "
    "'most common items' over a high-cardinality column (vocabulary, "
    "URL, user-agent). The audit runs in the sketch's exact region "
    "(items tracked >= domain cardinality) so the exact GROUP BY "
    "oracle matches count-for-count; rows are re-ordered by "
    "(count DESC, item) with the boundary gap verified tie-free at "
    "every test SF so the k-cut is deterministic cross-engine.",
)
def approx_topk_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sk = e.agg(F.expr(f"approx_top_k(event_type, {TOPK_K})").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("kv"))
        .select(
            F.col("kv.item").alias("event_type"),
            F.col("kv.count").alias("n_events"),
        )
        .orderBy(F.desc("n_events"), "event_type")
    )


# ---------------------------------------------------------------------------
# SQL scripting (Spark 4 SQL/PSM: BEGIN / DECLARE / WHILE / SET)
# ---------------------------------------------------------------------------


@query(
    "sql_scripting_audit",
    oracle="""
    SELECT CAST(sum(CAST(substr(o_orderpriority, 1, 1) AS INTEGER)) AS BIGINT)
               AS weighted_priority_count,
           count(*) AS n_orders
    FROM orders
    """,
    doc="SQL SCRIPTING (Spark 4 SQL/PSM): a BEGIN...END compound with "
    "DECLARE'd variables and a WHILE loop that folds five scalar "
    "subqueries — one per order priority, weighted by the loop index — "
    "into a session variable, then SELECTs the result. The oracle "
    "collapses the loop algebraically (the weight equals the "
    "priority's leading digit, so the scripted fold must equal one "
    "weighted aggregate over the raw table), which gates that every "
    "iteration actually executed against the data. Runs on a child "
    "session (scripting.enabled is a planner-behavior conf, same "
    "hygiene as the PyDS pushdown audit). Stored-procedure-style "
    "control flow is the migration path for warehouse PL/SQL jobs — "
    "each statement inside the loop is still a full Catalyst-optimized "
    "query, so the loop orchestrates scans rather than row-at-a-time "
    "cursors.",
)
def sql_scripting_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import ensure_session_confs

    spark = spark.newSession()
    ensure_session_confs(spark)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        BEGIN
          DECLARE w BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 1;
          WHILE i <= 5 DO
            SET w = w + i * (SELECT count(*) FROM orders
                             WHERE o_orderpriority LIKE i || '-%');
            SET i = i + 1;
          END WHILE;
          SELECT w AS weighted_priority_count,
                 (SELECT count(*) FROM orders) AS n_orders;
        END
        """
    )


@query(
    "sql_sugar_audit",
    oracle="""
    SELECT seg, prio, n_customers, n_orders, max_price
    FROM (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
               CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
               CAST(count(*) AS BIGINT) AS n_orders,
               max(o.o_totalprice) AS max_price,
               min(o.o_totalprice) AS min_price
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE lower(c.c_name) LIKE lower('%CUSTOMER#%001')
        GROUP BY c.c_mktsegment, o.o_orderpriority
    )
    ORDER BY seg, prio
    """,
    doc="MODERN SQL SUGAR audit — three analyst-ergonomics surfaces "
    "Spark 4 shares with DuckDB/BigQuery, proven to desugar to the "
    "classic plan: GROUP BY ALL (group by every non-aggregate select "
    "item — no more repeating the dimension list), SELECT * EXCEPT "
    "(project-away instead of enumerate), and case-insensitive ILIKE "
    "in the predicate. The ORACLE is the fully desugared ANSI "
    "spelling (explicit GROUP BY list, explicit projection, "
    "lower() LIKE lower()), so the differential proves the sugar "
    "forms are pure parse-time rewrites with identical semantics — "
    "same contract style as pipe_sql_order_stats for |> syntax. "
    "Plan shape: broadcast dim join + partial-aggregable count into "
    "a bounded 5x5 cell space; TakeOrdered on the tiny result.",
)
def sql_sugar_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT * EXCEPT (min_price) FROM (
            SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
                   CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   max(o.o_totalprice) AS max_price,
                   min(o.o_totalprice) AS min_price
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_name ILIKE '%CUSTOMER#%001'
            GROUP BY ALL
        )
        ORDER BY seg, prio
        """
    )


@query(
    "observed_metrics_audit",
    oracle=f"""
    WITH g AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
           (SELECT CAST(count(*) - count(l_quantity) AS BIGINT) FROM lineitem)
               AS n_null_qty,
           (SELECT {sql_dsum('l_extendedprice', 2)} FROM lineitem) AS total_price,
           (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_groups,
           (SELECT CAST(sum(n) AS BIGINT) FROM g) AS rows_via_groups
    """,
    doc="IN-FLIGHT OBSERVED METRICS (DataFrame.observe + Observation): "
    "data-quality counters — row count, null count, exact decimal "
    "price total — collected as accumulator-style metrics WHILE the "
    "real aggregation runs, with NO second scan of the input: the "
    "observe node piggybacks on the same pass that feeds the "
    "per-flag group-by, which is the entire point at 100 TB (a "
    "separate DQ scan doubles the read bill; this is the mechanism "
    "behind Delta Live Tables expectations / Deequ metric "
    "repositories). The query returns the observed metrics joined "
    "with an invariant derived from the REAL query result (group "
    "count, and rows-via-groups which must equal the observed row "
    "count — a cross-check that the metrics describe the same pass); "
    "the oracle recomputes everything relationally. The ingest path "
    "uses the same face in production (sources/csv_bars.py observe).",
)
def observed_metrics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    from .exprs import dsum

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("l_quantity")).cast("bigint").alias("n_null_qty"),
        dsum("l_extendedprice", 2).alias("total_price"),
    )
    groups = (
        observed.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    )
    m = obs.get  # populated by the action above — same single pass
    row = [
        (
            int(m["n_rows"]),
            int(m["n_null_qty"]),
            float(m["total_price"]),
            len(groups),
            int(sum(r["n"] for r in groups)),
        )
    ]
    return spark.createDataFrame(
        row,
        "n_rows bigint, n_null_qty bigint, total_price double, "
        "n_groups bigint, rows_via_groups bigint",
    )
