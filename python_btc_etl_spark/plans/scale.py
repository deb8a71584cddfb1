"""Scale-pattern coverage: the plan shapes that keep 100 TB workloads
alive — event-time range window frames, deterministic salted skew joins,
and two-phase (shuffle-resident) distinct aggregation.

The reference's only scale mechanism is a 4-thread pool
(reference btc_etl.py:108-124); these are the distributed equivalents,
each verified against the same-semantics unsalted/single-phase DuckDB
oracle — salting and phase-splitting are *physical* rewrites that must
not change results, and the differential check proves exactly that.

Scale notes (100 TB):
- ``window_time_range_frame``: trailing-interval frames over event time
  shuffle once on the partition key and sort within partitions — no
  self-join blowup (the naive equivalent is an O(n·w) range self-join);
- ``salted_skew_join``: a deterministic salt (pmod(hash(pk), N)) splits a
  hot key's rows across N reducers; the build side replicates each key N
  ways via explode(sequence). This is the manual fallback when AQE's
  skew-join splitting can't kick in (e.g. pre-AQE engines, or a
  shuffle-hash join AQE won't rewrite). Results are provably identical
  to the plain join — the oracle is the unsalted join;
- ``two_phase_distinct``: count(DISTINCT x) via dedup-then-count. The
  expand-based single-phase distinct keeps every (group, x) pair in one
  reducer's hash table; phase-splitting dedups on (group, x) first —
  shuffle keys of much higher cardinality, so hot groups spread evenly —
  then counts pre-deduped rows. Same answer, skew-immune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import ensure_session_confs, load, managed_cache, spread
from ..functions import text as TX
from .exprs import dsum, sql_dsum
from .registry import query

N_SALT = 8
RANGE_SECONDS = 3599  # trailing hour, inclusive

# The user-profile self-join both skew queries share: the oracle is the
# plain (unsalted, un-split) join, so salted_skew_join, aqe_skew_join and
# the oracle are provably the same relation computed three ways.
_SKEW_ORACLE = f"""
    WITH profile AS (
        SELECT user_id,
               count(*) AS user_events,
               {sql_dsum('value')} AS user_total
        FROM events GROUP BY user_id
    )
    SELECT e.event_type,
           count(*) AS n_events,
           {sql_dsum('p.user_total')} AS sum_user_totals,
           max(p.user_events) AS max_user_events
    FROM events e JOIN profile p ON p.user_id = e.user_id
    GROUP BY e.event_type
    ORDER BY e.event_type
    """


@query(
    "window_time_range_frame",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(CAST(sum(CAST(CAST(value AS VARCHAR) AS DECIMAL(24,6)))
                     OVER (PARTITION BY user_id
                           ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                           RANGE BETWEEN {RANGE_SECONDS} PRECEDING AND CURRENT ROW)
                AS VARCHAR) AS DOUBLE) AS trailing_hour_value,
           count(*) OVER (PARTITION BY user_id
                          ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                          RANGE BETWEEN {RANGE_SECONDS} PRECEDING AND CURRENT ROW)
               AS trailing_hour_events
    FROM events
    ORDER BY user_id, ts, event_id
    """,
    doc="Event-time RANGE frame: per-user trailing-hour rolling sum and "
    "count, frame bounds in epoch seconds (rangeBetween), decimal-cast "
    "sum for cross-engine float determinism. One shuffle on user_id + "
    "in-partition sort; no range self-join.",
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-RANGE_SECONDS, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(24,6)")).over(w).cast("double").alias(
            "trailing_hour_value"
        ),
        F.count(F.lit(1)).over(w).alias("trailing_hour_events"),
    ).orderBy("user_id", "ts", "event_id")


@query(
    "salted_skew_join",
    oracle=_SKEW_ORACLE,
    doc="Salted large-large join: fact side salted with "
    "pmod(hash(event_id), 8), build side replicated 8× via "
    "explode(sequence), equi-join on (user_id, salt). A hot user's rows "
    "land on 8 reducers instead of 1. Oracle is the UNSALTED join — "
    "proving the physical rewrite is semantics-preserving.",
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    profile = e.groupBy(F.col("user_id").alias("p_user_id")).agg(
        F.count(F.lit(1)).alias("user_events"),
        dsum("value").alias("user_total"),
    )
    fact = e.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(N_SALT)))
    build = profile.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1)))
    )
    return (
        fact.join(
            build,
            (fact.user_id == build.p_user_id) & (fact.salt == build.salt),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("user_total").alias("sum_user_totals"),
            F.max("user_events").alias("max_user_events"),
        )
        .orderBy("event_type")
    )


@query(
    "aqe_skew_join",
    oracle=f"""
    WITH dim(d_event_type, weight) AS (
        SELECT * FROM (VALUES ('click', 1.5), ('error', 0.0),
                              ('purchase', 5.0), ('signup', 2.0),
                              ('view', 1.0)) t(a, b)
    )
    SELECT e.user_id % 100 AS user_bucket,
           count(*) AS n_events,
           {sql_dsum('e.value * d.weight', 8)} AS weighted_value
    FROM events e JOIN dim d ON d.d_event_type = e.event_type
    GROUP BY user_bucket
    ORDER BY user_bucket
    """,
    doc="AQE skew-join twin of salted_skew_join: a 1:1 dim join on a "
    "hot low-cardinality key (every event carries one of 5 event_type "
    "values, so 5 shuffle partitions hold the whole fact side) with NO "
    "manual salt and broadcast disabled - spark.sql.adaptive.skewJoin "
    "detects the oversized partitions from measured map stats and "
    "splits them into advisory-sized chunks, duplicating the matching "
    "build-side partition per chunk (final plan shows "
    "SortMergeJoin(skew=true); plan-shape-tested). This is the "
    "preferred rewrite at 100 TB; the manual salt (salted_skew_join) "
    "is the fallback when AQE cannot apply (pre-AQE engines, or a "
    "build side the pattern will not match). Runs in a cloned session "
    "(own SQLConf) so demo-scale thresholds never leak into the "
    "caller session; the oracle is the plain un-split join.",
)
def aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.newSession()
    ensure_session_confs(s)
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Demo-scale thresholds: production defaults (256 MB / 5x median) are
    # sized for real clusters; test parquet shuffles are KB-sized, so the
    # detector needs KB-scale bounds to exercise the same code path.
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1kb")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4kb")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    # Skew splitting applies to sort-merge / shuffled-hash joins only -
    # keep the 5-row build side off the broadcast path.
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE splits a skewed reduce partition at map-output granularity: a
    # one-file scan yields ONE map task, making every reduce partition a
    # single unsplittable chunk. At 100 TB the scan arrives in thousands
    # of splits; spread() restores that shape at test scale.
    e = spread(load(s, sf_dir, "events"))
    dim = s.createDataFrame(
        [("click", 1.5), ("error", 0.0), ("purchase", 5.0),
         ("signup", 2.0), ("view", 1.0)],
        "d_event_type string, weight double",
    )
    return (
        e.hint("merge")
        .join(dim.hint("merge"), e.event_type == dim.d_event_type)
        .groupBy((F.col("user_id") % 100).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value") * F.col("weight"), 8).alias("weighted_value"),
        )
        .orderBy("user_bucket")
    )


@query(
    "two_phase_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT date_trunc('day', ts)) AS n_active_days
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Two-phase distinct aggregation: dedup on (group, key) first "
    "(high-cardinality shuffle keys spread hot groups across reducers), "
    "then count pre-deduped rows per group. Skew-immune form of "
    "count(DISTINCT); oracle is the single-phase form.",
)
def two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pairs = e.select(
        "event_type",
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
    )
    users = (
        pairs.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    days = (
        pairs.select("event_type", "day")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_active_days"))
    )
    return users.join(days, "event_type").orderBy("event_type")


@query(
    "bloom_filter_join",
    oracle=f"""
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_lines,
           {sql_dsum('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'F'
    GROUP BY priority
    ORDER BY priority
    """,
    doc="Runtime bloom-filter semi-join reduction: the filtered orders "
    "side builds a bloom filter over its join keys at runtime, and "
    "Catalyst injects might_contain(bloomFilter, xxhash64(l_orderkey)) "
    "into the lineitem scan — non-matching fact rows die before the "
    "shuffle, the same job the salted/AQE rewrites do for skew but for "
    "SELECTIVITY (at 100 TB a 3%-selective dim filter means ~97% of "
    "the fact shuffle is wasted without it). Plan-shape-tested; oracle "
    "is the plain join.",
)
def bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.newSession()
    ensure_session_confs(s)
    # Injection needs a shuffle join (a broadcast join already avoids the
    # fact shuffle), and the application-side scan must exceed a
    # threshold tuned for clusters (10 GB default) — zero it so the
    # KB-scale test exercises the same code path.
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    li = load(s, sf_dir, "lineitem")
    o = load(s, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("revenue"),
        )
        .orderBy("priority")
    )


@query(
    "hinted_shuffle_hash_join",
    oracle=f"""
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_lines,
           {sql_dsum('l.l_extendedprice')} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
    doc="Join-strategy control: the orders side is too big to broadcast "
    "but small enough to hash — hint('shuffle_hash') picks "
    "ShuffledHashJoin over the default sort-merge, skipping BOTH sides' "
    "sorts (at 100 TB the sort of the fact side is the cost). "
    "Plan-shape-tested; results identical to the unhinted join.",
)
def hinted_shuffle_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").hint("shuffle_hash")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("revenue"),
        )
        .orderBy("priority")
    )


Z_BITS = 21  # per-dimension bits: covers keys to 2M, z fits in 42 bits
Z_BUCKETS = 32


# Magic-mask bit spread (the closed-form Morton encode every z-order
# writer uses): 5 shift-or-mask steps spread a 21-bit key so its bits
# occupy even positions; two spreads OR'd (one shifted) interleave. The
# per-row cost is ~20 codegen'd long ops - measured 3x faster than the
# equivalent 21-iteration aggregate(sequence(...)) fold, which allocates
# an array per row. Equal to the fold for all inputs (both mask to
# Z_BITS low bits first).
_SPREAD_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def with_zval(df: DataFrame, c1: str, c2: str, out: str = "zval") -> DataFrame:
    """Append the Morton z-value of (c1, c2) as column ``out``.

    Each ``x = (x | x << s) & m`` step lands in its OWN projection alias
    (withColumn chain), so every intermediate is bound once and the plan
    really is ~20 long ops per row. A single interpolated SQL string
    would nest the accumulated expression twice per step — 2^5 copies of
    the base expression (~127 operator nodes per spread), leaning on
    subexpression elimination to avoid 32x re-evaluation. Catalyst's
    CollapseProject keeps multiply-referenced non-trivial aliases bound,
    and the whole chain still fuses into one codegen stage.
    """
    lo_mask = (1 << Z_BITS) - 1
    ta, tb = f"__{out}_a", f"__{out}_b"
    df = df.withColumn(ta, F.col(c1).cast("long").bitwiseAND(F.lit(lo_mask)))
    df = df.withColumn(tb, F.col(c2).cast("long").bitwiseAND(F.lit(lo_mask)))
    for sh, mask in _SPREAD_MASKS:
        for t in (ta, tb):
            df = df.withColumn(
                t, F.col(t).bitwiseOR(F.shiftleft(F.col(t), sh)).bitwiseAND(F.lit(mask))
            )
    return df.withColumn(out, F.col(ta).bitwiseOR(F.shiftleft(F.col(tb), 1))).drop(ta, tb)


def _sql_z_expr(c1: str, c2: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(range(0, {Z_BITS}), "
        f"i -> ((({c1} >> i) & 1) << (2*i)) + ((({c2} >> i) & 1) << (2*i+1)))), "
        f"(a, b) -> a + b)"
    )


@query(
    "zorder_layout_stats",
    oracle=f"""
    WITH z AS (
        SELECT l_partkey, l_suppkey,
               {_sql_z_expr('l_partkey', 'l_suppkey')} AS zval
        FROM lineitem
    ),
    rng AS (SELECT min(zval) AS zmin, max(zval) AS zmax FROM z),
    b AS (
        SELECT z.*, (z.zval - r.zmin) // (((r.zmax - r.zmin) // {Z_BUCKETS}) + 1)
                   AS bucket
        FROM z, rng r
    )
    SELECT bucket,
           count(*) AS n,
           min(l_partkey) AS pk_lo, max(l_partkey) AS pk_hi,
           min(l_suppkey) AS sk_lo, max(l_suppkey) AS sk_hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="Z-order (Morton-curve) layout statistics: interleave the bits "
    f"of (l_partkey, l_suppkey) into a {2 * Z_BITS}-bit z-value, split "
    f"the z-range into {Z_BUCKETS} equal-width cells, and report each "
    "cell's min/max on BOTH key columns — the file-level statistics a "
    "z-ordered table write would produce, where every cell has a "
    "bounded range on every clustered dimension (a single-column sort "
    "bounds only its own column, leaving the other's span at full "
    "width). Everything is integer bit arithmetic — bit-identical "
    "across engines — and fully distributed: the z-range comes from "
    "one broadcast min/max aggregate and bucketing is a scan-local "
    "expression, unlike a global ntile sort. This is the write-time "
    "clustering recipe for multi-dimension predicate skipping at "
    "100 TB (Delta/Iceberg OPTIMIZE ZORDER does exactly this).",
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    z = with_zval(li, "l_partkey", "l_suppkey")
    rng = z.agg(F.min("zval").alias("zmin"), F.max("zval").alias("zmax"))
    b = z.crossJoin(F.broadcast(rng)).withColumn(
        "bucket",
        F.expr(f"(zval - zmin) div (((zmax - zmin) div {Z_BUCKETS}) + 1)"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_partkey").alias("pk_lo"),
            F.max("l_partkey").alias("pk_hi"),
            F.min("l_suppkey").alias("sk_lo"),
            F.max("l_suppkey").alias("sk_hi"),
        )
        .orderBy("bucket")
    )


NULLKEY_EVERY = 97  # synthesize a null join key on ~1% of orders


@query(
    "null_key_isolated_join",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_custkey % {NULLKEY_EVERY} = 0 THEN NULL
                    ELSE o_custkey END AS cust_fk
        FROM orders
    )
    SELECT o.o_orderkey, o.cust_fk, c.c_mktsegment, o.o_totalprice
    FROM o LEFT JOIN customer c ON c.c_custkey = o.cust_fk
    ORDER BY o.o_orderkey
    """,
    doc="Null-key skew isolation: a LEFT JOIN whose foreign key is NULL "
    "on ~1% of rows (synthesized here; in real 100 TB fact tables "
    "null FKs are routine and EVERY null hashes to the same shuffle "
    "partition, making one straggler task carry all of them — they "
    "can never match anyway). The rewrite splits null-key rows out "
    "BEFORE the shuffle, joins only the non-null side, and unions the "
    "null rows back with null dim columns; the oracle is the plain "
    "unsplit LEFT JOIN, differentially proving the rewrite exact "
    "(including the null-never-matches SQL semantics). Same family as "
    "salted_skew_join/aqe_skew_join - the third classic skew surgery.",
)
def null_key_isolated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_custkey") % NULLKEY_EVERY == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    nn = o.filter(F.col("cust_fk").isNotNull())
    nulls = o.filter(F.col("cust_fk").isNull()).withColumn(
        "c_mktsegment", F.lit(None).cast("string")
    )
    joined = nn.join(c, nn["cust_fk"] == c["c_custkey"], "left").drop("c_custkey")
    return (
        joined.unionByName(nulls)
        .select("o_orderkey", "cust_fk", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    )


RANGE_PARTS = 16


@query(
    "range_partition_layout",
    oracle=f"""
    SELECT count(*) AS n_rows,
           min(event_id) AS id_lo,
           max(event_id) AS id_hi,
           {RANGE_PARTS} AS n_parts,
           0 AS overlap_violations,
           0 AS unsorted_partitions
    FROM events
    """,
    doc="Range partitioning + within-partition sort — the write layout "
    "for ordered tables at 100 TB (repartitionByRange gives every "
    "output file a disjoint key range, so file-level min/max pruning "
    "answers range predicates; a hash layout cannot). The query "
    "repartitionByRange(16)s events by event_id, probes the PHYSICAL "
    "layout with one mapInPandas pass (per-partition min/max/count + "
    "a cross-batch sortedness check — Arrow batches preserve "
    "partition-internal order), then asserts the partition intervals "
    "are pairwise disjoint and each partition is sorted. The layout "
    "properties (overlap_violations = 0, unsorted_partitions = 0, "
    "n_parts = 16) plus the row-conservation stats are the compared "
    "result; Spark's range boundaries themselves are "
    "sampling-determined and deliberately NOT in the oracle. "
    "Scale note: the boundary sampling pass is O(parts · sample) and "
    "the shuffle is one exchange — the same cost ORDER BY pays, but "
    "unlike a global sort the result stays partition-parallel for "
    "downstream writes.",
)
def range_partition_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    e = load(spark, sf_dir, "events").select("event_id")
    rp = e.repartitionByRange(RANGE_PARTS, F.col("event_id")).sortWithinPartitions(
        "event_id"
    )

    probe_schema = T.StructType(
        [
            T.StructField("pid", T.IntegerType()),
            T.StructField("p_lo", T.LongType()),
            T.StructField("p_hi", T.LongType()),
            T.StructField("p_rows", T.LongType()),
            T.StructField("p_sorted", T.IntegerType()),
        ]
    )

    def probe(batches):
        # One mapInPandas invocation == one physical partition; batches
        # arrive in partition order, so carrying `last` across batches
        # checks global partition sortedness, not per-batch sortedness.
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        lo = hi = last = None
        rows, ok = 0, 1
        for pdf in batches:
            v = pdf["event_id"]
            if len(v) == 0:
                continue
            if not v.is_monotonic_increasing:
                ok = 0
            if last is not None and v.iloc[0] < last:
                ok = 0
            last = int(v.iloc[-1])
            lo = int(v.iloc[0]) if lo is None else lo
            hi = last
            rows += len(v)
        if rows == 0:
            return
        yield pd.DataFrame(
            {"pid": [pid], "p_lo": [lo], "p_hi": [hi], "p_rows": [rows], "p_sorted": [ok]}
        )

    parts = rp.mapInPandas(probe, schema=probe_schema)
    w = W.orderBy("p_lo")
    return (
        parts.withColumn("prev_hi", F.lag("p_hi").over(w))
        .agg(
            F.sum("p_rows").alias("n_rows"),
            F.min("p_lo").alias("id_lo"),
            F.max("p_hi").alias("id_hi"),
            F.count(F.lit(1)).alias("n_parts"),
            F.count(F.when(F.col("p_lo") <= F.col("prev_hi"), 1)).alias(
                "overlap_violations"
            ),
            F.count(F.when(F.col("p_sorted") == 0, 1)).alias("unsorted_partitions"),
        )
        .select(
            "n_rows",
            "id_lo",
            "id_hi",
            F.col("n_parts").cast("int").alias("n_parts"),
            F.col("overlap_violations").cast("int").alias("overlap_violations"),
            F.col("unsorted_partitions").cast("int").alias("unsorted_partitions"),
        )
    )


SPATIAL_CELL = 2.0  # 2-degree grid cells over the synthetic [0,10) box
SPATIAL_R2 = 4.0  # squared proximity radius (2.0 deg = cell size)


@query(
    "spatial_grid_proximity_join",
    oracle="""
    WITH pts AS (
        SELECT DISTINCT user_id,
               CAST((user_id * 7919) % 1000 AS DOUBLE) / 100 AS lat,
               CAST((user_id * 104729) % 1000 AS DOUBLE) / 100 AS lon
        FROM events
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           (a.lat - b.lat) * (a.lat - b.lat)
               + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
    FROM pts a JOIN pts b ON a.user_id < b.user_id
    WHERE (a.lat - b.lat) * (a.lat - b.lat)
              + (a.lon - b.lon) * (a.lon - b.lon) <= 4.0
    ORDER BY user_a, user_b
    """,
    doc="Spatial proximity join via grid blocking: deterministic synthetic "
    "coordinates per user (integer hash → [0,10)² box), points bucketed "
    "into 2° grid cells, and the radius-2 pair search runs as an "
    "EQUI-join — one side replicated to its 3×3 neighbor cells, the "
    "other joined on its home cell, so every qualifying pair meets on "
    "exactly one key (no post-join dedup) and nothing is ever a cross "
    "product. The geohash/S2-cell pattern every distributed spatial "
    "join uses: radius ≤ cell size ⇒ 9 keys bound the candidate set "
    "regardless of table size (radius = cell keeps 3x3 sufficient). The oracle is the unblocked quadratic "
    "join — complete blocking must reproduce it exactly. Squared "
    "distance only (identical multiply/add order both engines; no "
    "sqrt).",
)
def spatial_grid_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pts = e.select("user_id").distinct().select(
        "user_id",
        (((F.col("user_id") * 7919) % 1000).cast("double") / 100).alias("lat"),
        (((F.col("user_id") * 104729) % 1000).cast("double") / 100).alias("lon"),
    )
    cell = lambda c: F.floor(c / SPATIAL_CELL).cast("int")  # noqa: E731
    home = pts.select(
        F.col("user_id").alias("user_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        cell(F.col("lat")).alias("cx"),
        cell(F.col("lon")).alias("cy"),
    )
    probe = (
        pts.select(
            F.col("user_id").alias("user_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            cell(F.col("lat")).alias("hx"),
            cell(F.col("lon")).alias("hy"),
        )
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "user_a",
            "lat_a",
            "lon_a",
            (F.col("hx") + F.col("dx")).alias("cx"),
            (F.col("hy") + F.col("dy")).alias("cy"),
        )
    )
    dist2 = (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b")) + (
        F.col("lon_a") - F.col("lon_b")
    ) * (F.col("lon_a") - F.col("lon_b"))
    return (
        probe.join(home, ["cx", "cy"])
        .filter(F.col("user_a") < F.col("user_b"))
        .select("user_a", "user_b", dist2.alias("dist2"))
        .filter(F.col("dist2") <= SPATIAL_R2)
        .orderBy("user_a", "user_b")
    )


# ---------------------------------------------------------------------------
# Z-order data-layout clustering audit
# ---------------------------------------------------------------------------

# 8 bits per dimension -> 16-bit z-values; 64 files of z-width 1024.
# ZP_ prefix: zorder_layout_stats above owns the bare Z_ names (21-bit
# interleave) — rebinding Z_BITS here would silently re-scope its
# call-time reads (caught by the round-6 full sweep).
ZP_BITS = 8
ZP_CODES = 1 << ZP_BITS           # 256 codes per dimension
ZP_FILE_WIDTH = 1024             # z-range per "file" (65536 / 64)
ZP_LIN_WIDTH = ZP_CODES // 64     # date-code width per linear "file"
ZP_BOX_LO, ZP_BOX_HI = 64, 127    # the 2-D range predicate (1/16 of the area)

_SQL_Z_CODED = f"""
    s AS (
        SELECT min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
               min(o_orderdate) AS min_d,
               date_diff('day', min(o_orderdate), max(o_orderdate)) AS max_days
        FROM orders
    ),
    coded AS (
        SELECT ((o_custkey - min_ck) * {ZP_CODES}) // (max_ck - min_ck + 1) AS x_code,
               (date_diff('day', min_d, o_orderdate) * {ZP_CODES}) // (max_days + 1)
                   AS y_code
        FROM orders, s
    ),
    zz AS (
        SELECT x_code, y_code,
               CAST(list_sum(list_transform(range(0, {ZP_BITS}), i ->
                    (((x_code >> i) & 1) << (2 * i + 1))
                  + (((y_code >> i) & 1) << (2 * i)))) AS BIGINT) AS z
        FROM coded
    )
"""


def _sql_z_layout(name: str, file_expr: str) -> str:
    return f"""
        SELECT '{name}' AS layout,
               count(*) AS n_files,
               count(*) FILTER (WHERE NOT (max_x < {ZP_BOX_LO} OR min_x > {ZP_BOX_HI}
                                        OR max_y < {ZP_BOX_LO} OR min_y > {ZP_BOX_HI}))
                   AS files_scanned,
               CAST(coalesce(sum(n_rows) FILTER (WHERE NOT (max_x < {ZP_BOX_LO}
                        OR min_x > {ZP_BOX_HI} OR max_y < {ZP_BOX_LO}
                        OR min_y > {ZP_BOX_HI})), 0) AS BIGINT) AS rows_scanned,
               (SELECT count(*) FROM zz WHERE x_code BETWEEN {ZP_BOX_LO} AND {ZP_BOX_HI}
                  AND y_code BETWEEN {ZP_BOX_LO} AND {ZP_BOX_HI}) AS rows_matching
        FROM (
            SELECT {file_expr} AS file_id,
                   min(x_code) AS min_x, max(x_code) AS max_x,
                   min(y_code) AS min_y, max(y_code) AS max_y,
                   count(*) AS n_rows
            FROM zz GROUP BY 1
        )
    """


@query(
    "zorder_layout_pruning_audit",
    oracle=f"""
    WITH {_SQL_Z_CODED}
    {_sql_z_layout('linear', f'y_code // {ZP_LIN_WIDTH}')}
    UNION ALL
    {_sql_z_layout('zorder', f'z // {ZP_FILE_WIDTH}')}
    ORDER BY layout
    """,
    doc="Z-ORDER data-layout clustering audit (the OPTIMIZE ZORDER "
    "pattern): orders are coded into 8-bit buckets on (custkey, "
    "orderdate), bit-interleaved into a 16-bit Morton z-value, and "
    "chunked into 64 value-range 'files' two ways — time-linear "
    "(append order) vs z-ordered. Per-file min/max column stats (the "
    "parquet-footer analogy) then answer a fixed 2-D range predicate: "
    "the audit reports files/rows scanned under each layout, proving "
    "the z-layout prunes to ~1/16 of files where the linear layout "
    "scans ~1/4 (each linear file spans the full custkey range). At "
    "100 TB the file assignment materializes as repartitionByRange(z) "
    "+ sortWithinPartitions before the write, and pruning happens for "
    "free off footer stats; here the same statistics are computed "
    "relationally so the benefit is differentially checkable. The "
    "z-value is pure per-row integer codegen (no UDF); every "
    "aggregation is partial-aggregable; no global sort or window "
    "anywhere.",
)
def zorder_layout_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    stats = o.agg(
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.min("o_orderdate").alias("min_d"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("max_days"),
    )
    coded = o.crossJoin(F.broadcast(stats)).select(
        F.expr(
            f"((o_custkey - min_ck) * {ZP_CODES}) div (max_ck - min_ck + 1)"
        ).alias("x_code"),
        F.expr(
            f"(datediff(o_orderdate, min_d) * {ZP_CODES}) div (max_days + 1)"
        ).alias("y_code"),
    )
    # Morton interleave as a bounded integer fold — shift amounts are
    # data-independent loop indices, so the whole expression codegens.
    zz = coded.withColumn(
        "z",
        F.expr(
            f"aggregate(sequence(0, {ZP_BITS - 1}), CAST(0 AS BIGINT),"
            " (acc, i) -> acc"
            " + shiftleft((shiftright(x_code, i) & 1), 2 * i + 1)"
            " + shiftleft((shiftright(y_code, i) & 1), 2 * i))"
        ),
    )
    zz = managed_cache(zz)  # three consumers: two layouts + the match count
    in_box = (
        F.col("x_code").between(ZP_BOX_LO, ZP_BOX_HI)
        & F.col("y_code").between(ZP_BOX_LO, ZP_BOX_HI)
    )
    n_match = zz.filter(in_box).agg(F.count(F.lit(1)).alias("rows_matching"))

    def layout(name: str, file_col):
        files = zz.groupBy(file_col.alias("file_id")).agg(
            F.min("x_code").alias("min_x"),
            F.max("x_code").alias("max_x"),
            F.min("y_code").alias("min_y"),
            F.max("y_code").alias("max_y"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        scanned = ~(
            (F.col("max_x") < ZP_BOX_LO)
            | (F.col("min_x") > ZP_BOX_HI)
            | (F.col("max_y") < ZP_BOX_LO)
            | (F.col("min_y") > ZP_BOX_HI)
        )
        return (
            files.agg(
                F.count(F.lit(1)).alias("n_files"),
                F.count(F.when(scanned, 1)).alias("files_scanned"),
                F.coalesce(
                    F.sum(F.when(scanned, F.col("n_rows"))), F.lit(0)
                ).cast("bigint").alias("rows_scanned"),
            )
            .select(F.lit(name).alias("layout"), "*")
            .crossJoin(F.broadcast(n_match))
        )

    lin = layout("linear", F.expr(f"y_code div {ZP_LIN_WIDTH}"))
    zor = layout("zorder", F.expr(f"z div {ZP_FILE_WIDTH}"))
    return lin.unionByName(zor).orderBy("layout")


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance (algebraic re-aggregation)
# ---------------------------------------------------------------------------

MV_DELTA_SLICE = 7  # event_id % 8 == 7 -> the "newly arrived" delta batch


@query(
    "incremental_mv_refresh_audit",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           {sql_dsum('value')} AS total_value,
           min(ts) AS min_ts,
           max(event_id) AS max_event_id,
           count(DISTINCT CASE WHEN event_id % 8 = {MV_DELTA_SLICE}
                               THEN 1 ELSE 0 END) AS n_partials
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="INCREMENTAL MV maintenance: the corpus is split into a base "
    f"batch and a delta batch (event_id % 8 == {MV_DELTA_SLICE}), each "
    "aggregated independently into per-key partial STATES (count / "
    "exact-decimal sum / min / max — all monoid-mergeable), and the "
    "refreshed view is the MERGE of the two state tables, never a "
    "re-scan of the base. The differential proves merge == full "
    "recompute (the DuckDB oracle aggregates all rows in one pass), "
    "and n_partials — counted from the DATA, not the plan — pins that "
    "every key genuinely carried two states into the merge. The "
    "decimal partial sums stay decimal until after the merge, so "
    "associativity is exact; the same algebra is why the pattern "
    "scales: at 100 TB the base state is a tiny keyed table and each "
    "refresh touches only the delta (this is the batch face of "
    "streaming state / Delta incremental aggregation; retractions "
    "need sum/count only — min/max require the full re-scan this "
    "audit avoids).",
)
def incremental_mv_refresh_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value", "ts")
    is_delta = F.col("event_id") % 8 == MV_DELTA_SLICE

    def partial_state(df: DataFrame) -> DataFrame:
        # Decimal partial sum NOT yet cast to double: the merge must sum
        # exact decimals (associative) — casting each partial to double
        # first would make merge != recompute by reintroducing float
        # rounding at the merge boundary.
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(24,6)")).alias("ps"),
            F.min("ts").alias("pmin"),
            F.max("event_id").alias("pmax"),
        )

    states = partial_state(e.filter(~is_delta)).unionByName(
        partial_state(e.filter(is_delta))
    )
    return (
        states.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("ps").cast("double").alias("total_value"),
            F.min("pmin").alias("min_ts"),
            F.max("pmax").alias("max_event_id"),
            F.count(F.lit(1)).alias("n_partials"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Salted skew-join mitigation AUDIT (round 10)
# --------------------------------------------------------------------------

# join_key_skew_profile MEASURES skew and salted_skew_join/aqe_skew_join
# prove the rewrites are semantics-preserving — this query closes the
# loop with the EVIDENCE that the salt actually balances the shuffle:
# plant a hot key (75% of fact rows collapse onto k = -1), execute the
# join BOTH ways (plain and salted) over the same cached fact pass, and
# report per-strategy partition statistics from a deterministic
# partitioner MODEL (part = hash28(key[, salt]) % SKEW_MODEL_PARTS —
# the same hash/modulo structure a hash partitioner applies, built on
# the repo's cross-engine SHA-based hash so DuckDB replays it exactly;
# the REAL spark_partition_id() balance is pinned by the pytest twin,
# which a SQL oracle cannot see). The checksum column is computed from
# each strategy's OWN executed join, so equal checksums across the two
# output rows prove result equality, and max_share_bp (max partition's
# share in basis points, division-free) proves the balance: unsalted
# concentrates >= 75% of rows on one reducer, salted divides that by
# ~N_SALT. 100 TB: this is the #1 scale-killer fix — the audit pattern
# (model partitions, compare max share) is exactly what you run before
# committing a salt factor on a real cluster.

SKEW_MODEL_PARTS = 32  # modeled reducer count for the balance audit


@query(
    "skew_join_salted_mitigation",
    oracle=f"""
    WITH fact AS MATERIALIZED (
        SELECT event_id,
               CASE WHEN user_id % 4 != 0 THEN -1 ELSE user_id END AS k,
               {TX.sql_hash28("CAST(event_id AS VARCHAR)")} % {N_SALT} AS salt
        FROM events
    ),
    dim AS MATERIALIZED (SELECT k, count(*) AS key_events FROM fact GROUP BY k),
    j AS MATERIALIZED (
        SELECT f.event_id, d.key_events
        FROM fact f JOIN dim d USING (k)
    ),
    chk AS (
        SELECT count(*) AS n_rows,
               CAST(sum((event_id % 97 + 1) * key_events) AS BIGINT) AS checksum
        FROM j
    ),
    parts_u AS (
        SELECT {TX.sql_hash28("CAST(k AS VARCHAR)")} % {SKEW_MODEL_PARTS} AS part,
               count(*) AS c
        FROM fact GROUP BY 1
    ),
    parts_s AS (
        SELECT {TX.sql_hash28("CAST(k AS VARCHAR) || '#' || CAST(salt AS VARCHAR)")}
                   % {SKEW_MODEL_PARTS} AS part,
               count(*) AS c
        FROM fact GROUP BY 1
    ),
    su AS (SELECT count(*) AS n_parts_used, max(c) AS max_part_rows FROM parts_u),
    ss AS (SELECT count(*) AS n_parts_used, max(c) AS max_part_rows FROM parts_s)
    SELECT * FROM (
        SELECT 'unsalted' AS strategy, chk.n_rows, chk.checksum,
               su.n_parts_used, su.max_part_rows,
               su.max_part_rows * 10000 // chk.n_rows AS max_share_bp
        FROM chk, su
        UNION ALL
        SELECT 'salted', chk.n_rows, chk.checksum,
               ss.n_parts_used, ss.max_part_rows,
               ss.max_part_rows * 10000 // chk.n_rows
        FROM chk, ss
    ) ORDER BY strategy
    """,
    doc="SALTED SKEW-JOIN MITIGATION AUDIT: a planted hot key (75% of "
    f"events collapse to k=-1) joined plain AND salted (deterministic "
    f"salt = hash28(event_id) % {N_SALT}, build side replicated); each "
    "strategy row carries the checksum of its OWN executed join (equal "
    "checksums = result equality, also oracle-verified) plus modeled "
    f"per-partition balance over {SKEW_MODEL_PARTS} reducers: the "
    "unsalted max-partition share is >= 7500 bp, the salted one drops "
    f"by ~{N_SALT}x. One cached fact pass feeds both joins and both "
    "partition models — no extra fact scan (plan-shape-tested); the "
    "real spark_partition_id() balance is pinned in pytest.",
)
def skew_join_salted_mitigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.when(F.col("user_id") % 4 != 0, F.lit(-1)).otherwise(F.col("user_id"))
    fact = managed_cache(
        e.select(
            "event_id",
            k.cast("bigint").alias("k"),
            (TX.hash28(F.col("event_id").cast("string")) % N_SALT).alias("salt"),
        )
    )
    dim = fact.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("key_events")
    )
    term = (F.col("event_id") % 97 + 1) * F.col("key_events")

    def _chk(joined: DataFrame) -> DataFrame:
        return joined.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(term).cast("bigint").alias("checksum"),
        )

    chk_u = _chk(fact.join(dim, "k"))
    dim_s = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1)))
    ).withColumn("salt", F.col("salt").cast("bigint"))
    chk_s = _chk(fact.join(dim_s, ["k", "salt"]))

    def _parts(partcol) -> DataFrame:
        return (
            fact.groupBy(partcol.alias("part"))
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_parts_used"),
                F.max("c").cast("bigint").alias("max_part_rows"),
            )
        )

    su = _parts(TX.hash28(F.col("k").cast("string")) % SKEW_MODEL_PARTS)
    ss = _parts(
        TX.hash28(
            F.concat(
                F.col("k").cast("string"), F.lit("#"), F.col("salt").cast("string")
            )
        )
        % SKEW_MODEL_PARTS
    )

    def _row(strategy: str, chk: DataFrame, st: DataFrame) -> DataFrame:
        return (
            chk.crossJoin(F.broadcast(st))
            .select(
                F.lit(strategy).alias("strategy"),
                "n_rows",
                "checksum",
                "n_parts_used",
                "max_part_rows",
                F.expr("max_part_rows * 10000 div n_rows").alias("max_share_bp"),
            )
        )

    return _row("unsalted", chk_u, su).unionByName(
        _row("salted", chk_s, ss)
    ).orderBy("strategy")


# --------------------------------------------------------------------------
# Sampled join-cardinality estimation audit (round 10)
# --------------------------------------------------------------------------

# The optimizer-statistics face: before launching a self-join (or any
# key-equi-join) at 100 TB, a planner wants |A ⋈ B| WITHOUT running
# the join. The classical estimator is key-hash sampling: take the
# deterministic 1/CARD_SLICES slice of the KEY DOMAIN (every key is in
# or out entirely — unlike row sampling, key sampling preserves the
# per-key quadratic term exactly), compute the pair mass over the
# sampled keys, scale by CARD_SLICES. The audit runs estimator AND
# ground truth from one per-key count pass and reports the signed
# error — the number that tells you whether the sample rate is safe to
# plan with. Everything is exact integer arithmetic off the shared
# 28-bit content hash, so both engines agree bit-for-bit. 100 TB: the
# count pass is one partial-aggregable shuffle on the join key; the
# estimator touches |sampled keys| rows; ground truth here is
# Σ c_k² computed from the SAME counts (never the materialized join).

CARD_SLICES = 16  # key-domain sample: hash28(key) % 16 == 0


@query(
    "join_cardinality_estimate_audit",
    oracle=f"""
    WITH c AS MATERIALIZED (
        SELECT user_id, count(*) AS c
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT user_id, c FROM c
        WHERE ({TX.sql_hash28("CAST(user_id AS VARCHAR)")}) % {CARD_SLICES} = 0
    )
    SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_keys,
           CAST((SELECT count(*) FROM s) AS BIGINT) AS n_keys_sampled,
           CAST((SELECT sum(c * c) FROM c) AS BIGINT) AS exact_pairs,
           CAST(coalesce((SELECT sum(c * c) FROM s), 0) * {CARD_SLICES}
                AS BIGINT) AS est_pairs,
           CAST((coalesce((SELECT sum(c * c) FROM s), 0) * {CARD_SLICES}
                 - (SELECT sum(c * c) FROM c)) * 1000000
                // (SELECT sum(c * c) FROM c) AS BIGINT) AS err_ppm
    """,
    doc="JOIN-CARDINALITY ESTIMATION AUDIT — the planner-statistics "
    "face: |events ⋈ events ON user_id| estimated by deterministic "
    "KEY-DOMAIN hash sampling (1/16 of keys via the shared 28-bit "
    "hash; key sampling, not row sampling, so each sampled key's "
    "quadratic pair mass is exact) scaled up, against the exact "
    "Σ c_k² ground truth computed from the SAME one-pass per-key "
    "counts — the join itself never runs. Signed error in exact "
    "integer ppm. 100 TB: one partial-aggregable count shuffle; "
    "the estimate costs |keys|/16 additions.",
)
def join_cardinality_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = managed_cache(
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    s = c.filter(
        TX.hash28(F.col("user_id").cast("string")) % CARD_SLICES == 0
    )
    tot = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("exact_pairs"),
    )
    smp = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys_sampled"),
        # empty sample slice => the estimator genuinely says 0, not NULL
        (F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0)) * CARD_SLICES)
        .cast("bigint")
        .alias("est_pairs"),
    )
    return tot.crossJoin(F.broadcast(smp)).select(
        "n_keys",
        "n_keys_sampled",
        "exact_pairs",
        "est_pairs",
        F.expr("(est_pairs - exact_pairs) * 1000000 div exact_pairs")
        .cast("bigint")
        .alias("err_ppm"),
    )
