"""Ordered-set / collection aggregates and extended scalar coverage:
exact percentiles & median, string aggregation, boolean aggregates,
lateral explode (UNNEST), deterministic mode, and a second tier of
string/math scalar functions.

Nothing here exists in the reference (SURVEY.md §2.B — it computes no
aggregates at runtime at all); these fill the remaining aggregate-
function rows of the gap table.

Determinism notes:
- exact percentiles interpolate between adjacent order statistics; on
  l_quantity (integers 1..50) every interpolated value is a small
  dyadic rational, exactly representable in both engines regardless of
  the interpolation formula's operation order;
- string aggregation is order-sensitive, so inputs are deduplicated and
  sorted before joining (array_sort(collect_set(...)) ≙ string_agg(
  DISTINCT ... ORDER BY ...));
- mode is tie-ambiguous across engines, so it is derived explicitly as
  "smallest value among the most frequent" via a count + min_by — same
  definition spelled out on both sides;
- percentile/median on Spark run as exact ordered-set aggregates
  (sort-based within groups); at 100 TB prefer approx_percentile
  (KLL/GK sketch, mergeable, one pass) — covered rows-only in
  approx_distinct_parts's family since sketches are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, managed_cache
from .exprs import dsum, sql_dsum
from .registry import query

# ---------------------------------------------------------------------------
# Exact percentiles / median
# ---------------------------------------------------------------------------


@query(
    "percentile_quantity",
    oracle="""
    SELECT l_returnflag,
           count(*)                          AS n_items,
           median(l_quantity)                AS median_qty,
           quantile_cont(l_quantity, 0.25)   AS p25_qty,
           quantile_cont(l_quantity, 0.75)   AS p75_qty,
           quantile_cont(l_quantity, 0.95)   AS p95_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Exact median + continuous percentiles (p25/p75/p95) per group — "
    "ordered-set aggregates; interpolated values on integer quantities "
    "are dyadic rationals, bit-identical across engines.",
)
def percentile_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.median("l_quantity").alias("median_qty"),
            F.percentile("l_quantity", 0.25).alias("p25_qty"),
            F.percentile("l_quantity", 0.75).alias("p75_qty"),
            F.percentile("l_quantity", 0.95).alias("p95_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "approx_quantiles_check",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS exact_p50,
           TRUE                           AS within_rank_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Approximate quantiles with a CHECKABLE contract (the 100 TB "
    "path: percentile_approx is a mergeable KLL-style sketch, one pass, "
    "no global sort): the sketch guarantees a RANK error <= 1/accuracy, "
    "so with accuracy=1000 the approx median must lie between the exact "
    "0.498 and 0.502 quantiles — the oracle hash-checks the exact "
    "median and expects the bound flag TRUE, same contract style as "
    "approx_distinct_parts.",
)
def approx_quantiles_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("exact_p50"),
            F.percentile_approx("l_quantity", 0.5, 1000).alias("approx_p50"),
            F.percentile("l_quantity", 0.498).alias("lo"),
            F.percentile("l_quantity", 0.502).alias("hi"),
        )
        .select(
            "l_returnflag",
            "exact_p50",
            ((F.col("approx_p50") >= F.col("lo")) & (F.col("approx_p50") <= F.col("hi"))).alias(
                "within_rank_bound"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "mode_quantity",
    oracle="""
    WITH freq AS (
        SELECT l_returnflag, l_quantity, count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    ranked AS (
        SELECT l_returnflag, l_quantity, n,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY n DESC, l_quantity) AS rn
        FROM freq
    )
    SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_freq
    FROM ranked WHERE rn = 1
    ORDER BY l_returnflag
    """,
    doc="Deterministic mode: smallest value among the most frequent, "
    "derived as count-then-rank (engines' built-in mode() breaks ties "
    "arbitrarily, so the definition is spelled out on both sides).",
)
def mode_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = load(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("l_returnflag").orderBy(F.desc("n"), "l_quantity")
    return (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"), F.col("n").alias("mode_freq"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Collection aggregates
# ---------------------------------------------------------------------------


@query(
    "stringagg_status_priorities",
    oracle="""
    SELECT o_orderstatus AS status,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
           count(DISTINCT o_orderpriority)                                    AS n_priorities,
           count(*)                                                           AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    doc="String aggregation (LISTAGG): deduplicated + sorted before "
    "joining so the concatenation is order-deterministic "
    "(array_sort(collect_set(...)) ≙ string_agg(DISTINCT ... ORDER BY)).",
)
def stringagg_status_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("status")
    )


@query(
    "bool_aggs_nation_wealth",
    oracle="""
    SELECT c_nationkey                     AS nationkey,
           bool_and(c_acctbal > -500)      AS all_above_neg500,
           bool_or(c_acctbal > 9000)       AS any_above_9000,
           count(*) FILTER (WHERE c_acctbal > 9000) AS n_above_9000,
           count(*)                        AS n_customers
    FROM customer
    GROUP BY c_nationkey
    ORDER BY nationkey
    """,
    doc="Boolean aggregates (EVERY / ANY a.k.a. bool_and / bool_or) plus "
    "a filtered count — all map-side-combinable single-pass aggregates.",
)
def bool_aggs_nation_wealth(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.bool_and(F.col("c_acctbal") > -500).alias("all_above_neg500"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_above_9000"),
            F.count(F.when(F.col("c_acctbal") > 9000, 1)).alias("n_above_9000"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Lateral explode / UNNEST
# ---------------------------------------------------------------------------


@query(
    "explode_part_name_words",
    oracle="""
    SELECT word, count(*) AS freq, count(DISTINCT p_partkey) AS n_parts
    FROM (
        SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
        FROM part
    )
    WHERE word <> ''
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 20
    """,
    doc="Lateral explode (UNNEST / LATERAL VIEW): tokenize part names, "
    "count word frequency, top-20 with lexicographic tie-break. The "
    "generator runs inside the scan stage — rows fan out before the "
    "single aggregation shuffle.",
)
def explode_part_name_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"), F.countDistinct("p_partkey").alias("n_parts"))
        .orderBy(F.desc("freq"), "word")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Scalar functions, second tier
# ---------------------------------------------------------------------------


@query(
    "scalar_string_extra",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '.')                       AS brand_padded,
           rpad(p_brand, 12, '.')                       AS brand_rpadded,
           replace(p_type, 'O', '0')                    AS type_leet,
           translate(p_brand, '#', 'N')                 AS brand_translated,
           split_part(p_name, ' ', 1)                   AS first_word,
           reverse(p_brand)                             AS brand_rev,
           repeat('*', p_size % 5)                      AS stars,
           levenshtein(p_brand, p_type)                 AS brand_type_dist,
           round(p_retailprice, 1)                      AS price_r1,
           CAST(ceil(p_retailprice) AS BIGINT)          AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT)         AS price_floor,
           CAST(sign(p_size - 25) AS BIGINT)            AS size_sign,
           greatest(p_size, 10)                         AS size_hi,
           least(p_size, 10)                            AS size_lo,
           power(CAST(p_size AS DOUBLE), 2)             AS size_sq
    FROM part
    ORDER BY p_partkey
    """,
    doc="Second-tier scalar coverage: padding, translate/replace, "
    "split_part, reverse, repeat, levenshtein, rounding family, sign, "
    "greatest/least, integer powers — all JVM-codegen'd expressions; "
    "libm-divergent functions (exp/log/trig) deliberately excluded from "
    "the differential surface (1-ulp cross-engine drift).",
)
def scalar_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.lpad("p_brand", 12, ".").alias("brand_padded"),
            F.rpad("p_brand", 12, ".").alias("brand_rpadded"),
            F.replace(F.col("p_type"), F.lit("O"), F.lit("0")).alias("type_leet"),
            F.translate("p_brand", "#", "N").alias("brand_translated"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
            F.reverse("p_brand").alias("brand_rev"),
            F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
            F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
            F.round("p_retailprice", 1).alias("price_r1"),
            F.ceil("p_retailprice").alias("price_ceil"),
            F.floor("p_retailprice").alias("price_floor"),
            F.signum(F.col("p_size") - 25).cast("long").alias("size_sign"),
            F.greatest("p_size", F.lit(10)).alias("size_hi"),
            F.least("p_size", F.lit(10)).alias("size_lo"),
            F.pow(F.col("p_size").cast("double"), 2).alias("size_sq"),
        )
        .orderBy("p_partkey")
    )


@query(
    "corr_regression_stats",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(CAST(sum(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(sum(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(sum(CAST(CAST(l_quantity * l_quantity AS VARCHAR) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(sum(CAST(CAST(l_extendedprice * l_extendedprice AS VARCHAR) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS syy,
               CAST(CAST(sum(CAST(CAST(l_quantity * l_extendedprice AS VARCHAR) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_price,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
    FROM s
    ORDER BY l_returnflag
    """,
    doc="Exact cross-engine correlation and least-squares regression "
    "(quantity vs price per return flag): built-in corr()/regr_slope() "
    "fold doubles in partition order (non-deterministic across "
    "engines), so the five raw sums are exact decimal folds and the "
    "closed-form combinations run the IDENTICAL IEEE op sequence on "
    "both sides. At 100 TB this is also the faster plan: one partial-agg "
    "pass computing five sums, no second-moment streaming update.",
)
def corr_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(24,6)"
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast(dec)).cast("double").alias("sx"),
        F.sum(y.cast(dec)).cast("double").alias("sy"),
        F.sum((x * x).cast(dec)).cast("double").alias("sxx"),
        F.sum((y * y).cast(dec)).cast("double").alias("syy"),
        F.sum((x * y).cast(dec)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        ((n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).alias(
            "corr_qty_price"
        ),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    ).orderBy("l_returnflag")


WINSOR_P = 0.95  # upper winsorization quantile (discrete, rank-based)


@query(
    "winsorize_event_values",
    oracle=f"""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    thr AS (
        SELECT event_type, value AS p95
        FROM ranked
        WHERE rn = CAST(ceil({WINSOR_P} * n) AS BIGINT)
    )
    SELECT r.event_type,
           t.p95,
           count(*) AS n_events,
           count(CASE WHEN r.value > t.p95 THEN 1 END) AS n_clipped,
           {sql_dsum('least(r.value, t.p95)')} AS winsorized_sum
    FROM ranked r JOIN thr t ON t.event_type = r.event_type
    GROUP BY r.event_type, t.p95
    ORDER BY r.event_type
    """,
    doc=f"Winsorization (outlier capping at the p{int(WINSOR_P * 100)} "
    "quantile) — the feature/label-cleaning step before training. The "
    "threshold is DISCRETE (the actual value at rank ceil(p*n) under a "
    "total order with tie-break), not interpolated: an interpolated "
    "quantile is engine-specific float arithmetic, a ranked value is "
    "bit-exact everywhere. One shuffle on event_type shared by the "
    "ranking window and the re-aggregation; the per-type thresholds "
    "broadcast back onto the events.",
)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    e = load(spark, sf_dir, "events")
    win = PW.partitionBy("event_type").orderBy("value", "event_id")
    cnt = PW.partitionBy("event_type")
    ranked = e.select(
        "event_type", "value",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    thr = ranked.filter(
        F.col("rn") == F.ceil(WINSOR_P * F.col("n")).cast("bigint")
    ).select("event_type", F.col("value").alias("p95"))
    return (
        ranked.join(F.broadcast(thr), "event_type")
        .groupBy("event_type", "p95")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("value") > F.col("p95"), 1)).alias("n_clipped"),
            dsum(F.least("value", "p95")).alias("winsorized_sum"),
        )
        .orderBy("event_type")
    )


MAD_K = 3  # flag |x - median| > MAD_K * MAD


@query(
    "mad_outliers_by_type",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS dev
        FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(dev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           any_value(d.med) AS med,
           any_value(a.mad) AS mad,
           count(*) AS n,
           CAST(count(CASE WHEN d.dev > {MAD_K} * a.mad THEN 1 END) AS BIGINT)
               AS n_outliers,
           CAST(count(CASE WHEN d.dev > {MAD_K} * a.mad THEN 1 END) AS DOUBLE)
               / count(*) AS outlier_ratio
    FROM dev d JOIN mad a ON a.event_type = d.event_type
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    doc="Robust outlier detection via median absolute deviation: per "
    f"event_type exact median, then the median of absolute deviations, "
    f"then the count of points beyond {MAD_K}*MAD — the robust-statistics "
    "alternative to the z-score query (immune to the outliers it hunts). "
    "Cross-engine exactness: both engines linear-interpolate "
    "quantile_cont between the same two order statistics with the same "
    "IEEE ops, verified bit-identical. Plan: two grouped exact "
    "percentiles + broadcast join-backs of the tiny per-type stats "
    "table; the event stream shuffles once on event_type and the sorted "
    "grouped percentile reuses that partitioning. At 100 TB swap "
    "percentile for approx_percentile and nothing else changes.",
)
def mad_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    out = F.col("dev") > MAD_K * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(out, 1)).alias("n_outliers"),
            (F.count(F.when(out, 1)).cast("double") / F.count(F.lit(1))).alias(
                "outlier_ratio"
            ),
        )
        .orderBy("event_type")
    )


N_DECILES = 10


@query(
    "decile_stats_order_totals",
    oracle=f"""
    WITH d AS (
        SELECT o_totalprice,
               ntile({N_DECILES}) OVER (ORDER BY o_totalprice, o_orderkey)
                   AS decile
        FROM orders
    )
    SELECT decile,
           count(*) AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi,
           {sql_dsum('o_totalprice', 2)} AS total
    FROM d GROUP BY decile ORDER BY decile
    """,
    doc=f"Equal-height binning: ntile({N_DECILES}) splits orders into "
    "deciles by total price (unique-key tie-break makes the assignment "
    "deterministic in both engines), then per-decile count/min/max/exact-"
    "decimal sum — the quantile-bucket profile feeding price-band "
    "reports and equi-depth histogram statistics. NOTE the global ntile "
    "window is a single-partition sort: correct here, and exact ntile "
    "semantics genuinely need it — the scale-safe twin is "
    "decile_stats_approx (bounded-histogram cut points broadcast into "
    "the scan, zero fact-table sorts, bounded per-bucket error).",
)
def decile_stats_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    win = PW.orderBy("o_totalprice", "o_orderkey")
    d = o.select("o_totalprice", F.ntile(N_DECILES).over(win).alias("decile"))
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            dsum("o_totalprice", 2).alias("total"),
        )
        .orderBy("decile")
    )


DSA_STEP = 1000.0  # equi-depth histogram bin width over o_totalprice


@query(
    "decile_stats_approx",
    oracle=f"""
    WITH h AS MATERIALIZED (
        SELECT CAST(floor(o_totalprice / {DSA_STEP}) AS BIGINT) AS q,
               count(*) AS c
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
    cum AS (SELECT q, CAST(sum(c) OVER (ORDER BY q) AS BIGINT) AS cum FROM h),
    cuts AS MATERIALIZED (
        SELECT k, min(q) AS cut
        FROM cum CROSS JOIN (SELECT unnest(range(1, {N_DECILES})) AS k)
        WHERE cum * {N_DECILES} >= k * (SELECT n FROM tot)
        GROUP BY k
    ),
    b AS (
        SELECT o_totalprice,
               1 + (SELECT count(*) FROM cuts
                    WHERE CAST(floor(o_totalprice / {DSA_STEP}) AS BIGINT)
                          > cuts.cut) AS bucket
        FROM orders
    )
    SELECT CAST(bucket AS INT) AS bucket,
           count(*) AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi,
           {sql_dsum('o_totalprice', 2)} AS total,
           CAST(abs(count(*) * {N_DECILES} - (SELECT n FROM tot)) * 1000000
                // (SELECT n FROM tot) AS BIGINT) AS abs_dev_ppm
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="SCALE-SAFE EQUI-DEPTH DECILES — the 100 TB twin of "
    "decile_stats_order_totals, which needs a single-partition global "
    "ntile sort. Here the scan aggregates a BOUNDED quantized "
    f"histogram (floor(price/{int(DSA_STEP)}): a few hundred bins "
    "regardless of row count), the equi-depth cut points fall out of "
    "an exact integer rule over its prefix sums (cut_k = min bin with "
    f"cum*{N_DECILES} >= k*N — deterministic on both engines, no "
    "floating interpolation), and the 9 cut points fold back into the "
    "scan as broadcast literals (bucket = 1 + Σ[bin > cut_k]) — two "
    "passes over the fact table, zero fact-table sorts, zero "
    "fact-sized windows (tests/test_plan_shape_r11.py pins the plan). "
    "abs_dev_ppm reports each bucket's deviation from perfect "
    "equi-depth — bounded by the largest single bin's mass, the "
    "classic histogram-sketch error bound (per-bucket bound asserted "
    "in tests/test_ordered_stats_r11.py).",
)
def decile_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_totalprice")
    q = F.floor(F.col("o_totalprice") / DSA_STEP).cast("bigint")
    # the histogram is BOUNDED by price-range/step (a few hundred bins
    # regardless of row count), so collecting it is metadata, not data
    hist = sorted(
        (int(r["q"]), int(r["c"]))
        for r in o.groupBy(q.alias("q")).agg(F.count(F.lit(1)).alias("c")).collect()
    )
    n = sum(c for _, c in hist)
    cuts, cum, k = [], 0, 1
    for qv, c in hist:  # exact integer cut rule, mirrored in the oracle
        cum += c
        while k < N_DECILES and cum * N_DECILES >= k * n:
            cuts.append(qv)
            k += 1
    bucket = F.lit(1)
    for cv in cuts:  # broadcast literals: the scan stays one projection
        bucket = bucket + F.when(q > cv, 1).otherwise(0)
    return (
        o.groupBy(bucket.cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            dsum("o_totalprice", 2).alias("total"),
            F.expr(
                f"(abs(count(1) * {N_DECILES} - {n}) * 1000000) div {n}"
            )
            .cast("bigint")
            .alias("abs_dev_ppm"),
        )
        .orderBy("bucket")
    )


QV_PROBS = (0.25, 0.5, 0.75, 0.95)


@query(
    "quantile_vector_by_flag",
    oracle=f"""
    SELECT l_returnflag,
           {", ".join(f"quantile_cont(l_extendedprice, {p}) AS q{int(p * 100)}" for p in QV_PROBS)}
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Exact quantile VECTOR in one aggregate: percentile(col, "
    f"array({', '.join(str(p) for p in QV_PROBS)})) computes all four "
    "order statistics from a single per-group sort (one pass, one "
    "sort), where four scalar percentile calls would sort four times. "
    "Interpolation is bit-identical across engines (verified for the "
    "scalar case by percentile_quantity; this pins the array form, "
    "unpacked to scalar columns so the driver's value-hash sees plain "
    "doubles).",
)
def quantile_vector_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    probs = ", ".join(str(p) for p in QV_PROBS)
    qv = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile(l_extendedprice, array({probs}))").alias("qv")
    )
    return qv.select(
        "l_returnflag",
        *[
            F.element_at("qv", i + 1).alias(f"q{int(p * 100)}")
            for i, p in enumerate(QV_PROBS)
        ],
    ).orderBy("l_returnflag")


@query(
    "correlation_matrix_types",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
               {sql_dsum('value')} AS total
        FROM events GROUP BY event_type, day_idx
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n,
               {sql_dsum('a.total', 6)} AS sx,
               {sql_dsum('b.total', 6)} AS sy,
               {sql_dsum('a.total * a.total', 12)} AS sxx,
               {sql_dsum('b.total * b.total', 12)} AS syy,
               {sql_dsum('a.total * b.total', 12)} AS sxy
        FROM daily a JOIN daily b
          ON b.day_idx = a.day_idx AND a.event_type < b.event_type
        GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, n,
           (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr
    FROM pairs
    ORDER BY type_a, type_b
    """,
    doc="Pairwise correlation MATRIX over daily per-type volumes (the "
    "co-movement profile behind metric dashboards and feature "
    "selection): the long daily table self-joins on the day key "
    "(types x types pairs, upper triangle), then each pair's "
    "correlation comes from EXACT decimal moment sums — products of "
    "daily totals carry 12 decimal digits, so the sums are "
    "order-independent, and the final corr is a fixed IEEE expression "
    "(sub/mul/div/sqrt are all correctly rounded) — bit-identical "
    "across engines where built-in corr() would drift with partial-"
    "aggregation order. The join runs on the aggregated daily table "
    "(~types x days rows), never on raw events.",
)
def correlation_matrix_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        (F.col("ts").cast("long") / 86400).cast("bigint").alias("day_idx"),
    ).agg(dsum("value").alias("total"))
    a = daily.select(
        F.col("event_type").alias("type_a"),
        F.col("day_idx"),
        F.col("total").alias("xa"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day_idx"),
        F.col("total").alias("xb"),
    )
    pairs = (
        a.join(b, "day_idx")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("xa", 6).alias("sx"),
            dsum("xb", 6).alias("sy"),
            dsum(F.col("xa") * F.col("xa"), 12).alias("sxx"),
            dsum(F.col("xb") * F.col("xb"), 12).alias("syy"),
            dsum(F.col("xa") * F.col("xb"), 12).alias("sxy"),
        )
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return pairs.select("type_a", "type_b", "n", corr.alias("corr")).orderBy(
        "type_a", "type_b"
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) — distributed exact ranks
# ---------------------------------------------------------------------------

MW_G1 = "click"     # group 1 of the two-sample rank test
MW_G2 = "purchase"  # group 2


@query(
    "mannwhitney_u_values",
    oracle=f"""
    WITH vc AS (
        SELECT value,
               CAST(floor(value) AS BIGINT) AS block,
               CAST(count(CASE WHEN event_type = '{MW_G1}' THEN 1 END) AS BIGINT) AS c1,
               CAST(count(CASE WHEN event_type = '{MW_G2}' THEN 1 END) AS BIGINT) AS c2
        FROM events
        WHERE event_type IN ('{MW_G1}', '{MW_G2}') AND value IS NOT NULL
        GROUP BY value
    ),
    wb AS (
        SELECT *,
               sum(c1) OVER (PARTITION BY block ORDER BY value
                             ROWS UNBOUNDED PRECEDING) - c1 AS w1,
               sum(c2) OVER (PARTITION BY block ORDER BY value
                             ROWS UNBOUNDED PRECEDING) - c2 AS w2
        FROM vc
    ),
    bt AS (
        SELECT block, sum(c1) AS t1, sum(c2) AS t2 FROM vc GROUP BY block
    ),
    bp AS (
        SELECT block,
               COALESCE(sum(t1) OVER (ORDER BY block
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p1,
               COALESCE(sum(t2) OVER (ORDER BY block
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p2
        FROM bt
    ),
    terms AS (
        SELECT wb.c1, wb.c2,
               (bp.p1 + wb.w1) + (bp.p2 + wb.w2) AS total_less
        FROM wb JOIN bp ON bp.block = wb.block
    ),
    agg AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2,
               CAST(sum(c1 * (2 * total_less + c1 + c2 + 1)) AS BIGINT) AS two_r1,
               CAST(sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS BIGINT)
                   AS tie_sum
        FROM terms
    )
    SELECT n1, n2, two_r1, tie_sum,
           CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / CAST(2 AS DOUBLE) AS u1,
           CAST(n1 * n2 AS DOUBLE)
               - CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / CAST(2 AS DOUBLE) AS u2,
           CAST(n1 * n2 AS DOUBLE) / CAST(2 AS DOUBLE) AS mu,
           sqrt((CAST(n1 * n2 AS DOUBLE) / CAST(12 AS DOUBLE))
                * (CAST(n1 + n2 + 1 AS DOUBLE)
                   - CAST(tie_sum AS DOUBLE)
                     / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))) AS sigma,
           (CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / CAST(2 AS DOUBLE)
            - CAST(n1 * n2 AS DOUBLE) / CAST(2 AS DOUBLE))
           / sqrt((CAST(n1 * n2 AS DOUBLE) / CAST(12 AS DOUBLE))
                  * (CAST(n1 + n2 + 1 AS DOUBLE)
                     - CAST(tie_sum AS DOUBLE)
                       / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))) AS z
    FROM agg
    """,
    doc=f"MANN-WHITNEY U (Wilcoxon rank-sum) two-sample test comparing "
    f"'{MW_G1}' vs '{MW_G2}' value distributions — the nonparametric "
    "A/B-test primitive (no normality assumption), with midrank tie "
    "handling and the tie-corrected normal approximation (U, mu, "
    "sigma, z). EXACT and fully distributed: global ranks are never "
    "materialized per row — per-distinct-value group counts feed a "
    "TWO-PHASE PREFIX SUM (within-block running counts under a window "
    "PARTITIONED by the domain block floor(value), plus a block-total "
    "prefix over the ~hundreds of domain blocks), so no unpartitioned "
    "window ever sees row-scale data; 2*midrank = 2*count_below + "
    "ties + 1 keeps every accumulator an INTEGER (2*R1 and the "
    "sum(t^3 - t) tie correction are exact bigints), and the handful "
    "of final U/sigma/z doubles are division/sqrt chains written "
    "operation-for-operation identically in both engines. 100 TB: two "
    "partial-aggregable shuffles (value groups, block totals) and a "
    "broadcast of the block-prefix table; at trillion-row scale widen "
    "the 2*R1 accumulator to decimal(38,0) (sum bound n*(2n+1)).",
)
def mannwhitney_u_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(MW_G1, MW_G2) & F.col("value").isNotNull()
    )
    vc = e.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == MW_G1, 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == MW_G2, 1)).alias("c2"),
    ).withColumn("block", F.floor("value").cast("bigint"))
    win = PW.partitionBy("block").orderBy("value").rowsBetween(
        PW.unboundedPreceding, 0
    )
    wb = vc.select(
        "value",
        "block",
        "c1",
        "c2",
        (F.sum("c1").over(win) - F.col("c1")).alias("w1"),
        (F.sum("c2").over(win) - F.col("c2")).alias("w2"),
    )
    bt = vc.groupBy("block").agg(F.sum("c1").alias("t1"), F.sum("c2").alias("t2"))
    # Block-prefix window is deliberately unpartitioned: it runs over the
    # DOMAIN blocks (floor(value): a few hundred rows at any SF), not rows.
    bwin = PW.orderBy("block").rowsBetween(PW.unboundedPreceding, -1)
    bp = bt.select(
        "block",
        F.coalesce(F.sum("t1").over(bwin), F.lit(0)).alias("p1"),
        F.coalesce(F.sum("t2").over(bwin), F.lit(0)).alias("p2"),
    )
    terms = wb.join(F.broadcast(bp), "block").select(
        "c1",
        "c2",
        ((F.col("p1") + F.col("w1")) + (F.col("p2") + F.col("w2"))).alias("total_less"),
    )
    t = F.col("c1") + F.col("c2")
    agg = terms.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(
            F.col("c1") * (2 * F.col("total_less") + F.col("c1") + F.col("c2") + 1)
        )
        .cast("bigint")
        .alias("two_r1"),
        F.sum(t * t * t - t).cast("bigint").alias("tie_sum"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    two_r1, tie_sum = F.col("two_r1"), F.col("tie_sum")
    u1 = (two_r1 - n1 * (n1 + 1)).cast("double") / F.lit(2).cast("double")
    mu = (n1 * n2).cast("double") / F.lit(2).cast("double")
    sigma = F.sqrt(
        ((n1 * n2).cast("double") / F.lit(12).cast("double"))
        * (
            (n1 + n2 + 1).cast("double")
            - tie_sum.cast("double") / ((n1 + n2) * (n1 + n2 - 1)).cast("double")
        )
    )
    return agg.select(
        "n1",
        "n2",
        "two_r1",
        "tie_sum",
        u1.alias("u1"),
        ((n1 * n2).cast("double") - u1).alias("u2"),
        mu.alias("mu"),
        sigma.alias("sigma"),
        ((u1 - mu) / sigma).alias("z"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence (bounded contingency, ordered fold)
# ---------------------------------------------------------------------------


@query(
    "chi_square_independence",
    oracle="""
    WITH cells AS (
        SELECT c_mktsegment AS seg, o_orderpriority AS prio,
               CAST(count(*) AS BIGINT) AS o
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    ),
    rt AS (SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY seg),
    ct AS (SELECT prio, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY prio),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    terms AS (
        SELECT cells.seg, cells.prio, tot.n,
               (CAST(cells.o * tot.n - rt.r * ct.c AS DOUBLE)
                * CAST(cells.o * tot.n - rt.r * ct.c AS DOUBLE))
               / CAST(tot.n * rt.r * ct.c AS DOUBLE) AS term
        FROM cells
        JOIN rt ON rt.seg = cells.seg
        JOIN ct ON ct.prio = cells.prio
        CROSS JOIN tot
    )
    SELECT list_reduce(list(CAST(term AS DOUBLE) ORDER BY seg, prio),
                       (a, b) -> a + b) AS chi2,
           CAST(16 AS INT) AS dof,
           max(n) AS n,
           sqrt(list_reduce(list(CAST(term AS DOUBLE) ORDER BY seg, prio),
                            (a, b) -> a + b)
                / CAST(4 * max(n) AS DOUBLE)) AS cramers_v
    FROM terms
    """,
    doc="CHI-SQUARE TEST OF INDEPENDENCE over the market-segment x "
    "order-priority contingency table (+ Cramer's V effect size) — "
    "the categorical-association primitive behind feature selection "
    "and cohort-drift checks. The observed counts are one broadcast "
    "dim join + a partial-aggregable count into a BOUNDED 5x5 cell "
    "space; marginals re-aggregate the 25 cells, never the fact "
    "table. Per-cell contribution is computed as the exact-integer "
    "identity (o*n - r*c)^2 / (n*r*c) — numerator and denominator "
    "are exact bigints, so each term is one double multiply + one "
    "divide of identical operands in both engines — and the 25 "
    "terms are summed with an ORDERED FOLD over (seg, prio): Spark "
    "F.aggregate over array_sort(collect_list(...)), DuckDB "
    "list_reduce(list(... ORDER BY ...)), sequential left-to-right "
    "in the same order, hence bit-identical (a plain SUM of doubles "
    "is partial-aggregation-order-dependent). 100 TB: all the scale "
    "is in the first count; everything after runs on 25 rows. At "
    "extreme counts widen o*n to decimal(38,0) (bigint holds to "
    "n ~ 3e9 per cell).",
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    cells = managed_cache(cells)
    rt = cells.groupBy("seg").agg(F.sum("o").cast("bigint").alias("r"))
    ct = cells.groupBy("prio").agg(F.sum("o").cast("bigint").alias("c"))
    tot = cells.agg(F.sum("o").cast("bigint").alias("n"))
    d = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    terms = (
        cells.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "prio")
        .crossJoin(F.broadcast(tot))
        .select(
            "seg",
            "prio",
            "n",
            ((d * d) / (F.col("n") * F.col("r") * F.col("c")).cast("double")).alias(
                "term"
            ),
        )
    )
    chi2 = F.aggregate(
        F.array_sort(F.collect_list(F.struct("seg", "prio", "term"))),
        F.lit(0.0),
        lambda acc, x: acc + x["term"],
    )
    return terms.agg(
        chi2.alias("chi2"),
        F.lit(16).cast("int").alias("dof"),
        F.max("n").alias("n"),
        F.sqrt(chi2 / (4 * F.max("n")).cast("double")).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Exact median WITHOUT a global sort (two-pass histogram narrowing)
# ---------------------------------------------------------------------------

TP_BIN = 256  # histogram bin width over the price domain (~400 bins)


@query(
    "exact_median_two_pass",
    oracle=f"""
    WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
    k AS (SELECT n, (n + 1) // 2 AS k1, (n + 2) // 2 AS k2 FROM t),
    s AS (
        SELECT l_extendedprice AS x,
               row_number() OVER (ORDER BY l_extendedprice) AS rn
        FROM lineitem
    ),
    v AS (
        SELECT (SELECT x FROM s WHERE rn = (SELECT k1 FROM k)) AS v1,
               (SELECT x FROM s WHERE rn = (SELECT k2 FROM k)) AS v2
    )
    SELECT k.n, k.k1, k.k2,
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem
            WHERE floor(l_extendedprice / {TP_BIN})
                      >= (SELECT floor(v1 / {TP_BIN}) FROM v)
              AND floor(l_extendedprice / {TP_BIN})
                      <= (SELECT floor(v2 / {TP_BIN}) FROM v)) AS pass2_rows,
           CAST((SELECT CAST(count(*) AS BIGINT) FROM lineitem
                 WHERE floor(l_extendedprice / {TP_BIN})
                           >= (SELECT floor(v1 / {TP_BIN}) FROM v)
                   AND floor(l_extendedprice / {TP_BIN})
                           <= (SELECT floor(v2 / {TP_BIN}) FROM v)) AS DOUBLE)
               / CAST(k.n AS DOUBLE) AS scan_fraction,
           (SELECT (v1 + v2) / CAST(2 AS DOUBLE) FROM v) AS median_price
    FROM k
    """,
    doc="EXACT MEDIAN WITHOUT A GLOBAL SORT — the two-pass histogram-"
    "narrowing algorithm (select the median at 100 TB where a total "
    "order is unaffordable): pass 1 builds a DOMAIN-bounded histogram "
    f"(floor(price/{TP_BIN}), ~400 bins — a partial-aggregable count, "
    "collected as bounded metadata) whose cumulative counts locate the "
    "bin(s) holding ranks (n+1)/2 and (n+2)/2; pass 2 ranks ONLY those "
    "bins' rows (<1% of the table, the scan_fraction column makes the "
    "saving visible) and reads the two order statistics at the "
    "residual ranks. The exact median of an even count is (lo+hi)/2 — "
    "one IEEE add + one divide, written identically in both engines; "
    "the oracle computes the same order statistics via a global sort, "
    "a DIFFERENT algorithm reaching the same bits. Complements "
    "percentile_quantity (engine ordered-set aggregate) and "
    "approx_quantiles_check (sketch): this is the exact-at-scale "
    "path. At 100 TB pass 2 recurses on the bin instead of ranking "
    "it whole if a single bin is still too big — same algorithm, "
    "log_bins(n) passes, each a narrow filter scan.",
)
def exact_median_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(F.col("l_extendedprice").alias("x"))
    li = managed_cache(li)
    n = li.count()
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    # Pass 1: domain-bounded histogram — ~400 rows of metadata, not data.
    hist = sorted(
        (int(r["bin"]), int(r["cnt"]))
        for r in li.groupBy(F.floor(F.col("x") / TP_BIN).cast("bigint").alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    below = 0
    bin_lo = bin_hi = None
    for b, c in hist:
        if below < k1 <= below + c and bin_lo is None:
            bin_lo = b
            below_lo = below
        if below < k2 <= below + c:
            bin_hi = b
        below += c
    # Pass 2: rank only the target bins' rows. The unpartitioned
    # row_number window is the POINT: it sees one histogram bin
    # (~1/400th of the table), not the table.
    from pyspark.sql.window import Window as PW

    p2 = li.filter(
        (F.floor(F.col("x") / TP_BIN) >= bin_lo) & (F.floor(F.col("x") / TP_BIN) <= bin_hi)
    )
    pass2_rows = p2.count()
    ranked = p2.select(
        "x", F.row_number().over(PW.orderBy("x")).alias("rn")
    )
    r1, r2 = k1 - below_lo, k2 - below_lo
    vals = (
        ranked.filter(F.col("rn").isin(r1, r2))
        .agg(F.min("x").alias("v1"), F.max("x").alias("v2"))
        .collect()[0]
    )
    v1, v2 = float(vals["v1"]), float(vals["v2"])
    row = [(n, k1, k2, pass2_rows)]
    return spark.createDataFrame(
        row, "n bigint, k1 bigint, k2 bigint, pass2_rows bigint"
    ).select(
        "n",
        "k1",
        "k2",
        "pass2_rows",
        (F.col("pass2_rows").cast("double") / F.col("n").cast("double")).alias(
            "scan_fraction"
        ),
        ((F.lit(v1) + F.lit(v2)) / F.lit(2).cast("double")).alias("median_price"),
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (controlled experiments)
# ---------------------------------------------------------------------------

_CUPED_DEC = "decimal(25,6)"   # exact per-user sums of 2-dp values
_CUPED_DECP = "decimal(15,6)"  # re-narrowed operand so products stay exact


@query(
    "cuped_variance_reduction",
    oracle="""
    WITH b AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
    ),
    pu AS (
        SELECT user_id, user_id % 2 AS variant,
               sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
                        THEN CAST(CAST(value AS VARCHAR) AS DECIMAL(25,6))
                        ELSE CAST(0 AS DECIMAL(25,6)) END) AS x,
               sum(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b)
                        THEN CAST(CAST(value AS VARCHAR) AS DECIMAL(25,6))
                        ELSE CAST(0 AS DECIMAL(25,6)) END) AS y
        FROM events GROUP BY user_id
    ),
    pv AS (
        SELECT variant,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy
        FROM pu GROUP BY variant
    ),
    pool AS (
        SELECT CAST(count(*) AS BIGINT) AS pn,
               CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS psx,
               CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS psy,
               CAST(CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)))
                    AS VARCHAR) AS DOUBLE) AS psxx,
               CAST(CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
                    AS VARCHAR) AS DOUBLE) AS psxy,
               CAST(CAST(sum(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
                    AS VARCHAR) AS DOUBLE) AS psyy
        FROM pu
    )
    SELECT variant, n_users,
           sx / CAST(n_users AS DOUBLE) AS mean_x,
           sy / CAST(n_users AS DOUBLE) AS mean_y,
           (CAST(pn AS DOUBLE) * psxy - psx * psy)
               / (CAST(pn AS DOUBLE) * psxx - psx * psx) AS theta,
           sy / CAST(n_users AS DOUBLE)
               - (CAST(pn AS DOUBLE) * psxy - psx * psy)
                 / (CAST(pn AS DOUBLE) * psxx - psx * psx)
                 * (sx / CAST(n_users AS DOUBLE) - psx / CAST(pn AS DOUBLE))
               AS adjusted_mean,
           ((CAST(pn AS DOUBLE) * psxy - psx * psy)
            * (CAST(pn AS DOUBLE) * psxy - psx * psy))
           / ((CAST(pn AS DOUBLE) * psxx - psx * psx)
              * (CAST(pn AS DOUBLE) * psyy - psy * psy)) AS rho2
    FROM pv CROSS JOIN pool
    ORDER BY variant
    """,
    doc="CUPED variance reduction (Deng/Xu/Kohavi/Walker WSDM'13) — the "
    "controlled-experiment primitive every experimentation platform "
    "ships: per-user PRE-period value (covariate X, events before the "
    "time midpoint) adjusts the IN-period metric Y via theta = "
    "cov(X,Y)/var(X), shrinking the A/B estimator's variance by the "
    "pooled rho^2 (reported). Variants are the deterministic "
    "user_id%2 split. Determinism: per-user X/Y are EXACT decimal "
    "sums of the 2-dp values; the five pooled moments are decimal "
    "sums of re-narrowed decimal PRODUCTS (exact — no float "
    "accumulation anywhere), cast once to double through the "
    "engine-matched text hop (exprs.py policy); theta / adjusted "
    "means / rho^2 are then fixed chains of IEEE ops on identical "
    "scalars, written operation-for-operation identically in both "
    "engines. 100 TB: ONE shuffle on user_id for the per-user "
    "covariate rollup, then two partial-aggregable moment passes "
    "over the user table; the epoch midpoint is a broadcast scalar. "
    "Widen the product decimals for heavier-tailed metrics.",
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id", "value", F.unix_micros("ts").alias("us")
    )
    mm = e.agg(F.expr("(min(us) + max(us)) div 2").alias("mid"))
    pu = (
        e.crossJoin(F.broadcast(mm))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("us") < F.col("mid"), F.col("value"))
                .otherwise(F.lit(0))
                .cast(_CUPED_DEC)
            ).alias("x"),
            F.sum(
                F.when(F.col("us") >= F.col("mid"), F.col("value"))
                .otherwise(F.lit(0))
                .cast(_CUPED_DEC)
            ).alias("y"),
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    pu = managed_cache(pu)
    xp = F.col("x").cast(_CUPED_DECP)
    yp = F.col("y").cast(_CUPED_DECP)
    pv = pu.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
    )
    pool = pu.agg(
        F.count(F.lit(1)).cast("bigint").alias("pn"),
        F.sum("x").cast("double").alias("psx"),
        F.sum("y").cast("double").alias("psy"),
        F.sum(xp * xp).cast("double").alias("psxx"),
        F.sum(xp * yp).cast("double").alias("psxy"),
        F.sum(yp * yp).cast("double").alias("psyy"),
    )
    pn_d = F.col("pn").cast("double")
    nv_d = F.col("n_users").cast("double")
    cov_t = pn_d * F.col("psxy") - F.col("psx") * F.col("psy")
    var_x = pn_d * F.col("psxx") - F.col("psx") * F.col("psx")
    var_y = pn_d * F.col("psyy") - F.col("psy") * F.col("psy")
    theta = cov_t / var_x
    return (
        pv.crossJoin(F.broadcast(pool))
        .select(
            "variant",
            "n_users",
            (F.col("sx") / nv_d).alias("mean_x"),
            (F.col("sy") / nv_d).alias("mean_y"),
            theta.alias("theta"),
            (
                F.col("sy") / nv_d
                - theta * (F.col("sx") / nv_d - F.col("psx") / pn_d)
            ).alias("adjusted_mean"),
            ((cov_t * cov_t) / (var_x * var_y)).alias("rho2"),
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit (fraud / data-quality screening)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) for d = 1..9, written out as literals: libm log is not
# bit-reproducible across engines (house policy bans it in computed
# paths), but PUBLISHED CONSTANTS are just doubles — both engines parse
# the identical decimal literal to the identical bit pattern.
BENFORD_P = {
    # Rounded to 5 significant digits: DuckDB's VARCHAR->DOUBLE parse
    # proved 1 ulp off Python/Java on a 17-digit literal (observed live
    # on 0.12493873660829993); short literals parse to the identical
    # nearest double everywhere, and 5 digits is far beyond the audit's
    # statistical resolution.
    1: 0.30103,
    2: 0.17609,
    3: 0.12494,
    4: 0.09691,
    5: 0.07918,
    6: 0.06695,
    7: 0.05799,
    8: 0.05115,
    9: 0.04576,
}


@query(
    "benford_first_digit_audit",
    oracle=f"""
    WITH d AS (
        SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                   AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
    p(digit, benford_p) AS (VALUES
        {', '.join(f'({d}, CAST({p!r} AS DOUBLE))' for d, p in BENFORD_P.items())}
    )
    SELECT p.digit, COALESCE(c.n, 0) AS n_orders,
           CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
           p.benford_p,
           abs(CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(t.total AS DOUBLE)
               - p.benford_p) AS abs_dev
    FROM p LEFT JOIN c ON c.digit = p.digit CROSS JOIN t
    ORDER BY p.digit
    """,
    doc="BENFORD'S-LAW first-digit audit over order totals — the "
    "classic fraud / fabricated-data screen (naturally occurring "
    "multi-magnitude amounts follow P(d) = log10(1+1/d); fabricated "
    "ones usually don't): first digits extracted via INTEGER string "
    "rendering (floor to bigint, then substring — never a double's "
    "string form, which differs across engines), counted in a "
    "9-key partial-aggregable rollup, and compared against the "
    "published Benford constants embedded as exact double LITERALS "
    "(libm log10 is banned from computed paths as not "
    "bit-reproducible; literals parse identically everywhere). "
    "Emits per-digit share and absolute deviation. 100 TB: one scan, "
    "one 9-key aggregate — the whole comparison runs on 9 rows. "
    "(TPC-H totals span ~3 magnitudes with a lognormal-ish shape, "
    "so deviations here are expectedly moderate; the OPERATOR is "
    "what's exercised, as with text_langid_confusion.)",
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    c = (
        o.select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    c = managed_cache(c)
    t = c.agg(F.sum("n").cast("bigint").alias("total"))
    p = spark.createDataFrame(
        [(d, pv) for d, pv in BENFORD_P.items()], "digit int, benford_p double"
    )
    share = F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("total").cast(
        "double"
    )
    return (
        p.join(c, "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
            share.alias("share"),
            "benford_p",
            F.abs(share - F.col("benford_p")).alias("abs_dev"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes)
# ---------------------------------------------------------------------------

TS_YEAR = 1995  # bounded series: one year of daily revenue (~365 points)


@query(
    "theil_sen_daily_revenue",
    oracle=f"""
    WITH d AS (
        SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS x,
               {sql_dsum('o_totalprice', 2)} AS y
        FROM orders
        WHERE o_orderdate >= DATE '{TS_YEAR}-01-01'
          AND o_orderdate < DATE '{TS_YEAR + 1}-01-01'
        GROUP BY o_orderdate
    ),
    pr AS (
        SELECT a.x AS x1, b.x AS x2,
               (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope
        FROM d a JOIN d b ON b.x > a.x
    ),
    rs AS (
        SELECT slope,
               row_number() OVER (ORDER BY slope, x1, x2) AS rn,
               count(*) OVER () AS np
        FROM pr
    ),
    med AS (
        SELECT
            ((SELECT slope FROM rs WHERE rn = (np + 1) // 2 LIMIT 1)
             + (SELECT slope FROM rs WHERE rn = (np + 2) // 2 LIMIT 1))
            / CAST(2 AS DOUBLE) AS slope_med,
            (SELECT max(np) FROM rs) AS n_pairs
        FROM rs LIMIT 1
    ),
    res AS (
        SELECT d.y - m.slope_med * CAST(d.x AS DOUBLE) AS r, d.x
        FROM d CROSS JOIN med m
    ),
    rr AS (
        SELECT r, row_number() OVER (ORDER BY r, x) AS rn, count(*) OVER () AS nd
        FROM res
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
           CAST(m.n_pairs AS BIGINT) AS n_pairs,
           m.slope_med AS theil_sen_slope,
           ((SELECT r FROM rr WHERE rn = (nd + 1) // 2 LIMIT 1)
            + (SELECT r FROM rr WHERE rn = (nd + 2) // 2 LIMIT 1))
           / CAST(2 AS DOUBLE) AS intercept
    FROM med m
    """,
    doc=f"THEIL-SEN ROBUST TREND over {TS_YEAR}'s daily revenue: the "
    "median of all pairwise slopes (y2-y1)/(x2-x1) — the classic "
    "outlier-resistant alternative to OLS (up to ~29% contamination "
    "tolerated), plus the median-residual intercept. Exactness: each "
    "daily revenue is an exact-decimal sum cast once to double, each "
    "pairwise slope is one subtraction + one division of identical "
    "doubles, and both medians are EXPLICIT order statistics under a "
    "total order (slope, x1, x2) with the even-count midpoint written "
    "(lo+hi)/2 in both engines — never an engine median() whose "
    "interpolation formula may differ by an ulp. Scale discipline: "
    "the O(n^2) pair join runs on the AGGREGATED day series (~365 "
    "rows, a DOMAIN-bounded table — ~66k pairs), never on raw "
    "orders; the raw scan is one partial-aggregable rollup. The "
    "ranking windows therefore see only the bounded pair table — "
    "same argument as the block-prefix pass in mannwhitney_u_values.",
)
def theil_sen_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{TS_YEAR}-01-01"))
        & (F.col("o_orderdate") < F.lit(f"{TS_YEAR + 1}-01-01"))
    )
    d = managed_cache(
        o.groupBy("o_orderdate")
        .agg(dsum("o_totalprice", 2).alias("y"))
        .select(
            F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint").alias("x"),
            "y",
        )
    )
    a = d.select(F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = d.select(F.col("x").alias("x2"), F.col("y").alias("y2"))
    pr = a.join(b, F.col("x2") > F.col("x1")).select(
        "x1",
        "x2",
        ((F.col("y2") - F.col("y1")) / (F.col("x2") - F.col("x1")).cast("double")).alias(
            "slope"
        ),
    )
    rs = pr.select(
        "slope",
        F.row_number().over(PW.orderBy("slope", "x1", "x2")).alias("rn"),
        F.count(F.lit(1)).over(PW.partitionBy()).alias("np"),
    )
    rs = managed_cache(rs)
    k = rs.select(
        F.expr("(np + 1) div 2").alias("k1"), F.expr("(np + 2) div 2").alias("k2")
    ).limit(1)
    med = (
        rs.join(F.broadcast(k), (F.col("rn") == F.col("k1")) | (F.col("rn") == F.col("k2")))
        .agg(
            ((F.min("slope") + F.max("slope")) / F.lit(2).cast("double")).alias(
                "slope_med"
            ),
            F.max("np").cast("bigint").alias("n_pairs"),
        )
    )
    res = d.crossJoin(F.broadcast(med)).select(
        "x",
        (F.col("y") - F.col("slope_med") * F.col("x").cast("double")).alias("r"),
        "slope_med",
        "n_pairs",
    )
    rr = res.select(
        "r",
        "slope_med",
        "n_pairs",
        F.row_number().over(PW.orderBy("r", "x")).alias("rn"),
        F.count(F.lit(1)).over(PW.partitionBy()).alias("nd"),
    )
    picked = rr.filter(
        (F.col("rn") == F.expr("(nd + 1) div 2")) | (F.col("rn") == F.expr("(nd + 2) div 2"))
    )
    n_days = d.count()
    return picked.agg(
        F.lit(n_days).cast("bigint").alias("n_days"),
        F.max("n_pairs").alias("n_pairs"),
        F.max("slope_med").alias("theil_sen_slope"),
        ((F.min("r") + F.max("r")) / F.lit(2).cast("double")).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Forecast evaluation: MASE (seasonal-naive vs naive)
# ---------------------------------------------------------------------------


@query(
    "forecast_mase_daily",
    oracle=f"""
    WITH d AS (
        SELECT o_orderdate AS day,
               sum(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(25,2))) AS y
        FROM orders
        WHERE o_orderdate >= DATE '{TS_YEAR}-01-01'
          AND o_orderdate < DATE '{TS_YEAR + 1}-01-01'
        GROUP BY o_orderdate
    ),
    l AS (
        SELECT day, y,
               lag(y, 1) OVER (ORDER BY day) AS y1,
               lag(y, 7) OVER (ORDER BY day) AS y7
        FROM d
    ),
    e AS (
        SELECT abs(y - y1) AS e1, abs(y - y7) AS e7
        FROM l WHERE y1 IS NOT NULL AND y7 IS NOT NULL
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_eval,
               CAST(CAST(sum(e1) AS VARCHAR) AS DOUBLE) AS se1,
               CAST(CAST(sum(e7) AS VARCHAR) AS DOUBLE) AS se7
        FROM e
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
           n_eval,
           se1 / CAST(n_eval AS DOUBLE) AS mae_naive,
           se7 / CAST(n_eval AS DOUBLE) AS mae_seasonal,
           (se7 / CAST(n_eval AS DOUBLE)) / (se1 / CAST(n_eval AS DOUBLE)) AS mase
    FROM agg
    """,
    doc="FORECAST EVALUATION via MASE (Hyndman & Koehler '06, mean "
    "absolute scaled error) comparing the SEASONAL-naive lag-7 "
    "forecast of daily revenue against the lag-1 naive scaler over "
    f"a common {TS_YEAR} evaluation window — the scale-free accuracy "
    "metric (MASE < 1 = beats naive) every forecasting pipeline "
    "reports, complementing q6_forecast_revenue (the forecast) and "
    "seasonality_index_dow (the weekly pattern MASE quantifies the "
    "value of). EXACT end to end: daily totals, lag differences, "
    "absolute errors, and their sums all stay in DECIMAL (2-dp "
    "money never leaves fixed point), cast once to double through "
    "the text-hop policy; the two MAEs and their ratio are three "
    "IEEE divisions written identically in both engines. The lag "
    "window runs over the DOMAIN-bounded day series (~365 rows, "
    "same argument as theil_sen_daily_revenue), never over raw "
    "orders; the raw scan is one partial-aggregable rollup.",
)
def forecast_mase_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{TS_YEAR}-01-01"))
        & (F.col("o_orderdate") < F.lit(f"{TS_YEAR + 1}-01-01"))
    )
    d = managed_cache(
        o.groupBy(F.col("o_orderdate").alias("day")).agg(
            F.sum(F.col("o_totalprice").cast("decimal(25,2)")).alias("y")
        )
    )
    w = PW.orderBy("day")
    l = d.select(
        "y", F.lag("y", 1).over(w).alias("y1"), F.lag("y", 7).over(w).alias("y7")
    )
    e = l.filter(F.col("y1").isNotNull() & F.col("y7").isNotNull()).select(
        F.abs(F.col("y") - F.col("y1")).alias("e1"),
        F.abs(F.col("y") - F.col("y7")).alias("e7"),
    )
    n_days = d.count()
    agg = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum("e1").cast("double").alias("se1"),
        F.sum("e7").cast("double").alias("se7"),
    )
    ne = F.col("n_eval").cast("double")
    return agg.select(
        F.lit(n_days).cast("bigint").alias("n_days"),
        "n_eval",
        (F.col("se1") / ne).alias("mae_naive"),
        (F.col("se7") / ne).alias("mae_seasonal"),
        ((F.col("se7") / ne) / (F.col("se1") / ne)).alias("mase"),
    )
