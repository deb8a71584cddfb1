"""Time-series operator coverage: OHLCV bar (re-)aggregation, VWAP,
moving averages, as-of join, range/interval join, sessionization.

This is the reference's home turf re-expressed as queries: its data is
1-minute OHLCV bars (SURVEY.md §2.A "Aggregation, implicit"), so the
natural query surface is bar aggregation at coarser grains plus the
time-series joins the reference lacks (SURVEY.md §2.B).

Determinism: OHLC open/close are order-sensitive; we use
``min_by/max_by`` keyed on a (ts, event_id) struct so ties are broken by
the unique event id — DuckDB mirrors this with ordered-set aggregates
``first(x ORDER BY ts, event_id)``.

Scale notes:
- bar aggregation is a single hash aggregate keyed on (bucket, type):
  map-side partial agg means each executor emits one row per bar before
  the shuffle — at 100 TB the shuffle carries bars, not ticks;
- the as-of join avoids a per-row subquery by the union + running-last
  trick: one sort-shuffle keyed by user, no N×M comparison;
- the range join pre-filters with an equi-key (user_id) so Catalyst
  plans a hash join + residual range predicate, not a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load
from .exprs import dsum, sql_dsum
from .registry import query

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _ord_key():
    return F.struct(F.col("ts"), F.col("event_id"))


@query(
    "ohlcv_hourly",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS bucket,
           event_type,
           first(value ORDER BY ts, event_id)                AS open,
           max(value)                                        AS high,
           min(value)                                        AS low,
           last(value ORDER BY ts, event_id)                 AS close,
           CAST(CAST(sum(CAST(CAST(value AS VARCHAR) AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS volume,
           count(*)                                          AS n_trades
    FROM events
    GROUP BY 1, 2
    ORDER BY bucket, event_type
    """,
    doc="OHLCV bar aggregation at 1-hour grain (E-AGG, SURVEY.md §2): "
    "open/close via min_by/max_by on (ts, event_id) — single hash "
    "aggregate, no window needed.",
)
def ohlcv_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), TS_FMT_SPARK).alias("bucket"),
            "event_type",
        )
        .agg(
            F.min_by("value", _ord_key()).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", _ord_key()).alias("close"),
            dsum("value").alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .orderBy("bucket", "event_type")
    )


@query(
    "ohlcv_daily_vwap",
    oracle="""
    SELECT CAST(ts AS DATE)                                   AS day,
           first(value ORDER BY ts, event_id)                 AS open,
           max(value)                                         AS high,
           min(value)                                         AS low,
           last(value ORDER BY ts, event_id)                  AS close,
           CAST(CAST(sum(CAST(CAST(value AS VARCHAR) AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE)  AS volume,
           CAST(sum(CAST(value * CAST(json_extract_string(props, '$.k') AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE)
             / nullif(CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE), 0) AS vwap,
           count(*)                                           AS n_trades
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
    doc="Flagship: daily OHLCV + VWAP (sum(px*qty)/sum(qty), the "
    "Weighted_Price definition implied by the reference's data — "
    "SURVEY.md §2.A) with qty drawn from the JSON props column.",
)
def ohlcv_daily_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    qty = F.get_json_object("props", "$.k").cast("double")
    return (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.min_by("value", _ord_key()).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", _ord_key()).alias("close"),
            dsum("value").alias("volume"),
            (dsum(F.col("value") * qty) / F.nullif(dsum(qty), F.lit(0.0))).alias("vwap"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .orderBy("day")
    )


@query(
    "moving_avg_events",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(CAST(value AS VARCHAR) AS DECIMAL(25,6)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)         AS ma4,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)     AS n_so_far
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="Moving average over a ROWS frame per user — the bar-smoothing "
    "window pattern on a uniquely-ordered event stream.",
)
def moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id",
            "user_id",
            (
                F.sum(F.col("value").cast("decimal(25,6)")).over(w.rowsBetween(-3, 0)).cast("double")
                / F.count(F.lit(1)).over(w.rowsBetween(-3, 0))
            ).alias("ma4"),
            F.count(F.lit(1)).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("n_so_far"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "asof_purchase_last_click",
    oracle=f"""
    WITH clicks AS (
        SELECT user_id, ts AS click_ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}')        AS purchase_ts,
           strftime(c.click_ts, '{TS_FMT_DUCK}')  AS click_ts,
           c.click_id,
           p.value                                AS purchase_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    ORDER BY p.event_id
    """,
    doc="As-of join (Spark has no native one — SURVEY.md §2.B): for each "
    "purchase, the most recent click by the same user at or before it. "
    "Implemented with the union + running last(ignorenulls) trick: one "
    "sort per user partition, no per-row subquery, scales linearly.",
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # Deduplicate clicks to one row per (user_id, ts) so the as-of match is
    # well-defined under timestamp ties (mirrors the oracle CTE).
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            F.col("click_ts").alias("ts"),
            "click_ts",
            "click_id",
            F.lit(0).alias("is_purchase"),
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(1).alias("is_purchase"),
        "event_id",
        "value",
    )
    # Order clicks before purchases at equal ts so an exactly-simultaneous
    # click is visible to the purchase (ASOF's >= semantics).
    merged = clicks.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "click_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
            F.date_format("last_click_ts", TS_FMT_SPARK).alias("click_ts"),
            F.col("last_click_id").alias("click_id"),
            F.col("value").alias("purchase_value"),
        )
        .orderBy("event_id")
    )


@query(
    "range_join_error_context",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           count(x.event_id)                 AS n_nearby,
           CAST(CAST(sum(CAST(CAST(x.value AS VARCHAR) AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS nearby_value
    FROM events e
    LEFT JOIN events x
      ON x.user_id = e.user_id
     AND x.event_id <> e.event_id
     AND x.ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts + INTERVAL 5 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.user_id
    ORDER BY e.event_id
    """,
    doc="Range/interval join (SURVEY.md §2.B): activity within ±5 minutes "
    "of each error by the same user. The join key is (user_id, "
    "time_bucket) with bucket width = window width: each probe-side "
    "event lands in exactly ONE 10-minute bucket, each error probes the "
    "(at most two) buckets its ±5-minute window overlaps, and the range "
    "predicate is a residual on a tiny candidate set. Joining on "
    "user_id alone evaluates every same-user pair — O(per-user-errors x "
    "per-user-events) residual work, ~10x slower measured at sf0.1 and "
    "unbounded at 100 TB where a user's history spans years.",
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket_us = 600 * 1_000_000  # 10 minutes, = the window width
    e = load(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    # probe buckets: the (<=2) distinct buckets overlapping [ts-5m, ts+5m]
    lo_b = F.floor((F.unix_micros("e_ts") - bucket_us // 2) / bucket_us)
    hi_b = F.floor((F.unix_micros("e_ts") + bucket_us // 2) / bucket_us)
    probes = errors.withColumn(
        "bucket", F.explode(F.array_distinct(F.array(lo_b, hi_b)))
    )
    others = e.select(
        F.col("event_id").alias("x_id"),
        F.col("user_id").alias("x_user"),
        F.col("ts").alias("x_ts"),
        F.col("value").alias("x_value"),
        F.floor(F.unix_micros("ts") / bucket_us).alias("x_bucket"),
    )
    cond = (
        (F.col("x_user") == F.col("e_user"))
        & (F.col("x_bucket") == F.col("bucket"))
        & (F.col("x_id") != F.col("e_id"))
        & (F.col("x_ts") >= F.col("e_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("x_ts") <= F.col("e_ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    # left join: errors with no nearby activity survive (their probe rows
    # all miss -> count 0, null sum). Each x has ONE bucket, so a pair
    # can match on at most one probe row — no dedup needed.
    return (
        probes.join(others, cond, "left")
        .groupBy(F.col("e_id").alias("event_id"), F.col("e_user").alias("user_id"))
        .agg(F.count("x_id").alias("n_nearby"), dsum("x_value").alias("nearby_value"))
        .orderBy("event_id")
    )


@query(
    "sessionize_events",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*)                            AS n_events,
           strftime(min(ts), '{TS_FMT_DUCK}')  AS session_start,
           strftime(max(ts), '{TS_FMT_DUCK}')  AS session_end,
           CAST(CAST(sum(CAST(CAST(value AS VARCHAR) AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    doc="Sessionization: 30-minute inactivity gap via lag + running sum "
    "(the batch form; the streaming module uses session_window). One "
    "sort-shuffle keyed by user — linear at scale.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap test (casting to seconds would truncate and
    # disagree with the oracle's INTERVAL comparison on sub-second gaps).
    gap_ok = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) <= 30 * 60 * 1_000_000
    sessions = (
        e.withColumn("new_session", F.when(gap_ok, 0).otherwise(1))
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("bigint"),
        )
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), TS_FMT_SPARK).alias("session_start"),
            F.date_format(F.max("ts"), TS_FMT_SPARK).alias("session_end"),
            dsum("value").alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "bars_gap_fill",
    oracle="""
    WITH bars AS (
        SELECT CAST(regexp_extract(filename, 'btcusd-(\\d{4}-\\d{2}-\\d{2})\\.csv$', 1) AS DATE)
                   AS file_date,
               CAST(file_date || ' ' || "Time" AS TIMESTAMP) AS date_time,
               "Close" AS close_price
        FROM read_csv('/root/reference/dataset-test/btcusd-2012-01-*.csv',
                      header=true, filename=true,
                      columns={'Time': 'VARCHAR', 'Open': 'DOUBLE', 'High': 'DOUBLE',
                               'Low': 'DOUBLE', 'Close': 'DOUBLE', 'Volume_(BTC)': 'DOUBLE',
                               'Volume_(Currency)': 'DOUBLE', 'Weighted_Price': 'DOUBLE'})
        WHERE "Open" IS NOT NULL OR "High" IS NOT NULL OR "Low" IS NOT NULL
           OR "Close" IS NOT NULL OR "Volume_(BTC)" IS NOT NULL
           OR "Volume_(Currency)" IS NOT NULL OR "Weighted_Price" IS NOT NULL
    ),
    spine AS (
        SELECT unnest(generate_series(TIMESTAMP '2012-01-01 00:00:00',
                                      TIMESTAMP '2012-01-31 23:59:00',
                                      INTERVAL 1 MINUTE)) AS minute
    )
    SELECT strftime(s.minute, '%Y-%m-%d %H:%M:%S') AS minute,
           CASE WHEN b.close_price IS NULL THEN 1 ELSE 0 END AS is_gap,
           last_value(b.close_price IGNORE NULLS) OVER (
               PARTITION BY CAST(s.minute AS DATE) ORDER BY s.minute
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS fill_close
    FROM spine s
    LEFT JOIN bars b ON b.date_time = s.minute
    ORDER BY minute
    """,
    doc="Calendar-spine gap fill over the reference corpus (Jan 2012): "
    "generate every minute, left-join the real bars (all-null rows "
    "dropped by ingest reappear as gaps), forward-fill the close within "
    "each day (day-partitioned ffill keeps the window parallel; a "
    "global ffill would serialize — at scale, seed each day with the "
    "prior day's close in a second tiny pass). The hypertable "
    "gap-fill/interpolation surface of the reference's domain.",
)
def bars_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.csv_bars import ingest_bars

    # A glob in the path restricts the scan to January 2012 before
    # listing — 31 files instead of 732.
    bars = ingest_bars(spark, "/root/reference/dataset-test/btcusd-2012-01-*.csv")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2012-01-01 00:00:00").cast("timestamp"),
                F.lit("2012-01-31 23:59:00").cast("timestamp"),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("minute")
    )
    b = bars.select("date_time", "close_price")
    w = (
        W.partitionBy(F.col("minute").cast("date"))
        .orderBy("minute")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        spine.join(b, b.date_time == spine.minute, "left")
        .select(
            F.date_format("minute", TS_FMT_SPARK).alias("minute_str"),
            F.when(F.col("close_price").isNull(), 1).otherwise(0).alias("is_gap"),
            F.last("close_price", ignorenulls=True).over(w).alias("fill_close"),
        )
        .withColumnRenamed("minute_str", "minute")
        .orderBy("minute")
    )


SECS_PER_DAY = 86400


@query(
    "twap_daily",
    oracle=f"""
    WITH t AS (
        SELECT event_type, ts, event_id, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               CAST(floor(epoch(ts)) AS BIGINT) // {SECS_PER_DAY} AS day_idx,
               lead(CAST(floor(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY event_type,
                                      CAST(floor(epoch(ts)) AS BIGINT) // {SECS_PER_DAY}
                         ORDER BY ts, event_id) AS next_sec
        FROM events
    ),
    w AS (
        SELECT event_type, day_idx, value,
               coalesce(next_sec, (day_idx + 1) * {SECS_PER_DAY}) - sec AS dur
        FROM t
    )
    SELECT event_type,
           strftime(to_timestamp(day_idx * {SECS_PER_DAY}), '%Y-%m-%d') AS day,
           {sql_dsum('w.value * w.dur')} / sum(w.dur) AS twap,
           CAST(sum(w.dur) AS BIGINT) AS covered_secs,
           count(*) AS n_events
    FROM w
    GROUP BY event_type, day_idx
    ORDER BY event_type, day
    """,
    doc="Time-weighted average price/value (TWAP) per (event_type, day): "
    "each observation is weighted by its holding duration — seconds "
    "until the next event in the partition, or until midnight for the "
    "day's last event (the standard finance aggregation the reference's "
    "OHLCV rollups feed into). One shuffle on (type, day) shared by the "
    "lead() window and the final aggregation; durations are integer "
    "seconds and the weighted sum is an exact decimal fold, so both "
    "engines agree bit-for-bit.",
)
def twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    e = load(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    day_idx = (sec / SECS_PER_DAY).cast("bigint")
    t = e.select(
        "event_type", "ts", "event_id", "value",
        sec.alias("sec"), day_idx.alias("day_idx"),
    )
    win = PW.partitionBy("event_type", "day_idx").orderBy("ts", "event_id")
    w = t.withColumn(
        "dur",
        F.coalesce(F.lead("sec").over(win), (F.col("day_idx") + 1) * SECS_PER_DAY)
        - F.col("sec"),
    )
    return (
        w.groupBy(
            "event_type",
            F.date_format(
                F.timestamp_seconds(F.col("day_idx") * SECS_PER_DAY), "yyyy-MM-dd"
            ).alias("day"),
        )
        .agg(
            (dsum(F.col("value") * F.col("dur")) / F.sum("dur")).alias("twap"),
            F.sum("dur").cast("bigint").alias("covered_secs"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


EWMA_K = 8  # lookback days; decay 0.5 per day (exact powers of two)


@query(
    "ewma_daily_decay",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
               {sql_dsum('value')} AS total
        FROM events GROUP BY event_type, day_idx
    ),
    terms AS (
        SELECT a.event_type, a.day_idx, b.day_idx AS p_day,
               b.total * power(0.5, a.day_idx - b.day_idx) AS term
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type
         AND b.day_idx BETWEEN a.day_idx - {EWMA_K - 1} AND a.day_idx
    )
    SELECT event_type,
           strftime(to_timestamp(day_idx * 86400), '%Y-%m-%d') AS day,
           count(*) AS n_terms,
           list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY p_day)),
                       (x, y) -> x + y) AS decayed_sum
    FROM terms
    GROUP BY event_type, day_idx
    ORDER BY event_type, day
    """,
    doc=f"Exponentially-decayed daily volume (EWMA-style smoothing, "
    f"decay 1/2 per day over a {EWMA_K}-day lookback): each day's "
    "smoothed value folds the trailing daily totals with power-of-two "
    "weights. Determinism is engineered end-to-end: daily totals are "
    "exact decimal sums, pow(0.5, k) is exactly representable, and the "
    "final float sum is an ORDERED fold (sort_array + aggregate vs "
    "DuckDB's list(ORDER BY) + list_reduce) — identical sequential IEEE "
    "adds, bit-identical results, where a plain SUM() would vary with "
    "partial-aggregation order. The range self-join runs on the "
    "aggregated (types x days) table, thousands of times smaller than "
    "raw events; at 100 TB the fold width stays K, independent of data "
    "volume.",
)
def ewma_daily_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        (F.col("ts").cast("long") / 86400).cast("bigint").alias("day_idx"),
    ).agg(dsum("value").alias("total"))
    a = daily.select("event_type", "day_idx")
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("day_idx").alias("p_day"),
        F.col("total").alias("b_total"),
    )
    terms = a.join(
        b,
        (F.col("b_type") == F.col("event_type"))
        & F.col("p_day").between(F.col("day_idx") - (EWMA_K - 1), F.col("day_idx")),
    ).select(
        "event_type",
        "day_idx",
        "p_day",
        (F.col("b_total") * F.pow(F.lit(0.5), F.col("day_idx") - F.col("p_day"))).alias(
            "term"
        ),
    )
    return (
        terms.groupBy("event_type", "day_idx")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.aggregate(
                F.sort_array(F.collect_list(F.struct(F.col("p_day"), F.col("term")))),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ).alias("decayed_sum"),
        )
        .select(
            "event_type",
            F.date_format(
                F.timestamp_seconds(F.col("day_idx") * 86400), "yyyy-MM-dd"
            ).alias("day"),
            "n_terms",
            "decayed_sum",
        )
        .orderBy("event_type", "day")
    )


@query(
    "asof_next_purchase",
    oracle=f"""
    WITH purchases AS (
        SELECT user_id, ts AS purchase_ts, min(event_id) AS purchase_id
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '{TS_FMT_DUCK}')            AS click_ts,
           strftime(p.purchase_ts, '{TS_FMT_DUCK}')   AS purchase_ts,
           p.purchase_id,
           CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
               - CAST(floor(epoch(c.ts)) AS BIGINT)   AS wait_s
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.purchase_ts
    ORDER BY c.event_id
    """,
    doc="FORWARD as-of join (the mirror of asof_purchase_last_click): for "
    "each click, the same user's EARLIEST purchase at or after it, plus "
    "the wait in seconds — the attribution / time-to-convert shape. "
    "Same union + single-sorted-window trick, but with "
    "first(ignorenulls) over the FOLLOWING frame; purchases sort after "
    "clicks at equal timestamps so a simultaneous purchase is visible "
    "(<= semantics). One shuffle on user_id, linear in events, no "
    "per-row subquery; the oracle is DuckDB's native forward ASOF "
    "LEFT JOIN.",
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.min("event_id").alias("purchase_id"))
        .select(
            "user_id",
            F.col("purchase_ts").alias("ts"),
            "purchase_ts",
            "purchase_id",
            F.lit(1).alias("is_purchase"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("purchase_ts"),
        F.lit(None).cast("bigint").alias("purchase_id"),
        F.lit(0).alias("is_purchase"),
        "event_id",
    )
    merged = clicks.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "purchase_id")
        .rowsBetween(0, W.unboundedFollowing)
    )
    return (
        merged.withColumn(
            "next_purchase_ts", F.first("purchase_ts", ignorenulls=True).over(w)
        )
        .withColumn(
            "next_purchase_id", F.first("purchase_id", ignorenulls=True).over(w)
        )
        .filter(F.col("is_purchase") == 0)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", TS_FMT_SPARK).alias("click_ts"),
            F.date_format("next_purchase_ts", TS_FMT_SPARK).alias("purchase_ts"),
            F.col("next_purchase_id").alias("purchase_id"),
            (
                F.col("next_purchase_ts").cast("long") - F.col("ts").cast("long")
            ).alias("wait_s"),
        )
        .orderBy("event_id")
    )


ROLLMED_W = 7  # rolling window width in days


@query(
    "rolling_median_daily",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               {sql_dsum('value')} AS total
        FROM events GROUP BY event_type, day
    )
    SELECT event_type, day, total,
           median(total) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {ROLLMED_W - 1} PRECEDING AND CURRENT ROW)
               AS rolling_median
    FROM daily
    ORDER BY event_type, day
    """,
    doc=f"Rolling ORDER STATISTIC: the trailing-{ROLLMED_W}-day median of "
    "daily totals per event type — the robust smoother (a rolling mean "
    "chases spikes; the median ignores them). Spark has no percentile "
    "window function, so the engine collects the bounded frame "
    "(<= {ROLLMED_W} values) with collect_list OVER, sorts the tiny "
    "array, and interpolates the middle in closed form — per-row cost "
    "O(W log W) with W fixed at {ROLLMED_W}, independent of data "
    "volume; the oracle uses DuckDB's native windowed median and both "
    "interpolate identically (verified bit-exact for quantile_cont "
    "elsewhere). Inputs are exact decimal daily sums, so the only "
    "float op is the even-size midpoint average - deterministic IEEE.",
)
def rolling_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
    ).agg(dsum("value").alias("total"))
    w = (
        PW.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(ROLLMED_W - 1), 0)
    )
    arr = F.sort_array(F.collect_list("total").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    return daily.select(
        "event_type",
        "day",
        "total",
        ((mid_lo + mid_hi) / 2).alias("rolling_median"),
    ).orderBy("event_type", "day")


@query(
    "max_concurrent_sessions",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                        <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
               ts
        FROM gaps
    ),
    intervals AS (
        SELECT user_id, sid, min(ts) AS s, max(ts) AS e
        FROM sess GROUP BY user_id, sid
    ),
    points AS (
        SELECT s AS ts, 1 AS delta FROM intervals
        UNION ALL
        SELECT e, -1 FROM intervals
    ),
    sweep AS (
        SELECT ts, delta,
               CAST(sum(delta) OVER (ORDER BY ts, delta DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS live
        FROM points
    )
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           max(live) AS max_concurrent
    FROM sweep
    GROUP BY day
    ORDER BY day
    """,
    doc="Interval-sweep concurrency: sessionize per user (30-min gaps), "
    "convert each session to a +1 start / -1 end point, and the "
    "running sum over the globally ordered point stream is the live "
    "session count — per-day maxima reported. Tie rule pinned: at an "
    "equal timestamp, starts (+1) process before ends (CLOSED "
    "intervals — a single-event session still counts as live at its "
    "instant), encoded as ORDER BY ts, delta DESC in both engines. "
    "The sweep sorts only 2x#sessions points (already thousands of "
    "times smaller than events); the sessionization shuffle is the "
    "same user_id key every session query shares. All integer "
    "arithmetic.",
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    e = load(spark, sf_dir, "events")
    w = PW.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        <= 30 * 60 * 1_000_000
    )
    sess = (
        e.withColumn("new_session", F.when(gap_ok, 0).otherwise(1))
        .withColumn(
            "sid",
            # (ts, event_id) tie-break, matching the gaps lag and the
            # repo's pinned-tie-break invariant: two same-user events at
            # an identical timestamp must assign sids deterministically.
            F.sum("new_session").over(
                PW.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(PW.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    points = sess.select(F.col("s").alias("ts"), F.lit(1).alias("delta")).unionByName(
        sess.select(F.col("e").alias("ts"), F.lit(-1).alias("delta"))
    )
    sweep = points.withColumn(
        "live",
        F.sum("delta")
        .over(
            PW.orderBy(F.col("ts"), F.desc("delta")).rowsBetween(
                PW.unboundedPreceding, 0
            )
        )
        .cast("bigint"),
    )
    return (
        sweep.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
        )
        .agg(F.max("live").alias("max_concurrent"))
        .orderBy("day")
    )


PATH_LEN = 5  # leading events per session that define its path
PATH_TOP = 10


@query(
    "top_session_paths",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                        <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM gaps
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
        FROM sess
    ),
    paths AS (
        SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= {PATH_LEN}
        GROUP BY user_id, sid
    )
    SELECT path, count(*) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOP}
    """,
    doc=f"Clickstream path mining: each session's leading {PATH_LEN}-event "
    "type sequence becomes a '>'-joined path string, and the corpus "
    f"reports its top {PATH_TOP} most common paths — the entry-flow "
    "report behind every product-analytics tool. Sessionization and "
    "the in-session ordering share one user_id shuffle; path strings "
    "aggregate map-side (the path-string key space is tiny versus "
    "events); TakeOrderedAndProject caps the result. Ordered "
    "string_agg on both engines pins tie-free concatenation order "
    "(rn is unique within a session).",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    e = load(spark, sf_dir, "events")
    w = PW.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        <= 30 * 60 * 1_000_000
    )
    sess = e.withColumn("new_session", F.when(gap_ok, 0).otherwise(1)).withColumn(
        "sid",
        F.sum("new_session").over(
            PW.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(PW.unboundedPreceding, 0)
        ),
    )
    ranked = sess.withColumn(
        "rn",
        F.row_number().over(
            PW.partitionBy("user_id", "sid").orderBy("ts", "event_id")
        ),
    ).filter(F.col("rn") <= PATH_LEN)
    paths = ranked.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("rn"), F.col("event_type")))),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOP)
    )


DEBOUNCE_S = 7200  # suppress same user+type re-fires within 2 hours


@query(
    "debounce_events",
    oracle=f"""
    WITH marked AS (
        SELECT event_type,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                         - CAST(floor(epoch(lag(ts) OVER (
                               PARTITION BY user_id, event_type
                               ORDER BY ts, event_id))) AS BIGINT)
                         <= {DEBOUNCE_S}
                    THEN 1 ELSE 0 END AS debounced
        FROM events
    )
    SELECT event_type,
           count(*) AS n_total,
           CAST(sum(debounced) AS BIGINT) AS n_debounced,
           CAST(count(*) - sum(debounced) AS BIGINT) AS n_kept
    FROM marked
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Debouncing (double-fire suppression): an event is dropped when "
    "the SAME user produced the SAME type within the trailing 2 h — "
    "the retry/double-click cleaning rule event pipelines apply before "
    "any counting. NOTE the chain semantics pinned by the oracle: the "
    "gap test is against the previous RAW event, not the previous KEPT "
    "one, so a burst collapses to its first event (lag-based, one "
    "window, no iteration; the kept-anchor variant needs the "
    "counter-with-reset pattern shown in events_since_last_purchase). "
    "One shuffle on (user, type); epoch integer arithmetic "
    "throughout.",
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    e = load(spark, sf_dir, "events")
    w = PW.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = e.select(
        "event_type",
        F.when(gap <= DEBOUNCE_S, 1).otherwise(0).alias("debounced"),
    )
    return (
        marked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("debounced").cast("bigint").alias("n_debounced"),
            (F.count(F.lit(1)) - F.sum("debounced")).cast("bigint").alias("n_kept"),
        )
        .orderBy("event_type")
    )


@query(
    "seasonality_index_dow",
    oracle=f"""
    WITH dowt AS (
        SELECT event_type,
               (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS dow,
               {sql_dsum('value')} AS dow_total
        FROM events GROUP BY event_type, dow
    ),
    tot AS (
        SELECT event_type, {sql_dsum('value')} AS type_total
        FROM events GROUP BY event_type
    )
    SELECT d.event_type, d.dow, d.dow_total,
           d.dow_total / t.type_total AS dow_share
    FROM dowt d JOIN tot t ON t.event_type = d.event_type
    ORDER BY d.event_type, d.dow
    """,
    doc="Day-of-week seasonality index: each weekday's share of its "
    "event type's total value (Monday=0 via epoch integer arithmetic, "
    "as in the heatmap query). Determinism is by construction: BOTH "
    "numerator and denominator are independent exact decimal folds "
    "over the raw events — never a float window-sum over the grouped "
    "rows, whose addend order differs between engines — and the share "
    "is one IEEE division of two deterministic doubles. Two "
    "aggregations sharing the scan; the 5-row totals table "
    "broadcasts.",
)
def seasonality_index_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    dow = ((F.col("ts").cast("long") / 86400).cast("bigint") + 4) % 7
    dowt = e.groupBy("event_type", dow.alias("dow")).agg(
        dsum("value").alias("dow_total")
    )
    tot = e.groupBy("event_type").agg(dsum("value").alias("type_total"))
    return (
        dowt.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            "dow_total",
            (F.col("dow_total") / F.col("type_total")).alias("dow_share"),
        )
        .orderBy("event_type", "dow")
    )


@query(
    "batch_session_window_stats",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                        < INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM gaps
    )
    SELECT user_id,
           strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
           count(*) AS n_events,
           {sql_dsum('value')} AS session_value
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc="session_window() as a BATCH aggregation key (the same engine "
    "primitive the streaming module uses, applied to a static table): "
    "groupBy(session_window(ts, '30 minutes'), user_id) merges "
    "overlapping per-event windows into gap-separated sessions inside "
    "the aggregate itself — no lag/cumsum window pass. The oracle is "
    "the classic gaps-and-islands SQL, differentially proving the "
    "engine primitive implements exactly those semantics (note the "
    "boundary rule pinned: session_window treats a gap of EXACTLY the "
    "timeout as a new session — strict <, hence the oracle's < "
    "INTERVAL 30 MINUTE). One shuffle on user_id either way; the "
    "engine form also works unchanged on a stream.",
)
def batch_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("session_start"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )
