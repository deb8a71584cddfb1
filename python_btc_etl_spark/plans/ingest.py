"""Reference-parity ingest queries over the actual reference CSV corpus
(/root/reference/dataset-test, 732 daily files — read-only input).

These differential-test the WHOLE reference pipeline (EP2, reference
btc_etl.py:137-182): the DuckDB oracle re-reads the same CSVs with its own
reader, so filename validation, the all-null-row filter, timestamp
assembly and the rename/projection are all cross-checked value-by-value.

``sf_dir`` is ignored: the corpus is fixed (like the reference's own
benchmark, reference tests/benchmark.py:40-45).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.csv_bars import ingest_bars
from .exprs import dsum
from .registry import query

CORPUS = "/root/reference/dataset-test"

# DuckDB-side equivalent of read_bars+transform_bars: explicit columns,
# filename→date, all-null filter.
_DUCK_RAW = f"""
    SELECT CAST(regexp_extract(filename, 'btcusd-(\\d{{4}}-\\d{{2}}-\\d{{2}})\\.csv$', 1) AS DATE)
               AS file_date,
           CAST(file_date || ' ' || "Time" AS TIMESTAMP) AS date_time,
           "Open"              AS open_price,
           "High"              AS high_price,
           "Low"               AS low_price,
           "Close"             AS close_price,
           "Volume_(BTC)"      AS volume_btc,
           "Volume_(Currency)" AS volume_currency,
           "Weighted_Price"    AS weighted_price
    FROM read_csv('{CORPUS}/*.csv', header=true, filename=true,
                  columns={{'Time': 'VARCHAR', 'Open': 'DOUBLE', 'High': 'DOUBLE',
                           'Low': 'DOUBLE', 'Close': 'DOUBLE', 'Volume_(BTC)': 'DOUBLE',
                           'Volume_(Currency)': 'DOUBLE', 'Weighted_Price': 'DOUBLE'}})
    WHERE NOT ("Open" IS NULL AND "High" IS NULL AND "Low" IS NULL AND "Close" IS NULL
               AND "Volume_(BTC)" IS NULL AND "Volume_(Currency)" IS NULL
               AND "Weighted_Price" IS NULL)
"""


@query(
    "btc_daily_summary",
    oracle=f"""
    WITH bars AS ({_DUCK_RAW})
    SELECT CAST(date_time AS DATE)           AS day,
           count(*)                          AS n_bars,
           CAST(CAST(sum(CAST(CAST(volume_btc AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)      AS total_btc,
           CAST(CAST(sum(CAST(CAST(volume_currency AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)  AS total_currency,
           min(low_price)                                               AS day_low,
           max(high_price)                                              AS day_high
    FROM bars
    GROUP BY 1
    ORDER BY day
    """,
    doc="Reference EP2 pipeline end-to-end (scan→validate→null-filter→"
    "timestamp assembly→project) + daily rollup. Differential-checks the "
    "ingest semantics of reference btc_etl.py:137-182 against an "
    "independent reader.",
)
def btc_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = ingest_bars(spark, CORPUS)
    return (
        bars.groupBy(F.col("date_time").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_bars"),
            dsum("volume_btc", 12).alias("total_btc"),
            dsum("volume_currency", 12).alias("total_currency"),
            F.min("low_price").alias("day_low"),
            F.max("high_price").alias("day_high"),
        )
        .orderBy("day")
    )


@query(
    "btc_hourly_ohlcv",
    oracle=f"""
    WITH bars AS ({_DUCK_RAW})
    SELECT strftime(date_trunc('hour', date_time), '%Y-%m-%d %H:%M:%S') AS bucket,
           first(open_price ORDER BY date_time)                        AS open,
           max(high_price)                                              AS high,
           min(low_price)                                               AS low,
           last(close_price ORDER BY date_time)                         AS close,
           CAST(CAST(sum(CAST(CAST(volume_btc AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)       AS volume_btc,
           CAST(CAST(sum(CAST(CAST(volume_currency AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
             / nullif(CAST(CAST(sum(CAST(CAST(volume_btc AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE), 0) AS vwap,
           count(*)                                         AS n_bars
    FROM bars
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="1-min → 1-hour OHLCV re-aggregation with VWAP = "
    "sum(volume_currency)/sum(volume_btc) — the aggregation implied by "
    "the reference's data model (SURVEY.md §2.A, E-AGG). date_time is "
    "unique per minute so open/close ties cannot occur.",
)
def btc_hourly_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = ingest_bars(spark, CORPUS)
    return (
        bars.groupBy(F.date_format(F.date_trunc("hour", "date_time"), "yyyy-MM-dd HH:mm:ss").alias("bucket"))
        .agg(
            F.min_by("open_price", F.col("date_time")).alias("open"),
            F.max("high_price").alias("high"),
            F.min("low_price").alias("low"),
            F.max_by("close_price", F.col("date_time")).alias("close"),
            dsum("volume_btc", 12).alias("volume_btc"),
            (dsum("volume_currency", 12) / F.nullif(dsum("volume_btc", 12), F.lit(0.0))).alias("vwap"),
            F.count(F.lit(1)).alias("n_bars"),
        )
        .orderBy("bucket")
    )


@query(
    "btc_max_drawdown",
    oracle=f"""
    WITH bars AS ({_DUCK_RAW}),
    daily AS (
        SELECT CAST(date_time AS DATE) AS day,
               last(close_price ORDER BY date_time) AS close
        FROM bars GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, close,
           max(close) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max,
           (max(close) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - close)
             / max(close) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS drawdown
    FROM daily
    ORDER BY day
    """,
    doc="Maximum-drawdown series over the reference corpus: daily closing "
    "price (last bar per day), the running all-time high, and the "
    "fractional drawdown from it — the canonical financial risk window "
    "(cumulative-max frame). Deterministic without any decimal fold: "
    "close/run_max are raw parsed doubles and drawdown is one IEEE "
    "subtract + divide of identical inputs. The window is a single "
    "global sort over ~2 daily rows per file — tiny after the daily "
    "pre-aggregation, which is where the 100 TB bar stream collapses "
    "to a per-day series.",
)
def btc_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    bars = ingest_bars(spark, CORPUS)
    daily = (
        bars.withColumn(
            "rn",
            F.row_number().over(
                PW.partitionBy(F.col("date_time").cast("date")).orderBy(
                    F.desc("date_time")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("date_time").cast("date").alias("day"),
            F.col("close_price").alias("close"),
        )
    )
    w = PW.orderBy("day").rowsBetween(PW.unboundedPreceding, 0)
    run_max = F.max("close").over(w)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "close",
        run_max.alias("run_max"),
        ((run_max - F.col("close")) / run_max).alias("drawdown"),
    ).orderBy("day")


@query(
    "binaryfile_ingest_manifest",
    oracle=f"""
    SELECT parse_filename(filename) AS file_name,
           size AS n_bytes,
           md5(decode(content)) AS content_md5
    FROM read_blob('{CORPUS}/btcusd-*.csv')
    ORDER BY file_name
    """,
    doc="Opaque-binary file ingestion (the binaryFile datasource): every "
    "corpus file lands as one (path, length, content bytes) row, "
    "hashed for a content manifest — the front door for image/audio/"
    "video corpora, where files are NOT parsed at ingest but "
    "registered, content-addressed, and handed to downstream decode "
    "operators (plans/multimodal.py) as binary columns. Parallelism "
    "is per-file (732 independent tasks); md5 over identical bytes is "
    "engine-portable, so the oracle (DuckDB read_blob) re-reads the "
    "same files independently — a true cross-reader ingest "
    "verification, same pattern as the CSV ingest oracle "
    "(reference analogue: the filename-pattern scan, reference "
    "btc_etl.py:104-134, minus any parsing).",
)
def binaryfile_ingest_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "btcusd-*.csv")
        .load(CORPUS)
    )
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    ).orderBy("file_name")


@query(
    "ingest_incremental_e2e",
    oracle=f"""
    WITH bars AS ({_DUCK_RAW})
    SELECT (SELECT count(*) FROM glob('{CORPUS}/*.csv')
            WHERE regexp_matches(file, 'btcusd-\\d{{4}}-\\d{{2}}-\\d{{2}}\\.csv$'))
               AS n_files,
           0 AS rerun_new_files,
           0 AS rerun_new_rows,
           count(*) AS n_rows,
           count(DISTINCT CAST(date_time AS DATE)) AS n_days,
           strftime(min(date_time), '%Y-%m-%d %H:%M:%S') AS first_minute,
           strftime(max(date_time), '%Y-%m-%d %H:%M:%S') AS last_minute,
           CAST(CAST(sum(CAST(CAST(volume_btc AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
               AS total_btc,
           CAST(CAST(sum(CAST(CAST(volume_currency AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
               AS total_currency,
           min(low_price) AS low_min,
           max(high_price) AS high_max
    FROM bars
    """,
    doc="D1 idempotent ingest END-TO-END, driver-checkable: runs "
    "ingest_incremental (sources/csv_bars.py:166-219 — ingestion-log "
    "anti-join replacing the reference's Redis processed_files set, "
    "reference utils.py:24-36) TWICE into a fresh temp table, then "
    "summarizes the PARQUET TABLE THAT WAS WRITTEN (not the input "
    "plan), so scan, validation, null-filter, timestamp assembly, "
    "partitioned write, parquet round-trip, and ingestion-log "
    "bookkeeping are all inside the differential. rerun_new_files/"
    "rerun_new_rows pin the second run at exactly (0, 0) — the "
    "idempotence property itself is part of the compared result. The "
    "oracle recomputes every statistic from the raw CSVs with DuckDB's "
    "own reader. Aggregates are computed eagerly so the temp table can "
    "be deleted before returning; the returned one-row DataFrame is "
    "plain literals.",
)
def ingest_incremental_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sources.csv_bars import ingest_incremental

    base = tempfile.mkdtemp(prefix="ingest_e2e_")
    table_path, log_path = f"{base}/bars", f"{base}/ingest_log"
    try:
        n1_files, n1_rows = ingest_incremental(spark, CORPUS, table_path, log_path)
        n2_files, n2_rows = ingest_incremental(spark, CORPUS, table_path, log_path)
        t = spark.read.parquet(table_path)
        row = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.col("date_time").cast("date")).alias("n_days"),
            F.date_format(F.min("date_time"), "yyyy-MM-dd HH:mm:ss").alias("first_minute"),
            F.date_format(F.max("date_time"), "yyyy-MM-dd HH:mm:ss").alias("last_minute"),
            dsum("volume_btc", 12).alias("total_btc"),
            dsum("volume_currency", 12).alias("total_currency"),
            F.min("low_price").alias("low_min"),
            F.max("high_price").alias("high_max"),
        ).collect()[0]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    out = [
        (
            n1_files,
            n2_files,
            n2_rows,
            row["n_rows"],
            row["n_days"],
            row["first_minute"],
            row["last_minute"],
            float(row["total_btc"]),
            float(row["total_currency"]),
            float(row["low_min"]),
            float(row["high_max"]),
        )
    ]
    return spark.createDataFrame(
        out,
        "n_files bigint, rerun_new_files bigint, rerun_new_rows bigint, "
        "n_rows bigint, n_days bigint, first_minute string, last_minute string, "
        "total_btc double, total_currency double, low_min double, high_max double",
    )
