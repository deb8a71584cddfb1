"""Streaming ingest + streaming aggregation (S3 parity, SURVEY.md §2.A).

The reference watches a directory with watchdog/inotify and processes
each new CSV on a thread pool, tracking seen files in Redis
(reference btc_etl.py:185-228, utils.py:24-36). Structured Streaming's
file source replaces all of it declaratively:

- new-file detection  → file-source listing per micro-batch;
- the Redis seen-set  → the checkpoint's file log (exactly-once,
  crash-safe — strictly stronger than the reference's at-least-once
  Redis fallback, reference utils.py:27-29);
- the thread pool     → task-parallel micro-batches;
- partial-file races (the reference reads files as they're created,
  btc_etl.py:209-228) → the source only lists completed files.

Two aggregation shapes on top:
- tumbling-window OHLCV (1-min bars → N-min bars) with a watermark for
  late data in the append path;
- session windows over the events stream (session_window, the
  streaming form of plans/timeseries.sessionize_events).

Scale notes: a 100 TB backlog drains through ``availableNow`` in
bounded micro-batches (maxFilesPerTrigger); state for windowed aggs is
bounded by the watermark; the memory-sink variants here exist for the
deterministic differential oracle and collect only final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import ensure_session_confs, stream_partitions
from ..sources.csv_bars import BAR_SCHEMA, transform_bars

DEFAULT_WATERMARK = "1 day"


def stream_bars(
    spark: SparkSession, directory: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of OHLCV bars: same explicit schema and
    transform as the batch reader (one code path for both, the lambda-
    architecture collapse the reference lacks)."""
    reader = (
        spark.readStream.format("csv")
        .option("header", True)
        .option("pathGlobFilter", "btcusd-*.csv")
        .schema(BAR_SCHEMA)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(directory)
    from ..sources.csv_bars import FILENAME_PATTERN  # local to avoid cycle noise

    raw = raw.withColumn(
        "file_date",
        F.try_to_date(F.regexp_extract(F.input_file_name(), FILENAME_PATTERN, 1), "yyyy-MM-dd"),
    ).filter(F.col("file_date").isNotNull())
    return transform_bars(raw)


def stream_ingest_once(
    spark: SparkSession,
    directory: str,
    table_path: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all pending files into the date-partitioned parquet table
    with exactly-once file tracking (checkpoint = the reference's Redis
    set, reference utils.py:24-36, but transactional)."""
    bars = stream_bars(spark, directory, max_files_per_trigger)
    out = bars.withColumn("date", F.col("date_time").cast("date"))
    with stream_partitions(spark):
        q = (
            out.writeStream.format("parquet")
            .option("path", table_path)
            .option("checkpointLocation", checkpoint)
            .partitionBy("date")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def stream_ingest_daemon(
    spark: SparkSession,
    directory: str,
    table_path: str,
    checkpoint: str,
    poll_interval: str = "1 second",
    max_files_per_trigger: int | None = None,
):
    """The reference's primary operating mode: a forever-watcher that
    polls the landing directory and ingests each new file as it arrives
    (reference btc_etl.py:185-198 — ``start_observer`` + the 1-second
    ``time.sleep`` poll loop at 193-194).

    Structured Streaming's processingTime trigger IS that poll loop,
    minus the hand-rolled thread pool and Redis seen-set: each tick
    lists new completed files, runs the same transform as the batch
    path, appends to the date-partitioned table, and commits the file
    names to the checkpoint log transactionally (exactly-once across
    crashes — strictly stronger than the reference's at-least-once
    Redis fallback, reference utils.py:27-29).

    Returns the live ``StreamingQuery`` as the stop handle: call
    ``.stop()`` for graceful shutdown (the reference's KeyboardInterrupt
    path, btc_etl.py:195-198), ``.awaitTermination()`` to block forever
    like the reference's main loop. ``max_files_per_trigger`` bounds
    per-tick work so a 100 TB backlog drains in steady micro-batches
    instead of one giant first batch.
    """
    bars = stream_bars(spark, directory, max_files_per_trigger)
    out = bars.withColumn("date", F.col("date_time").cast("date"))
    with stream_partitions(spark):
        return (
            out.writeStream.format("parquet")
            .option("path", table_path)
            .option("checkpointLocation", checkpoint)
            .partitionBy("date")
            .outputMode("append")
            .trigger(processingTime=poll_interval)
            .start()
        )


def _run_to_memory(df: DataFrame, name: str) -> DataFrame:
    """Run a streaming aggregation to completion (availableNow) into a
    complete-mode memory sink and return the final table — every window
    is emitted, so the result equals the batch aggregation and can be
    differentially checked against a SQL oracle."""
    spark = df.sparkSession
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    with stream_partitions(spark):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def run_windowed_ohlcv(
    spark: SparkSession,
    directory: str,
    width: str = "5 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """1-min bars → ``width`` OHLCV via streaming tumbling windows.

    Complete-mode memory sink: deterministic full result (the append-
    path watermark variant is exercised in tests; its tail windows stay
    in state at stream end by design).
    """
    bars = stream_bars(spark, directory, max_files_per_trigger)
    agg = (
        bars.groupBy(F.window("date_time", width).alias("win"))
        .agg(
            F.min_by("open_price", F.col("date_time")).alias("open"),
            F.max("high_price").alias("high"),
            F.min("low_price").alias("low"),
            F.max_by("close_price", F.col("date_time")).alias("close"),
            F.sum(F.col("volume_btc").cast("decimal(30,12)")).cast("double").alias("volume_btc"),
            F.count(F.lit(1)).alias("n_bars"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "volume_btc",
            "n_bars",
        )
    )
    return _run_to_memory(agg, "stream_ohlcv").orderBy("bucket")


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (nanos→micros handled
    as in catalog.load)."""
    ensure_session_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict((f.name, f.dataType.simpleString()) for f in schema).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def run_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the events stream unioned with
    itself (every row a duplicate) → ``dropDuplicatesWithinWatermark``
    on event_id. Append-mode memory sink — each surviving row is emitted
    once, so the sink equals SELECT DISTINCT of the input.

    This is the streaming analogue of the reference's Redis seen-set
    (reference utils.py:24-36) at ROW granularity instead of file
    granularity. State is bounded by the watermark: an event_id is
    dropped from state once the watermark passes its ts + delay — at
    100 TB/day, state holds one delay-window of ids, not the corpus.
    """
    dup = _events_stream(spark, sf_dir)
    dup2 = _events_stream(spark, sf_dir)
    deduped = (
        dup.unionByName(dup2)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "user_id", "value")
    )
    spark_ = deduped.sparkSession
    try:
        spark_.catalog.dropTempView("stream_dedup")
    except Exception:
        pass
    with stream_partitions(spark_):
        q = (
            deduped.writeStream.format("memory")
            .queryName("stream_dedup")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark_.table("stream_dedup").orderBy("event_id")


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases joined to the same user's
    clicks in the preceding hour. Both sides watermarked (1 hour), so
    the join state evicts rows once they can no longer match — the
    bounded-state form of the batch range join
    (plans/timeseries.range_join_error_context).
    """
    ev = _events_stream(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("p_ts", "1 hour")
    clicks = _events_stream(spark, sf_dir).filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", "1 hour")
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 60 MINUTES AND p_ts"
        ),
    ).select("purchase_id", "click_id", "p_user", "purchase_value")
    spark_ = joined.sparkSession
    try:
        spark_.catalog.dropTempView("stream_join")
    except Exception:
        pass
    with stream_partitions(spark_):
        q = (
            joined.writeStream.format("memory")
            .queryName("stream_join")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark_.table("stream_join").orderBy("purchase_id", "click_id")


def run_stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the join-mode
    matrix (inner / left / full). Matched purchase-click pairs emit
    immediately; an unmatched PURCHASE null-extends once the watermark
    proves no matching click can still arrive (clicks matching it have
    c_ts <= p_ts, so eviction at watermark > p_ts); an unmatched CLICK
    null-extends once no future purchase can match it (purchases
    matching it have p_ts <= c_ts + 60 min, so eviction only at
    watermark > c_ts + 60 min — the click side waits a full interval
    LONGER, which is the asymmetry the oracle pins). Rows inside the
    final watermark horizon stay in state unemitted.
    """
    ev = _events_stream(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("p_ts", "1 hour")
    clicks = _events_stream(spark, sf_dir).filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", "1 hour")
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 60 MINUTES AND p_ts"
        ),
        "fullOuter",
    ).select(
        "purchase_id",
        "click_id",
        F.coalesce("p_user", "c_user").alias("user_id"),
        "purchase_value",
    )
    spark_ = joined.sparkSession
    try:
        spark_.catalog.dropTempView("stream_full_join")
    except Exception:
        pass
    with stream_partitions(spark_):
        q = (
            joined.writeStream.format("memory")
            .queryName("stream_full_join")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # NULLS LAST to mirror the oracle's ORDER BY ... NULLS LAST (Spark's
    # ascending default is nulls-first; both sides must pin the same).
    return spark_.table("stream_full_join").orderBy(
        F.asc_nulls_last("purchase_id"),
        F.asc_nulls_last("click_id"),
        "user_id",
    )


def run_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase, with its
    same-user clicks from the preceding hour when they exist. Matched
    pairs emit immediately; an unmatched purchase emits null-extended
    only once the watermark proves no matching click can still arrive —
    so purchases newer than (final watermark) whose match never came are
    *retained in state, not emitted*. The oracle reproduces exactly that
    boundary: left rows survive if matched OR older than
    least(max purchase ts, max click ts) - 1 hour.
    """
    ev = _events_stream(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("p_ts", "1 hour")
    clicks = _events_stream(spark, sf_dir).filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", "1 hour")
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 60 MINUTES AND p_ts"
        ),
        "leftOuter",
    ).select("purchase_id", "click_id", "p_user", "purchase_value")
    spark_ = joined.sparkSession
    try:
        spark_.catalog.dropTempView("stream_left_join")
    except Exception:
        pass
    with stream_partitions(spark_):
        q = (
            joined.writeStream.format("memory")
            .queryName("stream_left_join")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark_.table("stream_left_join").orderBy("purchase_id", "click_id")


def run_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched per micro-batch with
    the static customer dimension (broadcast — stateless, no watermark
    needed; the stream side never shuffles). Returns the enriched sink
    table for downstream batch aggregation.
    """
    ev = _events_stream(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    joined = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey
    ).select("event_id", "user_id", "value", "c_mktsegment")
    spark_ = joined.sparkSession
    try:
        spark_.catalog.dropTempView("stream_enrich")
    except Exception:
        pass
    with stream_partitions(spark_):
        q = (
            joined.writeStream.format("memory")
            .queryName("stream_enrich")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark_.table("stream_enrich")


def run_sessionized_events(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Session windows over the events stream (session_window — the
    stateful streaming form of batch sessionization). File-source stream
    over the events parquet; complete-mode memory sink for determinism.

    Spark session semantics: an event at exactly ``gap`` after the
    previous one starts a NEW session (merge requires ts < prev + gap);
    session_end = last event + gap.
    """
    ensure_session_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict((f.name, f.dataType.simpleString()) for f in schema).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    agg = (
        raw.groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("win.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
    return _run_to_memory(agg, "stream_sessions").orderBy("user_id", "session_start")


def run_stream_sliding_counts(
    spark: SparkSession, sf_dir: str, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """SLIDING-window streaming aggregation (width > slide ⇒ each event
    lands in width/slide overlapping windows) with a watermark bounding
    state: per (window, event_type) counts and exact-decimal value sums,
    drained availableNow into a complete-mode memory sink so the final
    table equals the batch overlap-expansion the oracle computes.

    Completes the streaming-window matrix: tumbling (stream_ohlcv_5min),
    session (stream_session_stats), sliding (this). State is
    O(active windows × types), evicted by the watermark at 100 TB rates.
    """
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", width, slide).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _run_to_memory(agg, "stream_sliding_counts").orderBy("window_start", "event_type")


def run_stream_topk_users(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Complete-output-mode streaming aggregation: per-user lifetime
    totals re-emitted in full every trigger (no watermark — complete
    mode retains all groups), memory sink holds the latest snapshot.
    The batch top-k over the final snapshot equals the batch aggregate.

    Scale note: complete mode is only viable when the GROUP domain fits
    in state (users, not events) — the snapshot is O(groups) per
    trigger, which is why the windowed/append variants exist for
    unbounded key domains.
    """
    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(24,6)")).cast("double").alias("total_value"),
    )
    spark_ = agg.sparkSession
    try:
        spark_.catalog.dropTempView("stream_topk_users")
    except Exception:
        pass
    with stream_partitions(spark_):
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_topk_users")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark_.table("stream_topk_users")
        .orderBy(F.desc("total_value"), "user_id")
        .limit(k)
    )


def run_stream_dedup_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query (Spark 4 allows
    multiple stateful ops in append mode): exactly-once dedup
    (``dropDuplicatesWithinWatermark``) feeding a tumbling one-day
    windowed aggregation. The duplicated input (stream unioned with
    itself) proves the dedup stage: window counts equal the DISTINCT
    batch counts, not 2x.

    Append-mode semantics pinned by the oracle: a window only emits once
    the watermark (max event time - 1 h) passes its END, so the final
    partial day never appears — the oracle filters to exactly the
    closed windows. Both operators' state is watermark-bounded.
    """
    dup = _events_stream(spark, sf_dir)
    dup2 = _events_stream(spark, sf_dir)
    out = (
        dup.unionByName(dup2)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
        )
    )
    spark_ = out.sparkSession
    try:
        spark_.catalog.dropTempView("stream_dedup_window")
    except Exception:
        pass
    with stream_partitions(spark_):
        q = (
            out.writeStream.format("memory")
            .queryName("stream_dedup_window")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark_.table("stream_dedup_window").orderBy("day", "event_type")


N_UPDATE_SLICES = 8


def run_stream_update_mode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode across REAL multiple micro-batches.

    Complete mode re-emits every key per batch and append mode emits a
    key once; update mode emits exactly the keys whose aggregate CHANGED
    in that batch — the changelog face none of the other stream queries
    exercise. To make the emission pattern oracle-checkable, events are
    first laid out as N_UPDATE_SLICES parquet files keyed on
    ``event_id % 8`` (a DETERMINISTIC slicing both engines can compute —
    repartition(8) would hash rows engine-internally), and the stream
    drains them one file per micro-batch. The update-mode memory sink
    then accumulates one row per (key, emission); per event_type the
    final running count equals the batch count, and the number of
    emissions equals the number of slices containing that type —
    batch-ORDER-independent, so the differential is deterministic even
    though intermediate counts are not. State is the running per-key
    aggregate, O(|keys|), the same state complete mode would carry —
    update mode's win at 100 TB is the SINK volume: changed rows per
    batch instead of the full result table."""
    import os
    from pathlib import Path

    ensure_session_confs(spark)
    root = Path(__file__).resolve().parents[2]
    sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = str(root / "spark-warehouse" / f"events_slices_{sfname}")
    if not os.path.exists(os.path.join(path, "_SLICED")):
        src = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict((f.name, f.dataType.simpleString()) for f in src.schema).get("ts") == "bigint":
            src = src.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        (
            src.withColumn("slice", F.col("event_id") % N_UPDATE_SLICES)
            .repartition("slice")
            .write.mode("overwrite")
            .partitionBy("slice")
            .parquet(path)
        )
        with open(os.path.join(path, "_SLICED"), "w") as fh:
            fh.write(str(N_UPDATE_SLICES))
    schema = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    counts = raw.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
    )
    name = "stream_update_counts"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    with stream_partitions(spark):
        q = (
            counts.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    sink = spark.table(name)
    return (
        sink.groupBy("event_type")
        .agg(
            F.max("n").alias("final_count"),
            F.max_by("total_value", F.col("n")).alias("final_total_value"),
            F.count(F.lit(1)).alias("n_emissions"),
        )
        .orderBy("event_type")
    )
