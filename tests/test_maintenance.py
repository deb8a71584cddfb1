"""Warehouse-maintenance operations a 100 TB lake runs routinely:
idempotent partition backfill (dynamic partition overwrite) and schema
evolution on read (mergeSchema). The reference's only maintenance story
is full-table re-ingest guarded by the Redis processed-set (reference
btc_etl.py:137-147); these are the Spark-native equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_btc_etl_spark.catalog import load


def test_dynamic_partition_overwrite_backfill(spark, sf_dir, tmp_path):
    """Backfilling ONE day must replace exactly that day's partition and
    leave every other partition byte-identical — the idempotent-backfill
    contract. Static overwrite mode would truncate the whole table."""
    e = load(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    e.write.partitionBy("day").parquet(path)

    days = [r["day"] for r in e.select("day").distinct().orderBy("day").collect()]
    target = days[1]
    before_other = (
        spark.read.parquet(path).filter(F.col("day") != target).count()
    )

    # Backfill: recompute the target day with a corrected value column.
    fixed = e.filter(F.col("day") == target).withColumn(
        "value", F.col("value") * 2
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = spark.read.parquet(path)
    # other partitions untouched
    assert after.filter(F.col("day") != target).count() == before_other
    # the target partition holds exactly the backfilled rows
    orig_day = e.filter(F.col("day") == target)
    got_day = after.filter(F.col("day") == target)
    assert got_day.count() == orig_day.count()
    got_sum = got_day.agg(F.sum("event_id")).collect()[0][0]
    assert got_sum == orig_day.agg(F.sum("event_id")).collect()[0][0]
    # and carries the corrected values (doubled)
    v_new = got_day.agg(F.sum("value")).collect()[0][0]
    v_old = orig_day.agg(F.sum("value")).collect()[0][0]
    assert abs(v_new - 2 * v_old) < 1e-6 * abs(v_old)

    # idempotence: running the same backfill again changes nothing
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert spark.read.parquet(path).count() == e.count()


def test_schema_evolution_merge_on_read(spark, sf_dir, tmp_path):
    """A column added by a later writer must surface via mergeSchema with
    NULLs for pre-evolution files — no rewrite of historical data."""
    o = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_evolving")
    v1 = o.select("o_orderkey", "o_custkey", "o_totalprice").limit(100)
    v1.write.parquet(path)
    v2 = (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("o_channel", F.lit("web"))
        .limit(50)
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "o_channel" in merged.columns
    assert merged.count() == 150
    # pre-evolution rows read as NULL in the new column
    assert merged.filter(F.col("o_channel").isNull()).count() == 100
    assert merged.filter(F.col("o_channel") == "web").count() == 50
    # without mergeSchema, whichever footer wins simply lacks/has the
    # column; the option is what makes evolution deterministic
    plain = spark.read.parquet(path)
    assert plain.count() == 150
