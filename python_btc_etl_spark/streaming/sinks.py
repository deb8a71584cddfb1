"""foreachBatch sink with idempotent, replay-safe writes.

The reference's sink is a blind multi-row INSERT (reference
btc_etl.py:179-180): a crash between insert and the Redis
``mark_file_as_processed`` (btc_etl.py:144) re-inserts the whole file —
at-least-once with duplicates. Structured Streaming's contract is the
dual: the checkpoint replays a failed micro-batch with the SAME
``batch_id`` and the SAME rows, so a sink that writes each batch to a
batch-keyed partition with overwrite semantics makes the replay a no-op
— end-to-end exactly-once without a transactional table format.

Scale notes (100 TB/day):
- one directory per micro-batch keeps the commit unit bounded by
  trigger size, not table size; downstream readers see whole batches
  (partial writes live in un-committed temp files Spark cleans up);
- dynamic partition overwrite touches ONLY the replayed batch's
  directory — re-running batch 17 never rewrites batch 16;
- for real lakehouses swap the parquet write for Delta/Iceberg
  ``MERGE`` — the foreachBatch plumbing is identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def batch_partitioned_writer(table_dir: str) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function writing each micro-batch to
    ``table_dir/batch_id=<id>/`` with overwrite — idempotent under
    checkpoint replay (same batch_id ⇒ same rows ⇒ same directory
    overwritten, never appended twice)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        # dynamic: overwrite ONLY the partitions present in this batch.
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("batch_id", _lit_long(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(table_dir)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write


def _lit_long(v: int):
    from pyspark.sql import functions as F

    return F.lit(v).cast("bigint")
