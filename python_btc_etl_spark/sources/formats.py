"""Generic multi-format datasource layer (SURVEY.md §2.B row 1).

The reference reads exactly one format — CSV via ``pd.read_csv``
(reference btc_etl.py:152) — and writes exactly one sink — SQL INSERT via
``to_sql`` (reference btc_etl.py:179-180). The new engine exposes the
full built-in datasource matrix behind two thin helpers that enforce the
practices that matter at 100 TB:

- **explicit schema always** for text formats (JSON/CSV): schema
  inference re-reads the corpus — an extra full scan at 100 TB;
- **columnar formats by default** (parquet/orc): predicate pushdown +
  column pruning reach the file footer, so a 2-column projection reads
  2 columns;
- **partitioned writes** (``partitionBy``) so downstream reads get
  static + dynamic partition pruning;
- **JDBC** mirrors the reference's Postgres sink; reads parallelize via
  ``partitionColumn/lowerBound/upperBound/numPartitions``, writes batch
  via ``batchsize`` (the Spark analogue of the reference's
  ``method='multi'`` multi-row INSERT). Gated: no database exists in the
  test container, so ``read_jdbc``/``write_jdbc`` build the reader/writer
  but only execute when a URL is supplied by the caller.

Boundary: Avro is NOT wired — it has been an external module since
Spark 2.4 (org.apache.spark:spark-avro_*) and the jar is absent in this
container (no network to fetch packages; probed, fails with "Failed to
find data source: avro"). On a real cluster add the spark-avro package
and ``read_any``/``write_any`` accept ``fmt="avro"`` unchanged — the
helpers don't allowlist formats.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TEXT_FORMATS = {"json", "csv", "xml"}  # xml: built-in since Spark 4 (rowTag option)
COLUMNAR_FORMATS = {"parquet", "orc"}

# Spark's default text-format timestamp patterns carry milliseconds only;
# round-tripping microsecond event times through JSON/CSV would silently
# truncate. Full-precision defaults, overridable per call. TIMESTAMP and
# TIMESTAMP_NTZ columns are formatted by *separate* options (the NTZ
# pattern must not carry a zone offset).
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _text_defaults(fmt: str, options: dict) -> dict:
    if fmt in TEXT_FORMATS:
        options.setdefault("timestampFormat", _TS_FMT)
        options.setdefault("timestampNTZFormat", _TS_NTZ_FMT)
    return options


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt``; text formats require an explicit schema."""
    if fmt in TEXT_FORMATS and schema is None:
        raise ValueError(
            f"{fmt} reads require an explicit schema: inference costs a "
            "full extra pass over the data at scale"
        )
    reader = spark.read.format(fmt).options(**_text_defaults(fmt, dict(options)))
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Iterable[str] = (),
    **options: str,
) -> None:
    writer = df.write.format(fmt).mode(mode).options(**_text_defaults(fmt, dict(options)))
    partition_by = list(partition_by)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) table.

    Bucketing is the write-time co-location strategy for repeated
    fact-fact joins at 100 TB: both sides pre-hashed into ``n_buckets``
    on the join key means the sort-merge join needs NO Exchange at read
    time — the single biggest shuffle eliminated in a star-schema
    pipeline that joins lineitem⋈orders every run. ``sortBy`` removes
    the per-task sort too when each bucket lands in one file.

    Requires ``saveAsTable`` (bucket metadata lives in the catalog);
    ``path`` keeps the data files at an explicit location.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.option("path", path).saveAsTable(table)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Parallel JDBC read. With a partition column, Spark issues
    ``num_partitions`` range-predicate queries concurrently instead of
    one giant scan through a single connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.options(**options).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """Batched JDBC append — the reference's ``to_sql(method='multi')``
    (reference btc_etl.py:180) with one connection per task."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**options)
        .mode(mode)
        .save()
    )


def compact_table(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    partition_col: str | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet table into ~``target_mb``
    files (bin-packing by current on-disk size), preserving the
    partition layout when ``partition_col`` is given.

    The maintenance half of the ingest story: streaming/incremental
    appends produce one file per micro-batch per partition, and at
    100 TB the resulting millions of small files dominate planning and
    open() cost. Compaction trades one controlled rewrite for fast
    scans — the same job a lakehouse's OPTIMIZE runs. Returns
    {files_before, files_after, bytes}.
    """
    import glob as _glob
    import os as _os

    data_files = [
        f
        for f in _glob.glob(f"{path}/**/*.parquet", recursive=True)
        if _os.path.isfile(f)
    ]
    total_bytes = sum(_os.path.getsize(f) for f in data_files)
    n_target = max(1, round(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = f"{path}__compacting"
    writer = (
        df.repartition(n_target, partition_col)
        if partition_col
        else df.repartition(n_target)
    )
    w = writer.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(tmp)
    # atomic-ish swap (same filesystem): readers see old or new, not both
    import shutil as _shutil

    _shutil.rmtree(path)
    _os.rename(tmp, path)
    after = [
        f
        for f in _glob.glob(f"{path}/**/*.parquet", recursive=True)
        if _os.path.isfile(f)
    ]
    return {
        "files_before": len(data_files),
        "files_after": len(after),
        "bytes": total_bytes,
    }
