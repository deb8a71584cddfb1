"""Data sources: reference-parity OHLCV CSV corpus, parquet catalog,
and (in ``streaming``) the file-arrival stream source."""

from .csv_bars import (  # noqa: F401
    BAR_SCHEMA,
    FILENAME_PATTERN,
    ingest_bars,
    ingest_incremental,
    read_bars,
    transform_bars,
    write_bars,
)
