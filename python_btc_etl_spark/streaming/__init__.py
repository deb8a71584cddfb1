"""Structured Streaming surface: the reference's file-watcher ingest
path (reference btc_etl.py:185-228) re-expressed as Spark file-source
streams, plus windowed/sessionized streaming aggregation."""

from .file_stream import (  # noqa: F401
    run_sessionized_events,
    run_windowed_ohlcv,
    stream_bars,
    stream_ingest_once,
)
