"""Batch idempotence (D1 parity): the ingestion-log anti-join gives
file-level exactly-once across repeated batch runs — the relational
replacement for the reference's Redis processed-files set
(reference utils.py:24-36)."""

from __future__ import annotations

import shutil
from pathlib import Path

from python_btc_etl_spark.sources.csv_bars import (
    ingest_bars,
    ingest_incremental,
    write_bars,
)

CORPUS = Path("/root/reference/dataset-test")


def test_batch_ingest_idempotent(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    for n in ["btcusd-2012-03-01.csv", "btcusd-2012-03-02.csv"]:
        shutil.copy(CORPUS / n, src / n)
    table = str(tmp_path / "table")
    log = str(tmp_path / "log")

    nf1, nr1 = ingest_incremental(spark, str(src), table, log)
    assert nf1 == 2 and nr1 > 0

    # Re-run: nothing new, nothing written.
    nf2, nr2 = ingest_incremental(spark, str(src), table, log)
    assert (nf2, nr2) == (0, 0)
    assert spark.read.parquet(table).count() == nr1

    # One new file arrives: only it is ingested.
    shutil.copy(CORPUS / "btcusd-2012-03-03.csv", src / "btcusd-2012-03-03.csv")
    nf3, nr3 = ingest_incremental(spark, str(src), table, log)
    assert nf3 == 1
    assert spark.read.parquet(table).count() == nr1 + nr3


def test_multimodal_decode_stub():
    import pytest as _pytest

    from python_btc_etl_spark.functions.multimodal import decode_image, fake_decode_features

    with _pytest.raises(NotImplementedError):  # JPEG: genuinely needs libjpeg
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 8)
    with _pytest.raises(ValueError):  # PNG signature but empty body
        decode_image(b"\x89PNG\r\n\x1a\n")
    f = fake_decode_features(b"abcd" * 3)
    assert f["n_bytes"] == 12
    assert f["checksum"] == (sum(b"abcd") * 3) % 9973
    assert f["band0"] == ord("a") * 3


def test_write_bars_observed_metrics(spark, tmp_path):
    """Observation metrics ride the write plan itself (no second scan):
    rows, distinct days, null-vwap count for the written batch."""
    bars = ingest_bars(spark, str(CORPUS), [str(CORPUS / "btcusd-2012-01-21.csv")])
    metrics = write_bars(bars, str(tmp_path / "t"))
    assert metrics["n_rows"] == bars.count() > 0
    assert metrics["n_days"] == 1
    assert metrics["n_null_vwap"] == 0
