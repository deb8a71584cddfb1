"""The Arrow shingle-hash worker (plans/dedup._shingle_hash_batches)
must produce the same per-doc hash SETS as the Column reference forms
(TX.shingles -> TX.shingle_hashes28 / token_hashes60) — the same
equality contract test_winnowing.py pins for the winnowing twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_btc_etl_spark.functions import text as TX
from python_btc_etl_spark.plans.dedup import (
    _shingle_hash_batches,
    docs_with_truncated_copies,
)
from tests.conftest import SF_SMALL


def _sets(rows):
    return {r["doc_id"]: frozenset(r["hs"]) for r in rows}


def test_arrow_shingle_hashes_match_column_forms(spark):
    aug = docs_with_truncated_copies(spark, SF_SMALL)
    wdf = aug.select("doc_id", TX.words(F.col("text")).alias("w")).filter(
        F.size("w") >= TX.SHINGLE_N
    )
    for hexd, col_fn in (
        (TX.SHINGLE_HEX_DIGITS, TX.shingle_hashes28),
        (15, TX.token_hashes60),
    ):
        arrow = _sets(
            wdf.mapInPandas(
                _shingle_hash_batches(hexd), "doc_id bigint, hs array<bigint>"
            ).collect()
        )
        ref = _sets(
            aug.filter(F.size(TX.words(F.col("text"))) >= TX.SHINGLE_N)
            .select(
                "doc_id",
                col_fn(TX.shingles(TX.words(F.col("text")))).alias("hs"),
            )
            .collect()
        )
        assert arrow == ref, f"hexd={hexd}: mismatch"
