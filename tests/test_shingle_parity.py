"""The Arrow shingle-hash worker (plans/dedup._shingle_hash_batches)
must produce the same per-doc hash MULTISETS as the Column reference
forms — compared as SORTED LISTS, not frozensets, so a duplicate hash
left by a within-doc hash collision between distinct trigrams cannot
hide (a frozenset comparison collapses exactly the duplicate the
28-bit oracle's post-hash list_distinct is supposed to collapse).

Two distinct contracts, one per call site:

* 28-bit (`dedup_hashes=True`): reference is
  array_distinct(shingle_hashes28(shingles)) — dedup AFTER hashing,
  matching the oracle's list_distinct(list_transform(sh, hash28)).
* 60-bit (`dedup_hashes=False`): reference is
  token_hashes60(shingles) = hash each distinct STRING, keeping any
  colliding duplicate hash — matching sql_simhash's ±1 fold over
  list_distinct(strings).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from python_btc_etl_spark.functions import text as TX
from python_btc_etl_spark.plans.dedup import (
    _shingle_hash_batches,
    docs_with_truncated_copies,
)
from tests.conftest import SF_SMALL


def _sorted_lists(rows):
    return {r["doc_id"]: sorted(r["hs"]) for r in rows}


def test_arrow_shingle_hashes_match_column_forms(spark):
    aug = docs_with_truncated_copies(spark, SF_SMALL)
    wdf = aug.select("doc_id", TX.words(F.col("text")).alias("w")).filter(
        F.size("w") >= TX.SHINGLE_N
    )
    cases = (
        (
            TX.SHINGLE_HEX_DIGITS,
            True,
            lambda sh: F.array_distinct(TX.shingle_hashes28(sh)),
        ),
        (15, False, TX.token_hashes60),
    )
    for hexd, dedup_hashes, col_fn in cases:
        arrow = _sorted_lists(
            wdf.mapInPandas(
                _shingle_hash_batches(hexd, dedup_hashes=dedup_hashes),
                "doc_id bigint, hs array<bigint>",
            ).collect()
        )
        ref = _sorted_lists(
            aug.filter(F.size(TX.words(F.col("text"))) >= TX.SHINGLE_N)
            .select(
                "doc_id",
                col_fn(TX.shingles(TX.words(F.col("text")))).alias("hs"),
            )
            .collect()
        )
        assert arrow == ref, f"hexd={hexd}: mismatch"


def test_dedup_hashes_collapses_posthash_duplicates():
    """Synthetic collision check on the worker itself: two distinct
    'grams' that collide at hexd=1 (1 hex digit = 16 buckets guarantees
    collisions among 20 distinct trigrams) must yield ONE hash with
    dedup_hashes=True and keep multiplicity with False."""
    import pandas as pd

    toks = [f"tok{i}" for i in range(22)]  # 20 trigrams, 16 buckets
    pdf = pd.DataFrame({"doc_id": [1], "w": [toks]})
    for dedup_hashes, expect_dups in ((True, False), (False, True)):
        gen = _shingle_hash_batches(1, dedup_hashes=dedup_hashes)
        (out,) = list(gen(iter([pdf])))
        hs = out["hs"][0]
        has_dups = len(hs) != len(set(hs))
        assert has_dups == expect_dups, (dedup_hashes, hs)
