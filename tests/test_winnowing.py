"""Winnowing fingerprint guarantee (Schleimer/Wilkerson/Aiken SIGMOD'03 §2).

The paper's correctness property: if two documents share a token run of
length >= WINNOW_K + WINNOW_W - 1, they MUST share at least one
fingerprint (every length-(K+W-1) run contains a full window of W
consecutive k-gram hashes, and the window's minimum is selected on both
sides).  These tests pin the property on constructed corpora, the SQL
twin's parity on the same rows, and the planted-copy recall of the
registered query at sf0.001.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from python_btc_etl_spark.functions import text as TX
from python_btc_etl_spark.plans import dedup
from .conftest import SF_SMALL

KW = TX.WINNOW_K + TX.WINNOW_W - 1  # minimal guaranteed-detected run


def _fps(spark, texts: list[str]) -> list[set[int]]:
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    h = TX.shingle_hashes28(TX.grams_all(TX.words(F.col("text")), TX.WINNOW_K))
    out = (
        df.select("doc_id", h.alias("h"))
        .filter(F.size("h") >= TX.WINNOW_W)
        .select("doc_id", TX.winnow_from_hashes(F.col("h")).alias("fps"))
        .orderBy("doc_id")
        .collect()
    )
    return [set(r.fps) for r in out]


def test_shared_run_guarantees_shared_fingerprint(spark):
    # Distinct left/right contexts around one shared KW-token run.
    shared = " ".join(f"s{i}" for i in range(KW))
    a = "alpha beta gamma " + shared + " delta epsilon"
    b = "one two three four five " + shared + " six seven"
    fa, fb = _fps(spark, [a, b])
    assert fa & fb, "shared >=K+W-1 token run must share a fingerprint"


def test_disjoint_vocab_shares_nothing(spark):
    a = " ".join(f"a{i}" for i in range(30))
    b = " ".join(f"b{i}" for i in range(30))
    fa, fb = _fps(spark, [a, b])
    assert not (fa & fb)


def test_fingerprint_count_bounded(spark):
    # n grams -> n-W+1 windows -> at most that many distinct fingerprints,
    # at least ceil(n-W+1 / W) (each fingerprint covers <= W windows).
    n_tokens = 40
    t = " ".join(f"t{i}" for i in range(n_tokens))
    (fa,) = _fps(spark, [t])
    n_grams = n_tokens - TX.WINNOW_K + 1
    n_windows = n_grams - TX.WINNOW_W + 1
    assert len(fa) <= n_windows
    assert len(fa) >= (n_windows + TX.WINNOW_W - 1) // TX.WINNOW_W


def test_sql_twin_matches_spark(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs the quick brown fox jumps over",
        " ".join(f"w{i % 7}" for i in range(25)),  # heavy internal repetition
    ]
    spark_sets = _fps(spark, texts)
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts)) +
                ") t(doc_id, text)")
    rows = con.execute(f"""
        WITH g AS (
            SELECT doc_id,
                   list_transform({TX.sql_grams_all(TX.sql_words('text'), TX.WINNOW_K)},
                                  s -> {TX.sql_hash28('s')}) AS h
            FROM d
        )
        SELECT doc_id, {TX.sql_winnow_from_hashes('h')} AS fps
        FROM g WHERE len(h) >= {TX.WINNOW_W} ORDER BY doc_id
    """).fetchall()
    duck_sets = [set(r[1]) for r in rows]
    assert duck_sets == spark_sets


def test_planted_copies_detected_sf0001(spark):
    rows = dedup.dedup_winnowing(spark, SF_SMALL).collect()
    assert rows, "planted 80%-prefix copies must surface"
    by_pair = {(r.doc_a, r.doc_b): r for r in rows}
    # Every planted truncation pair that got fingerprints should be found
    # with near-total containment (shared ~= min side).
    planted = [p for p in by_pair if p[1] == p[0] + dedup.TRUNC_OFFSET]
    assert planted, "at least one planted pair detected"
    for p in planted:
        r = by_pair[p]
        assert 2 * r.shared_fp >= min(r.fp_a, r.fp_b)
