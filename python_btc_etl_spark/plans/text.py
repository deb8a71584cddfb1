"""Text-analysis operator coverage (E-TEXT, SURVEY.md §2.B): token
counting (whitespace + BPE-ish regex), quality scoring, language-ID by
stopword-marker scoring, and document fingerprinting — the text side of
a training-data pipeline, over the ``documents`` table.

The reference has no text operators (its only string work is filename
parsing, reference utils.py:5-21); this module is pure extension.

Everything is built-in Spark expressions / higher-order functions —
JVM-side, codegen'd, no UDFs — so a 100 TB documents corpus processes at
scan speed with zero Python in the hot path.
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load, managed_cache, spread
from ..functions import text as TX
from ..functions import vectors as VX
from .exprs import dsum, sql_dsum
from .registry import query

# Marker stopwords per language, used by the language-ID scorer. Scores
# are plain token-membership counts; `predicted` is the argmax with
# alphabetical-first tie-break (a deterministic CASE chain, identical in
# both engines).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "das"),
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "le", "shi", "he", "zai"),
}
LANGS = tuple(sorted(LANG_MARKERS))


def _words(df: DataFrame) -> DataFrame:
    return df.withColumn("w", TX.words(F.col("text")))


@query(
    "text_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {TX.sql_words('text')} AS w,
                      {TX.sql_tokens_bpe('text')} AS tok
               FROM documents)
    SELECT doc_id, lang,
           len(w)                                              AS n_words,
           len(tok)                                            AS n_tokens,
           len(list_distinct(w))                               AS n_distinct_words,
           CAST(list_reduce(list_transform(w, s -> length(s)), (x, y) -> x + y) AS DOUBLE)
               / len(w)                                        AS avg_word_len,
           CAST(len(list_distinct(w)) AS DOUBLE) / len(w)      AS uniq_ratio
    FROM t
    ORDER BY doc_id
    """,
    doc="Token counting: whitespace words + BPE-ish regex tokens "
    "(alnum runs | single punctuation), distinct-word ratio, mean word "
    "length. Pure codegen'd array expressions.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _words(spread(load(spark, sf_dir, "documents")))
    n_words = F.size("w")
    n_distinct = F.size(F.array_distinct("w"))
    total_len = F.aggregate(F.col("w"), F.lit(0), lambda acc, s: acc + F.length(s))
    return (
        d.select(
            "doc_id",
            "lang",
            n_words.alias("n_words"),
            F.size(TX.tokens_bpe(F.col("text"))).alias("n_tokens"),
            n_distinct.alias("n_distinct_words"),
            (total_len.cast("double") / n_words).alias("avg_word_len"),
            (n_distinct.cast("double") / n_words).alias("uniq_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {TX.sql_words('lower(text)')} AS w,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS n_punct
        FROM documents
    ), s AS (
        SELECT doc_id, n_chars,
               len(w) AS n_words,
               CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
               CAST(len(list_filter(w, x -> list_contains({list(LANG_MARKERS['en'])}, x))) AS DOUBLE)
                   / len(w) AS stop_ratio,
               CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq_ratio
        FROM t
    )
    SELECT doc_id, n_words, punct_ratio, stop_ratio, uniq_ratio,
           0.4 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
             + 0.3 * (1.0 - punct_ratio) + 0.3 * uniq_ratio AS quality,
           CASE WHEN 0.4 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
                     + 0.3 * (1.0 - punct_ratio) + 0.3 * uniq_ratio >= 0.8 THEN 'high'
                WHEN 0.4 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
                     + 0.3 * (1.0 - punct_ratio) + 0.3 * uniq_ratio >= 0.6 THEN 'medium'
                ELSE 'low' END AS tier
    FROM s
    ORDER BY doc_id
    """,
    doc="Document quality scoring: length score, punctuation ratio, "
    "stopword ratio, uniqueness ratio → composite score + tier. The "
    "standard pre-training quality-filter shape (length/punct/stopword "
    "heuristics), all JVM-side.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    lowered = F.lower(F.col("text"))
    d = d.withColumn("w", TX.words(lowered)).withColumn(
        "n_punct", F.length("text") - F.length(F.regexp_replace(lowered, "[^a-z0-9 ]", ""))
    )
    n_words = F.size("w")
    punct_ratio = F.col("n_punct").cast("double") / F.length("text")
    stop = F.size(F.filter(F.col("w"), lambda x: x.isin(*LANG_MARKERS["en"])))
    stop_ratio = stop.cast("double") / n_words
    uniq_ratio = F.size(F.array_distinct("w")).cast("double") / n_words
    quality = (
        F.lit(0.4) * F.least(n_words.cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * uniq_ratio
    )
    return (
        d.select(
            "doc_id",
            n_words.alias("n_words"),
            punct_ratio.alias("punct_ratio"),
            stop_ratio.alias("stop_ratio"),
            uniq_ratio.alias("uniq_ratio"),
            quality.alias("quality"),
            F.when(quality >= 0.8, "high").when(quality >= 0.6, "medium").otherwise("low").alias("tier"),
        )
        .orderBy("doc_id")
    )


def _score(w: Column, lang: str) -> Column:
    return F.size(F.filter(w, lambda x: x.isin(*LANG_MARKERS[lang])))


def _sql_score(w: str, lang: str) -> str:
    return f"len(list_filter({w}, x -> list_contains({list(LANG_MARKERS[lang])}, x)))"


@query(
    "text_langid_confusion",
    oracle=f"""
    WITH scored AS (
        SELECT lang,
               {', '.join(f"{_sql_score(TX.sql_words('text'), lg)} AS s_{lg}" for lg in LANGS)}
        FROM documents
    ), pred AS (
        SELECT lang,
               CASE {' '.join(f"WHEN s_{lg} >= greatest({', '.join('s_' + o for o in LANGS)}) THEN '{lg}'" for lg in LANGS)}
               END AS predicted
        FROM scored
    )
    SELECT lang, predicted, count(*) AS n_docs
    FROM pred GROUP BY lang, predicted
    ORDER BY lang, predicted
    """,
    doc="Language-ID by stopword-marker scoring (n-gram-heuristic "
    "family): per-language membership counts, argmax with deterministic "
    "alphabetical-first tie-break, aggregated into a confusion matrix "
    "against the labeled lang column. (The synthetic corpus shares one "
    "vocabulary across langs, so accuracy is meaningless here — the "
    "operator mechanics are what's exercised.)",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _words(spread(load(spark, sf_dir, "documents")))
    scored = d.select("lang", *[_score(F.col("w"), lg).alias(f"s_{lg}") for lg in LANGS])
    best = F.greatest(*[F.col(f"s_{lg}") for lg in LANGS])
    pred = None
    for lg in LANGS:
        cond = F.col(f"s_{lg}") >= best
        pred = F.when(cond, lg) if pred is None else pred.when(cond, lg)
    return (
        scored.withColumn("predicted", pred)
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted")
    )


@query(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, lower(text) AS ltext, {TX.sql_words('lower(text)')} AS w
               FROM documents)
    SELECT doc_id,
           sha256(ltext)                                      AS content_sha,
           {TX.sql_hash60('ltext')}                           AS fp60,
           len({TX.sql_shingles('w')})                        AS n_shingles
    FROM t
    ORDER BY doc_id
    """,
    doc="Document fingerprinting: full SHA-256 content hash + a 60-bit "
    "integer fingerprint (hex-prefix carve) + distinct shingle count — "
    "the join/partition key material for dedup at scale.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents")).withColumn("ltext", F.lower("text"))
    w = TX.words(F.col("ltext"))
    return (
        d.select(
            "doc_id",
            F.sha2("ltext", 256).alias("content_sha"),
            TX.hash60(F.col("ltext")).alias("fp60"),
            F.size(TX.shingles(w)).alias("n_shingles"),
        )
        .orderBy("doc_id")
    )


REP_N = 3  # repetition-gram width
REP_NUM, REP_DEN = 1, 5  # flag docs where > 1/5 of grams are repeats


@query(
    "repetition_gram_ratio",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {TX.sql_grams_all(TX.sql_words('text'))} AS g
        FROM documents
    )
    SELECT doc_id,
           len(g) AS n_grams,
           len(list_distinct(g)) AS n_distinct,
           CASE WHEN len(g) = 0 THEN 0.0
                ELSE CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g)
           END AS dup_ratio,
           (len(g) - len(list_distinct(g))) * {REP_DEN} > len(g) * {REP_NUM}
               AS flagged
    FROM t
    ORDER BY doc_id
    """,
    doc=f"Within-document repetition filter (the Gopher/MassiveText "
    f"duplicate-{REP_N}-gram rule): the fraction of a document's word "
    f"{REP_N}-grams that are repeats of an earlier gram in the SAME "
    f"document; docs with more than {REP_NUM}/{REP_DEN} duplicate grams "
    "are flagged as degenerate (loops, keyword stuffing, template spam). "
    "Entirely per-row higher-order functions — transform + array_distinct "
    "inside one projection, no explode, no shuffle, no Python — so a "
    "100 TB corpus scores at parquet scan speed and the flag pushes "
    "down as an ordinary column predicate. The flag threshold is an "
    "integer cross-multiplication, bit-identical across engines.",
)
def repetition_gram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    g = TX.grams_all(TX.words(F.col("text")), n=REP_N)
    n = F.size("g")
    nd = F.size(F.array_distinct("g"))
    return (
        d.select("doc_id", g.alias("g"))
        .select(
            "doc_id",
            n.alias("n_grams"),
            nd.alias("n_distinct"),
            F.when(n == 0, F.lit(0.0))
            .otherwise((n - nd).cast("double") / n)
            .alias("dup_ratio"),
            ((n - nd) * REP_DEN > n * REP_NUM).alias("flagged"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# PII detection + redaction (planted, like the dedup corpora)
# ---------------------------------------------------------------------------

# The synthetic corpus contains no PII, so — exactly like the dedup
# suite's planted duplicates — both engines append deterministic PII to
# a known subset of docs, then the operator must find and scrub ALL of
# it. The planting is part of the query definition; parity covers the
# whole detect→redact pipeline.
PII_EMAIL_EVERY = 10  # doc_id % 10 == 0 gets an email appended
PII_PHONE_EVERY = 7  # doc_id % 7 == 0 gets a phone number appended
# Same regex text in Java (Spark) and RE2 (DuckDB): character classes,
# bounded repeats and literals only — no lookaround, no backrefs.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "pii_redaction_audit",
    oracle=f"""
    WITH planted AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % {PII_EMAIL_EVERY} = 0
                       THEN ' contact user' || doc_id || '@example-mail.com now'
                       ELSE '' END
               || CASE WHEN doc_id % {PII_PHONE_EVERY} = 0
                       THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS text
        FROM documents
    ),
    scanned AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS n_phones,
               regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                              '{PII_PHONE_RE}', '[PHONE]', 'g') AS redacted,
               text
        FROM planted
    )
    SELECT count(*) AS n_docs,
           count(*) FILTER (n_emails > 0) AS docs_with_email,
           count(*) FILTER (n_phones > 0) AS docs_with_phone,
           CAST(sum(n_emails) AS BIGINT) AS total_emails,
           CAST(sum(n_phones) AS BIGINT) AS total_phones,
           CAST(sum(len(regexp_extract_all(redacted, '{PII_EMAIL_RE}'))
                    + len(regexp_extract_all(redacted, '{PII_PHONE_RE}'))) AS BIGINT)
               AS residual_matches,
           CAST(sum(len(text) - len(redacted)) AS BIGINT) AS chars_removed
    FROM scanned
    """,
    doc="PII detect + redact over the documents corpus (planted "
    "deterministically on both sides, like the dedup corpora): "
    "regexp_count finds emails/phones, regexp_replace scrubs them to "
    "[EMAIL]/[PHONE] tags, and the audit re-scans the REDACTED text — "
    "residual_matches is computed from the actual scrub output and "
    "must be 0, so the redaction itself (not just the detection) is "
    "inside the differential, along with exact match counts and the "
    "redaction's total character delta. All JVM-side regexp "
    "expressions (one scan, codegen'd, zero Python); the regex "
    "dialect is the Java∩RE2 common subset so both engines run the "
    "identical pattern. The cleaning step every training-data "
    "pipeline needs before publishing a corpus; at 100 TB this is "
    "scan-speed work with no shuffle at all until the final one-row "
    "summary.",
)
def pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % PII_EMAIL_EVERY == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example-mail.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % PII_PHONE_EVERY == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    scanned = planted.select(
        "doc_id",
        "text",
        F.regexp_count("text", F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL_RE, "[EMAIL]"),
            PII_PHONE_RE,
            "[PHONE]",
        ).alias("redacted"),
    )
    return scanned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("n_emails") > 0, 1)).alias("docs_with_email"),
        F.count(F.when(F.col("n_phones") > 0, 1)).alias("docs_with_phone"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_phones").alias("total_phones"),
        F.sum(
            F.regexp_count("redacted", F.lit(PII_EMAIL_RE))
            + F.regexp_count("redacted", F.lit(PII_PHONE_RE))
        ).alias("residual_matches"),
        F.sum(F.length("text") - F.length("redacted")).alias("chars_removed"),
    )


# ---------------------------------------------------------------------------
# Vocabulary growth (Heaps' law) via the first-occurrence rewrite
# ---------------------------------------------------------------------------

HEAPS_CHECKPOINTS = 10


@query(
    "vocab_growth_heaps",
    oracle=f"""
    WITH maxid AS (SELECT max(doc_id) AS m FROM documents),
    ck AS (
        SELECT t.i AS checkpoint,
               ((SELECT m FROM maxid) + 1) * t.i / {HEAPS_CHECKPOINTS} - 1 AS hi
        FROM unnest(range(1, {HEAPS_CHECKPOINTS} + 1)) AS t(i)
    ),
    w AS (
        SELECT d.doc_id, u.w
        FROM (SELECT doc_id, {TX.sql_words('text')} AS ws FROM documents) d,
             unnest(d.ws) AS u(w)
    ),
    first_occ AS (SELECT w, min(doc_id) AS first_doc FROM w GROUP BY w),
    tok AS (SELECT doc_id, count(*) AS n_tok FROM w GROUP BY doc_id)
    SELECT c.checkpoint,
           CAST(c.hi AS BIGINT) AS max_doc_id,
           (SELECT count(*) FROM first_occ f WHERE f.first_doc <= c.hi) AS vocab_size,
           (SELECT CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM tok
            WHERE doc_id <= c.hi) AS tokens_cum
    FROM ck c
    ORDER BY c.checkpoint
    """,
    doc="Heaps'-law vocabulary growth curve: distinct-vocabulary size "
    "after each tenth of the corpus (in doc_id order) with cumulative "
    "token counts — the tokenizer-budget planning curve. The naive "
    "form is a distinct-count over every growing prefix (quadratic "
    "work, or an ever-growing dedup state); the relational rewrite "
    "computes each word's FIRST-occurrence doc once (one explode + "
    "min-aggregate) and then vocab(checkpoint) is a simple filtered "
    "count over first occurrences — one shuffle on the word key "
    "regardless of checkpoint count, fully scalable. Both engines run "
    "the same rewrite.",
)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    w = d.select("doc_id", F.explode(TX.words(F.col("text"))).alias("w"))
    first_occ = w.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    tok = w.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    max_id = d.agg(F.max("doc_id").alias("m"))
    ck = (
        spark.range(1, HEAPS_CHECKPOINTS + 1)
        .withColumnRenamed("id", "checkpoint")
        .crossJoin(F.broadcast(max_id))
        .select(
            "checkpoint",
            ((F.col("m") + 1) * F.col("checkpoint") / HEAPS_CHECKPOINTS - 1)
            .cast("bigint")
            .alias("max_doc_id"),
        )
    )
    vocab = (
        ck.join(first_occ, first_occ.first_doc <= ck.max_doc_id, "left")
        .groupBy("checkpoint", "max_doc_id")
        .agg(F.count("w").alias("vocab_size"))
    )
    tokens = (
        ck.join(tok, tok.doc_id <= ck.max_doc_id, "left")
        .groupBy(F.col("checkpoint").alias("ck2"))
        .agg(F.coalesce(F.sum("n_tok"), F.lit(0)).cast("bigint").alias("tokens_cum"))
    )
    return (
        # F.col, not vocab.checkpoint: attribute access collides with the
        # DataFrame.checkpoint METHOD and returns the bound function.
        vocab.join(tokens, F.col("checkpoint") == F.col("ck2"))
        .select("checkpoint", "max_doc_id", "vocab_size", "tokens_cum")
        .orderBy("checkpoint")
    )


# --- BM25 keyword retrieval + hybrid RRF fusion ---------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10
# Literal keyword queries over the synthetic corpus vocabulary. query_id
# doubles as the embedding vec_id for the hybrid-fusion query below.
BM25_QUERIES: dict[int, tuple[str, ...]] = {
    0: ("spark", "join", "stream"),
    1: ("vector", "scan", "filter"),
    2: ("customer", "order", "query"),
}
RRF_K = 60  # reciprocal-rank-fusion damping (Cormack/Clarke/Buettcher '09)
RRF_TOP_K = 5

_SQL_QUERY_TERMS = ", ".join(
    f"({qid}, '{t}')" for qid, terms in sorted(BM25_QUERIES.items()) for t in terms
)

# Shared oracle CTE chain: tokenized docs, doc lengths, tf, df, and the
# BM25 ranking. idf uses sqrt((N - df + 0.5)/(df + 0.5)) instead of the
# classical log: both are monotone-decreasing concave dampings of the
# same rarity ratio, and sqrt is CORRECTLY-ROUNDED IEEE in every engine
# while libm log differs in the last ulp across engines (the same policy
# as tfidf_top_terms dropping log and temperature_mix_allocation using
# sqrt). The per-(query, doc) score sums <= |terms| products of
# engine-identical doubles via the exact-decimal dsum, so (score,
# doc_id) ranking is cross-engine deterministic.
_SQL_BM25_CTES = f"""
    w AS (SELECT doc_id, unnest({TX.sql_words('text')}) AS word FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id),
    stats AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
                     count(*) AS n_docs
              FROM dl),
    qt(query_id, term) AS (VALUES {_SQL_QUERY_TERMS}),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
    df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
    term_scores AS (
        SELECT qt.query_id, tf.doc_id,
               sqrt((stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * ((tf.tf * CAST({BM25_K1 + 1.0!r} AS DOUBLE))
                  / (tf.tf + CAST({BM25_K1!r} AS DOUBLE)
                             * (CAST({1.0 - BM25_B!r} AS DOUBLE)
                                + CAST({BM25_B!r} AS DOUBLE)
                                  * dl.dl / stats.avgdl)))
                   AS term_score
        FROM qt
        JOIN tf ON tf.word = qt.term
        JOIN df ON df.word = qt.term
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats
    ),
    bm25 AS (
        SELECT query_id, doc_id, score, rnk FROM (
            SELECT query_id, doc_id,
                   {sql_dsum('term_score', 18)} AS score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY {sql_dsum('term_score', 18)} DESC,
                                               doc_id) AS rnk
            FROM term_scores
            GROUP BY query_id, doc_id
        ) WHERE rnk <= {BM25_TOP_K}
    )"""


def _bm25_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score, rnk): BM25 top-K per keyword query —
    the Spark twin of the _SQL_BM25_CTES chain."""
    d = spread(load(spark, sf_dir, "documents"))
    w = _words(d).select("doc_id", F.explode("w").alias("word"))
    dl = w.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in sorted(BM25_QUERIES.items()) for t in terms],
        "query_id int, term string",
    )
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = w.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.sqrt(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_sat = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
    )
    win = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        # Query terms drive the probe: the tiny qt/df/stats sides
        # broadcast; only postings of the queried terms are ever joined
        # (an inverted-index probe, not a corpus scan at score time).
        tf.join(F.broadcast(qt), tf.word == qt.term)
        .join(F.broadcast(df_.join(F.broadcast(qt), df_.word == qt.term).select("word", "df")), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("term_score", idf * tf_sat)
        .groupBy("query_id", "doc_id")
        .agg(dsum("term_score", 18).alias("score"))
        .withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= BM25_TOP_K)
        .select("query_id", "doc_id", "score", "rnk")
    )


@query(
    "bm25_keyword_topk",
    oracle=f"""
    WITH {_SQL_BM25_CTES}
    SELECT query_id, rnk, doc_id, score
    FROM bm25
    ORDER BY query_id, rnk
    """,
    doc=f"BM25 keyword retrieval (k1={BM25_K1}, b={BM25_B}): top-"
    f"{BM25_TOP_K} documents per keyword query by the Robertson/"
    "Sparck-Jones ranking — tf saturation with document-length "
    "normalization times term rarity. The idf damping is sqrt instead "
    "of log (monotone in the same ratio; sqrt is correctly-rounded "
    "IEEE in both engines while libm log differs in the last ulp — "
    "same cross-engine policy as tfidf_top_terms), and per-(query, "
    "doc) term scores sum via the exact-decimal dsum so ranking is "
    "deterministic. Plan shape: tf is the inverted index (posting "
    "list per word); the query-term table, per-term df, and corpus "
    "stats all broadcast, so scoring touches ONLY the queried terms' "
    "postings — at 100 TB this is an index probe, never a corpus "
    "scan, and the per-query ranking is one window over the matched "
    "postings.",
)
def bm25_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bm25_ranked(spark, sf_dir).orderBy("query_id", "rnk").select(
        "query_id", "rnk", "doc_id", "score"
    )


@query(
    "hybrid_rrf_fusion",
    oracle=f"""
    WITH {_SQL_BM25_CTES},
    e AS (SELECT vec_id, (embedding::DOUBLE[]) AS v FROM embeddings),
    qv AS (SELECT vec_id AS query_id, v AS qvec FROM e
           WHERE vec_id IN ({", ".join(str(q) for q in sorted(BM25_QUERIES))})),
    vec_rank AS (
        SELECT query_id, doc_id, rnk FROM (
            SELECT qv.query_id, e.vec_id AS doc_id,
                   row_number() OVER (PARTITION BY qv.query_id
                                      ORDER BY {VX.sql_cosine('qv.qvec', 'e.v')} DESC,
                                               e.vec_id) AS rnk
            FROM qv JOIN e ON e.vec_id <> qv.query_id
        ) WHERE rnk <= {BM25_TOP_K}
    ),
    fused AS (
        SELECT COALESCE(b.query_id, v.query_id) AS query_id,
               COALESCE(b.doc_id, v.doc_id) AS doc_id,
               COALESCE(1.0 / ({RRF_K} + b.rnk), 0.0)
               + COALESCE(1.0 / ({RRF_K} + v.rnk), 0.0) AS rrf_score,
               b.rnk AS text_rank, v.rnk AS vec_rank
        FROM bm25 b
        FULL OUTER JOIN vec_rank v
          ON v.query_id = b.query_id AND v.doc_id = b.doc_id
    )
    SELECT query_id, rnk, doc_id, rrf_score, text_rank, vec_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_score DESC, doc_id) AS rnk
        FROM fused
    ) WHERE rnk <= {RRF_TOP_K}
    ORDER BY query_id, rnk
    """,
    doc="HYBRID RETRIEVAL via reciprocal-rank fusion (Cormack/Clarke/"
    f"Buettcher SIGIR'09): each query runs BOTH modalities — BM25 over "
    "the keyword index and embedding-cosine over the vector column "
    "(doc_id and vec_id align in the corpus) — and candidates merge by "
    f"rrf = 1/({RRF_K}+rank_text) + 1/({RRF_K}+rank_vec), the score "
    "RAG stacks use because it needs no cross-modality calibration. "
    "Ranks are integers, the two reciprocal terms add in one fixed-"
    "order expression after a full-outer join of the two top-K lists, "
    "so fusion is cross-engine exact. Scale shape: each modality "
    "produces a bounded top-K per query (window over an index probe / "
    "bucketed ANN), so the fusion join is per-query-K-sized — "
    "broadcastable at any corpus size; the corpus is only touched by "
    "the modality retrievals themselves.",
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    bm25 = _bm25_ranked(spark, sf_dir).select(
        F.col("query_id").alias("b_qid"),
        F.col("doc_id").alias("b_did"),
        F.col("rnk").alias("text_rank"),
    )
    e = spread(load(spark, sf_dir, "embeddings")).select(
        "vec_id", VX.as_double(F.col("embedding")).alias("v")
    ).withColumn("nv", VX.norm(F.col("v")))  # per-row norm (r14)
    qv = e.filter(F.col("vec_id").isin(*sorted(BM25_QUERIES))).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qvec"),
        F.col("nv").alias("nqv"),
    )
    vwin = W.partitionBy("query_id").orderBy(F.desc("cos"), "doc_id")
    vec_rank = (
        e.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            VX.cosine_pre(F.col("qvec"), F.col("v"), F.col("nqv"), F.col("nv")),
        )
        .withColumn("doc_id", F.col("vec_id"))
        .withColumn("rnk", F.row_number().over(vwin))
        .filter(F.col("rnk") <= BM25_TOP_K)
        .select("query_id", "doc_id", F.col("rnk").alias("vec_rank"))
    )
    fused = (
        bm25.join(
            vec_rank,
            (F.col("b_qid") == F.col("query_id"))
            & (F.col("b_did") == F.col("doc_id")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("query_id"), F.col("b_qid")).alias("query_id"),
            F.coalesce(F.col("doc_id"), F.col("b_did")).alias("doc_id"),
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("text_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0)
                )
            ).alias("rrf_score"),
            "text_rank",
            "vec_rank",
        )
    )
    fwin = W.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(fwin))
        .filter(F.col("rnk") <= RRF_TOP_K)
        .select("query_id", "rnk", "doc_id", "rrf_score", "text_rank", "vec_rank")
        .orderBy("query_id", "rnk")
    )


@query(
    "doc_gini_diversity",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest({TX.sql_words('text')}) AS word
               FROM documents),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
    g AS (
        SELECT doc_id,
               CAST(sum(tf) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(tf * tf) AS BIGINT) AS sum_tf2
        FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           CAST(1 AS DOUBLE)
           - CAST(sum_tf2 AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS gini
    FROM g ORDER BY doc_id
    """,
    doc="Vocabulary-diversity quality signal per document: GINI "
    "IMPURITY of the token distribution, 1 - sum(p_w^2) — the log-free "
    "twin of token entropy (both are concave diversity measures; "
    "libm log differs in the last ulp across engines, the same policy "
    "as tfidf_top_terms/bm25 dropping log). Low gini = repetitive "
    "spam-like text, a standard pretraining quality filter. "
    "Determinism by construction: sum(p^2) is computed as the exact "
    "INTEGER sum of tf^2 divided once by n_tokens^2 — all aggregation "
    "is bigint, doubles appear in exactly one final division, so no "
    "decimal conversion is needed at all. One shuffle on (doc_id, "
    "word) then a partial-aggregable per-doc rollup; scan-speed at "
    "100 TB with zero Python.",
)
def doc_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    tf = (
        _words(d)
        .select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    g = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("tf") * F.col("tf")).alias("sum_tf2"),
    )
    gini = F.lit(1.0) - F.col("sum_tf2").cast("double") / (
        F.col("n_tokens").cast("double") * F.col("n_tokens").cast("double")
    )
    return g.select(
        "doc_id", "n_tokens", "n_distinct", gini.alias("gini")
    ).orderBy("doc_id")


# --- Retrieval evaluation: MRR / precision@k / recall@k -------------------


@query(
    "retrieval_eval_mrr",
    oracle=f"""
    WITH {_SQL_BM25_CTES},
    rel AS (
        SELECT qt.query_id, tf.doc_id
        FROM qt JOIN tf ON tf.word = qt.term
        GROUP BY qt.query_id, tf.doc_id
        HAVING count(*) = (SELECT count(*) FROM qt q2
                           WHERE q2.query_id = qt.query_id)
    ),
    nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant
             FROM rel GROUP BY query_id),
    j AS (
        SELECT b.query_id, b.rnk,
               CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
        FROM bm25 b
        LEFT JOIN rel ON rel.query_id = b.query_id AND rel.doc_id = b.doc_id
    ),
    per_q AS (
        SELECT query_id,
               min(CASE WHEN is_rel = 1 THEN rnk END) AS first_rel_rank,
               CAST(sum(CASE WHEN is_rel = 1 AND rnk <= 5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS rel_in_top5,
               CAST(sum(is_rel) AS BIGINT) AS rel_in_top10
        FROM j GROUP BY query_id
    )
    SELECT p.query_id, n.n_relevant, p.first_rel_rank,
           COALESCE(CAST(1 AS DOUBLE) / CAST(p.first_rel_rank AS DOUBLE),
                    CAST(0 AS DOUBLE)) AS rr,
           CAST(p.rel_in_top5 AS DOUBLE) / CAST(5 AS DOUBLE) AS p_at_5,
           CAST(p.rel_in_top10 AS DOUBLE) / CAST(n.n_relevant AS DOUBLE)
               AS recall_at_10
    FROM per_q p JOIN nrel n ON n.query_id = p.query_id
    ORDER BY p.query_id
    """,
    doc="RETRIEVAL EVALUATION (MRR / precision@5 / recall@10): grades "
    "the BM25 ranking against an EXACT relevance oracle — a document "
    "is relevant iff it contains ALL the query's terms (AND "
    "semantics), derivable in-engine from the same inverted index "
    "the ranker probes, so no human labels are needed and both "
    "engines agree on the label set bit-for-bit. Per query: the "
    "reciprocal rank of the first relevant hit (1/rank — a single "
    "IEEE division; 0.0 when nothing relevant ranked), precision@5, "
    "and recall@10 against the full relevant-set size. Per-query "
    "rows avoid any cross-query float mean; a fleet-level MRR is "
    "one tiny ordered fold away. Plan shape: the relevance set is "
    "the same broadcast-probed postings join as the ranker (HAVING "
    "count = |query terms| = the AND), the grade join is top-10-"
    "sized, and nothing rescans the corpus. The eval loop every "
    "retrieval stack ships with — at 100 TB it runs per experiment "
    "over millions of logged queries exactly this shape.",
)
def retrieval_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    w = _words(d).select("doc_id", F.explode("w").alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in sorted(BM25_QUERIES.items()) for t in terms],
        "query_id int, term string",
    )
    qsize = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("qn"))
    rel = (
        tf.join(F.broadcast(qt), tf.word == qt.term)
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("hits"))
        .join(F.broadcast(qsize), "query_id")
        .filter(F.col("hits") == F.col("qn"))
        .select("query_id", "doc_id")
    )
    rel = managed_cache(rel)
    nrel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_relevant"))
    b = _bm25_ranked(spark, sf_dir)
    j = b.join(
        rel.withColumn("is_rel", F.lit(1)), ["query_id", "doc_id"], "left"
    ).select("query_id", "rnk", F.coalesce("is_rel", F.lit(0)).alias("is_rel"))
    per_q = j.groupBy("query_id").agg(
        F.min(F.when(F.col("is_rel") == 1, F.col("rnk"))).alias("first_rel_rank"),
        F.sum(F.when((F.col("is_rel") == 1) & (F.col("rnk") <= 5), 1).otherwise(0))
        .cast("bigint")
        .alias("rel_in_top5"),
        F.sum("is_rel").cast("bigint").alias("rel_in_top10"),
    )
    return (
        per_q.join(F.broadcast(nrel), "query_id")
        .select(
            "query_id",
            "n_relevant",
            "first_rel_rank",
            F.coalesce(
                F.lit(1).cast("double") / F.col("first_rel_rank").cast("double"),
                F.lit(0).cast("double"),
            ).alias("rr"),
            (F.col("rel_in_top5").cast("double") / F.lit(5).cast("double")).alias(
                "p_at_5"
            ),
            (
                F.col("rel_in_top10").cast("double")
                / F.col("n_relevant").cast("double")
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


# --- Retrieval evaluation: nDCG@k with a fixed-point discount table -------

# DCG's 1/log2(rank+1) discount is irrational, and libm log differs in
# the last ulp across engines (the same hazard the BM25 idf avoids with
# sqrt). Instead of dropping the log, FREEZE it: the discount table is
# computed ONCE here in Python as fixed-point integers D_i =
# round(2^24 / log2(i+1)), and the SAME integer literals are embedded in
# both the Spark plan and the DuckDB oracle — DCG and ideal-DCG become
# exact BIGINT sums, and the only floating-point operation in the whole
# query is the single final dcg_fp/idcg_fp division. |table error| <
# 2^-24 relative per term, orders of magnitude under any ranking
# decision boundary.
_NDCG_B = 24  # fractional bits of the fixed-point discount
_NDCG_D = tuple(
    round((1 << _NDCG_B) / math.log2(i + 1)) for i in range(1, BM25_TOP_K + 1)
)
_NDCG_P = tuple(itertools.accumulate(_NDCG_D))  # ideal-DCG prefix sums


def _sql_int_list(xs: tuple[int, ...]) -> str:
    return "[" + ", ".join(str(int(x)) for x in xs) + "]"


@query(
    "retrieval_eval_ndcg",
    oracle=f"""
    WITH {_SQL_BM25_CTES},
    rel AS (
        SELECT qt.query_id, tf.doc_id
        FROM qt JOIN tf ON tf.word = qt.term
        GROUP BY qt.query_id, tf.doc_id
        HAVING count(*) = (SELECT count(*) FROM qt q2
                           WHERE q2.query_id = qt.query_id)
    ),
    nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant
             FROM rel GROUP BY query_id),
    j AS (
        SELECT b.query_id, b.rnk,
               CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
        FROM bm25 b
        LEFT JOIN rel ON rel.query_id = b.query_id AND rel.doc_id = b.doc_id
    ),
    dcg AS (
        SELECT query_id,
               CAST(sum(CASE WHEN is_rel = 1
                        THEN ({_sql_int_list(_NDCG_D)})[rnk]
                        ELSE 0 END) AS BIGINT) AS dcg_fp
        FROM j GROUP BY query_id
    )
    SELECT d.query_id, n.n_relevant, d.dcg_fp,
           CAST(({_sql_int_list(_NDCG_P)})[least(n.n_relevant,
                                                 {BM25_TOP_K})]
                AS BIGINT) AS idcg_fp,
           CAST(d.dcg_fp AS DOUBLE)
           / CAST(({_sql_int_list(_NDCG_P)})[least(n.n_relevant,
                                                   {BM25_TOP_K})]
                  AS DOUBLE) AS ndcg_at_10
    FROM dcg d JOIN nrel n ON n.query_id = d.query_id
    ORDER BY d.query_id
    """,
    doc=f"RETRIEVAL EVALUATION (nDCG@{BM25_TOP_K}): position-discounted "
    "ranking quality of the BM25 top-K against the same exact AND-"
    "semantics relevance oracle as retrieval_eval_mrr (relevant = "
    "contains ALL query terms, derived in-engine from the inverted "
    "index — no human labels, bit-identical label sets). The classic "
    "1/log2(rank+1) discount is FROZEN into a fixed-point integer "
    f"table (D_i = round(2^{_NDCG_B}/log2(i+1)), computed once at "
    "plan-build time and embedded as the same literals in both "
    "engines), so DCG and the ideal DCG (prefix sums of the table, "
    "indexed at min(n_relevant, K)) are exact BIGINT sums; the single "
    "final dcg_fp/idcg_fp division is the query's only float. "
    "Plan shape identical to the MRR eval: broadcast-probed postings "
    "for the relevance set, a top-K-sized grade join, nothing rescans "
    "the corpus — at 100 TB this is the per-experiment ranking-eval "
    "loop over millions of logged queries.",
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    w = _words(d).select("doc_id", F.explode("w").alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in sorted(BM25_QUERIES.items()) for t in terms],
        "query_id int, term string",
    )
    qsize = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("qn"))
    rel = (
        tf.join(F.broadcast(qt), tf.word == qt.term)
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("hits"))
        .join(F.broadcast(qsize), "query_id")
        .filter(F.col("hits") == F.col("qn"))
        .select("query_id", "doc_id")
    )
    rel = managed_cache(rel)
    nrel = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_relevant")
    )
    b = _bm25_ranked(spark, sf_dir)
    disc = F.element_at(
        F.array(*[F.lit(int(x)).cast("bigint") for x in _NDCG_D]),
        F.col("rnk").cast("int"),
    )
    j = b.join(rel.withColumn("is_rel", F.lit(1)), ["query_id", "doc_id"], "left")
    dcg = j.groupBy("query_id").agg(
        F.sum(F.when(F.col("is_rel") == 1, disc).otherwise(F.lit(0).cast("bigint")))
        .cast("bigint")
        .alias("dcg_fp")
    )
    idcg = F.element_at(
        F.array(*[F.lit(int(x)).cast("bigint") for x in _NDCG_P]),
        F.least(F.col("n_relevant"), F.lit(BM25_TOP_K)).cast("int"),
    )
    return (
        dcg.join(F.broadcast(nrel), "query_id")
        .withColumn("idcg_fp", idcg)
        .select(
            "query_id",
            "n_relevant",
            "dcg_fp",
            "idcg_fp",
            (F.col("dcg_fp").cast("double") / F.col("idcg_fp").cast("double"))
            .alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )


# --- Readability scoring (Flesch reading ease) -----------------------------


@query(
    "readability_flesch_by_lang",
    oracle=f"""
    WITH d AS (
        SELECT lang,
               CAST(len({TX.sql_words('text')}) AS BIGINT) AS w,
               CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
                   AS syl
        FROM documents
    ),
    f AS (
        SELECT lang, w, s, syl,
               CAST(206.835 AS DOUBLE)
               - CAST(1.015 AS DOUBLE)
                 * (CAST(w AS DOUBLE) / CAST(greatest(s, 1) AS DOUBLE))
               - CAST(84.6 AS DOUBLE)
                 * (CAST(syl AS DOUBLE) / CAST(greatest(w, 1) AS DOUBLE))
                   AS flesch
        FROM d
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS total_words,
           CAST(sum(s) AS BIGINT) AS total_sentences,
           CAST(sum(syl) AS BIGINT) AS total_syllables,
           {sql_dsum('flesch', 18)} / count(*) AS mean_flesch
    FROM f
    GROUP BY lang
    ORDER BY lang
    """,
    doc="FLESCH READING-EASE scoring per language — the classic "
    "readability feature used in training-data quality filtering "
    "(alongside text_quality_score's length/punct ratios): 206.835 "
    "- 1.015*(words/sentences) - 84.6*(syllables/words), with "
    "syllables approximated as VOWEL GROUPS — counted with ONE flat "
    "regexp_extract_all over the whole lowercased document (vowel "
    "runs never span the whitespace between words, so the per-word "
    "sum collapses to a single document-level count: no per-word "
    "HOF, no explode). Sentences are terminal-punctuation runs. All "
    "three counts are integers; the per-doc score is a fixed chain "
    "of IEEE ops on them (constants CAST AS DOUBLE — DuckDB parses "
    "bare literals as DECIMAL), and the per-language mean uses the "
    "exact-decimal dsum at scale 18, the BM25 policy for "
    "non-fixed-point doubles. greatest(...,1) guards division on "
    "degenerate docs identically in both engines. 100 TB: pure "
    "per-row regex compute + one partial-aggregable rollup keyed on "
    "the bounded language set.",
)
def readability_flesch_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents")).select(
        "lang",
        F.size(TX.words(F.col("text"))).cast("bigint").alias("w"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0))
        .cast("bigint")
        .alias("s"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0))
        .cast("bigint")
        .alias("syl"),
    )
    flesch = (
        F.lit(206.835).cast("double")
        - F.lit(1.015).cast("double")
        * (F.col("w").cast("double") / F.greatest(F.col("s"), F.lit(1)).cast("double"))
        - F.lit(84.6).cast("double")
        * (
            F.col("syl").cast("double")
            / F.greatest(F.col("w"), F.lit(1)).cast("double")
        )
    )
    return (
        d.withColumn("flesch", flesch)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("total_words"),
            F.sum("s").cast("bigint").alias("total_sentences"),
            F.sum("syl").cast("bigint").alias("total_syllables"),
            (dsum("flesch", 18) / F.count(F.lit(1))).alias("mean_flesch"),
        )
        .orderBy("lang")
    )


# --- URL canonicalization dedup (the CommonCrawl-style first gate) ----------

# Synthetic raw-URL corpus: each group of 5 docs carries 5 decorated
# variants of one logical page (mixed-case scheme/host, http vs https,
# www prefix, default :443 port, utm_* tracking params, #fragment,
# trailing slash). The decorations are exactly the noise a crawl-dedup
# gate must erase; variant 3 keeps a REAL query param (ref=home) that
# canonicalization must preserve, so each group yields two canonical
# URLs, not one.
_URL_HOSTS = 7  # host = example{g % 7}.com


def _raw_url_sql() -> str:
    """DuckDB expression synthesizing the raw URL from doc_id."""
    return """
        CASE doc_id % 5
          WHEN 0 THEN 'https://www.example' || (doc_id // 5) % 7
                      || '.com/articles/' || (doc_id // 5)
          WHEN 1 THEN 'HTTP://WWW.EXAMPLE' || (doc_id // 5) % 7
                      || '.COM/articles/' || (doc_id // 5) || '/'
          WHEN 2 THEN 'https://example' || (doc_id // 5) % 7
                      || '.com/articles/' || (doc_id // 5)
                      || '?utm_source=feed&utm_campaign=x'
          WHEN 3 THEN 'https://www.example' || (doc_id // 5) % 7
                      || '.com:443/articles/' || (doc_id // 5)
                      || '?ref=home&utm_medium=email'
          ELSE        'https://www.example' || (doc_id // 5) % 7
                      || '.com/articles/' || (doc_id // 5) || '#section-2'
        END
    """


def _raw_url_col() -> Column:
    g = F.expr("doc_id DIV 5")
    h = g % _URL_HOSTS
    path = F.concat(F.lit("/articles/"), g.cast("string"))
    host = F.concat(F.lit("example"), h.cast("string"), F.lit(".com"))
    return (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("https://www."), host, path),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(
                F.lit("HTTP://WWW.EXAMPLE"),
                h.cast("string"),
                F.lit(".COM"),
                path,
                F.lit("/"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(
                F.lit("https://"), host, path,
                F.lit("?utm_source=feed&utm_campaign=x"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(
                F.lit("https://www."), host, F.lit(":443"), path,
                F.lit("?ref=home&utm_medium=email"),
            ),
        )
        .otherwise(F.concat(F.lit("https://www."), host, path, F.lit("#section-2")))
    )


def _canonical_url(u: Column) -> Column:
    """Canonicalize a URL with native regexp expressions only (the
    100 TB path: pure JVM codegen, no UDF, no parse_url round-trips).

    Steps (each mirrored 1:1 in the DuckDB oracle, RE2-safe — no
    lookarounds): normalize scheme to https + lowercase the authority;
    strip the www. prefix; drop default ports :443/:80; strip the
    fragment; strip utm_* tracking params (mid-query '&utm_x=v', then
    leading '?utm_x=v&' -> '?', then a lone '?utm_x=v'); strip the
    trailing slash (corpus has no root-path URLs, so the bare '/$' is
    safe)."""
    c = F.concat(
        F.lit("https://"),
        F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]*)", 1)),
        F.regexp_replace(u, r"^[A-Za-z]+://[^/?#]*", ""),
    )
    c = F.regexp_replace(c, r"^https://www\.", "https://")
    c = F.regexp_replace(c, r"^(https://[^/?#:]*):(443|80)([/?#].*)?$", "$1$3")
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"&utm_[A-Za-z_]+=[^&#]*", "")
    c = F.regexp_replace(c, r"\?utm_[A-Za-z_]+=[^&#]*&", "?")
    c = F.regexp_replace(c, r"\?utm_[A-Za-z_]+=[^&#]*$", "")
    return F.regexp_replace(c, r"/$", "")


@query(
    "url_canonical_dedup",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {_raw_url_sql()} AS url FROM documents
    ),
    canon AS (
        SELECT doc_id, url,
            regexp_replace(
            regexp_replace(
            regexp_replace(
            regexp_replace(
            regexp_replace(
            regexp_replace(
            regexp_replace(
                'https://' || lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1))
                           || regexp_replace(url, '^[A-Za-z]+://[^/?#]*', ''),
                '^https://www\\.', 'https://'),
                '^(https://[^/?#:]*):(443|80)([/?#].*)?$', '\\1\\3'),
                '#.*$', ''),
                '&utm_[A-Za-z_]+=[^&#]*', '', 'g'),
                '\\?utm_[A-Za-z_]+=[^&#]*&', '?'),
                '\\?utm_[A-Za-z_]+=[^&#]*$', ''),
                '/$', '') AS canonical_url
        FROM raw
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon
    GROUP BY canonical_url
    ORDER BY canonical_url
    """,
    doc="URL CANONICALIZATION DEDUP — the CommonCrawl-style first gate "
    "of a web-scale cleaning pipeline: normalize scheme case + https, "
    "lowercase the authority, strip www., drop default ports, strip "
    "fragments and utm_* tracking params (REAL query params like "
    "ref=home survive), strip the trailing slash, then group by the "
    "canonical form. Every step is a native regexp_replace/"
    "regexp_extract chain (whole-stage codegen; RE2-compatible "
    "patterns so the DuckDB oracle mirrors them literally — no "
    "lookarounds, no engine-specific syntax). Each 5-doc group "
    "carries 5 decorated variants of one page URL, four of which "
    "must collapse and one (real param) must stay distinct — the "
    "planted truth the differential locks. 100 TB: canonicalization "
    "is scan-local string compute; the dedup is one partial-"
    "aggregable groupBy on the canonical key (same discipline as "
    "dedup_exact_sha).",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents")).select("doc_id", _raw_url_col().alias("url"))
    canon = d.select("doc_id", "url", _canonical_url(F.col("url")).alias("canonical_url"))
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.countDistinct("url").cast("bigint").alias("n_raw_forms"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        )
        .orderBy("canonical_url")
    )
