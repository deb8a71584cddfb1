"""Training-data pipeline operators (north-star extensions beyond
SURVEY.md §2.B rows): context-window document packing and benchmark
decontamination — the two corpus-preparation steps an LLM data pipeline
runs after dedup (plans/dedup.py) and quality filtering (plans/text.py).

The reference has no analogue (it is a 268-line bar ETL); both
operators are pure extension, designed Spark-first:

- packing uses a DISTRIBUTED two-phase prefix sum (per-block window +
  broadcast block offsets), never a single global-orderBy window whose
  one partition would serialize a 100 TB corpus;
- decontamination generates candidate pairs by an equi-join on n-gram
  hashes (inverted-index shape, like plans/dedup.py), never an
  all-pairs comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..catalog import load, managed_cache, spread
from ..functions import text as TX
from .exprs import dsum, sql_dsum
from .registry import query

CTX_TOKENS = 512  # context-window size, in whitespace tokens
PACK_BLOCK = 64  # docs per prefix-sum block (tune ≫ this at scale)

DECONTAM_N = 8  # n-gram width for contamination matching
BENCH_EVERY = 50  # doc_id % BENCH_EVERY == 0 → held-out benchmark set

TFIDF_TOP_K = 3  # characteristic terms kept per document
STRATA_K = 100  # exact per-class sample quota


@query(
    "pack_documents_ctx",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len({TX.sql_words('text')}) AS n_tokens FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS tokens_before
        FROM toks
    )
    SELECT CAST(coalesce(tokens_before, 0) // {CTX_TOKENS} AS BIGINT) AS bin_id,
           count(*)      AS n_docs,
           min(doc_id)   AS first_doc,
           max(doc_id)   AS last_doc,
           sum(n_tokens) AS bin_tokens
    FROM cum
    GROUP BY 1
    ORDER BY bin_id
    """,
    doc="Context-window packing (concatenate-then-chunk, the standard "
    "LLM pretraining layout): documents in doc_id order are virtually "
    "concatenated and each doc is assigned to the context window where "
    "it STARTS (bin = tokens_before // CTX). The prefix sum is "
    "DISTRIBUTED two-phase: an in-block running sum (window partitioned "
    "by doc_id block — parallel) plus per-block offsets from a tiny "
    "aggregate joined back by broadcast — the scale-safe form of the "
    "oracle's single global window, proven equal to it differentially.",
)
def pack_documents_ctx(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        (F.col("doc_id") / PACK_BLOCK).cast("bigint").alias("blk"),
        F.size(TX.words(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    # Phase 1: running sum WITHIN each block — windows partitioned by
    # blk run in parallel across the cluster.
    in_blk = W.partitionBy("blk").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    # Phase 2: per-block totals, then each block's offset = sum of all
    # previous block totals — O(n_blocks) rows, a tiny window + broadcast.
    blk_tot = toks.groupBy("blk").agg(F.sum("n_tokens").alias("blk_tokens"))
    blk_off = blk_tot.withColumn(
        "blk_offset",
        F.coalesce(
            F.sum("blk_tokens").over(
                W.orderBy("blk").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("blk", "blk_offset")
    cum = (
        toks.withColumn("in_blk_before", F.coalesce(F.sum("n_tokens").over(in_blk), F.lit(0)))
        .join(F.broadcast(blk_off), "blk")
        .withColumn("tokens_before", F.col("blk_offset") + F.col("in_blk_before"))
    )
    return (
        cum.groupBy((F.col("tokens_before") / CTX_TOKENS).cast("bigint").alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .orderBy("bin_id")
    )


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest({TX.sql_words('text')}) AS word FROM documents
    ),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
    df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word, tf.tf, df.df,
               CAST(tf.tf AS DOUBLE) / df.df AS score,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.word)
                   AS rnk
        FROM tf JOIN df ON tf.word = df.word
    )
    SELECT doc_id, word, tf, df, score, rnk
    FROM scored WHERE rnk <= {TFIDF_TOP_K}
    ORDER BY doc_id, rnk
    """,
    doc="Characteristic-term extraction, the tf-idf shape: term "
    "frequency per (doc, word), document frequency per word (the "
    "vocabulary-sized aggregate joined back — broadcastable at any "
    "corpus size since vocab << corpus), score = tf/df, top-3 per doc "
    "by a per-doc ranking window. idf's log() is deliberately dropped: "
    "it is monotone in 1/df so rankings are identical, and tf/df is a "
    "single IEEE division both engines compute bit-identically (libm "
    "log differs in the last ulp across engines).",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    w = d.select("doc_id", F.explode(TX.words(F.col("text"))).alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = w.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    score = F.col("tf").cast("double") / F.col("df")
    win = W.partitionBy("doc_id").orderBy(F.desc("score"), "word")
    return (
        tf.join(F.broadcast(df_), "word")
        .withColumn("score", score)
        .withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "word", "tf", "df", "score", "rnk")
        .orderBy("doc_id", "rnk")
    )


@query(
    "stratified_sample_orders",
    oracle=f"""
    WITH ranked AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY sha256(CAST(o_orderkey AS VARCHAR)), o_orderkey)
                   AS rnk
        FROM orders
    )
    SELECT o_orderpriority AS priority,
           count(*)        AS n_sampled,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key,
           {sql_dsum('o_totalprice')} AS sampled_total
    FROM ranked WHERE rnk <= {STRATA_K}
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    doc=f"Stratified sampling with EXACT per-class quotas ({STRATA_K} "
    "orders per priority): rank within each stratum by the sha256 of "
    "the key — a deterministic, engine-identical shuffle order — and "
    "keep rank <= K. Unlike Bernoulli hash sampling "
    "(deterministic_sample), quotas are exact, which is what "
    "train/val/test splits and class-balanced subsets need; one "
    "hash-partitioned window per stratum, no driver involvement.",
)
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    win = W.partitionBy("o_orderpriority").orderBy(
        F.sha2(F.col("o_orderkey").cast("string"), 256), "o_orderkey"
    )
    return (
        o.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= STRATA_K)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            dsum("o_totalprice").alias("sampled_total"),
        )
        .orderBy("priority")
    )


@query(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {TX.sql_words('text')} AS w FROM documents
    ),
    grams AS (
        SELECT doc_id, g
        FROM w, unnest(CASE WHEN len(w.w) < {DECONTAM_N} THEN []::VARCHAR[]
                            ELSE list_distinct(list_transform(
                                range(1, len(w.w) - {DECONTAM_N} + 2),
                                i -> {" || ' ' || ".join(f"w.w[i+{k}]" for k in range(DECONTAM_N))}))
                       END) AS t(g)
    ),
    bench AS (SELECT doc_id AS bench_id, g FROM grams WHERE doc_id % {BENCH_EVERY} = 0),
    train AS (SELECT doc_id, g FROM grams WHERE doc_id % {BENCH_EVERY} <> 0)
    SELECT t.doc_id,
           count(DISTINCT t.g)        AS n_shared_ngrams,
           count(DISTINCT b.bench_id) AS n_benchmark_docs
    FROM train t JOIN bench b ON t.g = b.g
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    doc=f"Benchmark decontamination: flag training documents sharing any "
    f"word {DECONTAM_N}-gram with a held-out benchmark set (doc_id % "
    f"{BENCH_EVERY} = 0 stands in for the eval corpus). Candidates come "
    "from an equi-join on the n-gram (inverted-index shape — at 100 TB "
    "the join key becomes the n-gram's 64-bit hash and the benchmark "
    "side, being small, broadcasts, so the corpus never shuffles); "
    "output is per-doc shared-n-gram and matched-benchmark-doc counts "
    "for the removal/report step.",
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    # cache: the benchmark and train sides are two branches of this same
    # gram table — uncached, the shingle assembly (8-way concat per
    # position) runs twice. At 100 TB this is the materialized n-gram
    # table both sides would read.
    grams = managed_cache(d.select(
        "doc_id", F.explode(TX.shingles(TX.words(F.col("text")), n=DECONTAM_N)).alias("g")
    ))
    bench = grams.filter(F.col("doc_id") % BENCH_EVERY == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    train = grams.filter(F.col("doc_id") % BENCH_EVERY != 0)
    return (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_shared_ngrams"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
        .orderBy("doc_id")
    )


@query(
    "top_ngrams_corpus",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {TX.sql_words('text')} AS w FROM documents
    ),
    grams AS (
        SELECT doc_id, g
        FROM w, unnest(CASE WHEN len(w.w) < 2 THEN []::VARCHAR[]
                            ELSE list_transform(range(1, len(w.w)),
                                                i -> w.w[i] || ' ' || w.w[i+1])
                       END) AS t(g)
    )
    SELECT g AS bigram,
           count(*)                 AS n_occurrences,
           count(DISTINCT doc_id)   AS n_docs
    FROM grams
    GROUP BY g
    ORDER BY n_occurrences DESC, bigram
    LIMIT 20
    """,
    doc="Corpus-level top-k bigram frequencies (the vocabulary-stats "
    "pass a tokenizer-training / corpus-QA pipeline runs): explode "
    "word bigrams (NOT distinct per doc — occurrence counts), one "
    "hash aggregation on the bigram, top-20 via TakeOrderedAndProject "
    "(no global sort materializes). Map-side partial aggregation "
    "absorbs the heavy-hitter skew before the shuffle.",
)
def top_ngrams_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    w = TX.words(F.col("text"))
    gram = F.when(F.size(w) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        )
    )
    grams = d.select("doc_id", F.explode(gram).alias("bigram"))
    return (
        grams.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "bigram")
        .limit(20)
    )


HIST_BINS = 10


@query(
    "doc_length_histogram",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len({TX.sql_words('text')}) AS n_tokens FROM documents
    ),
    rng AS (SELECT min(n_tokens) AS lo, max(n_tokens) AS hi FROM t)
    SELECT LEAST(({HIST_BINS} * (n_tokens - lo)) // (hi - lo + 1),
                 {HIST_BINS} - 1)      AS bin_id,
           count(*)                    AS n_docs,
           min(n_tokens)               AS bin_min,
           max(n_tokens)               AS bin_max
    FROM t, rng
    GROUP BY 1
    ORDER BY bin_id
    """,
    doc="Document-length (token-count) histogram — the first profiling "
    "chart of any pretraining corpus: equal-width integer bins over the "
    "observed range. The 1-row min/max aggregate broadcasts onto the "
    "doc stream (the only sane plan — a cross join against a scalar), "
    "then one hash aggregation on bin id; pure integer arithmetic so "
    "both engines bin identically.",
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    t = d.select("doc_id", F.size(TX.words(F.col("text"))).cast("bigint").alias("n_tokens"))
    rng = t.agg(F.min("n_tokens").alias("lo"), F.max("n_tokens").alias("hi"))
    # Integer floor division on both sides: DuckDB's CAST(double AS
    # BIGINT) rounds while Spark's truncates — `//` vs floor() keeps the
    # binning in exact integer arithmetic instead.
    bin_id = F.least(
        F.floor(
            (F.lit(HIST_BINS) * (F.col("n_tokens") - F.col("lo")))
            / (F.col("hi") - F.col("lo") + 1)
        ).cast("bigint"),
        F.lit(HIST_BINS - 1).cast("bigint"),
    )
    return (
        t.crossJoin(F.broadcast(rng))
        .groupBy(bin_id.alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("bin_min"),
            F.max("n_tokens").alias("bin_max"),
        )
        .orderBy("bin_id")
    )


MIX_RATES = {"en": 1000, "de": 500, "fr": 250}  # per-mille keep rates
MIX_MOD = 1000


@query(
    "dataset_mix_by_lang",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
                   % {MIX_MOD} AS slot
        FROM documents
    )
    SELECT lang,
           count(*) AS n_total,
           count(*) FILTER (WHERE slot < CASE lang
               {' '.join(f"WHEN '{k}' THEN {v}" for k, v in MIX_RATES.items())}
               ELSE 100 END) AS n_kept,
           min(doc_id) FILTER (WHERE slot < CASE lang
               {' '.join(f"WHEN '{k}' THEN {v}" for k, v in MIX_RATES.items())}
               ELSE 100 END) AS first_kept
    FROM keyed
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Deterministic dataset mixing (the source-weighting step of a "
    "pretraining data recipe): each document hashes to a stable slot in "
    "[0, 1000) via sha256(doc_id), and each language keeps documents "
    "below its per-mille rate (en 100%, de 50%, fr 25%, others 10%). "
    "Hash-based mixing is reproducible across runs AND engines — unlike "
    "rand() sampling — and composes with packing/dedup downstream: a "
    "pure per-row projection + one aggregation, no shuffle of the kept "
    "rows themselves.",
)
def dataset_mix_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    slot = F.conv(F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 7), 16, 10).cast(
        "bigint"
    ) % MIX_MOD
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in MIX_RATES.items()],
        F.lit(100),
    )
    kept = F.col("slot") < F.col("rate")
    return (
        d.select("doc_id", "lang", slot.alias("slot"), rate.alias("rate"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.min(F.when(kept, F.col("doc_id"))).alias("first_kept"),
        )
        .orderBy("lang")
    )


BOILER_N = 3  # boilerplate shingle width
BOILER_DF = 5  # a shingle in >= this many docs is boilerplate


@query(
    "boilerplate_ngram_ratio",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {TX.sql_words('text')} AS w FROM documents
    ),
    grams AS (
        SELECT doc_id, g
        FROM w, unnest(CASE WHEN len(w.w) < {BOILER_N} THEN []::VARCHAR[]
                            ELSE list_distinct(list_transform(
                                range(1, len(w.w) - {BOILER_N} + 2),
                                i -> {" || ' ' || ".join(f"w.w[i+{k}]" for k in range(BOILER_N))}))
                       END) AS t(g)
    ),
    boiler AS (
        SELECT g FROM grams GROUP BY g
        HAVING count(DISTINCT doc_id) >= {BOILER_DF}
    )
    SELECT gr.doc_id,
           count(*) AS n_grams,
           count(b.g) AS n_boiler,
           CAST(count(b.g) AS DOUBLE) / count(*) AS boiler_ratio
    FROM grams gr LEFT JOIN boiler b ON gr.g = b.g
    GROUP BY gr.doc_id
    ORDER BY gr.doc_id
    """,
    doc=f"Boilerplate detection (the C4/RefinedWeb duplicate-phrase "
    f"metric): a word {BOILER_N}-gram appearing in >= {BOILER_DF} "
    "distinct documents is boilerplate; each document reports the "
    "fraction of its distinct shingles that are boilerplate — the "
    "score the cleaning step thresholds on. Two passes over an "
    "inverted-index gram table: doc-frequency aggregation, then a "
    "broadcast join of the (small) boilerplate set back onto per-doc "
    "grams. The corpus itself never shuffles on raw text; at 100 TB "
    "the gram key becomes its 64-bit hash.",
)
def boilerplate_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    grams = managed_cache(d.select(
        "doc_id", F.explode(TX.shingles(TX.words(F.col("text")), n=BOILER_N)).alias("g")
    ))
    boiler = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILER_DF)
        .select("g", F.lit(1).alias("is_boiler"))
    )
    return (
        grams.join(F.broadcast(boiler), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("is_boiler").alias("n_boiler"),
            (F.count("is_boiler").cast("double") / F.count(F.lit(1))).alias(
                "boiler_ratio"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "bigram_next_word",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {TX.sql_words('text')} AS w FROM documents
    ),
    bg AS (
        SELECT w.w[i] AS w1, w.w[i+1] AS w2, count(*) AS cnt
        FROM w, unnest(range(1, len(w.w))) AS t(i)
        GROUP BY w1, w2
    ),
    tot AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS total FROM bg GROUP BY w1),
    ranked AS (
        SELECT w1, w2, cnt,
               row_number() OVER (PARTITION BY w1 ORDER BY cnt DESC, w2) AS rn
        FROM bg
    )
    SELECT r.w1, r.w2 AS top_next, r.cnt AS pair_count, t.total AS w1_count,
           CAST(r.cnt AS DOUBLE) / t.total AS cond_prob
    FROM ranked r JOIN tot t ON t.w1 = r.w1
    WHERE r.rn = 1
    ORDER BY r.w1
    """,
    doc="Bigram language-model table (tokenizer/LM bootstrap statistics): "
    "corpus-wide adjacent-word pair counts, then each first-word's most "
    "likely successor with its conditional probability. Pair extraction "
    "is a posexplode over the word array (NON-distinct, unlike shingle "
    "dedup paths); counting is one hash aggregation on (w1, w2), and "
    "the per-w1 argmax is a ranking window over the (small) aggregated "
    "pair table, never over raw tokens.",
)
def bigram_next_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    d = spread(load(spark, sf_dir, "documents"))
    w = d.select(TX.words(F.col("text")).alias("w"))
    pairs = w.select(
        F.posexplode(F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0)))).alias(
            "i", "w1"
        ),
        F.col("w"),
    ).select("w1", F.element_at(F.col("w"), F.col("i") + 2).alias("w2"))
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    tot = bg.groupBy("w1").agg(F.sum("cnt").alias("total"))
    win = PW.partitionBy("w1").orderBy(F.desc("cnt"), F.asc("w2"))
    top = bg.withColumn("rn", F.row_number().over(win)).filter(F.col("rn") == 1)
    return (
        top.join(tot, "w1")
        .select(
            "w1",
            F.col("w2").alias("top_next"),
            F.col("cnt").alias("pair_count"),
            F.col("total").alias("w1_count"),
            (F.col("cnt").cast("double") / F.col("total")).alias("cond_prob"),
        )
        .orderBy("w1")
    )


RARE_DEN = 20  # a bigram with P(w2|w1) < 1/RARE_DEN is "rare"
FLAG_NUM, FLAG_DEN = 1, 2  # flag docs with rare_ratio > FLAG_NUM/FLAG_DEN


@query(
    "lm_rare_bigram_filter",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {TX.sql_words('text')} AS w FROM documents
    ),
    pairs AS (
        SELECT doc_id, w.w[i] AS w1, w.w[i+1] AS w2
        FROM w, unnest(range(1, len(w.w))) AS t(i)
    ),
    bg AS (SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY w1, w2),
    tot AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS total FROM bg GROUP BY w1)
    SELECT p.doc_id,
           count(*) AS n_bigrams,
           CAST(count(CASE WHEN b.cnt * {RARE_DEN} < t.total THEN 1 END) AS BIGINT)
               AS n_rare,
           CAST(count(CASE WHEN b.cnt * {RARE_DEN} < t.total THEN 1 END) AS DOUBLE)
               / count(*) AS rare_ratio,
           count(CASE WHEN b.cnt * {RARE_DEN} < t.total THEN 1 END) * {FLAG_DEN}
               > count(*) * {FLAG_NUM} AS flagged
    FROM pairs p
    JOIN bg b ON b.w1 = p.w1 AND b.w2 = p.w2
    JOIN tot t ON t.w1 = p.w1
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """,
    doc="Language-model quality filter (the CCNet/CC-100 perplexity-filter "
    f"shape, integer-exact): score each document by the fraction of its "
    f"word bigrams whose corpus conditional probability is below "
    f"1/{RARE_DEN}, flagging docs where more than "
    f"{FLAG_NUM}/{FLAG_DEN} of bigrams are rare. The rarity test is the "
    "integer comparison cnt*den < total — no logs, no floats — so both "
    "engines agree bit-for-bit where a log-perplexity would be at the "
    "mercy of libm ulp differences. Plan: one pair-extraction pass "
    "(posexplode, JVM-side), one hash agg for the LM table, an equi-join "
    "back on (w1,w2), and a per-doc agg. At 100 TB the join key becomes "
    "the 64-bit pair hash and the LM table is doc-frequency-pruned "
    "before the join-back; nothing is ever all-pairs.",
)
def lm_rare_bigram_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    w = d.select("doc_id", TX.words(F.col("text")).alias("w"))
    pairs = w.select(
        "doc_id",
        F.posexplode(
            F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0)))
        ).alias("i", "w1"),
        F.col("w"),
    ).select("doc_id", "w1", F.element_at(F.col("w"), F.col("i") + 2).alias("w2"))
    pairs = managed_cache(pairs)
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    tot = bg.groupBy("w1").agg(F.sum("cnt").alias("total"))
    rare = F.col("cnt") * RARE_DEN < F.col("total")
    return (
        pairs.join(bg, ["w1", "w2"])
        .join(tot, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count(F.when(rare, 1)).alias("n_rare"),
            (F.count(F.when(rare, 1)).cast("double") / F.count(F.lit(1))).alias(
                "rare_ratio"
            ),
            (
                F.count(F.when(rare, 1)) * FLAG_DEN > F.count(F.lit(1)) * FLAG_NUM
            ).alias("flagged"),
        )
        .orderBy("doc_id")
    )


# 16 hex buckets on a stable content key: 12 train / 2 val / 2 test.
SPLIT_TRAIN = tuple("0123456789ab")
SPLIT_VAL = ("c", "d")


@query(
    "split_train_val_test",
    oracle=f"""
    WITH tagged AS (
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN {SPLIT_TRAIN!r} THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN {SPLIT_VAL!r} THEN 'val'
                 ELSE 'test'
               END AS split,
               n_chars, lang
        FROM documents
    )
    SELECT split,
           count(*) AS n_docs,
           CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS share,
           CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*) AS avg_chars,
           count(DISTINCT lang) AS n_langs
    FROM tagged
    GROUP BY split
    ORDER BY split
    """,
    doc="Deterministic train/val/test split (the dataset-building "
    "primitive): bucket every document by the first hex digit of "
    "md5(doc_id) — 12/2/2 of 16 buckets = 75%/12.5%/12.5% — and report "
    "per-split size, share, mean length, and language coverage. md5 is "
    "bit-identical across engines (and across reshards/reruns at 100 TB: "
    "the assignment depends only on the row key, never on partitioning, "
    "row order, or cluster size). Single scan, one hash agg; the split "
    "column in production becomes a partition column so every later "
    "reader prunes to its split.",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    c = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    split = (
        F.when(c.isin(*SPLIT_TRAIN), "train")
        .when(c.isin(*SPLIT_VAL), "val")
        .otherwise("test")
    )
    agg = d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    total = W.partitionBy()
    return agg.select(
        "split",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(total)).alias("share"),
        (F.col("sum_chars").cast("double") / F.col("n_docs")).alias("avg_chars"),
        "n_langs",
    ).orderBy("split")


@query(
    "constraint_quality_report",
    oracle="""
    SELECT 'orders_rowcount' AS metric,
           CAST(count(*) AS DOUBLE) AS value FROM orders
    UNION ALL
    SELECT 'orders_orderkey_unique_ratio',
           CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*) FROM orders
    UNION ALL
    SELECT 'orders_totalprice_nonpositive',
           CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'orders_totalprice_min', min(o_totalprice) FROM orders
    UNION ALL
    SELECT 'orders_totalprice_max', max(o_totalprice) FROM orders
    UNION ALL
    SELECT 'lineitem_rowcount', CAST(count(*) AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT 'lineitem_quantity_null_count',
           CAST(count(CASE WHEN l_quantity IS NULL THEN 1 END) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range_violations',
           CAST(count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
                AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orphan_orderkeys',
           CAST(count(*) AS DOUBLE)
    FROM (SELECT DISTINCT l_orderkey FROM lineitem) li
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey)
    UNION ALL
    SELECT 'customer_mktsegment_cardinality',
           CAST(count(DISTINCT c_mktsegment) AS DOUBLE) FROM customer
    ORDER BY metric
    """,
    doc="Data-quality constraint suite (the Deequ/Great-Expectations "
    "shape): completeness, uniqueness, range-conformance, and "
    "referential-integrity metrics over the star schema, emitted as one "
    "long-format (metric, value) report. Each table is scanned once "
    "with all its metrics fused into a single aggregate; the "
    "referential check is a distinct-project + left-anti join on the "
    "join key (never a row-level anti join of the full fact table). "
    "This is the validation gate a 100 TB ingest runs before promoting "
    "a batch.",
)
def constraint_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    dbl = lambda col: col.cast("double")  # noqa: E731

    o_agg = o.agg(
        dbl(F.count(F.lit(1))).alias("orders_rowcount"),
        (F.countDistinct("o_orderkey").cast("double") / F.count(F.lit(1))).alias(
            "orders_orderkey_unique_ratio"
        ),
        dbl(F.count(F.when(F.col("o_totalprice") <= 0, 1))).alias(
            "orders_totalprice_nonpositive"
        ),
        F.min("o_totalprice").alias("orders_totalprice_min"),
        F.max("o_totalprice").alias("orders_totalprice_max"),
    )
    li_agg = li.agg(
        dbl(F.count(F.lit(1))).alias("lineitem_rowcount"),
        dbl(F.count(F.when(F.col("l_quantity").isNull(), 1))).alias(
            "lineitem_quantity_null_count"
        ),
        dbl(
            F.count(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1))
        ).alias("lineitem_discount_range_violations"),
    )
    orphans = (
        li.select("l_orderkey")
        .distinct()
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(dbl(F.count(F.lit(1))).alias("lineitem_orphan_orderkeys"))
    )
    c_agg = c.agg(
        dbl(F.countDistinct("c_mktsegment")).alias("customer_mktsegment_cardinality")
    )
    wide = o_agg.crossJoin(li_agg).crossJoin(orphans).crossJoin(c_agg)
    metrics = [
        "orders_rowcount",
        "orders_orderkey_unique_ratio",
        "orders_totalprice_nonpositive",
        "orders_totalprice_min",
        "orders_totalprice_max",
        "lineitem_rowcount",
        "lineitem_quantity_null_count",
        "lineitem_discount_range_violations",
        "lineitem_orphan_orderkeys",
        "customer_mktsegment_cardinality",
    ]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return wide.selectExpr(
        f"stack({len(metrics)}, {stack}) AS (metric, value)"
    ).orderBy("metric")


TOKEN_BUDGET = 50_000  # total token budget to allocate across sources


@query(
    "token_budget_allocation",
    oracle=f"""
    WITH per_source AS (
        SELECT source,
               CAST(sum(len({TX.sql_words('text')})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM per_source),
    quota AS (
        SELECT s.source, s.n_tokens,
               (s.n_tokens * {TOKEN_BUDGET}) // t.total        AS floor_alloc,
               (s.n_tokens * {TOKEN_BUDGET}) % t.total         AS remainder_num
        FROM per_source s, tot t
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY remainder_num DESC, source)
                   AS rem_rank,
               CAST({TOKEN_BUDGET} - sum(floor_alloc) OVER () AS BIGINT)
                   AS n_leftover
        FROM quota
    )
    SELECT source, n_tokens,
           CAST(floor_alloc + CASE WHEN rem_rank <= n_leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM ranked
    ORDER BY source
    """,
    doc=f"Token-budget allocation (the data-recipe step of corpus "
    f"assembly): split a {TOKEN_BUDGET}-token training budget across "
    "sources proportionally to their token counts using "
    "LARGEST-REMAINDER rounding — floor each quota, then hand the "
    "leftover tokens to the sources with the largest fractional "
    "remainders (remainder comparison stays in exact integer "
    "arithmetic: numerator n_tokens*budget % total, never a float "
    "quota). Allocations sum to the budget EXACTLY — the property "
    "naive per-source rounding loses. One agg over documents, then "
    "windows on the tiny per-source table.",
)
def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    d = spread(load(spark, sf_dir, "documents"))
    per_source = d.groupBy("source").agg(
        F.sum(F.size(TX.words(F.col("text")))).cast("bigint").alias("n_tokens")
    )
    tot = per_source.agg(F.sum("n_tokens").cast("bigint").alias("total"))
    quota = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(f"(n_tokens * {TOKEN_BUDGET}) div total").alias("floor_alloc"),
        ((F.col("n_tokens") * TOKEN_BUDGET) % F.col("total")).alias("remainder_num"),
    )
    allw = PW.partitionBy()
    ranked = quota.select(
        "source",
        "n_tokens",
        "floor_alloc",
        F.row_number()
        .over(PW.orderBy(F.desc("remainder_num"), F.asc("source")))
        .alias("rem_rank"),
        (F.lit(TOKEN_BUDGET) - F.sum("floor_alloc").over(allw))
        .cast("bigint")
        .alias("n_leftover"),
    )
    return ranked.select(
        "source",
        "n_tokens",
        (
            F.col("floor_alloc")
            + F.when(F.col("rem_rank") <= F.col("n_leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    ).orderBy("source")


BPE_TOP = 10  # report the top-N candidate merges


@query(
    "bpe_first_merges",
    oracle=f"""
    WITH w AS (
        SELECT unnest({TX.sql_words('text')}) AS word FROM documents
    ),
    pairs AS (
        SELECT substr(word, i, 1) AS c1, substr(word, i + 1, 1) AS c2,
               count(*) AS n
        FROM w, unnest(range(1, length(word))) AS t(i)
        WHERE length(word) >= 2
        GROUP BY c1, c2
    )
    SELECT c1, c2, n
    FROM pairs
    ORDER BY n DESC, c1, c2
    LIMIT {BPE_TOP}
    """,
    doc=f"BPE tokenizer bootstrap — the first merge step: count every "
    "ADJACENT CHARACTER PAIR inside every word across the corpus and "
    f"rank the top {BPE_TOP} merge candidates (byte-pair encoding "
    "picks argmax, then re-segments and repeats; each round is exactly "
    "this aggregation over the current symbol sequence). Pair "
    "extraction is a posexplode over word characters — rows = total "
    "corpus characters — feeding one map-side-combinable count on a "
    "key space of only |alphabet|², then a TakeOrderedAndProject "
    "top-k. Count tie-break is lexicographic, pinned in both engines.",
)
def bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    words = d.select(F.explode(TX.words(F.col("text"))).alias("word")).filter(
        F.length("word") >= 2
    )
    pairs = words.select(
        F.posexplode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")
        ).alias("i", "pair")
    ).select(
        F.substring("pair", 1, 1).alias("c1"), F.substring("pair", 2, 1).alias("c2")
    )
    return (
        pairs.groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "c1", "c2")
        .limit(BPE_TOP)
    )


FH_DIM = 1024  # hashing-trick feature dimension


@query(
    "feature_hashing_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct({TX.sql_words('text')})) AS tok
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, tok, {TX.sql_hash28('tok')} % {FH_DIM} AS bucket
        FROM toks
    ),
    per_doc AS (
        SELECT doc_id,
               count(*) AS n_tokens,
               count(DISTINCT bucket) AS nnz
        FROM hashed GROUP BY doc_id
    ),
    corpus AS (
        SELECT count(DISTINCT tok) AS vocab,
               count(DISTINCT bucket) AS occupied
        FROM hashed
    )
    SELECT p.doc_id, p.n_tokens, p.nnz,
           CAST(p.n_tokens - p.nnz AS BIGINT) AS doc_collisions,
           c.vocab, c.occupied,
           1.0 - CAST(c.occupied AS DOUBLE) / c.vocab AS corpus_collision_rate
    FROM per_doc p, corpus c
    ORDER BY p.doc_id
    """,
    doc=f"Feature hashing (the hashing trick): distinct document tokens "
    f"map to a fixed {FH_DIM}-dim space via hash %% {FH_DIM} — the "
    "vocabulary-free featurizer that makes bag-of-words viable at "
    "100 TB (no vocabulary table to build, broadcast, or keep "
    "consistent across shards; the encoder is a stateless scan-local "
    "expression). The query audits the trick's one cost: per-doc and "
    "corpus-wide collision loss (tokens sharing a bucket). All "
    "integer arithmetic off the shared 28-bit sha-carved token hash "
    "(functions/text.py) — the identical hash the dedup family uses.",
)
def feature_hashing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(TX.words(F.col("text")))).alias("tok"),
    )
    hashed = toks.select(
        "doc_id", "tok", (TX.hash28(F.col("tok")) % FH_DIM).alias("bucket")
    )
    per_doc = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("bucket").alias("nnz"),
    )
    corpus = hashed.agg(
        F.countDistinct("tok").alias("vocab"),
        F.countDistinct("bucket").alias("occupied"),
    )
    return (
        per_doc.crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "n_tokens",
            "nnz",
            (F.col("n_tokens") - F.col("nnz")).cast("bigint").alias("doc_collisions"),
            "vocab",
            "occupied",
            (F.lit(1.0) - F.col("occupied").cast("double") / F.col("vocab")).alias(
                "corpus_collision_rate"
            ),
        )
        .orderBy("doc_id")
    )


# Quality-classifier constants (shared by quality_classifier_scores
# below and the funnel's stage 5): fastText-style linear scorer over
# hashed BOW features, weights a closed-form integer function of the
# bucket so both engines compute the exact same integer score.
QC_BIAS = 3  # intercept
# Keep threshold: sits near the observed 30th percentile of the score
# distribution at sf0.01 (min -22, median 29, max 66), so the gate
# drops the low-quality tail (~25-30%) and keeps the head+middle — the
# CCNet-style operating point (a gate at score>0 kept 98% here because
# the corpus' shared vocabulary concentrates the scores).
QC_KEEP_MIN = 20


def _qc_weight_sql(bucket: str) -> str:
    return f"(({bucket}) * 37 + 11) % 21 - 10"


# Cleaning-funnel thresholds (integer-exact gates)
FUNNEL_MIN_WORDS = 20
FUNNEL_LANGS = ("de", "en", "es", "fr")  # keep these labeled languages
FUNNEL_REP_NUM, FUNNEL_REP_DEN = 1, 5  # drop if dup-3-grams > 1/5


def _funnel_stats_batches(it):
    """Arrow pass for the funnel's per-doc stats: word count, trigram
    count + distinct-trigram count (the repetition gate), and the
    stage-5 quality score (28-bit sha-carved bucket -> closed-form
    integer weight, identical to quality_classifier_scores). ONE batch
    pass replaces the size(array_distinct(transform(...))) expression —
    interpreted HOFs cost ~65-90 us/element (re-measured round 8 after
    the corpus regenerated at ~54 words/doc: the HOF form took the
    funnel from 1.4 s to ~20 s at sf0.1; this pass returns it to ~1 s)
    — and folds in the quality score so no doc-keyed join is needed.
    Gram distinctness over tuples == distinctness over the oracle's
    "a b c" strings (tokens cannot contain spaces)."""
    import hashlib

    import pandas as pd

    n = TX.SHINGLE_N
    for pdf in it:
        n_words, n_grams, n_distinct, scores = [], [], [], []
        for wl in pdf["w"]:
            toks = list(wl)
            n_words.append(len(toks))
            k = max(0, len(toks) - n + 1)
            n_grams.append(k)
            n_distinct.append(
                len({tuple(toks[i : i + n]) for i in range(k)})
            )
            score = QC_BIAS
            for tok in set(toks):
                b = (
                    int(
                        hashlib.sha256(tok.encode("utf-8")).hexdigest()[
                            : TX.SHINGLE_HEX_DIGITS
                        ],
                        16,
                    )
                    % FH_DIM
                )
                score += (b * 37 + 11) % 21 - 10
            scores.append(score)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "ltext": pdf["ltext"],
                "w": pdf["w"],  # passthrough: e2e_corpus_build_v2 needs it
                "n_words": n_words,
                "n_grams": n_grams,
                "n_distinct": n_distinct,
                "score": scores,
            }
        )


@query(
    "cleaning_funnel_report",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, lang, lower(text) AS ltext,
               {TX.sql_words('text')} AS w
        FROM documents
    ),
    g AS (
        SELECT *,
               len({TX.sql_grams_all('w')}) AS n_grams,
               len(list_distinct({TX.sql_grams_all('w')})) AS n_distinct
        FROM w
    ),
    canon AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(ltext)) AS keeper
        FROM g
    ),
    qc AS (
        SELECT doc_id,
               {QC_BIAS} + sum({_qc_weight_sql(f"{TX.sql_hash28('tok')} % {FH_DIM}")})
                   AS score
        FROM (SELECT doc_id, unnest(list_distinct(w)) AS tok FROM g)
        GROUP BY doc_id
    ),
    staged AS (
        SELECT g.doc_id,
               len(g.w) >= {FUNNEL_MIN_WORDS} AS s1,
               len(g.w) >= {FUNNEL_MIN_WORDS}
                   AND g.lang IN {FUNNEL_LANGS!r} AS s2,
               len(g.w) >= {FUNNEL_MIN_WORDS}
                   AND g.lang IN {FUNNEL_LANGS!r}
                   AND (g.n_grams - g.n_distinct) * {FUNNEL_REP_DEN}
                           <= g.n_grams * {FUNNEL_REP_NUM} AS s3,
               len(g.w) >= {FUNNEL_MIN_WORDS}
                   AND g.lang IN {FUNNEL_LANGS!r}
                   AND (g.n_grams - g.n_distinct) * {FUNNEL_REP_DEN}
                           <= g.n_grams * {FUNNEL_REP_NUM}
                   AND c.keeper = g.doc_id AS s4,
               len(g.w) >= {FUNNEL_MIN_WORDS}
                   AND g.lang IN {FUNNEL_LANGS!r}
                   AND (g.n_grams - g.n_distinct) * {FUNNEL_REP_DEN}
                           <= g.n_grams * {FUNNEL_REP_NUM}
                   AND c.keeper = g.doc_id
                   AND coalesce(q.score, {QC_BIAS}) >= {QC_KEEP_MIN} AS s5
        FROM g JOIN canon c ON c.doc_id = g.doc_id
        LEFT JOIN qc q ON q.doc_id = g.doc_id
    )
    SELECT stage, n_surviving,
           CAST(n_surviving AS DOUBLE)
               / first(n_surviving) OVER (ORDER BY stage
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS survival_rate
    FROM (
        SELECT '0_ingested' AS stage, count(*) AS n_surviving FROM staged
        UNION ALL
        SELECT '1_min_length', count(CASE WHEN s1 THEN 1 END) FROM staged
        UNION ALL
        SELECT '2_language', count(CASE WHEN s2 THEN 1 END) FROM staged
        UNION ALL
        SELECT '3_repetition', count(CASE WHEN s3 THEN 1 END) FROM staged
        UNION ALL
        SELECT '4_exact_dedup', count(CASE WHEN s4 THEN 1 END) FROM staged
        UNION ALL
        SELECT '5_quality', count(CASE WHEN s5 THEN 1 END) FROM staged
    )
    ORDER BY stage
    """,
    doc="The cleaning-funnel report — the headline artifact of every "
    "training-data pipeline: how many documents survive each "
    "successive filter (minimum length → allowed language → "
    "within-doc repetition → exact dedup keep-first → quality-"
    "classifier keep), with cumulative survival rates. All five gates "
    "are integer-exact (word counts, label membership, cross-"
    "multiplied repetition ratio, md5-group min, the linear scorer's "
    "integer dot product); the funnel is ONE scan + one content-hash "
    "window + one doc-keyed score join — "
    "each stage is a flag, not a materialized intermediate table, "
    "which is precisely how a 100 TB cleaning pass avoids writing "
    "four copies of the corpus.",
)
def cleaning_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    d = spread(load(spark, sf_dir, "documents"))
    base_cols = d.select(
        "doc_id",
        "lang",
        F.lower("text").alias("ltext"),
        TX.words(F.col("text")).alias("w"),
    )
    g = base_cols.mapInPandas(
        _funnel_stats_batches,
        "doc_id bigint, lang string, ltext string, w array<string>, "
        "n_words bigint, n_grams bigint, n_distinct bigint, score bigint",
    ).drop("w")
    keeper = F.min("doc_id").over(PW.partitionBy(F.md5(F.col("ltext").cast("binary"))))
    s1 = F.col("n_words") >= FUNNEL_MIN_WORDS
    s2 = s1 & F.col("lang").isin(*FUNNEL_LANGS)
    s3 = s2 & (
        (F.col("n_grams") - F.col("n_distinct")) * FUNNEL_REP_DEN
        <= F.col("n_grams") * FUNNEL_REP_NUM
    )
    staged = (
        g.withColumn("keeper", keeper)
        .select(
            s1.alias("s1"), s2.alias("s2"), s3.alias("s3"),
            (s3 & (F.col("keeper") == F.col("doc_id"))).alias("s4"),
            (
                s3
                & (F.col("keeper") == F.col("doc_id"))
                & (F.col("score") >= QC_KEEP_MIN)
            ).alias("s5"),
        )
    )
    counts = staged.agg(
        F.count(F.lit(1)).alias("0_ingested"),
        F.count(F.when(F.col("s1"), 1)).alias("1_min_length"),
        F.count(F.when(F.col("s2"), 1)).alias("2_language"),
        F.count(F.when(F.col("s3"), 1)).alias("3_repetition"),
        F.count(F.when(F.col("s4"), 1)).alias("4_exact_dedup"),
        F.count(F.when(F.col("s5"), 1)).alias("5_quality"),
    )
    stages = [
        "0_ingested", "1_min_length", "2_language", "3_repetition",
        "4_exact_dedup", "5_quality",
    ]
    stack = ", ".join(f"'{s}', `{s}`" for s in stages)
    long = counts.selectExpr(f"stack({len(stages)}, {stack}) AS (stage, n_surviving)")
    base = F.first("n_surviving").over(
        PW.orderBy("stage").rowsBetween(PW.unboundedPreceding, 0)
    )
    return long.select(
        "stage",
        "n_surviving",
        (F.col("n_surviving").cast("double") / base).alias("survival_rate"),
    ).orderBy("stage")


@query(
    "group_coherent_split_events",
    oracle=f"""
    WITH tagged AS (
        SELECT user_id, event_id, value,
               CASE
                 WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                      IN {SPLIT_TRAIN!r} THEN 'train'
                 WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                      IN {SPLIT_VAL!r} THEN 'val'
                 ELSE 'test'
               END AS split
        FROM events
    ),
    leak AS (
        SELECT CAST(coalesce(sum(n_splits - 1), 0) AS BIGINT) AS leaked_users
        FROM (SELECT user_id, count(DISTINCT split) AS n_splits
              FROM tagged GROUP BY user_id)
    )
    SELECT split,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           {sql_dsum('value')} AS total_value,
           (SELECT leaked_users FROM leak) AS leaked_users
    FROM tagged
    GROUP BY split
    ORDER BY split
    """,
    doc="GROUP-coherent train/val/test split: the split key is the GROUP "
    "(user_id), not the row, so every event of a user lands in exactly "
    "one split — the leakage-prevention form of split_train_val_test "
    "(row-keyed splitting of correlated rows leaks user behavior from "
    "train into test; for an LLM corpus the group is the source "
    "document/domain and the rows are its chunks). leaked_users "
    "recounts distinct splits per user from the tagged rows themselves "
    "and must be 0 — the invariant is computed, not assumed. Same "
    "md5-first-hex-digit bucketing: reshard/rerun-stable at 100 TB, "
    "one scan, one hash agg.",
)
def group_coherent_split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    first_hex = F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
    tagged = e.select(
        "user_id",
        "event_id",
        "value",
        F.when(first_hex.isin(*SPLIT_TRAIN), "train")
        .when(first_hex.isin(*SPLIT_VAL), "val")
        .otherwise("test")
        .alias("split"),
    )
    leak = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(
            F.coalesce(F.sum(F.col("n_splits") - 1), F.lit(0))
            .cast("bigint")
            .alias("leaked_users")
        )
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .crossJoin(F.broadcast(leak))
        .select("split", "n_users", "n_events", "total_value", "leaked_users")
        .orderBy("split")
    )


@query(
    "e2e_corpus_build",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, lang, lower(text) AS ltext, {TX.sql_words('text')} AS w
        FROM documents
    ),
    g AS (
        SELECT *,
               len({TX.sql_grams_all('w')}) AS n_grams,
               len(list_distinct({TX.sql_grams_all('w')})) AS n_distinct
        FROM w
    ),
    canon AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(ltext)) AS keeper FROM g
    ),
    kept AS (
        SELECT g.doc_id, g.lang, len(g.w) AS n_tok
        FROM g JOIN canon c ON c.doc_id = g.doc_id
        WHERE len(g.w) >= {FUNNEL_MIN_WORDS}
          AND g.lang IN {FUNNEL_LANGS!r}
          AND (g.n_grams - g.n_distinct) * {FUNNEL_REP_DEN}
                  <= g.n_grams * {FUNNEL_REP_NUM}
          AND c.keeper = g.doc_id
    ),
    tagged AS (
        SELECT *,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                        IN {SPLIT_TRAIN!r} THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                        IN {SPLIT_VAL!r} THEN 'val'
                    ELSE 'test'
               END AS split
        FROM kept
    )
    SELECT split,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(n_tok) // {CTX_TOKENS} AS BIGINT) AS n_ctx_windows,
           count(DISTINCT lang) AS n_langs
    FROM tagged
    GROUP BY split
    ORDER BY split
    """,
    doc="The corpus-build pipeline END-TO-END as one plan: quality gates "
    "(min length, allowed languages, Gopher repetition cut) → exact "
    "content dedup (md5 canonical election) → deterministic md5 "
    "train/val/test split → per-split token budget and full-context-"
    "window counts. Every stage reuses the exact constants and "
    "expressions of its standalone query (cleaning_funnel_report, "
    "dedup_exact, split_train_val_test, token budgets), so this is "
    "the composition proof: the engine runs the whole training-data "
    "DAG in one job — one documents scan, one dedup window, one hash "
    "agg — not four materialized intermediate corpora. At 100 TB the "
    "split column becomes the write partition and each stage's "
    "shuffle is the one its standalone query already pays.",
)
def e2e_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    d = spread(load(spark, sf_dir, "documents"))
    w = TX.words(F.col("text"))
    grams = TX.grams_all(w)
    g = d.select(
        "doc_id",
        "lang",
        F.lower("text").alias("ltext"),
        F.size(w).alias("n_tok"),
        F.size(grams).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct"),
    )
    keeper = F.min("doc_id").over(PW.partitionBy(F.md5(F.col("ltext").cast("binary"))))
    kept = (
        g.withColumn("keeper", keeper)
        .filter(
            (F.col("n_tok") >= FUNNEL_MIN_WORDS)
            & F.col("lang").isin(*FUNNEL_LANGS)
            & (
                (F.col("n_grams") - F.col("n_distinct")) * FUNNEL_REP_DEN
                <= F.col("n_grams") * FUNNEL_REP_NUM
            )
            & (F.col("keeper") == F.col("doc_id"))
        )
        .select("doc_id", "lang", "n_tok")
    )
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    tagged = kept.withColumn(
        "split",
        F.when(first_hex.isin(*SPLIT_TRAIN), "train")
        .when(first_hex.isin(*SPLIT_VAL), "val")
        .otherwise("test"),
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.floor(F.sum("n_tok") / CTX_TOKENS).cast("bigint").alias("n_ctx_windows"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


@query(
    "dq_quarantine_split",
    oracle="""
    WITH flagged AS (
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_totalprice <= 900 THEN 1 ELSE 0 END
               + CASE WHEN o_orderkey % 1000 = 0 THEN 2 ELSE 0 END
               + CASE WHEN o_orderpriority NOT IN
                      ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                      THEN 4 ELSE 0 END AS reasons
        FROM orders
    )
    SELECT 'clean' AS bucket, count(*) AS n_rows,
           CAST(CAST(sum(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(20,2))) AS VARCHAR)
                AS DOUBLE) AS total_price
    FROM flagged WHERE reasons = 0
    UNION ALL
    SELECT 'q_low_price', count(*),
           CAST(CAST(sum(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(20,2))) AS VARCHAR)
                AS DOUBLE)
    FROM flagged WHERE reasons & 1 = 1
    UNION ALL
    SELECT 'q_key_rule', count(*),
           CAST(CAST(sum(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(20,2))) AS VARCHAR)
                AS DOUBLE)
    FROM flagged WHERE reasons & 2 = 2
    ORDER BY bucket
    """,
    doc="Row-level data-quality quarantine split (the ingestion "
    "companion to the table-level constraint_quality_report): every "
    "rule failure sets a bit in a per-row reason BITMAP computed in "
    "ONE scan, so clean rows, each quarantine bucket, and rows "
    "failing MULTIPLE rules (counted in every bucket they violate) "
    "all come from the same pass — no per-rule rescans, and the "
    "bitmap column is exactly what a production pipeline writes "
    "alongside quarantined rows so triage can group by failure "
    "combination. Demo rules: price floor, synthetic key rule, "
    "priority domain check (never fires — pinned empty bucket guards "
    "against silent rule evaporation are in the counts).",
)
def dq_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    valid_pri = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    reasons = (
        F.when(F.col("o_totalprice") <= 900, 1).otherwise(0)
        + F.when(F.col("o_orderkey") % 1000 == 0, 2).otherwise(0)
        + F.when(~F.col("o_orderpriority").isin(*valid_pri), 4).otherwise(0)
    )
    flagged = o.select("o_totalprice", reasons.alias("reasons"))
    price_sum = F.sum(F.col("o_totalprice").cast("decimal(20,2)")).cast("double")

    def bucket(name, cond):
        return flagged.filter(cond).agg(
            F.lit(name).alias("bucket"),
            F.count(F.lit(1)).alias("n_rows"),
            price_sum.alias("total_price"),
        ).select("bucket", "n_rows", "total_price")

    return (
        bucket("clean", F.col("reasons") == 0)
        .unionByName(bucket("q_low_price", F.col("reasons").bitwiseAND(1) == 1))
        .unionByName(bucket("q_key_rule", F.col("reasons").bitwiseAND(2) == 2))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Temperature-sampled multilingual mixing (the mT5/XLM-R alpha recipe)
# ---------------------------------------------------------------------------

TEMP_MIX_BUDGET = 10_000  # documents in the mixed corpus
# alpha = 0.5 exactly, because p_l ∝ n_l^0.5 = sqrt(n_l) and IEEE sqrt is
# CORRECTLY ROUNDED in both engines — bit-identical weights without the
# libm pow() divergence any other temperature would risk cross-engine.


@query(
    "temperature_mix_allocation",
    oracle=f"""
    WITH lc AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    w AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS wt FROM lc),
    tot AS (SELECT {sql_dsum('wt', 18)} AS tw FROM w),
    alloc AS (
        SELECT lang, n, wt / t.tw AS p,
               CAST(floor({TEMP_MIX_BUDGET} * (wt / t.tw)) AS BIGINT) AS base,
               {TEMP_MIX_BUDGET} * (wt / t.tw)
                   - floor({TEMP_MIX_BUDGET} * (wt / t.tw)) AS rem
        FROM w, tot t
    ),
    fin AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, lang) AS rk,
               (SELECT {TEMP_MIX_BUDGET} - sum(base) FROM alloc) AS leftover
        FROM alloc
    )
    SELECT lang, n AS n_docs, p AS sample_prob,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS quota,
           (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
               / CAST(n AS DOUBLE) AS sampling_factor
    FROM fin
    ORDER BY lang
    """,
    doc="TEMPERATURE-SAMPLED multilingual mixing (the mT5/XLM-R recipe): "
    "per-language sampling probability p_l ∝ n_l^α flattens the natural "
    "distribution so high-resource languages stop drowning the tail — "
    "α = 0.5 here, deliberately, because sqrt is correctly rounded in "
    "IEEE so both engines derive bit-identical weights (arbitrary α "
    "rides on libm pow(), which is not). The document budget is then "
    "allocated by largest-remainder rounding (quotas sum EXACTLY to "
    "the budget — floor-only allocation silently under-fills), and the "
    "per-language sampling_factor (>1 = upsample with repeats, <1 = "
    "subsample) is what a downstream mixer feeds into hash-based "
    "selection (dataset_mix_by_lang). Derives the rates the fixed-rate "
    "mix query consumes; one tiny per-language aggregate — the corpus "
    "scan is the only data-sized pass, everything after is |lang| "
    "rows.",
)
def temperature_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lc = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("wt", F.sqrt(F.col("n").cast("double")))
    )
    tot = lc.agg(dsum("wt", 18).alias("tw"))
    alloc = (
        lc.crossJoin(F.broadcast(tot))
        .withColumn("p", F.col("wt") / F.col("tw"))
        .withColumn(
            "base",
            F.floor(F.lit(TEMP_MIX_BUDGET) * F.col("p")).cast("bigint"),
        )
        .withColumn(
            "rem", F.lit(TEMP_MIX_BUDGET) * F.col("p") - F.floor(F.lit(TEMP_MIX_BUDGET) * F.col("p"))
        )
    )
    leftover = alloc.agg(
        (F.lit(TEMP_MIX_BUDGET) - F.sum("base")).alias("leftover")
    )
    fin = (
        alloc.crossJoin(F.broadcast(leftover))
        .withColumn("rk", F.row_number().over(W.orderBy(F.desc("rem"), "lang")))
        .withColumn(
            "quota",
            (F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)).cast(
                "bigint"
            ),
        )
    )
    return fin.select(
        "lang",
        F.col("n").alias("n_docs"),
        F.col("p").alias("sample_prob"),
        "quota",
        (F.col("quota") / F.col("n").cast("double")).alias("sampling_factor"),
    ).orderBy("lang")


# --- Priority sampling (Duffield-Lund-Thorup) with estimator audit --------

PS_K = 100                       # sample size
PS_PRIME = 2_147_483_647         # u-surrogate modulus (Mersenne 2^31-1)
PS_A, PS_B = 1_103_515_245, 12_345  # LCG constants (functions/text.py)


@query(
    "priority_sample_orders",
    oracle=f"""
    WITH w AS (
        SELECT o_orderkey AS key, o_totalprice AS wt,
               (({PS_A}::BIGINT * o_orderkey + {PS_B}) % {PS_PRIME}) AS h
        FROM orders
    ),
    p AS (SELECT key, wt,
                 wt * (CAST({PS_PRIME} AS DOUBLE) / (h + 1)) AS priority
          FROM w),
    r AS (SELECT key, wt, priority,
                 row_number() OVER (ORDER BY priority DESC, key) AS rk
          FROM p),
    tau AS (SELECT priority AS tau FROM r WHERE rk = {PS_K + 1}),
    s AS (SELECT r.wt, tau.tau FROM r, tau WHERE r.rk <= {PS_K}),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
                   {sql_dsum('wt')} AS true_total FROM w),
    est AS (SELECT {sql_dsum('greatest(wt, tau)', 18)} AS est_total FROM s)
    SELECT {PS_K} AS k, tot.n_total, tot.true_total, est.est_total,
           (est.est_total - tot.true_total) / tot.true_total AS rel_err
    FROM tot, est
    """,
    doc=f"WEIGHTED PRIORITY SAMPLING (Duffield/Lund/Thorup, JACM '07) "
    f"of {PS_K} orders by o_totalprice, with the unbiased-estimator "
    "audit: each item gets priority w/u for a deterministic uniform "
    "u-surrogate ((LCG(key)+1)/P — exact int64 math, the repo's "
    "MinHash constants), the top-k by priority are the sample, and "
    "the total-weight estimator sums max(w, tau) with tau the "
    "(k+1)-th priority. The audit emits the estimate NEXT TO the true "
    "total and their relative error — the property that makes "
    "priority sampling production-grade for weighted subset selection "
    "(loss-weighted data selection, cost-weighted query sampling). "
    "Determinism: priorities are single-expression doubles from exact "
    "integers, the estimator sums via exact decimals (scale 18 — "
    "full-precision tau converts exactly), divisions are of identical "
    "doubles. Scale shape: one TakeOrderedAndProject-style top-(k+1) "
    "selection (no global sort materialization), the true total is a "
    "partial-aggregable decimal sum, and the k-row sample broadcasts.",
)
def priority_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("wt")
    )
    h = (F.lit(PS_A).cast("bigint") * F.col("key") + F.lit(PS_B)) % F.lit(PS_PRIME)
    p = o.withColumn(
        "priority", F.col("wt") * (F.lit(float(PS_PRIME)) / (h + F.lit(1)))
    )
    # Distributed top-(k+1): orderBy().limit() plans as
    # TakeOrderedAndProject (per-partition heaps + driver merge) — no
    # global sort, no single-partition window over the full table. The
    # ranking window then runs over only k+1 rows.
    top = p.orderBy(F.desc("priority"), "key").limit(PS_K + 1)
    win = W.orderBy(F.desc("priority"), "key")
    r = top.withColumn("rk", F.row_number().over(win))
    tau = r.filter(F.col("rk") == PS_K + 1).select(F.col("priority").alias("tau"))
    s = r.filter(F.col("rk") <= PS_K).crossJoin(F.broadcast(tau))
    tot = o.agg(
        F.count(F.lit(1)).alias("n_total"), dsum("wt").alias("true_total")
    )
    est = s.agg(
        dsum(F.greatest(F.col("wt"), F.col("tau")), 18).alias("est_total")
    )
    return (
        tot.crossJoin(F.broadcast(est))
        .select(
            F.lit(PS_K).alias("k"),
            "n_total",
            "true_total",
            "est_total",
            (
                (F.col("est_total") - F.col("true_total")) / F.col("true_total")
            ).alias("rel_err"),
        )
    )


# --- Split-leakage audit: dup groups straddling train/val/test ------------

from .dedup import SQL_DOCS_EXACT as _SQL_DOCS_EXACT  # noqa: E402


def _sql_split(key: str) -> str:
    return f"""CASE
        WHEN substr(md5(CAST({key} AS VARCHAR)), 1, 1)
             IN {SPLIT_TRAIN!r} THEN 'train'
        WHEN substr(md5(CAST({key} AS VARCHAR)), 1, 1)
             IN {SPLIT_VAL!r} THEN 'val'
        ELSE 'test' END"""


def _split_col(key):
    c = F.substring(F.md5(key.cast("string").cast("binary")), 1, 1)
    return (
        F.when(c.isin(*SPLIT_TRAIN), "train")
        .when(c.isin(*SPLIT_VAL), "val")
        .otherwise("test")
    )


@query(
    "split_leakage_audit",
    oracle=f"""
    WITH aug AS ({_SQL_DOCS_EXACT}),
    t AS (SELECT doc_id, sha256(text) AS sha,
                 {_sql_split('doc_id')} AS split
          FROM aug),
    p AS (SELECT a.sha,
                 least(a.split, b.split) AS split_a,
                 greatest(a.split, b.split) AS split_b
          FROM t a JOIN t b ON a.sha = b.sha AND a.doc_id < b.doc_id
          WHERE a.split <> b.split)
    SELECT split_a, split_b,
           CAST(count(*) AS BIGINT) AS n_leaked_pairs,
           CAST(count(DISTINCT sha) AS BIGINT) AS n_leaked_groups
    FROM p GROUP BY split_a, split_b
    ORDER BY split_a, split_b
    """,
    doc="SPLIT-LEAKAGE audit: duplicate-content groups whose members "
    "land in DIFFERENT train/val/test splits — the eval-contamination "
    "failure the benchmark-decontamination query guards against, but "
    "between a dataset's own splits: a val document with a training-"
    "set twin inflates eval scores. Content groups come from the "
    "sha256 exact-dedup relation (the planted-copy corpus guarantees "
    "non-empty groups to audit), split assignment is the same "
    "md5(doc_id) rule as split_train_val_test, and the audit counts "
    "leaked pairs and groups per unordered split pair. One shuffle on "
    "the content hash (groups are tiny, the self-join is within-"
    "group), integers only. At 100 TB this is the CI gate run after "
    "every dataset build: any (train, val)/(train, test) row here "
    "means re-canonicalize-or-drop before training.",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import docs_with_exact_copies

    t = docs_with_exact_copies(spark, sf_dir).select(
        "doc_id",
        F.sha2("text", 256).alias("sha"),
        _split_col(F.col("doc_id")).alias("split"),
    )
    a = t.select(
        F.col("doc_id").alias("id_a"), "sha", F.col("split").alias("sa")
    )
    b = t.select(
        F.col("doc_id").alias("id_b"), "sha", F.col("split").alias("sb")
    )
    return (
        a.join(b, "sha")
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("sa") != F.col("sb")))
        .select(
            "sha",
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("n_leaked_pairs"),
            F.countDistinct("sha").alias("n_leaked_groups"),
        )
        .orderBy("split_a", "split_b")
    )


# ---------------------------------------------------------------------------
# Embedding-space benchmark decontamination (the semantic complement of
# decontam_ngram_overlap: paraphrased eval contamination that n-gram
# overlap misses, caught by vector similarity)
# ---------------------------------------------------------------------------

from ..functions import vectors as VX  # noqa: E402
from .dedup import SQL_VECS_SCALED as _SQL_VECS_SCALED  # noqa: E402
from .dedup import VEC_OFFSET as _VEC_OFFSET  # noqa: E402
from .dedup import vecs_with_scaled_copies as _vecs_scaled  # noqa: E402

DECON_COS_T = 0.99  # flag train vectors this close to any benchmark vector


@query(
    "decontam_embedding_knn",
    oracle=f"""
    WITH aug AS ({_SQL_VECS_SCALED}),
    bk AS (SELECT vec_id, label, v, {VX.sql_lsh_bucket('v')} AS bucket FROM aug),
    train AS (SELECT * FROM bk WHERE vec_id < {_VEC_OFFSET}),
    bench AS (SELECT * FROM bk WHERE vec_id >= {_VEC_OFFSET})
    SELECT t.vec_id AS train_id, b.vec_id AS bench_id, t.label AS label,
           {VX.sql_cosine('t.v', 'b.v')} AS cosine
    FROM train t JOIN bench b ON t.bucket = b.bucket
    WHERE {VX.sql_cosine('t.v', 'b.v')} >= {DECON_COS_T}
    ORDER BY train_id, bench_id
    """,
    doc="EMBEDDING-SPACE benchmark decontamination: training vectors "
    "whose cosine to ANY benchmark-set vector clears "
    f"{DECON_COS_T} are flagged for removal — the semantic twin of "
    "decontam_ngram_overlap (n-gram overlap catches verbatim "
    "contamination; embedding similarity catches paraphrase). The "
    "planted scaled copies stand in for the benchmark set (cosine 1.0 "
    "to their train originals). Candidates come from a hyperplane-LSH "
    "bucket equi-join — but unlike the corpus self-join in "
    "dedup_embedding_cosine, this join is ASYMMETRIC: the benchmark "
    "side is tiny and broadcast, so per-train-row work is bounded by "
    "the benchmark bucket occupancy and no hot-bucket guard is needed. "
    "100 TB: the corpus is scanned once, never shuffled; the benchmark "
    "index ships with every executor. Exact cosine verify uses the "
    "order-deterministic fold (bit-identical vs DuckDB).",
)
def decontam_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-row norms on both bucket-join sides (r14, VX.cosine_pre)
    aug = (
        _vecs_scaled(spark, sf_dir)
        .withColumn("bucket", VX.lsh_bucket(F.col("v")))
        .withColumn("nv", VX.norm(F.col("v")))
    )
    train = aug.filter(F.col("vec_id") < _VEC_OFFSET)
    bench = aug.filter(F.col("vec_id") >= _VEC_OFFSET).select(
        F.col("vec_id").alias("bench_id"),
        F.col("v").alias("bv"),
        F.col("bucket").alias("bbucket"),
        F.col("nv").alias("nbv"),
    )
    cos = VX.cosine_pre(F.col("v"), F.col("bv"), F.col("nv"), F.col("nbv"))
    return (
        train.join(F.broadcast(bench), F.col("bucket") == F.col("bbucket"))
        .select(
            F.col("vec_id").alias("train_id"),
            "bench_id",
            "label",
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= DECON_COS_T)
        .orderBy("train_id", "bench_id")
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap — with-replacement resampling that scales
# ---------------------------------------------------------------------------

# The classic bootstrap needs a global 0..n-1 row index to draw from
# (driver-side n, single-partition row_number). The POISSON bootstrap
# (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
# Google 2012) replaces index draws with per-row replicate
# multiplicities m ~ Poisson(1) — one scan, no global state, exactly the
# map-side-combinable shape a 100 TB table needs. Here the multiplicity
# is DETERMINISTIC: a per-(row, replicate) LCG hash mapped through the
# Poisson(1) inverse CDF with integer thresholds (CDF * 2^20 as literal
# constants — no libm at query time), so both engines draw the exact
# same resamples.
PB_B = 8  # bootstrap replicates
PB_A, PB_C = 1_103_515_245, 12_345
PB_MOD = 2_147_483_647
PB_SCALE = 1 << 20
# floor(CDF_Poisson(1)(k) * 2^20) for k = 0..5; h >= last -> m = 6
PB_T = (385_749, 771_499, 964_373, 1_028_665, 1_044_738, 1_047_952)


def _pb_sql_m(h: str) -> str:
    cases = " ".join(f"WHEN {h} < {t} THEN {i}" for i, t in enumerate(PB_T))
    return f"(CASE {cases} ELSE 6 END)"


@query(
    "poisson_bootstrap_totals",
    oracle=f"""
    WITH d AS (
        SELECT t.r,
               o.o_totalprice,
               (({PB_A}::BIGINT * (o.o_orderkey * {PB_B} + t.r) + {PB_C})
                 % {PB_MOD}) % {PB_SCALE} AS h
        FROM orders o CROSS JOIN range(0, {PB_B}) t(r)
    ),
    dm AS (SELECT r, o_totalprice, {_pb_sql_m('h')} AS m FROM d)
    SELECT r AS replicate,
           CAST(sum(m) AS BIGINT) AS n_draws,
           CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_hit,
           {sql_dsum('o_totalprice * m')} AS total_price
    FROM dm GROUP BY r ORDER BY replicate
    """,
    doc=f"POISSON BOOTSTRAP ({PB_B} replicates) over order totals — "
    "with-replacement resampling WITHOUT a global row index: each row "
    "contributes multiplicity m to each replicate, m = deterministic "
    "per-(row, replicate) LCG hash passed through the Poisson(1) "
    "inverse CDF (integer thresholds = floor(CDF * 2^20) as literals, "
    "so no transcendental evaluates at query time and both engines "
    "draw identical resamples). Per replicate: total draws, distinct "
    "rows hit (~63.2% of n, the bootstrap's classic signature), and "
    "the exact decimal resample total — the spread across replicates "
    "IS the uncertainty estimate. 100 TB: one scan, B multiplicities "
    "per row, fully partial-aggregable — the Chamandy et al. shape; "
    "the driver-side-index bootstrap cannot run at that scale.",
)
def poisson_bootstrap_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    d = o.select(
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(PB_B - 1))).alias("r"),
        F.col("o_orderkey").alias("k"),
    ).withColumn(
        "h",
        ((F.lit(PB_A).cast("bigint") * (F.col("k") * PB_B + F.col("r")) + PB_C) % PB_MOD)
        % PB_SCALE,
    )
    m = F.when(F.col("h") < PB_T[0], 0)
    for i, t in enumerate(PB_T[1:], start=1):
        m = m.when(F.col("h") < t, i)
    m = m.otherwise(6)
    return (
        d.withColumn("m", m)
        .groupBy(F.col("r").alias("replicate"))
        .agg(
            F.sum("m").cast("bigint").alias("n_draws"),
            F.sum(F.when(F.col("m") > 0, 1).otherwise(0)).cast("bigint").alias("n_rows_hit"),
            dsum(F.col("o_totalprice") * F.col("m")).alias("total_price"),
        )
        .orderBy("replicate")
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding (categorical featurization)
# ---------------------------------------------------------------------------

TE_PRIOR = 10   # smoothing pseudo-count toward the global mean
TE_MOD = 97     # deterministic output subset: o_orderkey % TE_MOD == 0


@query(
    "target_encoding_loo",
    oracle=f"""
    WITH j AS (
        SELECT o.o_orderkey, c.c_mktsegment AS seg,
               CAST(CAST(o.o_totalprice AS VARCHAR) AS DECIMAL(25,2)) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    st AS (
        SELECT seg, CAST(count(*) AS BIGINT) AS n, sum(y) AS s
        FROM j GROUP BY seg
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS gn,
               CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS gs
        FROM j
    )
    SELECT j.o_orderkey, j.seg, st.n AS n_cat,
           CAST(CAST(st.s - j.y AS VARCHAR) AS DOUBLE)
               / CAST(st.n - 1 AS DOUBLE) AS loo_mean,
           (CAST(CAST(st.s - j.y AS VARCHAR) AS DOUBLE)
            + CAST({TE_PRIOR} AS DOUBLE) * (g.gs / CAST(g.gn AS DOUBLE)))
           / (CAST(st.n - 1 AS DOUBLE) + CAST({TE_PRIOR} AS DOUBLE))
               AS smoothed_loo
    FROM j JOIN st ON st.seg = j.seg CROSS JOIN g
    WHERE j.o_orderkey % {TE_MOD} = 0
    ORDER BY j.o_orderkey
    """,
    doc="LEAVE-ONE-OUT TARGET ENCODING of a categorical feature "
    "(market segment -> mean order total), the standard high-"
    "cardinality featurization for tabular ML: each row's encoding "
    "is its category's target mean EXCLUDING the row itself — "
    "(sum_cat - y_i)/(n_cat - 1) — which is what prevents the "
    "target-leakage a naive category mean injects; plus the "
    f"m-estimate smoothed variant (prior weight {TE_PRIOR} toward "
    "the global mean) that tames rare categories. Determinism: "
    "per-category sums are EXACT decimals, each row's numerator is "
    "one exact decimal subtraction cast once to double (text-hop "
    "policy on the DuckDB side), and the remaining arithmetic is an "
    "identical IEEE op chain in both engines. Category stats are a "
    "partial-aggregable one-pass rollup re-joined via BROADCAST "
    "(categories are few even when rows are 100 TB), so the fact "
    "table never shuffles; output is a deterministic orderkey-"
    "modulus slice so the differential stays hash-sized while "
    "stats still cover every row.",
)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").cast("decimal(25,2)").alias("y"),
    )
    j = managed_cache(j)
    st = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("y").alias("s")
    )
    g = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("gn"),
        F.sum("y").cast("double").alias("gs"),
    )
    prior = F.lit(TE_PRIOR).cast("double")
    num = (F.col("s") - F.col("y")).cast("double")
    return (
        j.filter(F.col("o_orderkey") % TE_MOD == 0)
        .join(F.broadcast(st), "seg")
        .crossJoin(F.broadcast(g))
        .select(
            "o_orderkey",
            "seg",
            F.col("n").alias("n_cat"),
            (num / (F.col("n") - 1).cast("double")).alias("loo_mean"),
            (
                (num + prior * (F.col("gs") / F.col("gn").cast("double")))
                / ((F.col("n") - 1).cast("double") + prior)
            ).alias("smoothed_loo"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# StringIndexer + one-hot encoding (categorical featurization)
# ---------------------------------------------------------------------------


@query(
    "string_indexer_onehot",
    oracle="""
    WITH c AS (
        SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_brand
    ),
    idx AS (
        SELECT brand, n_parts,
               CAST(row_number() OVER (ORDER BY n_parts DESC, brand) - 1 AS INT)
                   AS category_index,
               CAST(count(*) OVER () AS INT) AS n_categories
        FROM c
    )
    SELECT brand, n_parts, category_index,
           CAST(1 AS BIGINT) << category_index AS one_hot_mask,
           array_to_string(list_transform(range(0, n_categories),
                           i -> CASE WHEN i = category_index
                                     THEN 1 ELSE 0 END), ',') AS one_hot
    FROM idx
    ORDER BY category_index
    """,
    doc="STRING-INDEXER + ONE-HOT encoding of a categorical column "
    "(Spark MLlib's StringIndexer/OneHotEncoder semantics "
    "re-expressed relationally, with the tie broken "
    "DETERMINISTICALLY): categories indexed by frequency descending "
    "— index 0 = most frequent, MLlib's frequencyDesc — with "
    "alphabetical tie-break (MLlib's tie order is undefined; "
    "spelling it out is what makes the encoding reproducible across "
    "runs AND engines), then expanded to a dense 0/1 indicator "
    "vector sized to the category count. All integers. 100 TB: the "
    "category dictionary is one partial-aggregable count over the "
    "fact column (the dictionary itself is small by definition — "
    "a high-cardinality column belongs to feature_hashing_stats, "
    "the vocabulary-free sibling); the window runs over the "
    "dictionary, never the data; applying the encoding downstream "
    "is a broadcast join.",
)
def string_indexer_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select(F.col("p_brand").alias("brand"))
    c = p.groupBy("brand").agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    idx = c.select(
        "brand",
        "n_parts",
        (F.row_number().over(W.orderBy(F.desc("n_parts"), "brand")) - 1)
        .cast("int")
        .alias("category_index"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("int").alias("n_categories"),
    )
    one_hot = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.col("n_categories") - 1),
            lambda i: F.when(i == F.col("category_index"), 1).otherwise(0).cast("int"),
        ),
        ",",
    )
    return (
        idx.select(
            "brand",
            "n_parts",
            "category_index",
            F.expr("shiftleft(CAST(1 AS BIGINT), category_index)").alias(
                "one_hot_mask"
            ),
            one_hot.alias("one_hot"),
        )
        .orderBy("category_index")
    )


# --------------------------------------------------------------------------
# Quality-classifier inference (the fastText-style linear gate)
# --------------------------------------------------------------------------

# The #1 quality gate in production cleaning stacks (CCNet / fastText
# langid-quality, GPT-3 "WebText classifier", Llama's quality scorer) is
# linear-model inference over hashed bag-of-words features. Inference =
# one dot product per doc between its hashed feature set and a FIXED
# weight vector. Here the trained weights are a closed-form integer
# function of the bucket — w(b) = (b*37 + 11) % 21 - 10, range [-10,10]
# — so the whole scorer is exact integer arithmetic and the DuckDB
# differential needs no float policy; in production the trained
# FH_DIM-sized vector is a broadcast lookup table instead (a few KB —
# the fact table never shuffles either way, same story as the LOO
# target encoder). Constants + the weight expression live next to the
# cleaning funnel above (the funnel's stage-5 oracle f-string needs
# them at decoration time).


@query(
    "quality_classifier_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct({TX.sql_words('text')})) AS tok
        FROM documents
    ),
    feat AS (
        SELECT doc_id, {TX.sql_hash28('tok')} % {FH_DIM} AS bucket
        FROM toks
    ),
    scored AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_features,
               CAST({QC_BIAS} + sum({_qc_weight_sql('bucket')}) AS BIGINT)
                   AS score
        FROM feat GROUP BY doc_id
    )
    SELECT doc_id, n_features, score, score >= {QC_KEEP_MIN} AS keep
    FROM scored
    ORDER BY doc_id
    """,
    doc="QUALITY-CLASSIFIER INFERENCE — fastText-style linear scoring "
    "over hashed bag-of-words features: per doc, score = bias + sum of "
    "w(hash(tok) % FH_DIM) over DISTINCT tokens (binary BOW features, "
    f"the same 28-bit sha-carved hash and {FH_DIM}-dim bucket space as "
    "feature_hashing_stats — the featurizer and the scorer share one "
    "definition, as train/serve skew demands). Weights are a "
    "closed-form integer function so the cross-engine differential is "
    f"exact; the keep/drop gate at score >= {QC_KEEP_MIN} feeds "
    "cleaning_funnel_report's stage 5. 100 TB: inference is one "
    "explode + partial-aggregable integer sum — scan-local compute, "
    "no model table to shuffle (a real weight vector broadcasts a few "
    "KB).",
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    feat = d.select(
        "doc_id",
        F.explode(F.array_distinct(TX.words(F.col("text")))).alias("tok"),
    ).select("doc_id", (TX.hash28(F.col("tok")) % FH_DIM).alias("bucket"))
    weight = (F.col("bucket") * 37 + 11) % 21 - 10
    scored = feat.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_features"),
        (F.lit(QC_BIAS) + F.sum(weight)).cast("bigint").alias("score"),
    )
    return scored.select(
        "doc_id",
        "n_features",
        "score",
        (F.col("score") >= QC_KEEP_MIN).alias("keep"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# BPE encode pass (train -> APPLY -> count real tokens -> re-budget)
# --------------------------------------------------------------------------

# bpe_first_merges trains the merge ranking; these queries APPLY it.
# Encoding uses a boundary-safe string form: every symbol is wrapped in
# its own delimiters ("tab" -> "|t||a||b|", symbol boundary = "||"), so
# merge (a,b) is the literal replace "|a||b|" -> "|ab|". The wrap makes
# a plain leftmost non-overlapping replace() EXACT BPE for a first-round
# (single-char-pair) merge table:
#   - a match must span one full symbol + one full symbol, so merges can
#     never cross an already-merged boundary ("|ab||c|" contains no
#     "|b||c|");
#   - adjacent matches never share a delimiter ("|a||a||a||a|" ->
#     "|aa||aa|", the fixpoint answer), so one pass per rule = that
#     rule's fixpoint;
#   - later merges only create multi-char symbols, which single-char
#     rules can never match, so applying rules in rank order, each once,
#     equals the apply-best-rank-anywhere loop of canonical BPE.
# Both engines' replace() are leftmost non-overlapping, so the DuckDB
# oracle replays the encode bit-identically. Scale shape: the merge
# table is a bounded top-k (collected like the k-means centroid lists —
# 10 rows of metadata), the encode runs over DISTINCT words only (the
# dictionary trick: encode cost ∝ vocabulary, not corpus), and per-doc
# counts come from a broadcast dictionary join — the corpus never
# carries the symbol strings.


# Trained merge tables memoized per corpus: five queries consume the
# first-round table and four the iterative one, and re-training per
# query repeats a corpus scan (first-round) or ten argmax rounds
# (iterative) for a result that is 10 rows of metadata. The key
# includes the documents parquet's mtime+size — the same
# staleness-fingerprint discipline as materialize_versioned_events —
# so a regenerated corpus retrains instead of serving a stale table.
_BPE_TABLE_MEMO: dict = {}


def _bpe_memo_key(sf_dir: str, tag: str):
    import os

    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    return (tag, sf_dir, st.st_mtime_ns, st.st_size)


def _bpe_merges(spark: SparkSession, sf_dir: str) -> list[tuple[str, str]]:
    """Top-BPE_TOP first-round merge pairs in rank order (n DESC, c1, c2)
    — the same ranking bpe_first_merges reports. Bounded 10-row collect;
    memoized per corpus fingerprint (train once, apply many)."""
    key = _bpe_memo_key(sf_dir, "first")
    if key in _BPE_TABLE_MEMO:
        return _BPE_TABLE_MEMO[key]
    d = spread(load(spark, sf_dir, "documents"))
    words = d.select(F.explode(TX.words(F.col("text"))).alias("word")).filter(
        F.length("word") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")
        ).alias("pair")
    ).select(
        F.substring("pair", 1, 1).alias("c1"), F.substring("pair", 2, 1).alias("c2")
    )
    rows = (
        pairs.groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "c1", "c2")
        .limit(BPE_TOP)
        .collect()
    )
    _BPE_TABLE_MEMO[key] = [(r["c1"], r["c2"]) for r in rows]
    return _BPE_TABLE_MEMO[key]


def _bpe_encode_col(word) -> "F.Column":
    """Wrapped-symbol base form |c||c||c| of a word column."""
    return F.regexp_replace(word, "(.)", r"|$1|")


def _bpe_sql_m_cte() -> str:
    """DuckDB CTEs: the ranked merge table m(pat, rep, rnk)."""
    return f"""
    allw AS (SELECT unnest({TX.sql_words('text')}) AS word FROM documents),
    m AS (
        SELECT '|' || c1 || '||' || c2 || '|' AS pat,
               '|' || c1 || c2 || '|'         AS rep,
               row_number() OVER (ORDER BY n DESC, c1, c2) AS rnk
        FROM (
            SELECT substr(word, i, 1) AS c1, substr(word, i + 1, 1) AS c2,
                   count(*) AS n
            FROM allw, unnest(range(1, length(word))) AS t(i)
            WHERE length(word) >= 2
            GROUP BY c1, c2
        )
        QUALIFY rnk <= {BPE_TOP}
    )"""


def _bpe_sql_enc_expr_from(cte: str) -> str:
    """DuckDB expression: the nested replace chain applying merges rank
    1..BPE_TOP from CTE ``cte``(pat, rep, rnk); chr(1) sentinels make
    absent ranks no-ops."""
    expr = "regexp_replace(word, '(.)', '|\\1|', 'g')"
    for k in range(1, BPE_TOP + 1):
        expr = (
            f"replace({expr}, coalesce((SELECT pat FROM {cte} WHERE rnk = {k}), chr(1)),"
            f" coalesce((SELECT rep FROM {cte} WHERE rnk = {k}), chr(1)))"
        )
    return expr


def _bpe_sql_enc_expr() -> str:
    """The replace chain over the canonical first-round CTE m."""
    return _bpe_sql_enc_expr_from("m")


def _bpe_sql_enc_cte() -> str:
    """DuckDB CTE: enc(word, n_bpe) — the encoded dictionary."""
    expr = _bpe_sql_enc_expr()
    return f"""
    vocab AS (SELECT DISTINCT word FROM allw),
    enc AS (
        SELECT word,
               (length(sym) - length(replace(sym, '|', ''))) // 2 AS n_bpe
        FROM (SELECT word, {expr} AS sym FROM vocab)
    )"""


@query(
    "bpe_encode_token_counts",
    oracle=f"""
    WITH {_bpe_sql_m_cte()},
    {_bpe_sql_enc_cte()},
    w AS (SELECT doc_id, unnest({TX.sql_words('text')}) AS word FROM documents)
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT)            AS n_words,
           CAST(sum(length(w.word)) AS BIGINT) AS n_chars,
           CAST(sum(e.n_bpe) AS BIGINT)        AS n_bpe_tokens
    FROM w JOIN enc e ON e.word = w.word
    GROUP BY w.doc_id
    ORDER BY w.doc_id
    """,
    doc=f"BPE ENCODE pass — apply the corpus' own top-{BPE_TOP} "
    "first-round merges (bpe_first_merges' ranking) to every document "
    "and count REAL post-merge tokens. The encode is a chain of "
    "boundary-safe literal replaces over a wrapped-symbol string (see "
    "section comment: exact BPE for a first-round merge table, "
    "replayed bit-identically by DuckDB's replace), evaluated on the "
    "DISTINCT-word dictionary only and joined back broadcast — the "
    "dictionary trick that makes tokenizer application ∝ vocabulary "
    "while the corpus pays one hash join. Completes train→apply: "
    "n_bpe_tokens <= n_chars per doc, with equality only if no merge "
    "ever fires.",
)
def bpe_encode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_merges(spark, sf_dir)
    d = spread(load(spark, sf_dir, "documents"))
    w = d.select("doc_id", F.explode(TX.words(F.col("text"))).alias("word"))
    vocab = w.select("word").distinct()
    sym = _bpe_encode_col(F.col("word"))
    for c1, c2 in merges:
        sym = F.replace(sym, F.lit(f"|{c1}||{c2}|"), F.lit(f"|{c1}{c2}|"))
    enc = vocab.select(
        "word",
        ((F.length(sym) - F.length(F.replace(sym, F.lit("|"), F.lit("")))) / 2)
        .cast("bigint")
        .alias("n_bpe"),
    )
    return (
        w.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "token_budget_real_bpe",
    oracle=f"""
    WITH {_bpe_sql_m_cte()},
    {_bpe_sql_enc_cte()},
    w AS (SELECT source, unnest({TX.sql_words('text')}) AS word FROM documents),
    per_source AS (
        SELECT source, CAST(sum(e.n_bpe) AS BIGINT) AS n_tokens
        FROM w JOIN enc e ON e.word = w.word
        GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM per_source),
    quota AS (
        SELECT s.source, s.n_tokens,
               (s.n_tokens * {TOKEN_BUDGET}) // t.total AS floor_alloc,
               (s.n_tokens * {TOKEN_BUDGET}) % t.total  AS remainder_num
        FROM per_source s, tot t
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY remainder_num DESC, source)
                   AS rem_rank,
               CAST({TOKEN_BUDGET} - sum(floor_alloc) OVER () AS BIGINT)
                   AS n_leftover
        FROM quota
    )
    SELECT source, n_tokens,
           CAST(floor_alloc + CASE WHEN rem_rank <= n_leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM ranked
    ORDER BY source
    """,
    doc=f"Token-budget allocation on REAL tokenizer counts: the "
    f"{TOKEN_BUDGET}-token budget split across sources by largest-"
    "remainder rounding (token_budget_allocation's exact-integer "
    "quota machinery) — but weighted by post-BPE token counts from "
    "the encode pass instead of whitespace-word proxies. Closes the "
    "train→apply→budget loop the round-7 verdict asked for: the "
    "recipe that decides mixing weights now runs on the same token "
    "definition the training run will pay for.",
)
def token_budget_real_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_merges(spark, sf_dir)
    d = spread(load(spark, sf_dir, "documents"))
    w = d.select("source", F.explode(TX.words(F.col("text"))).alias("word"))
    sym = _bpe_encode_col(F.col("word"))
    for c1, c2 in merges:
        sym = F.replace(sym, F.lit(f"|{c1}||{c2}|"), F.lit(f"|{c1}{c2}|"))
    enc = w.select("word").distinct().select(
        "word",
        ((F.length(sym) - F.length(F.replace(sym, F.lit("|"), F.lit("")))) / 2)
        .cast("bigint")
        .alias("n_bpe"),
    )
    per_source = (
        w.join(F.broadcast(enc), "word")
        .groupBy("source")
        .agg(F.sum("n_bpe").cast("bigint").alias("n_tokens"))
    )
    tot = per_source.agg(F.sum("n_tokens").cast("bigint").alias("total"))
    quota = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(f"(n_tokens * {TOKEN_BUDGET}) div total").alias("floor_alloc"),
        ((F.col("n_tokens") * TOKEN_BUDGET) % F.col("total")).alias("remainder_num"),
    )
    allw = W.partitionBy()
    ranked = quota.select(
        "*",
        F.row_number()
        .over(W.orderBy(F.desc("remainder_num"), "source"))
        .alias("rem_rank"),
        (F.lit(TOKEN_BUDGET) - F.sum("floor_alloc").over(allw))
        .cast("bigint")
        .alias("n_leftover"),
    )
    return ranked.select(
        "source",
        "n_tokens",
        (
            F.col("floor_alloc")
            + F.when(F.col("rem_rank") <= F.col("n_leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# Iterative multi-round BPE training (the real BPE loop)
# --------------------------------------------------------------------------

# bpe_first_merges / _bpe_merges rank FIRST-round character-pair counts
# once — rank-2+ merges never see post-merge pair statistics, so the
# table can only ever contain single-char pairs. Real BPE (Sennrich et
# al., ACL'16) recounts after EVERY merge: once (t,h)→th wins, the next
# round counts (th,e) as a candidate. This section runs that loop.
#
# Scale shape (the round-8 dictionary trick, taken one step further):
# the loop never touches the corpus. One corpus scan builds the
# DISTINCT-WORD dictionary WITH per-word multiplicities (word, cnt),
# cached; every round's pair count is explode + partial-aggregable
# sum(cnt) over dictionary rows (cost ∝ vocabulary, key space ∝ live
# symbol pairs), and the round's winner is a BOUNDED 1-ROW collect —
# the trainer's inherent sync point, since the argmax must become a
# literal in the next round's replace chain (same discipline as the
# k-means centroid and 10-row merge-table collects; total driver
# traffic = BPE_ITER_ROUNDS rows). Round r's symbolization is the base
# wrapped form with merges 1..r-1 replayed — the boundary-safe wrapped
# encoding (section comment above _bpe_merges) stays EXACT for
# multi-char symbols: a pattern |ab||c| can only match where `ab` and
# `c` are complete symbols, because symbols never contain '|' and the
# delimiters anchor both ends. The DuckDB oracle replays the loop as
# BPE_ITER_ROUNDS unrolled CTE stages (the kmeans_lloyd_centroids
# pattern): p{r} pair counts → m{r} argmax → d{r} rewritten dictionary.

BPE_ITER_ROUNDS = 10  # == BPE_TOP, so the gain query compares equal-size tables


def _bpe_iter_sql_ctes() -> str:
    """DuckDB CTE chain replaying the iterative trainer bit-for-bit.

    Every per-round CTE is AS MATERIALIZED: DuckDB inlines plain CTEs,
    and d{r} references d{r-1} three times (pair count + two argmax
    scalar subqueries), so an inlined chain expands ~3^R copies of the
    base corpus scan — at R=10 that is 'Too many open files', not a
    plan. Materialization makes each round compute once, exactly like
    the Spark side's cached dictionary."""
    parts = [
        f"tw AS MATERIALIZED (SELECT unnest({TX.sql_words('text')}) AS word FROM documents)",
        "d0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', '|\\1|', 'g') AS sym,"
        " count(*) AS cnt FROM tw WHERE length(word) >= 2 GROUP BY word)",
    ]
    for r in range(1, BPE_ITER_ROUNDS + 1):
        parts.append(
            f"""p{r} AS MATERIALIZED (
        SELECT s[i] AS s1, s[i+1] AS s2, sum(cnt) AS n
        FROM (SELECT string_split(substr(sym, 2, length(sym) - 2), '||') AS s,
                     cnt
              FROM d{r - 1}),
             unnest(range(1, len(s))) AS t(i)
        GROUP BY s1, s2
    )"""
        )
        parts.append(
            f"m{r} AS MATERIALIZED"
            f" (SELECT s1, s2, n FROM p{r} ORDER BY n DESC, s1, s2 LIMIT 1)"
        )
        parts.append(
            f"""d{r} AS MATERIALIZED (
        SELECT replace(sym,
                   coalesce((SELECT '|' || s1 || '||' || s2 || '|' FROM m{r}), chr(1)),
                   coalesce((SELECT '|' || s1 || s2 || '|' FROM m{r}), chr(1))) AS sym,
               cnt
        FROM d{r - 1}
    )"""
        )
    return ",\n    ".join(parts)


def _bpe_iter_sql_enc_expr() -> str:
    """DuckDB expression applying the iterative merges rank 1..R to a
    `word` column (chr(1) sentinels make absent ranks no-ops)."""
    expr = "regexp_replace(word, '(.)', '|\\1|', 'g')"
    for r in range(1, BPE_ITER_ROUNDS + 1):
        expr = (
            f"replace({expr},"
            f" coalesce((SELECT '|' || s1 || '||' || s2 || '|' FROM m{r}), chr(1)),"
            f" coalesce((SELECT '|' || s1 || s2 || '|' FROM m{r}), chr(1)))"
        )
    return expr


def _bpe_iter_pairs(sym_col) -> "F.Column":
    """Adjacent-symbol pair structs of a wrapped-symbol string: strip
    the outer delimiters, split on the '||' symbol boundary, zip the
    array against itself shifted by one."""
    core = F.regexp_replace(F.regexp_replace(sym_col, r"^\|", ""), r"\|$", "")
    syms = F.split(core, r"\|\|")
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("s1"), b.alias("s2")),
        ),
    ).otherwise(F.array().cast("array<struct<s1:string,s2:string>>"))


def _bpe_iter_merges(spark: SparkSession, sf_dir: str) -> list[tuple[str, str, int]]:
    """The real BPE training loop: BPE_ITER_ROUNDS greedy merges, pair
    counts recomputed over the rewritten dictionary after every merge.

    Bounded collect: exactly ONE row per round (the argmax pair), R
    rows total — the argmax must become a literal in the next round's
    replace, so this sync point is inherent to greedy BPE, not a
    shortcut. The corpus is scanned ONCE (the cached dictionary);
    every round reads dictionary rows only (plan-shape-pinned in
    tests/test_plan_shape_r9.py). Memoized per corpus fingerprint like
    _bpe_merges — four queries consume this table (train once, apply
    many)."""
    key = _bpe_memo_key(sf_dir, "iter")
    if key in _BPE_TABLE_MEMO:
        return _BPE_TABLE_MEMO[key]
    d = spread(load(spark, sf_dir, "documents"))
    dic = managed_cache(
        d.select(F.explode(TX.words(F.col("text"))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merges: list[tuple[str, str, int]] = []
    sym = _bpe_encode_col(F.col("word"))
    for _ in range(BPE_ITER_ROUNDS):
        top = (
            dic.select(F.col("cnt"), F.explode(_bpe_iter_pairs(sym)).alias("p"))
            .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "s1", "s2")
            .limit(1)
            .collect()
        )
        if not top:
            break
        s1, s2 = top[0]["s1"], top[0]["s2"]
        merges.append((s1, s2, int(top[0]["n"])))
        sym = F.replace(sym, F.lit(f"|{s1}||{s2}|"), F.lit(f"|{s1}{s2}|"))
    _BPE_TABLE_MEMO[key] = merges
    return merges


def _bpe_apply_chain(merges: list[tuple[str, str, int]], word) -> "F.Column":
    """Apply a trained merge list, in rank order, to a word column."""
    sym = _bpe_encode_col(word)
    for s1, s2, _ in merges:
        sym = F.replace(sym, F.lit(f"|{s1}||{s2}|"), F.lit(f"|{s1}{s2}|"))
    return sym


def _bpe_sym_count(sym) -> "F.Column":
    """Number of symbols in a wrapped-symbol string (= pipe pairs)."""
    return (
        (F.length(sym) - F.length(F.replace(sym, F.lit("|"), F.lit("")))) / 2
    ).cast("bigint")


@query(
    "bpe_iterative_merges",
    oracle=f"""
    WITH {_bpe_iter_sql_ctes()}
    SELECT * FROM (
        {" UNION ALL ".join(
            f"SELECT {r} AS rnk, s1, s2, CAST(n AS BIGINT) AS n FROM m{r}"
            for r in range(1, BPE_ITER_ROUNDS + 1)
        )}
    )
    ORDER BY rnk
    """,
    doc=f"ITERATIVE BPE TRAINING — {BPE_ITER_ROUNDS} greedy merge "
    "rounds with pair counts RECOMPUTED over the rewritten dictionary "
    "after every merge (the real Sennrich et al. loop; "
    "bpe_first_merges' one-shot ranking can never produce the "
    "multi-char merges this table contains from rank 2 on). Per round: "
    "one explode + map-side-combinable sum(cnt) over the cached "
    "distinct-word dictionary, one 1-row argmax collect; the corpus is "
    "scanned once, never per merge. Tie-break (n DESC, s1, s2) pinned "
    "on both engines; the oracle unrolls the loop as CTE stages.",
)
def bpe_iterative_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_iter_merges(spark, sf_dir)
    rows = [(r + 1, s1, s2, n) for r, (s1, s2, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rnk int, s1 string, s2 string, n bigint"
    ).orderBy("rnk")


@query(
    "bpe_iterative_encode_counts",
    oracle=f"""
    WITH {_bpe_iter_sql_ctes()},
    w AS (SELECT doc_id, unnest({TX.sql_words('text')}) AS word FROM documents),
    vocab AS (SELECT DISTINCT word FROM w),
    enc AS (
        SELECT word,
               (length(sym) - length(replace(sym, '|', ''))) // 2 AS n_bpe
        FROM (SELECT word, {_bpe_iter_sql_enc_expr()} AS sym FROM vocab)
    )
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT)            AS n_words,
           CAST(sum(length(w.word)) AS BIGINT) AS n_chars,
           CAST(sum(e.n_bpe) AS BIGINT)        AS n_bpe_tokens
    FROM w JOIN enc e ON e.word = w.word
    GROUP BY w.doc_id
    ORDER BY w.doc_id
    """,
    doc=f"ENCODE under the ITERATIVE merge table: apply the "
    f"{BPE_ITER_ROUNDS}-round trained merges in rank order to every "
    "document and count real post-merge tokens — the rank-order "
    "wrapped-replace chain is exact for multi-char symbols too (the "
    "delimiters anchor complete symbols on both sides of a pattern). "
    "Same dictionary trick as bpe_encode_token_counts: encode cost "
    "∝ vocabulary, corpus pays one broadcast join.",
)
def bpe_iterative_encode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_iter_merges(spark, sf_dir)
    d = spread(load(spark, sf_dir, "documents"))
    w = d.select("doc_id", F.explode(TX.words(F.col("text"))).alias("word"))
    enc = w.select("word").distinct().select(
        "word", _bpe_sym_count(_bpe_apply_chain(merges, F.col("word"))).alias("n_bpe")
    )
    return (
        w.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "bpe_iterative_vs_first_gain",
    oracle=f"""
    WITH {_bpe_iter_sql_ctes()},
    fm AS (
        SELECT '|' || c1 || '||' || c2 || '|' AS pat,
               '|' || c1 || c2 || '|'         AS rep,
               row_number() OVER (ORDER BY n DESC, c1, c2) AS rnk
        FROM (
            SELECT substr(word, i, 1) AS c1, substr(word, i + 1, 1) AS c2,
                   count(*) AS n
            FROM tw, unnest(range(1, length(word))) AS t(i)
            WHERE length(word) >= 2
            GROUP BY c1, c2
        )
        QUALIFY rnk <= {BPE_TOP}
    ),
    w AS (SELECT unnest({TX.sql_words('text')}) AS word FROM documents),
    vocab AS (SELECT DISTINCT word FROM w),
    enc AS (
        SELECT word,
               (length(si) - length(replace(si, '|', ''))) // 2 AS n_iter,
               (length(sf) - length(replace(sf, '|', ''))) // 2 AS n_first
        FROM (SELECT word,
                     {_bpe_iter_sql_enc_expr()} AS si,
                     {_bpe_sql_enc_expr_from('fm')} AS sf
              FROM vocab)
    )
    SELECT CAST(count(*) AS BIGINT)            AS n_words,
           CAST(sum(length(w.word)) AS BIGINT) AS n_chars,
           CAST(sum(e.n_first) AS BIGINT)      AS n_bpe_first,
           CAST(sum(e.n_iter) AS BIGINT)       AS n_bpe_iter
    FROM w JOIN enc e ON e.word = w.word
    """,
    doc=f"WHY the recount matters, measured: corpus-total token counts "
    f"under the one-shot first-round table (bpe_first_merges' top "
    f"{BPE_TOP}) vs the {BPE_ITER_ROUNDS}-round iterative table of the "
    "same size — the iterative table spends rank-2+ slots on merges "
    "chosen from POST-merge statistics (multi-char continuations "
    "included), which the first-round ranking cannot see. One vocab "
    "projection computes both encodes; one broadcast join, one "
    "all-partial corpus aggregate.",
)
def bpe_iterative_vs_first_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    iter_merges = _bpe_iter_merges(spark, sf_dir)
    first_merges = [(c1, c2, 0) for c1, c2 in _bpe_merges(spark, sf_dir)]
    d = spread(load(spark, sf_dir, "documents"))
    w = d.select(F.explode(TX.words(F.col("text"))).alias("word"))
    enc = w.select("word").distinct().select(
        "word",
        _bpe_sym_count(_bpe_apply_chain(iter_merges, F.col("word"))).alias("n_iter"),
        _bpe_sym_count(_bpe_apply_chain(first_merges, F.col("word"))).alias("n_first"),
    )
    return w.join(F.broadcast(enc), "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        F.sum("n_first").cast("bigint").alias("n_bpe_first"),
        F.sum("n_iter").cast("bigint").alias("n_bpe_iter"),
    )


# --------------------------------------------------------------------------
# Overlap chunking (embedding-index / RAG corpus preparation)
# --------------------------------------------------------------------------

# The chunker every retrieval/embedding pipeline runs before indexing:
# fixed-length token windows with overlap (stride < length), last chunk
# clamped to the document end. HF/LangChain-style start rule: starts at
# 0, stride, 2*stride, ...; a document shorter than one chunk yields
# exactly one chunk; otherwise the final start is the first one whose
# window reaches the end (n_chunks = 1 + ceil((n - LEN) / STRIDE)).
CHUNK_LEN = 24  # tokens per chunk
CHUNK_STRIDE = 16  # tokens between chunk starts (overlap = 8)


@query(
    "doc_chunking_overlap",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {TX.sql_words('text')} AS w,
               len({TX.sql_words('text')}) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, i AS chunk_idx,
               least({CHUNK_LEN}, n - i * {CHUNK_STRIDE}) AS n_tokens,
               array_to_string(
                   w[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_LEN}],
                   ' ') AS chunk
        FROM t,
             unnest(range(0,
                 CASE WHEN n <= {CHUNK_LEN} THEN 1
                      ELSE 1 + (n - {CHUNK_LEN} + {CHUNK_STRIDE} - 1)
                               // {CHUNK_STRIDE} END)) AS u(i)
    )
    SELECT doc_id, chunk_idx, CAST(n_tokens AS BIGINT) AS n_tokens,
           sha256(chunk) AS chunk_sha
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
    doc=f"OVERLAP CHUNKING for embedding-index/RAG preparation: "
    f"{CHUNK_LEN}-token windows every {CHUNK_STRIDE} tokens "
    f"(overlap {CHUNK_LEN - CHUNK_STRIDE}), last window clamped to the "
    "document end, one window for short docs. Entirely native "
    "expressions — sequence/explode for starts, slice + array_join "
    "for the window text, sha2 for the chunk fingerprint (no HOF, no "
    "Python): the one-row-in/k-rows-out fan-out stays in whole-stage "
    "codegen. The chunk_sha column is what an embedding index stores "
    "as the dedup/idempotence key. 100 TB: scan-local fan-out, "
    "output rows ~ tokens/STRIDE, no shuffle at all until the "
    "downstream index groupBy. Complements udtf_chunk_documents "
    "(the UDTF API face, fixed non-overlapping chunks): this is the "
    "production chunker — overlap semantics, zero Python.",
)
def doc_chunking_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    t = d.select(
        "doc_id",
        TX.words(F.col("text")).alias("w"),
        F.size(TX.words(F.col("text"))).alias("n"),
    )
    n_chunks = F.when(F.col("n") <= CHUNK_LEN, F.lit(1)).otherwise(
        F.lit(1)
        + F.expr(
            f"(n - {CHUNK_LEN} + {CHUNK_STRIDE} - 1) DIV {CHUNK_STRIDE}"
        )
    )
    c = t.select(
        "doc_id",
        "w",
        "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.least(
            F.lit(CHUNK_LEN), F.col("n") - F.col("chunk_idx") * CHUNK_STRIDE
        )
        .cast("bigint")
        .alias("n_tokens"),
        F.sha2(
            F.array_join(
                F.expr(f"slice(w, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_LEN})"),
                " ",
            ),
            256,
        ).alias("chunk_sha"),
    )
    return c.orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# e2e corpus build v2: the round-8 stages composed into ONE plan
# --------------------------------------------------------------------------

# e2e_corpus_build chains the classic gates; this twin chains the
# ROUND-8 operators end-to-end, exactly as a production cleaning DAG
# would run them: five-stage funnel (length -> language -> repetition
# -> exact-dedup -> quality-classifier) -> duplicate-SPAN removal
# within the kept corpus (Lee et al. rewrite, 8-token grams, 60-bit
# hashes, keep-first) -> BPE merge table TRAINED ON THE SURVIVORS ->
# encode the survivors and count real tokens -> deterministic md5
# split -> per-split report (docs, surviving word tokens, removed
# tokens, real BPE tokens, full context windows). Every stage reuses
# its standalone query's exact constants, helpers and hash carves, so
# the composed differential also cross-checks stage INTERACTIONS
# (e.g. the merge ranking genuinely shifts when span removal drops
# prefix-duplicated text first).

from .dedup import DSR_K as _DSR_K  # noqa: E402  (oracle interpolates the shared constant)


@query(
    "e2e_corpus_build_v2",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, lang, lower(text) AS ltext, {TX.sql_words('text')} AS w
        FROM documents
    ),
    g AS (
        SELECT *,
               len({TX.sql_grams_all('w')}) AS n_grams,
               len(list_distinct({TX.sql_grams_all('w')})) AS n_distinct
        FROM w
    ),
    qc AS (
        SELECT doc_id,
               {QC_BIAS} + sum({_qc_weight_sql(f"{TX.sql_hash28('tok')} % {FH_DIM}")})
                   AS score
        FROM (SELECT doc_id, unnest(list_distinct(w)) AS tok FROM w)
        GROUP BY doc_id
    ),
    canon AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(ltext)) AS keeper FROM g
    ),
    kept AS (
        SELECT g.doc_id, g.lang, g.w, len(g.w) AS n_tok
        FROM g
        JOIN canon c ON c.doc_id = g.doc_id
        LEFT JOIN qc q ON q.doc_id = g.doc_id
        WHERE len(g.w) >= {FUNNEL_MIN_WORDS}
          AND g.lang IN {FUNNEL_LANGS!r}
          AND (g.n_grams - g.n_distinct) * {FUNNEL_REP_DEN}
                  <= g.n_grams * {FUNNEL_REP_NUM}
          AND c.keeper = g.doc_id
          AND coalesce(q.score, {QC_BIAS}) >= {QC_KEEP_MIN}
    ),
    sg AS (
        SELECT doc_id, i - 1 AS pos,
               {TX.sql_hash60(f"array_to_string(w[i:i+{_DSR_K}-1], ' ')")} AS h
        FROM kept, unnest(range(1, len(w) - {_DSR_K} + 2)) AS u(i)
        WHERE len(w) >= {_DSR_K}
    ),
    md AS (SELECT h, min(doc_id) AS keep_doc FROM sg GROUP BY h),
    cov AS (
        SELECT DISTINCT sg.doc_id, p.tpos
        FROM sg JOIN md USING (h),
             unnest(range(sg.pos, sg.pos + {_DSR_K})) AS p(tpos)
        WHERE sg.doc_id > md.keep_doc
    ),
    e AS (
        SELECT doc_id, i - 1 AS tpos, w[i] AS word
        FROM kept, unnest(range(1, len(w) + 1)) AS u(i)
    ),
    surv AS (
        SELECT e.doc_id, e.word
        FROM e LEFT JOIN cov c ON c.doc_id = e.doc_id AND c.tpos = e.tpos
        WHERE c.doc_id IS NULL
    ),
    m AS (
        SELECT '|' || c1 || '||' || c2 || '|' AS pat,
               '|' || c1 || c2 || '|'         AS rep,
               row_number() OVER (ORDER BY n DESC, c1, c2) AS rnk
        FROM (
            SELECT substr(word, i, 1) AS c1, substr(word, i + 1, 1) AS c2,
                   count(*) AS n
            FROM surv, unnest(range(1, length(word))) AS t(i)
            WHERE length(word) >= 2
            GROUP BY c1, c2
        )
        QUALIFY rnk <= {BPE_TOP}
    ),
    vocab AS (SELECT DISTINCT word FROM surv),
    enc AS (
        SELECT word,
               (length(sym) - length(replace(sym, '|', ''))) // 2 AS n_bpe
        FROM (SELECT word, {_bpe_sql_enc_expr()} AS sym FROM vocab)
    ),
    perdoc AS (
        SELECT s.doc_id,
               CAST(count(*) AS BIGINT) AS n_after,
               CAST(sum(e2.n_bpe) AS BIGINT) AS n_bpe
        FROM surv s JOIN enc e2 ON e2.word = s.word
        GROUP BY s.doc_id
    ),
    tagged AS (
        SELECT k.doc_id, k.lang, k.n_tok,
               coalesce(p.n_after, 0) AS n_after,
               coalesce(p.n_bpe, 0) AS n_bpe,
               CASE WHEN substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 1)
                        IN {SPLIT_TRAIN!r} THEN 'train'
                    WHEN substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 1)
                        IN {SPLIT_VAL!r} THEN 'val'
                    ELSE 'test'
               END AS split
        FROM kept k LEFT JOIN perdoc p ON p.doc_id = k.doc_id
    )
    SELECT split,
           CAST(count(*) AS BIGINT)                  AS n_docs,
           CAST(sum(n_after) AS BIGINT)              AS n_tokens,
           CAST(sum(n_tok - n_after) AS BIGINT)      AS tokens_removed,
           CAST(sum(n_bpe) AS BIGINT)                AS n_bpe_tokens,
           CAST(sum(n_bpe) // {CTX_TOKENS} AS BIGINT) AS n_ctx_windows,
           count(DISTINCT lang)                      AS n_langs
    FROM tagged
    GROUP BY split
    ORDER BY split
    """,
    doc="The ROUND-8 pipeline composed END-TO-END in one plan: "
    "five-stage cleaning funnel (incl. the quality-classifier gate) → "
    "duplicate-span removal within the kept corpus → BPE merges "
    "trained on the SURVIVORS → encode survivors, count real tokens → "
    "md5 split → per-split report (docs, surviving/removed word "
    "tokens, real BPE tokens, 512-token context windows). Each stage "
    "reuses its standalone query's constants, Arrow workers and hash "
    "carves, so the differential also locks stage INTERACTIONS (the "
    "merge ranking genuinely shifts when span removal rewrites the "
    "text first). One documents scan feeds everything; the only wide "
    "ops are the stages' own (content-hash window, gram-hash "
    "attribution shuffle, doc-keyed re-aggregations); the merge table "
    "is a bounded 10-row collect and the dictionary joins broadcast.",
)
def e2e_corpus_build_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    from .dedup import DSR_K, _span_gram_batches

    d = spread(load(spark, sf_dir, "documents"))
    base = d.select(
        "doc_id", "lang", F.lower("text").alias("ltext"),
        TX.words(F.col("text")).alias("w"),
    )
    g = base.mapInPandas(
        _funnel_stats_batches,
        "doc_id bigint, lang string, ltext string, w array<string>, "
        "n_words bigint, n_grams bigint, n_distinct bigint, score bigint",
    )
    keeper = F.min("doc_id").over(PW.partitionBy(F.md5(F.col("ltext").cast("binary"))))
    kept = managed_cache(
        g.withColumn("keeper", keeper)
        .filter(
            (F.col("n_words") >= FUNNEL_MIN_WORDS)
            & F.col("lang").isin(*FUNNEL_LANGS)
            & (
                (F.col("n_grams") - F.col("n_distinct")) * FUNNEL_REP_DEN
                <= F.col("n_grams") * FUNNEL_REP_NUM
            )
            & (F.col("keeper") == F.col("doc_id"))
            & (F.col("score") >= QC_KEEP_MIN)
        )
        .select("doc_id", "lang", "w", F.col("n_words").alias("n_tok"))
    )
    fp = managed_cache(
        kept.filter(F.size("w") >= DSR_K)
        .select("doc_id", "w")
        .mapInPandas(_span_gram_batches, "doc_id bigint, hs array<bigint>")
    )
    grams = fp.select("doc_id", F.posexplode("hs").alias("pos", "h"))
    mind = grams.groupBy("h").agg(F.min("doc_id").alias("keep_doc"))
    cov = (
        grams.join(mind, "h")
        .filter(F.col("doc_id") > F.col("keep_doc"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(DSR_K - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    e = kept.select("doc_id", F.posexplode("w").alias("tpos", "word"))
    surv = managed_cache(
        e.join(cov, ["doc_id", "tpos"], "left_anti").select("doc_id", "word")
    )
    # BPE merges trained on the SURVIVORS (bounded 10-row collect).
    pairs = (
        surv.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))"
                )
            ).alias("pair")
        )
        .select(
            F.substring("pair", 1, 1).alias("c1"),
            F.substring("pair", 2, 1).alias("c2"),
        )
    )
    merges = [
        (r["c1"], r["c2"])
        for r in pairs.groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "c1", "c2")
        .limit(BPE_TOP)
        .collect()
    ]
    sym = _bpe_encode_col(F.col("word"))
    for c1, c2 in merges:
        sym = F.replace(sym, F.lit(f"|{c1}||{c2}|"), F.lit(f"|{c1}{c2}|"))
    enc = surv.select("word").distinct().select(
        "word",
        ((F.length(sym) - F.length(F.replace(sym, F.lit("|"), F.lit("")))) / 2)
        .cast("bigint")
        .alias("n_bpe"),
    )
    perdoc = (
        surv.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_after"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe"),
        )
    )
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(first_hex.isin(*SPLIT_TRAIN), "train")
        .when(first_hex.isin(*SPLIT_VAL), "val")
        .otherwise("test")
    )
    tagged = (
        kept.join(perdoc, "doc_id", "left")
        .select(
            split.alias("split"),
            "lang",
            "n_tok",
            F.coalesce(F.col("n_after"), F.lit(0)).alias("n_after"),
            F.coalesce(F.col("n_bpe"), F.lit(0)).alias("n_bpe"),
        )
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_after").cast("bigint").alias("n_tokens"),
            F.sum(F.col("n_tok") - F.col("n_after"))
            .cast("bigint")
            .alias("tokens_removed"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
            F.expr(f"sum(n_bpe) DIV {CTX_TOKENS}").alias("n_ctx_windows"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# Corpus data card (the per-source summary a dataset ships with)
# --------------------------------------------------------------------------


@query(
    "corpus_datacard_report",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source, lang, {TX.sql_words('text')} AS w
        FROM documents
    ),
    qc AS (
        SELECT doc_id,
               {QC_BIAS} + sum({_qc_weight_sql(f"{TX.sql_hash28('tok')} % {FH_DIM}")})
                   AS score
        FROM (SELECT doc_id, unnest(list_distinct(w)) AS tok FROM w)
        GROUP BY doc_id
    ),
    dup AS (
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY md5(array_to_string(w, ' ')))
                   AS keeper
        FROM w
    )
    SELECT w.source,
           CAST(count(*) AS BIGINT)                      AS n_docs,
           CAST(sum(len(w.w)) AS BIGINT)                 AS n_tokens,
           CAST(min(len(w.w)) AS BIGINT)                 AS min_tokens,
           CAST(max(len(w.w)) AS BIGINT)                 AS max_tokens,
           count(DISTINCT w.lang)                        AS n_langs,
           CAST(sum(q.score) AS BIGINT)                  AS quality_score_sum,
           CAST(count(CASE WHEN q.score >= {QC_KEEP_MIN} THEN 1 END) AS BIGINT)
               AS n_quality_keep,
           CAST(count(CASE WHEN d.keeper <> w.doc_id THEN 1 END) AS BIGINT)
               AS n_exact_dups
    FROM w
    JOIN qc q ON q.doc_id = w.doc_id
    JOIN dup d ON d.doc_id = w.doc_id
    GROUP BY w.source
    ORDER BY w.source
    """,
    doc="CORPUS DATA CARD — the per-source summary table a published "
    "dataset ships with (Datasheets for Datasets / HF dataset cards): "
    "document and token counts, length range, language coverage, the "
    "quality-classifier keep rate (same closed-form scorer as "
    "quality_classifier_scores, integer score sum so no float policy) "
    "and the exact-duplicate count (content-hash keep-first, the "
    "dedup_exact discipline). ONE documents scan feeds a doc-keyed "
    "score aggregation, one content-hash window and one bounded "
    "|sources|-row rollup. The provenance-accounting artifact every "
    "corpus release needs.",
)
def corpus_datacard_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    d = spread(load(spark, sf_dir, "documents"))
    w = d.select("doc_id", "source", "lang", TX.words(F.col("text")).alias("w"))
    qc = (
        w.select(
            "doc_id",
            F.explode(F.array_distinct(F.col("w"))).alias("tok"),
        )
        .select("doc_id", (TX.hash28(F.col("tok")) % FH_DIM).alias("bucket"))
        .groupBy("doc_id")
        .agg(
            (F.lit(QC_BIAS) + F.sum((F.col("bucket") * 37 + 11) % 21 - 10)).alias(
                "score"
            )
        )
    )
    keeper = F.min("doc_id").over(
        PW.partitionBy(F.md5(F.array_join(F.col("w"), " ").cast("binary")))
    )
    base = (
        w.withColumn("keeper", keeper)
        .join(qc, "doc_id")
        .select(
            "source",
            "lang",
            F.size("w").alias("n_tok"),
            "score",
            (F.col("keeper") != F.col("doc_id")).alias("is_dup"),
        )
    )
    return (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.min("n_tok").cast("bigint").alias("min_tokens"),
            F.max("n_tok").cast("bigint").alias("max_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("score").cast("bigint").alias("quality_score_sum"),
            F.count(F.when(F.col("score") >= QC_KEEP_MIN, 1))
            .cast("bigint")
            .alias("n_quality_keep"),
            F.count(F.when(F.col("is_dup"), 1)).cast("bigint").alias("n_exact_dups"),
        )
        .orderBy("source")
    )


@query(
    "bpe_fertility_by_lang",
    oracle=f"""
    WITH {_bpe_sql_m_cte()},
    {_bpe_sql_enc_cte()},
    w AS (SELECT lang, unnest({TX.sql_words('text')}) AS word FROM documents)
    SELECT w.lang,
           CAST(count(*) AS BIGINT)            AS n_words,
           CAST(sum(e.n_bpe) AS BIGINT)        AS n_bpe_tokens,
           CAST(sum(e.n_bpe) * 1000000 // count(*) AS BIGINT)
               AS fertility_ppm
    FROM w JOIN enc e ON e.word = w.word
    GROUP BY w.lang
    ORDER BY w.lang
    """,
    doc="TOKENIZER FERTILITY by language — the standard multilingual "
    "tokenizer-evaluation metric (tokens emitted per word; high "
    "fertility = a language the merge table underserves, the signal "
    "that drives vocabulary rebalancing in multilingual tokenizer "
    "training). Reuses the BPE encode pass's merge table and "
    "dictionary trick (encode ∝ vocabulary, broadcast join-back); "
    "fertility reported in exact integer ppm so no float policy. "
    "Bounded |languages|-row output from one partial-aggregable "
    "rollup.",
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_merges(spark, sf_dir)
    d = spread(load(spark, sf_dir, "documents"))
    w = d.select("lang", F.explode(TX.words(F.col("text"))).alias("word"))
    sym = _bpe_encode_col(F.col("word"))
    for c1, c2 in merges:
        sym = F.replace(sym, F.lit(f"|{c1}||{c2}|"), F.lit(f"|{c1}{c2}|"))
    enc = w.select("word").distinct().select(
        "word",
        ((F.length(sym) - F.length(F.replace(sym, F.lit("|"), F.lit("")))) / 2)
        .cast("bigint")
        .alias("n_bpe"),
    )
    return (
        w.join(F.broadcast(enc), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
            F.expr("sum(n_bpe) * 1000000 DIV count(*)")
            .cast("bigint")
            .alias("fertility_ppm"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Quality-classifier TRAINING (distributed normal equations, round 9)
# --------------------------------------------------------------------------

# quality_classifier_scores serves closed-form weights; this section
# closes train→serve with a real TRAINING pass: exact least squares by
# normal equations over features derived from the SAME hashed-BOW
# featurizer (28-bit sha-carve % FH_DIM — one definition, no
# train/serve skew). The distributed shape is the one that matters at
# 100 TB: ONE partial-aggregable corpus pass accumulates XᵀX and Xᵀy
# (the Gram matrix is dimension²-bounded metadata — here 3×3 with
# intercept; at FH_DIM=1024 the same single pass accumulates ~1M cells
# and the solve stays driver-side either way), then the solve touches
# no data. The solve itself is Cramer's rule kept in EXACT integer
# arithmetic — weights are reported as (numerator, common
# denominator = det XᵀX) and the keep-gate compares pred_num >=
# threshold*det, so there is NO division and no float anywhere:
# DuckDB replays every value bit-for-bit (HUGEINT there,
# decimal(38,0) here; triple products reach ~1e22, past int64).
# Labels come from a planted integer rule y = 3·x1 − 2·x2 + 7 +
# ((doc_id % 5) − 2): exactly linear plus bounded integer noise, so
# the LS solution is a nontrivial exact rational and the normal
# equations Σ residual·x = 0 hold exactly (pinned in
# tests/test_plan_shape_r9.py).

QCT_KEEP = 25  # keep-gate: pred >= 25 (in y units; compared x det)


def _det3(m) -> str:
    """SQL text of a 3x3 determinant by first-row cofactor expansion."""
    return (
        f"({m[0][0]})*(({m[1][1]})*({m[2][2]}) - ({m[1][2]})*({m[2][1]}))"
        f" - ({m[0][1]})*(({m[1][0]})*({m[2][2]}) - ({m[1][2]})*({m[2][0]}))"
        f" + ({m[0][2]})*(({m[1][0]})*({m[2][1]}) - ({m[1][1]})*({m[2][0]}))"
    )


def _det3_col(m) -> "F.Column":
    """Column form of the same expansion (decimal-exact)."""
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


_QCT_A = [["s11", "s12", "s1"], ["s12", "s22", "s2"], ["s1", "s2", "n"]]
_QCT_B = ["t1", "t2", "t0"]


def _qct_sql_base() -> str:
    """Shared CTEs: featurize (the FH_DIM hash space, even/odd bucket
    split), plant labels, accumulate the Gram sums as HUGEINT."""
    return f"""
    toks AS (
        SELECT doc_id, unnest(list_distinct({TX.sql_words('text')})) AS tok
        FROM documents
    ),
    feat AS (
        SELECT d.doc_id,
               coalesce(sum(CASE WHEN {TX.sql_hash28('tok')} % {FH_DIM} % 2 = 0
                            THEN 1 ELSE 0 END), 0) AS x1,
               coalesce(sum(CASE WHEN {TX.sql_hash28('tok')} % {FH_DIM} % 2 = 1
                            THEN 1 ELSE 0 END), 0) AS x2
        FROM documents d LEFT JOIN toks t USING (doc_id)
        GROUP BY d.doc_id
    ),
    lab AS (
        SELECT doc_id, x1, x2,
               3*x1 - 2*x2 + 7 + (doc_id % 5) - 2 AS y
        FROM feat
    ),
    g AS (
        SELECT CAST(sum(x1*x1) AS HUGEINT) AS s11,
               CAST(sum(x1*x2) AS HUGEINT) AS s12,
               CAST(sum(x1)    AS HUGEINT) AS s1,
               CAST(sum(x2*x2) AS HUGEINT) AS s22,
               CAST(sum(x2)    AS HUGEINT) AS s2,
               CAST(count(*)   AS HUGEINT) AS n,
               CAST(sum(x1*y)  AS HUGEINT) AS t1,
               CAST(sum(x2*y)  AS HUGEINT) AS t2,
               CAST(sum(y)     AS HUGEINT) AS t0
        FROM lab
    )"""


def _qct_replace_col(col: int):
    """Cramer numerator matrix: A with column `col` replaced by b."""
    return [
        [(_QCT_B[r] if c == col else _QCT_A[r][c]) for c in range(3)]
        for r in range(3)
    ]


def _qct_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(TX.words(F.col("text")))).alias("tok")
    )
    feat = (
        d.select("doc_id")
        .join(
            toks.select(
                "doc_id", (TX.hash28(F.col("tok")) % FH_DIM).alias("bucket")
            )
            .groupBy("doc_id")
            .agg(
                F.sum(F.when(F.col("bucket") % 2 == 0, 1).otherwise(0)).alias("x1"),
                F.sum(F.when(F.col("bucket") % 2 == 1, 1).otherwise(0)).alias("x2"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("x1", F.lit(0)).cast("bigint").alias("x1"),
            F.coalesce("x2", F.lit(0)).cast("bigint").alias("x2"),
        )
    )
    return feat.withColumn(
        "y",
        (
            F.lit(3) * F.col("x1")
            - F.lit(2) * F.col("x2")
            + F.lit(7)
            + (F.col("doc_id") % 5)
            - F.lit(2)
        ).cast("bigint"),
    )


def _qct_gram(feats: DataFrame) -> DataFrame:
    dec = lambda c: c.cast("decimal(20,0)")  # noqa: E731
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    return feats.agg(
        dec(F.sum(x1 * x1)).alias("s11"),
        dec(F.sum(x1 * x2)).alias("s12"),
        dec(F.sum(x1)).alias("s1"),
        dec(F.sum(x2 * x2)).alias("s22"),
        dec(F.sum(x2)).alias("s2"),
        dec(F.count(F.lit(1))).alias("n"),
        dec(F.sum(x1 * y)).alias("t1"),
        dec(F.sum(x2 * y)).alias("t2"),
        dec(F.sum(y)).alias("t0"),
    )


def _qct_overflow_guard(c: "F.Column", name: str) -> "F.Column":
    """Spark caps the Cramer triple-product precision at decimal(38,0);
    in non-ANSI mode a corpus big enough to push a determinant past 38
    digits yields silent NULLs while the DuckDB HUGEINT oracle raises.
    This guard makes Spark fail LOUDLY at the same boundary: the Gram
    sums are never null (coalesced features over count(*) >= 1 input),
    so a null determinant can only mean decimal overflow."""
    return F.when(
        c.isNotNull(), c
    ).otherwise(
        F.raise_error(
            F.lit(
                f"quality_train: {name} overflowed decimal(38,0) — corpus "
                "too large for the exact Cramer path (det(XᵀX) must stay "
                "under 10^38; shrink features or shard the fit)"
            )
        ).cast("decimal(38,0)")
    )


def _qct_weight_cols():
    A = [[F.col(c) for c in row] for row in _QCT_A]
    det = _qct_overflow_guard(_det3_col(A).cast("decimal(38,0)"), "det(XᵀX)")
    nums = []
    for j in range(3):
        mat = [
            [
                (F.col(_QCT_B[r]) if c == j else F.col(_QCT_A[r][c]))
                for c in range(3)
            ]
            for r in range(3)
        ]
        nums.append(
            _qct_overflow_guard(_det3_col(mat).cast("decimal(38,0)"), f"w{j}_num")
        )
    return nums, det


@query(
    "quality_train_normal_equations",
    oracle=f"""
    WITH {_qct_sql_base()}
    SELECT CAST({_det3(_qct_replace_col(0))} AS DECIMAL(38,0)) AS w1_num,
           CAST({_det3(_qct_replace_col(1))} AS DECIMAL(38,0)) AS w2_num,
           CAST({_det3(_qct_replace_col(2))} AS DECIMAL(38,0)) AS b_num,
           CAST({_det3(_QCT_A)} AS DECIMAL(38,0)) AS det
    FROM g
    """,
    doc="QUALITY-CLASSIFIER TRAINING — exact least squares by normal "
    "equations: one partial-aggregable corpus pass accumulates the "
    "Gram sums XᵀX / Xᵀy over features from the SHARED hashed-BOW "
    "featurizer (even/odd FH_DIM-bucket token counts + intercept), "
    "then Cramer's rule solves the 3x3 system in exact integer "
    "arithmetic — weights reported as numerators over the common "
    "denominator det(XᵀX), no division, no floats, bit-identical "
    "cross-engine (triple products ~1e22: HUGEINT / decimal(38,0); "
    "determinants past 10^38 raise LOUDLY on both engines — Spark via "
    "the _qct_overflow_guard null-check, DuckDB via HUGEINT overflow — "
    "never a silent NULL-weight divergence). "
    "100 TB: the corpus pays exactly one scan + one tiny-key shuffle; "
    "the Gram matrix is dimension-bounded metadata.",
)
def quality_train_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _qct_gram(_qct_features(spark, sf_dir))
    nums, det = _qct_weight_cols()
    return g.select(
        nums[0].cast("decimal(38,0)").alias("w1_num"),
        nums[1].cast("decimal(38,0)").alias("w2_num"),
        nums[2].cast("decimal(38,0)").alias("b_num"),
        det.cast("decimal(38,0)").alias("det"),
    )


@query(
    "quality_train_serve_scores",
    oracle=f"""
    WITH {_qct_sql_base()},
    w AS (
        SELECT {_det3(_qct_replace_col(0))} AS w1_num,
               {_det3(_qct_replace_col(1))} AS w2_num,
               {_det3(_qct_replace_col(2))} AS b_num,
               {_det3(_QCT_A)} AS det
        FROM g
    )
    SELECT l.doc_id,
           CAST(l.x1 AS BIGINT) AS x1,
           CAST(l.x2 AS BIGINT) AS x2,
           CAST(l.y AS BIGINT) AS y,
           CAST(l.x1 * w.w1_num + l.x2 * w.w2_num + w.b_num AS DECIMAL(38,0))
               AS pred_num,
           l.x1 * w.w1_num + l.x2 * w.w2_num + w.b_num >= {QCT_KEEP} * w.det
               AS keep
    FROM lab l, w
    ORDER BY l.doc_id
    """,
    doc=f"SERVE the trained weights: per-doc prediction as the exact "
    "numerator x·w_num (common denominator det), keep-gate "
    f"pred >= {QCT_KEEP} compared cross-multiplied against det — "
    "division-free, so train AND serve are bit-exact cross-engine. "
    "The weight row broadcasts into the scoring projection (one "
    "corpus scan); featurizer identical to training by construction.",
)
def quality_train_serve_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = managed_cache(_qct_features(spark, sf_dir))
    nums, det = _qct_weight_cols()
    w = _qct_gram(feats).select(
        nums[0].alias("w1_num"), nums[1].alias("w2_num"),
        nums[2].alias("b_num"), det.alias("det"),
    )
    pred = (
        F.col("x1").cast("decimal(20,0)") * F.col("w1_num")
        + F.col("x2").cast("decimal(20,0)") * F.col("w2_num")
        + F.col("b_num")
    )
    return (
        feats.crossJoin(F.broadcast(w))  # 1-row weight table
        .select(
            "doc_id",
            "x1",
            "x2",
            "y",
            pred.cast("decimal(38,0)").alias("pred_num"),
            (pred >= F.lit(QCT_KEEP).cast("decimal(20,0)") * F.col("det")).alias("keep"),
        )
        .orderBy("doc_id")
    )


QCB_BINS = 10  # calibration deciles over the served score distribution


@query(
    "quality_calibration_bins",
    oracle=f"""
    WITH {_qct_sql_base()},
    w AS (
        SELECT {_det3(_qct_replace_col(0))} AS w1_num,
               {_det3(_qct_replace_col(1))} AS w2_num,
               {_det3(_qct_replace_col(2))} AS b_num,
               {_det3(_QCT_A)} AS det
        FROM g
    ),
    p AS (
        SELECT l.doc_id, l.y,
               l.x1 * w.w1_num + l.x2 * w.w2_num + w.b_num AS pred_num
        FROM lab l, w
    ),
    b AS (
        SELECT y, pred_num,
               ntile({QCB_BINS}) OVER (ORDER BY pred_num, doc_id) AS bin
        FROM p
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(pred_num) AS DECIMAL(38,0)) AS pred_min_num,
           CAST(max(pred_num) AS DECIMAL(38,0)) AS pred_max_num,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_y
    FROM b GROUP BY bin ORDER BY bin
    """,
    doc=f"CLASSIFIER CALIBRATION / RELIABILITY TABLE: the served quality "
    f"scores cut into {QCB_BINS} equi-depth deciles (ntile over the "
    "total order pred_num, doc_id — the predictions share the common "
    "positive denominator det, so ordering by the exact integer "
    "numerator IS ordering by the score), each bin reporting its size, "
    "its exact score range (min/max pred_num as decimal — no float "
    "summation anywhere), and the observed label mass (sum_y bigint; "
    "mean_y is the query's only division). A well-calibrated monotone "
    "ranker shows mean_y rising with bin — the reliability-diagram "
    "check every FineWeb-Edu-style quality filter needs before its "
    "keep threshold is trusted; a flat or non-monotone table means the "
    "score is noise at that operating range. Scale note (the "
    "rfm_customer_segments argument): the global ntile is one "
    "sort-based exchange over a 3-column projection; at 100 TB the cut "
    "points come from approx quantiles + width_bucket instead, "
    "trading exactness for a scan — exactness is this query's "
    "contract. Train and serve stay the bit-exact Cramer path of "
    "quality_train_serve_scores (pipeline.py:3415).",
)
def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = managed_cache(_qct_features(spark, sf_dir))
    nums, det = _qct_weight_cols()
    w = _qct_gram(feats).select(
        nums[0].alias("w1_num"),
        nums[1].alias("w2_num"),
        nums[2].alias("b_num"),
        det.alias("det"),
    )
    pred = (
        F.col("x1").cast("decimal(20,0)") * F.col("w1_num")
        + F.col("x2").cast("decimal(20,0)") * F.col("w2_num")
        + F.col("b_num")
    )
    p = (
        feats.crossJoin(F.broadcast(w))  # 1-row weight table
        .select("doc_id", "y", pred.cast("decimal(38,0)").alias("pred_num"))
    )
    b = p.select(
        "y",
        "pred_num",
        F.ntile(QCB_BINS).over(W.orderBy("pred_num", "doc_id")).alias("bin"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("pred_num").cast("decimal(38,0)").alias("pred_min_num"),
            F.max("pred_num").cast("decimal(38,0)").alias("pred_max_num"),
            F.sum("y").cast("bigint").alias("sum_y"),
            (F.sum("y").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mean_y"
            ),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Dedup-corrected mixing weights (round 9)
# --------------------------------------------------------------------------

# dedup_source_overlap_matrix's doc states the stake: "double-counted
# content silently doubles a source's effective weight". This query
# CLOSES that loop — the mixing recipe consumes dedup's output instead
# of raw sizes: every exact-content group is attributed to ONE canonical
# source (the source of its min-doc_id member, dedup_exact's election),
# effective sizes count canonical content only, and the temperature
# allocation (α = 0.5 — sqrt is correctly rounded, the
# temperature_mix_allocation argument) is computed over BOTH raw and
# effective sizes side by side, so the output shows exactly how much
# quota the duplicate mass was stealing. On the planted corpus src0-6
# carry mirrored copies whose canonicals live elsewhere: their raw
# quotas are inflated and their corrected quotas fall back to parity.
# 100 TB: one content-hash shuffle (the dedup election), one
# |sources|-row allocation — the corpus scan is the only data-sized
# pass.

DCM_BUDGET = 10_000  # documents in the mixed corpus

from .dedup import SQL_DOCS_SRC as _SQL_DOCS_SRC  # noqa: E402


@query(
    "dedup_corrected_mixing",
    oracle=f"""
    WITH aug AS ({_SQL_DOCS_SRC}),
    h AS (SELECT doc_id, source, md5(text) AS ch FROM aug),
    canon AS (SELECT ch, arg_min(source, doc_id) AS csrc FROM h GROUP BY ch),
    raw AS (SELECT source, count(*) AS n_raw FROM h GROUP BY source),
    eff AS (SELECT csrc AS source, count(*) AS n_eff FROM canon GROUP BY csrc),
    s AS (
        SELECT r.source, r.n_raw, coalesce(e.n_eff, 0) AS n_eff
        FROM raw r LEFT JOIN eff e USING (source)
    ),
    w AS (
        SELECT source, n_raw, n_eff,
               sqrt(CAST(n_raw AS DOUBLE)) AS wr,
               sqrt(CAST(n_eff AS DOUBLE)) AS we
        FROM s
    ),
    tot AS (SELECT {sql_dsum('wr', 18)} AS twr, {sql_dsum('we', 18)} AS twe FROM w),
    alloc AS (
        SELECT source, n_raw, n_eff,
               CAST(floor({DCM_BUDGET} * (wr / t.twr)) AS BIGINT) AS base_r,
               {DCM_BUDGET} * (wr / t.twr)
                   - floor({DCM_BUDGET} * (wr / t.twr)) AS rem_r,
               CAST(floor({DCM_BUDGET} * (we / t.twe)) AS BIGINT) AS base_e,
               {DCM_BUDGET} * (we / t.twe)
                   - floor({DCM_BUDGET} * (we / t.twe)) AS rem_e
        FROM w, tot t
    ),
    fin AS (
        SELECT *,
               row_number() OVER (ORDER BY rem_r DESC, source) AS rk_r,
               row_number() OVER (ORDER BY rem_e DESC, source) AS rk_e,
               (SELECT {DCM_BUDGET} - sum(base_r) FROM alloc) AS left_r,
               (SELECT {DCM_BUDGET} - sum(base_e) FROM alloc) AS left_e
        FROM alloc
    )
    SELECT source,
           CAST(n_raw AS BIGINT) AS n_raw,
           CAST(n_eff AS BIGINT) AS n_effective,
           CAST(base_r + CASE WHEN rk_r <= left_r THEN 1 ELSE 0 END AS BIGINT)
               AS quota_naive,
           CAST(base_e + CASE WHEN rk_e <= left_e THEN 1 ELSE 0 END AS BIGINT)
               AS quota_corrected
    FROM fin
    ORDER BY source
    """,
    doc="DEDUP-CORRECTED MIXING — the recipe that consumes the "
    "cross-source duplication audit: every exact-content group is "
    "attributed to its canonical source (min-doc_id election), "
    "effective sizes count canonical content only, and the α=0.5 "
    "temperature allocation runs over raw AND effective sizes side by "
    "side — the quota a mirroring source loses is exactly the weight "
    "its duplicate mass was stealing. Largest-remainder rounding: both "
    "quota columns each sum EXACTLY to the budget. One content-hash "
    "shuffle + a |sources|-row allocation.",
)
def dedup_corrected_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import docs_with_source_copies

    h = managed_cache(
        docs_with_source_copies(spark, sf_dir).select(
            "doc_id", "source", F.md5(F.col("text").cast("binary")).alias("ch")
        )
    )
    canon = h.groupBy("ch").agg(F.min_by("source", "doc_id").alias("csrc"))
    raw = h.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_raw"))
    eff = canon.groupBy(F.col("csrc").alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eff")
    )
    s = raw.join(eff, "source", "left").select(
        "source", "n_raw", F.coalesce("n_eff", F.lit(0)).cast("bigint").alias("n_eff")
    )
    w = s.select(
        "*",
        F.sqrt(F.col("n_raw").cast("double")).alias("wr"),
        F.sqrt(F.col("n_eff").cast("double")).alias("we"),
    )
    tot = w.agg(dsum("wr", 18).alias("twr"), dsum("we", 18).alias("twe"))
    alloc = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_raw",
        "n_eff",
        F.floor(F.lit(DCM_BUDGET) * (F.col("wr") / F.col("twr")))
        .cast("bigint")
        .alias("base_r"),
        (
            F.lit(DCM_BUDGET) * (F.col("wr") / F.col("twr"))
            - F.floor(F.lit(DCM_BUDGET) * (F.col("wr") / F.col("twr")))
        ).alias("rem_r"),
        F.floor(F.lit(DCM_BUDGET) * (F.col("we") / F.col("twe")))
        .cast("bigint")
        .alias("base_e"),
        (
            F.lit(DCM_BUDGET) * (F.col("we") / F.col("twe"))
            - F.floor(F.lit(DCM_BUDGET) * (F.col("we") / F.col("twe")))
        ).alias("rem_e"),
    )
    left = alloc.agg(
        (F.lit(DCM_BUDGET) - F.sum("base_r")).alias("left_r"),
        (F.lit(DCM_BUDGET) - F.sum("base_e")).alias("left_e"),
    )
    fin = (
        alloc.crossJoin(F.broadcast(left))
        .withColumn("rk_r", F.row_number().over(W.orderBy(F.desc("rem_r"), "source")))
        .withColumn("rk_e", F.row_number().over(W.orderBy(F.desc("rem_e"), "source")))
    )
    return fin.select(
        "source",
        "n_raw",
        F.col("n_eff").alias("n_effective"),
        (F.col("base_r") + F.when(F.col("rk_r") <= F.col("left_r"), 1).otherwise(0))
        .cast("bigint")
        .alias("quota_naive"),
        (F.col("base_e") + F.when(F.col("rk_e") <= F.col("left_e"), 1).otherwise(0))
        .cast("bigint")
        .alias("quota_corrected"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# Curriculum-ordered packing (round 9)
# --------------------------------------------------------------------------

# Sequence-length curriculum (train short→long, the warmup layout many
# pretraining runs use): documents are ordered by (length bucket,
# doc_id) and packed into context windows in THAT order, so early bins
# hold short documents and difficulty rises monotonically through the
# run. The global position comes from a THREE-level prefix sum — the
# pack_documents_ctx two-phase trick with a bucket level on top:
# in-block running sum (windows partitioned by (bucket, block) — fully
# parallel) + per-block offsets within the bucket (tiny) + per-bucket
# offsets (4 rows). No global single-partition window anywhere on the
# Spark side; the oracle IS the single global window, so the
# differential proves the decomposition equals it.

CURR_BUCKETS = 4  # length buckets: n_tokens DIV 20, capped


@query(
    "curriculum_pack_order",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len({TX.sql_words('text')}) AS n_tokens,
               least(len({TX.sql_words('text')}) // 20, {CURR_BUCKETS - 1})
                   AS bucket
        FROM documents
    ),
    cum AS (
        SELECT *,
               coalesce(sum(n_tokens) OVER (
                   ORDER BY bucket, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS tokens_before
        FROM toks
    )
    SELECT CAST(tokens_before // {CTX_TOKENS} AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(min(bucket) AS BIGINT)   AS first_bucket,
           CAST(max(bucket) AS BIGINT)   AS last_bucket,
           CAST(min(tokens_before) AS BIGINT) AS bin_start
    FROM cum
    GROUP BY 1
    ORDER BY bin_id
    """,
    doc="CURRICULUM-ORDERED PACKING — short→long sequence-length "
    "curriculum: docs ordered by (length bucket, doc_id), virtually "
    "concatenated, chunked into context windows; per-bin report shows "
    "difficulty rising monotonically (first/last bucket). Global "
    "positions via a three-level distributed prefix sum (in-block "
    "window partitioned by (bucket, block), per-block offsets within "
    "bucket, 4-row bucket offsets) — no global single-partition window "
    "on the Spark side; the oracle is exactly that global window, so "
    "the differential proves the decomposition. 100 TB: every level's "
    "key space shrinks by PACK_BLOCK; the corpus is scanned once.",
)
def curriculum_pack_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    n_tok = F.size(TX.words(F.col("text"))).cast("bigint")
    toks = d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.least(n_tok / 20, F.lit(CURR_BUCKETS - 1)).cast("bigint").alias("bucket"),
        (F.col("doc_id") / PACK_BLOCK).cast("bigint").alias("blk"),
    )
    in_blk = (
        W.partitionBy("bucket", "blk")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    blk_tot = toks.groupBy("bucket", "blk").agg(F.sum("n_tokens").alias("blk_tokens"))
    blk_off = blk_tot.withColumn(
        "blk_offset",
        F.coalesce(
            F.sum("blk_tokens").over(
                W.partitionBy("bucket").orderBy("blk")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "blk", "blk_offset")
    bkt_tot = blk_tot.groupBy("bucket").agg(F.sum("blk_tokens").alias("bkt_tokens"))
    bkt_off = bkt_tot.withColumn(
        "bkt_offset",
        F.coalesce(
            F.sum("bkt_tokens").over(
                W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "bkt_offset")
    cum = (
        toks.withColumn(
            "in_blk_before", F.coalesce(F.sum("n_tokens").over(in_blk), F.lit(0))
        )
        .join(F.broadcast(blk_off), ["bucket", "blk"])
        .join(F.broadcast(bkt_off), "bucket")
        .withColumn(
            "tokens_before",
            F.col("bkt_offset") + F.col("blk_offset") + F.col("in_blk_before"),
        )
    )
    return (
        cum.groupBy(
            (F.col("tokens_before") / CTX_TOKENS).cast("bigint").alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
            F.min("bucket").alias("first_bucket"),
            F.max("bucket").alias("last_bucket"),
            F.min("tokens_before").cast("bigint").alias("bin_start"),
        )
        .orderBy("bin_id")
    )


# --------------------------------------------------------------------------
# Contamination UNION report (round 9)
# --------------------------------------------------------------------------

# Production decontamination runs BOTH channels and removes the union:
# verbatim leakage (the n-gram channel) and paraphrase leakage (the
# embedding channel) have disjoint blind spots, and a doc is
# contaminated if EITHER fires. This report joins the two standalone
# queries' verdicts into one per-id row — the removal list a corpus
# build actually consumes — with per-channel evidence columns so the
# removal is auditable. Id spaces: the n-gram channel flags document
# ids, the embedding channel flags vector ids (the train id of each
# embedding row); entities without an embedding can only be flagged by
# text, which the full-outer join preserves as NULL-evidence rows.

DECON_UNION_COLS = (
    "train_id, n_shared_ngrams, n_bench_ngram_docs, "
    "n_bench_embedding_hits, max_cosine, flagged_ngram, "
    "flagged_embedding, flagged_both"
)


@query(
    "decontam_union_report",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {TX.sql_words('text')} AS w FROM documents
    ),
    grams AS (
        SELECT doc_id, g
        FROM w, unnest(CASE WHEN len(w.w) < {DECONTAM_N} THEN []::VARCHAR[]
                            ELSE list_distinct(list_transform(
                                range(1, len(w.w) - {DECONTAM_N} + 2),
                                i -> {" || ' ' || ".join(f"w.w[i+{k}]" for k in range(DECONTAM_N))}))
                       END) AS t(g)
    ),
    gb AS (SELECT doc_id AS bench_id, g FROM grams WHERE doc_id % {BENCH_EVERY} = 0),
    gt AS (SELECT doc_id, g FROM grams WHERE doc_id % {BENCH_EVERY} <> 0),
    ng AS (
        SELECT t.doc_id AS train_id,
               count(DISTINCT t.g)        AS n_shared_ngrams,
               count(DISTINCT b.bench_id) AS n_bench_ngram_docs
        FROM gt t JOIN gb b ON t.g = b.g
        GROUP BY t.doc_id
    ),
    aug AS ({_SQL_VECS_SCALED}),
    bk AS (SELECT vec_id, v, {VX.sql_lsh_bucket('v')} AS bucket FROM aug),
    etr AS (SELECT * FROM bk WHERE vec_id < {_VEC_OFFSET}),
    ebn AS (SELECT * FROM bk WHERE vec_id >= {_VEC_OFFSET}),
    emb AS (
        SELECT t.vec_id AS train_id,
               CAST(count(*) AS BIGINT) AS n_bench_embedding_hits,
               max({VX.sql_cosine('t.v', 'b.v')}) AS max_cosine
        FROM etr t JOIN ebn b ON t.bucket = b.bucket
        WHERE {VX.sql_cosine('t.v', 'b.v')} >= {DECON_COS_T}
        GROUP BY t.vec_id
    )
    SELECT coalesce(n.train_id, e.train_id) AS train_id,
           CAST(coalesce(n.n_shared_ngrams, 0) AS BIGINT) AS n_shared_ngrams,
           CAST(coalesce(n.n_bench_ngram_docs, 0) AS BIGINT) AS n_bench_ngram_docs,
           CAST(coalesce(e.n_bench_embedding_hits, 0) AS BIGINT)
               AS n_bench_embedding_hits,
           coalesce(e.max_cosine, 0.0) AS max_cosine,
           n.train_id IS NOT NULL AS flagged_ngram,
           e.train_id IS NOT NULL AS flagged_embedding,
           n.train_id IS NOT NULL AND e.train_id IS NOT NULL AS flagged_both
    FROM ng n FULL OUTER JOIN emb e ON n.train_id = e.train_id
    ORDER BY train_id
    """,
    doc="CONTAMINATION UNION REPORT — the removal list production "
    "decontamination consumes: one row per train id flagged by EITHER "
    "channel (verbatim n-gram overlap OR embedding-space paraphrase), "
    "with per-channel evidence (shared-gram + matched-benchmark "
    "counts; hit count + max cosine) and the flag booleans. Full-outer "
    "join of the two standalone verdict sets; each channel keeps its "
    "own scale shape (broadcast benchmark gram index; broadcast "
    "benchmark vectors into the LSH bucket join). The union is why "
    "both channels exist: each one's blind spot is the other's "
    "catch.",
)
def decontam_union_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    grams = managed_cache(
        d.select(
            "doc_id",
            F.explode(TX.shingles(TX.words(F.col("text")), n=DECONTAM_N)).alias("g"),
        )
    )
    gb = grams.filter(F.col("doc_id") % BENCH_EVERY == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    gt = grams.filter(F.col("doc_id") % BENCH_EVERY != 0)
    ng = (
        gt.join(F.broadcast(gb), "g")
        .groupBy(F.col("doc_id").alias("train_id"))
        .agg(
            F.countDistinct("g").alias("n_shared_ngrams"),
            F.countDistinct("bench_id").alias("n_bench_ngram_docs"),
        )
    )
    # Per-row norms on both bucket-join sides (r14, VX.cosine_pre)
    aug = (
        _vecs_scaled(spark, sf_dir)
        .withColumn("bucket", VX.lsh_bucket(F.col("v")))
        .withColumn("nv", VX.norm(F.col("v")))
    )
    etr = aug.filter(F.col("vec_id") < _VEC_OFFSET)
    ebn = aug.filter(F.col("vec_id") >= _VEC_OFFSET).select(
        F.col("v").alias("bv"), F.col("bucket").alias("bbucket"),
        F.col("nv").alias("nbv"),
    )
    cosv = VX.cosine_pre(F.col("v"), F.col("bv"), F.col("nv"), F.col("nbv"))
    emb = (
        etr.join(F.broadcast(ebn), F.col("bucket") == F.col("bbucket"))
        .select(F.col("vec_id").alias("train_id"), cosv.alias("cosine"))
        .filter(F.col("cosine") >= DECON_COS_T)
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bench_embedding_hits"),
            F.max("cosine").alias("max_cosine"),
        )
    )
    n, e = ng.alias("n"), emb.alias("e")
    return (
        n.join(e, F.col("n.train_id") == F.col("e.train_id"), "full_outer")
        .select(
            F.coalesce(F.col("n.train_id"), F.col("e.train_id")).alias("train_id"),
            F.coalesce("n.n_shared_ngrams", F.lit(0)).cast("bigint").alias("n_shared_ngrams"),
            F.coalesce("n.n_bench_ngram_docs", F.lit(0)).cast("bigint").alias("n_bench_ngram_docs"),
            F.coalesce("e.n_bench_embedding_hits", F.lit(0)).cast("bigint").alias("n_bench_embedding_hits"),
            F.coalesce("e.max_cosine", F.lit(0.0)).alias("max_cosine"),
            F.col("n.train_id").isNotNull().alias("flagged_ngram"),
            F.col("e.train_id").isNotNull().alias("flagged_embedding"),
            (F.col("n.train_id").isNotNull() & F.col("e.train_id").isNotNull()).alias("flagged_both"),
        )
        .orderBy("train_id")
    )


# --------------------------------------------------------------------------
# Tokenizer comparison: fertility under first-round vs iterative tables
# --------------------------------------------------------------------------

# The eval a tokenizer retrain ships with: per-language fertility under
# the CURRENT (one-shot first-round) table vs the CANDIDATE (iterative)
# table, side by side, with the delta in exact ppm — the evidence row a
# "should we swap tokenizers" decision reads. One vocab projection
# computes BOTH encodes (the dictionary trick twice over), one
# broadcast join, one |languages|-row rollup.


@query(
    "bpe_fertility_compare",
    oracle=f"""
    WITH {_bpe_iter_sql_ctes()},
    fm AS (
        SELECT '|' || c1 || '||' || c2 || '|' AS pat,
               '|' || c1 || c2 || '|'         AS rep,
               row_number() OVER (ORDER BY n DESC, c1, c2) AS rnk
        FROM (
            SELECT substr(word, i, 1) AS c1, substr(word, i + 1, 1) AS c2,
                   count(*) AS n
            FROM tw, unnest(range(1, length(word))) AS t(i)
            WHERE length(word) >= 2
            GROUP BY c1, c2
        )
        QUALIFY rnk <= {BPE_TOP}
    ),
    w AS (SELECT lang, unnest({TX.sql_words('text')}) AS word FROM documents),
    vocab AS (SELECT DISTINCT word FROM w),
    enc AS (
        SELECT word,
               (length(sf) - length(replace(sf, '|', ''))) // 2 AS n_first,
               (length(si) - length(replace(si, '|', ''))) // 2 AS n_iter
        FROM (SELECT word,
                     {_bpe_sql_enc_expr_from('fm')} AS sf,
                     {_bpe_iter_sql_enc_expr()} AS si
              FROM vocab)
    )
    SELECT w.lang,
           CAST(count(*) AS BIGINT)            AS n_words,
           CAST(sum(e.n_first) AS BIGINT)      AS n_tokens_first,
           CAST(sum(e.n_iter) AS BIGINT)       AS n_tokens_iter,
           CAST(sum(e.n_first) * 1000000 // count(*) AS BIGINT)
               AS fertility_first_ppm,
           CAST(sum(e.n_iter) * 1000000 // count(*) AS BIGINT)
               AS fertility_iter_ppm
    FROM w JOIN enc e ON e.word = w.word
    GROUP BY w.lang
    ORDER BY w.lang
    """,
    doc="TOKENIZER COMPARISON — per-language fertility under the "
    "one-shot first-round merge table vs the iterative table of the "
    "same size, side by side in exact integer ppm: the eval artifact "
    "a tokenizer swap decision reads (a language whose fertility "
    "drops most is the one the recount served best). One vocab "
    "projection computes both encodes, one broadcast join, "
    "|languages|-row output.",
)
def bpe_fertility_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    iter_merges = _bpe_iter_merges(spark, sf_dir)
    first_merges = [(c1, c2, 0) for c1, c2 in _bpe_merges(spark, sf_dir)]
    d = spread(load(spark, sf_dir, "documents"))
    w = d.select("lang", F.explode(TX.words(F.col("text"))).alias("word"))
    enc = w.select("word").distinct().select(
        "word",
        _bpe_sym_count(_bpe_apply_chain(first_merges, F.col("word"))).alias("n_first"),
        _bpe_sym_count(_bpe_apply_chain(iter_merges, F.col("word"))).alias("n_iter"),
    )
    return (
        w.join(F.broadcast(enc), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_first").cast("bigint").alias("n_tokens_first"),
            F.sum("n_iter").cast("bigint").alias("n_tokens_iter"),
            F.expr("sum(n_first) * 1000000 DIV count(*)")
            .cast("bigint")
            .alias("fertility_first_ppm"),
            F.expr("sum(n_iter) * 1000000 DIV count(*)")
            .cast("bigint")
            .alias("fertility_iter_ppm"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Mid-band score pruning (round 9)
# --------------------------------------------------------------------------

# Data pruning by difficulty band (Sorscher et al. '22, "Beyond neural
# scaling laws"): the best pruning policy keeps the MIDDLE of the
# difficulty distribution — the lowest-scoring tail is noise, the
# highest-scoring tail is redundant easy data. Score = the shared
# hashed-BOW quality score (one featurizer, as everywhere); thresholds
# are EXACT integer quantiles with percentile_disc semantics (the
# smallest score whose cumulative count reaches ceil(q*N)) computed
# from the score HISTOGRAM — the cumulative window runs over |distinct
# scores| rows, bounded metadata however large the corpus, so the
# "global" quantile needs no global sort of data rows.

SBP_LO_NUM, SBP_HI_NUM, SBP_DEN = 1, 3, 4  # keep the p25..p75 band


@query(
    "score_band_pruning",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct({TX.sql_words('text')})) AS tok
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               {QC_BIAS} + sum({_qc_weight_sql(f"{TX.sql_hash28('tok')} % {FH_DIM}")})
                   AS score
        FROM toks GROUP BY doc_id
    ),
    hist AS (SELECT score, count(*) AS c FROM scored GROUP BY score),
    cum AS (
        SELECT score, sum(c) OVER (ORDER BY score) AS cum,
               (SELECT count(*) FROM scored) AS n
        FROM hist
    ),
    th AS (
        SELECT min(CASE WHEN cum >= (n * {SBP_LO_NUM} + {SBP_DEN - 1}) // {SBP_DEN}
                   THEN score END) AS t_lo,
               min(CASE WHEN cum >= (n * {SBP_HI_NUM} + {SBP_DEN - 1}) // {SBP_DEN}
                   THEN score END) AS t_hi
        FROM cum
    )
    SELECT CASE WHEN s.score < t.t_lo THEN 'low'
                WHEN s.score > t.t_hi THEN 'high'
                ELSE 'keep' END AS band,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(min(s.score) AS BIGINT) AS min_score,
           CAST(max(s.score) AS BIGINT) AS max_score,
           CAST(max(t.t_lo) AS BIGINT)  AS t_lo,
           CAST(max(t.t_hi) AS BIGINT)  AS t_hi
    FROM scored s, th t
    GROUP BY 1
    ORDER BY band
    """,
    doc="MID-BAND DATA PRUNING (Sorscher et al. '22): keep documents "
    "whose quality score sits in the exact p25..p75 band — the low "
    "tail is noise, the high tail redundant. Thresholds use "
    "percentile_disc semantics (smallest score whose cumulative count "
    "reaches ceil(q*N)) over the SCORE HISTOGRAM, so the global "
    "quantile costs one partial-aggregable count plus a window over "
    "|distinct scores| rows of metadata — no global data sort. Score "
    "is the shared hashed-BOW featurizer; everything is integer, "
    "division-free, bit-identical cross-engine.",
)
def score_band_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    feat = d.select(
        "doc_id",
        F.explode(F.array_distinct(TX.words(F.col("text")))).alias("tok"),
    ).select("doc_id", (TX.hash28(F.col("tok")) % FH_DIM).alias("bucket"))
    weight = (F.col("bucket") * 37 + 11) % 21 - 10
    scored = managed_cache(
        feat.groupBy("doc_id").agg(
            (F.lit(QC_BIAS) + F.sum(weight)).cast("bigint").alias("score")
        )
    )
    hist = scored.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    n_tot = scored.agg(F.count(F.lit(1)).alias("n"))
    cum = hist.crossJoin(F.broadcast(n_tot)).withColumn(
        "cum",
        F.sum("c").over(W.orderBy("score").rowsBetween(W.unboundedPreceding, 0)),
    )
    lo_pos = (F.col("n") * SBP_LO_NUM + (SBP_DEN - 1)) / SBP_DEN
    hi_pos = (F.col("n") * SBP_HI_NUM + (SBP_DEN - 1)) / SBP_DEN
    th = cum.agg(
        F.min(
            F.when(F.col("cum") >= F.floor(lo_pos), F.col("score"))
        ).alias("t_lo"),
        F.min(
            F.when(F.col("cum") >= F.floor(hi_pos), F.col("score"))
        ).alias("t_hi"),
    )
    band = (
        F.when(F.col("score") < F.col("t_lo"), "low")
        .when(F.col("score") > F.col("t_hi"), "high")
        .otherwise("keep")
    )
    return (
        scored.crossJoin(F.broadcast(th))
        .groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("score").cast("bigint").alias("min_score"),
            F.max("score").cast("bigint").alias("max_score"),
            F.max("t_lo").cast("bigint").alias("t_lo"),
            F.max("t_hi").cast("bigint").alias("t_hi"),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# Robust MAD outlier gate (round 9)
# --------------------------------------------------------------------------

# The robust length gate: flag documents whose word count sits more
# than MAD_K median-absolute-deviations from the median — the outlier
# rule that, unlike mean/stddev z-scores, a handful of monster
# documents cannot drag (median and MAD have 50% breakdown points).
# Both quantiles use percentile_disc semantics over HISTOGRAMS (the
# score_band_pruning machinery): the median over the length histogram,
# the MAD over the |len - median| histogram — two bounded-metadata
# windows, no global data sort, all integers, the verdict compared
# division-free (|len - med| > MAD_K * mad).
#
# Planted outliers (the natural corpus is uniform 10..100 words with
# MAD 22, so a 3-MAD gate would never fire on it): every MAD_EVERY-th
# doc gains a runaway copy with its text repeated MAD_REP times
# (~8x median length, far outside the 3-MAD band) — which is ALSO the
# robustness demonstration: the runaways barely move the median/MAD
# the gate is built from, exactly why MAD beats mean/stddev here.

MAD_K = 3
MAD_EVERY = 40  # docs with doc_id % 40 == 0 gain a runaway copy
MAD_REP = 8
MAD_OFFSET = 7_000_000


@query(
    "robust_outlier_mad",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {MAD_OFFSET}, trim(repeat(text || ' ', {MAD_REP}))
        FROM documents WHERE doc_id % {MAD_EVERY} = 0
    ),
    lens AS (
        SELECT doc_id, len({TX.sql_words('text')}) AS l FROM aug
    ),
    h1 AS (SELECT l, count(*) AS c FROM lens GROUP BY l),
    c1 AS (
        SELECT l, sum(c) OVER (ORDER BY l) AS cum,
               (SELECT count(*) FROM lens) AS n
        FROM h1
    ),
    med AS (SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN l END) AS m FROM c1),
    dev AS (SELECT doc_id, l, abs(l - (SELECT m FROM med)) AS d FROM lens),
    h2 AS (SELECT d, count(*) AS c FROM dev GROUP BY d),
    c2 AS (
        SELECT d, sum(c) OVER (ORDER BY d) AS cum,
               (SELECT count(*) FROM lens) AS n
        FROM h2
    ),
    mad AS (SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN d END) AS m FROM c2)
    SELECT CASE WHEN dev.d > {MAD_K} * mad.m THEN 'outlier'
                ELSE 'inlier' END AS band,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(min(dev.l) AS BIGINT) AS min_len,
           CAST(max(dev.l) AS BIGINT) AS max_len,
           CAST(max(med.m) AS BIGINT) AS median_len,
           CAST(max(mad.m) AS BIGINT) AS mad
    FROM dev, med, mad
    GROUP BY 1
    ORDER BY band
    """,
    doc=f"ROBUST OUTLIER GATE — |len − median| > {MAD_K}·MAD on word "
    "counts: the length filter monster documents cannot drag (median "
    "and MAD have 50% breakdown points, unlike mean/stddev z-scores). "
    "Median AND MAD both use percentile_disc semantics over "
    "HISTOGRAMS — two bounded-metadata cumulative windows, no global "
    "data sort, all-integer and division-free, bit-identical "
    "cross-engine. One corpus scan feeds both histograms.",
)
def robust_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    runaway = d.filter(F.col("doc_id") % MAD_EVERY == 0).select(
        (F.col("doc_id") + MAD_OFFSET).alias("doc_id"),
        F.trim(F.repeat(F.concat(F.col("text"), F.lit(" ")), MAD_REP)).alias("text"),
    )
    lens = managed_cache(
        d.unionByName(runaway).select(
            "doc_id", F.size(TX.words(F.col("text"))).cast("bigint").alias("l")
        )
    )
    n_tot = lens.agg(F.count(F.lit(1)).alias("n"))

    def _disc_median(vals: DataFrame, col: str) -> DataFrame:
        hist = vals.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        cum = hist.crossJoin(F.broadcast(n_tot)).withColumn(
            "cum",
            F.sum("c").over(W.orderBy(col).rowsBetween(W.unboundedPreceding, 0)),
        )
        pos = F.floor((F.col("n") + 1) / 2)
        return cum.agg(
            F.min(F.when(F.col("cum") >= pos, F.col(col))).alias("m")
        )

    med = _disc_median(lens, "l")
    dev = lens.crossJoin(F.broadcast(med)).select(
        "doc_id", "l", F.abs(F.col("l") - F.col("m")).alias("d")
    )
    mad = _disc_median(dev.select("d"), "d").select(F.col("m").alias("mm"))
    band = F.when(F.col("d") > MAD_K * F.col("mm"), "outlier").otherwise("inlier")
    return (
        dev.crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(med))
        .groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("l").cast("bigint").alias("min_len"),
            F.max("l").cast("bigint").alias("max_len"),
            F.max("m").cast("bigint").alias("median_len"),
            F.max("mm").cast("bigint").alias("mad"),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# Bigram-LM perplexity quality gate (round 10) — the CCNet filtering face
# --------------------------------------------------------------------------

# The one quality face the repo lacked: language-model scoring (CCNet /
# Wenzek et al. '19 — every production pretraining pipeline gates raw
# text on LM perplexity before training). Model = bigram counts with
# add-one smoothing: p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V). Scoring and
# gating are DIVISION-FREE and float-free so both engines agree
# bit-for-bit (the quality_train_serve_scores discipline):
#
# - log2 is computed as an EXACT fixed-point integer function L(x) ≈
#   2^LM_B * log2(x): normalize x to mantissa m ∈ [2^LM_S, 2^{LM_S+1}),
#   then LM_B rounds of "square the mantissa, renormalize, emit one
#   fractional bit" — the classical shift-and-square binary-logarithm
#   algorithm, every intermediate < 2^{2*LM_S+2} = 2^62 so the whole
#   thing is exact int64 on Spark and exact BIGINT in DuckDB (verified
#   identical round-by-round; monotone in x; |L(x)/2^B - log2 x| <
#   2e-5 measured). L is evaluated ONCE per distinct COUNT VALUE — the
#   dictionary is bounded by the number of distinct frequencies, not by
#   vocabulary — then broadcast back onto the count tables.
# - per-doc negative log2-likelihood nll_fp = Σ_bigrams (L(c1+V) −
#   L(c12+1)) is an exact integer (≥ 0 since c12+1 ≤ c1+V and L is
#   monotone); the per-token rate is quantized division-free as
#   q = (nll_fp << LM_RATE_Q) div n — floor, both engines.
# - the gate is CCNet's head/middle/tail TERCILE banding, computed over
#   the bounded histogram of q (never a global sort): cut_k = min q
#   with 3*cum >= k*N, cross-multiplied — no ceil(), no floats. Tercile
#   banding (not an absolute threshold) keeps the gate meaningful when
#   the driver regenerates the corpus each round.
#
# 100 TB: one corpus tokenize pass (cached bigram table) feeds counts,
# vocabulary and scoring; counts are partial-aggregable shuffles on the
# (w1,w2) key; the unigram/model tables broadcast into the scoring join
# (the bigram-count side shuffles once on its natural key — stopword
# bigrams are hot keys, AQE skew split applies, see
# skew_join_salted_mitigation); the log dictionary and the tercile
# histogram are metadata-sized. No floats anywhere, so results are
# reproducible across cluster sizes and reruns.

LM_B = 16  # fractional bits of the fixed-point log2
LM_S = 30  # mantissa scale: m*m < 2^62, exact signed-int64
LM_MIN_C = 3  # train-query model slice: bigrams with count >= 3
LM_RATE_Q = 10  # nll-rate quantization: q = (nll_fp << 10) div n_bigrams


def _lm_log_sql(sfx: str = "", src: str = "xs") -> str:
    """DuckDB mirror of :func:`_fp_log2_dict`: CTEs lg0{sfx}..lg{LM_B}{sfx}
    unroll the shift-and-square rounds over the (bounded) dictionary
    ``src``, each MATERIALIZED — each round references the previous once,
    but materializing pins linear evaluation regardless of inlining.
    ``sfx`` namespaces the chain so multiple dictionaries can coexist in
    one oracle (the unigram trainer needs one per EM round)."""
    parts = [
        f""",
    lg0{sfx} AS MATERIALIZED (
        SELECT x, length(ltrim(bin(x), '0')) - 1 AS e,
               CASE WHEN length(ltrim(bin(x), '0')) - 1 <= {LM_S}
                    THEN x << ({LM_S} - (length(ltrim(bin(x), '0')) - 1))
                    ELSE x >> ((length(ltrim(bin(x), '0')) - 1) - {LM_S})
               END AS m,
               CAST(0 AS BIGINT) AS frac
        FROM {src}
    )"""
    ]
    for k in range(1, LM_B + 1):
        parts.append(
            f""",
    lg{k}{sfx} AS MATERIALIZED (
        SELECT x, e,
               CASE WHEN (m*m) >> {LM_S} >= {1 << (LM_S + 1)}
                    THEN (m*m) >> {LM_S + 1} ELSE (m*m) >> {LM_S}
               END AS m,
               frac * 2 + CASE WHEN (m*m) >> {LM_S} >= {1 << (LM_S + 1)}
                               THEN 1 ELSE 0 END AS frac
        FROM lg{k - 1}{sfx}
    )"""
        )
    parts.append(
        f""",
    lg{sfx} AS MATERIALIZED (SELECT x, e * {1 << LM_B} + frac AS lgv FROM lg{LM_B}{sfx})"""
    )
    return "".join(parts)


def _lm_sql_base(src: str = "documents") -> str:
    """Shared oracle CTEs: bigram table (with multiplicity), counts,
    vocabulary, the log dictionary, and the L-annotated model tables.
    ``src`` is any relation exposing (doc_id, text) — the e2e_v3
    composition feeds the post-funnel corpus instead of raw documents."""
    w = TX.sql_words("text")
    return f"""
    bg AS MATERIALIZED (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM (SELECT doc_id, {w} AS w FROM {src}) t,
             unnest(range(1, len(w))) AS r(i)
        WHERE len(w) >= 2
    ),
    c12 AS MATERIALIZED (
        SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
    ),
    c1 AS MATERIALIZED (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
    voc AS MATERIALIZED (
        SELECT count(DISTINCT w) AS v
        FROM (SELECT w1 AS w FROM bg UNION ALL SELECT w2 FROM bg)
    ),
    xs AS MATERIALIZED (
        SELECT DISTINCT x FROM (
            SELECT c12 + 1 AS x FROM c12
            UNION
            SELECT c1 + (SELECT v FROM voc) AS x FROM c1
        )
    ){_lm_log_sql()},
    c12l AS MATERIALIZED (
        SELECT c12.w1, c12.w2, c12.c12, lg.lgv AS l12
        FROM c12 JOIN lg ON lg.x = c12.c12 + 1
    ),
    c1l AS MATERIALIZED (
        SELECT c1.w1, c1.c1 + (SELECT v FROM voc) AS c1v, lg.lgv AS l1
        FROM c1 JOIN lg ON lg.x = c1.c1 + (SELECT v FROM voc)
    )"""


_LM_SQL_SCORE = f""",
    sc AS MATERIALIZED (
        SELECT bg.doc_id,
               count(*) AS n_bigrams,
               sum(c1l.l1 - c12l.l12) AS nll_fp
        FROM bg
        JOIN c12l ON bg.w1 = c12l.w1 AND bg.w2 = c12l.w2
        JOIN c1l ON bg.w1 = c1l.w1
        GROUP BY bg.doc_id
    ),
    scq AS MATERIALIZED (
        SELECT doc_id, n_bigrams, nll_fp,
               (nll_fp << {LM_RATE_Q}) // n_bigrams AS nll_rate_q
        FROM sc
    )"""


def _fp_log2_dict(xs: DataFrame) -> DataFrame:
    """(x bigint >= 1) -> (x, lgv): lgv = exact fixed-point log2 with
    LM_B fractional bits by LM_B shift-and-square rounds (see the block
    comment above; DuckDB mirror: :func:`_lm_log_sql`). The dictionary
    is bounded (distinct count VALUES), so the 17-projection plan is
    pinned with localCheckpoint and broadcast into the model joins."""
    e0 = F.length(F.bin(F.col("x"))) - 1
    df = xs.select(
        "x",
        e0.cast("int").alias("e"),
        F.when(
            e0 <= LM_S,
            F.col("x")
            * F.expr(f"shiftleft(CAST(1 AS BIGINT), {LM_S} - (length(bin(x)) - 1))"),
        )
        .otherwise(F.expr(f"shiftright(x, (length(bin(x)) - 1) - {LM_S})"))
        .cast("bigint")
        .alias("m"),
        F.lit(0).cast("bigint").alias("frac"),
    )
    for _ in range(LM_B):
        msq = F.expr(f"shiftright(m * m, {LM_S})")
        bit = msq >= F.lit(1 << (LM_S + 1))
        df = df.select(
            "x",
            "e",
            F.when(bit, F.expr(f"shiftright(m * m, {LM_S + 1})"))
            .otherwise(msq)
            .alias("m"),
            (F.col("frac") * 2 + F.when(bit, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("frac"),
        )
    return df.select(
        "x", (F.col("e").cast("bigint") * (1 << LM_B) + F.col("frac")).alias("lgv")
    ).localCheckpoint()  # bounded: one row per distinct count value


def _lm_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2) bigram tokens WITH multiplicity — the one corpus
    pass everything else (counts, vocabulary, scoring) derives from."""
    d = spread(load(spark, sf_dir, "documents"))
    return _lm_bigrams_from(d)


def _lm_bigrams_from(d: DataFrame) -> DataFrame:
    """Bigram pass over any (doc_id, text) relation (cached)."""
    return managed_cache(
        d.select("doc_id", TX.words(F.col("text")).alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(w[i - 1] AS w1, w[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )


def _lm_model(bg: DataFrame):
    """(c12l, c1l): the L-annotated bigram / unigram count tables.
    c1 derives from c12 (partial-aggregable rollup, no second corpus
    shuffle); V = distinct words over bigram positions (deterministic,
    derived from the same cached pass)."""
    c12 = managed_cache(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    # V from the CACHED distinct-pair table, not a second corpus pass
    # (optimization r14, guide §2.3): the distinct words over bigram
    # positions equal the distinct words over c12's key pairs (c12 is
    # exactly the distinct (w1, w2) set), and c12 is orders of
    # magnitude smaller than the token-level bg it summarizes — the
    # old plan re-shuffled 2x the corpus bigram tokens through a
    # countDistinct per model build (~20 builds across the suite).
    voc = (
        c12.select(F.col("w1").alias("w"))
        .unionAll(c12.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").cast("bigint").alias("v"))
    )
    c1v = c1.crossJoin(F.broadcast(voc)).select(
        "w1", (F.col("c1") + F.col("v")).cast("bigint").alias("c1v")
    )
    xs = (
        c12.select((F.col("c12") + 1).cast("bigint").alias("x"))
        .union(c1v.select(F.col("c1v").alias("x")))
        .distinct()
    )
    lg = _fp_log2_dict(xs)
    c12l = (
        c12.withColumn("x", (F.col("c12") + 1).cast("bigint"))
        .join(F.broadcast(lg), "x")
        .select("w1", "w2", "c12", F.col("lgv").alias("l12"))
    )
    c1l = (
        c1v.withColumn("x", F.col("c1v"))
        .join(F.broadcast(lg), "x")
        .select("w1", "c1v", F.col("lgv").alias("l1"))
    )
    return c12l, c1l


def _lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lm_scores_from(_lm_bigrams(spark, sf_dir))


def _lm_scores_from(bg: DataFrame) -> DataFrame:
    c12l, c1l = _lm_model(bg)
    return (
        bg.join(c12l, ["w1", "w2"])
        .join(F.broadcast(c1l), "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.col("l1") - F.col("l12")).cast("bigint").alias("nll_fp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "nll_fp",
            F.expr(f"shiftleft(nll_fp, {LM_RATE_Q}) div n_bigrams").alias(
                "nll_rate_q"
            ),
        )
    )


@query(
    "lm_bigram_train",
    oracle=f"""
    WITH {_lm_sql_base()}
    SELECT c12l.w1, c12l.w2, c12l.c12, c1l.c1v,
           c1l.l1 - c12l.l12 AS nll_fp
    FROM c12l JOIN c1l USING (w1)
    WHERE c12l.c12 >= {LM_MIN_C}
    ORDER BY w1, w2
    """,
    doc="BIGRAM-LM TRAINING (the CCNet quality-gate model): one corpus "
    "pass accumulates bigram/unigram counts; add-one smoothing over the "
    "corpus vocabulary V; each surviving bigram (count >= "
    f"{LM_MIN_C}) is emitted with its EXACT fixed-point negative "
    "log2-probability nll_fp = L(c1+V) - L(c12+1), L the integer "
    "shift-and-square log2 — no floats, bit-identical cross-engine. "
    "100 TB: counts are partial-aggregable; L is evaluated once per "
    "distinct count value (bounded dictionary, broadcast back).",
)
def lm_bigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    bg = _lm_bigrams(spark, sf_dir)
    c12l, c1l = _lm_model(bg)
    return (
        c12l.filter(F.col("c12") >= LM_MIN_C)
        .join(F.broadcast(c1l), "w1")
        .select(
            "w1",
            "w2",
            "c12",
            "c1v",
            (F.col("l1") - F.col("l12")).cast("bigint").alias("nll_fp"),
        )
        .orderBy("w1", "w2")
    )


@query(
    "lm_perplexity_score",
    oracle=f"""
    WITH {_lm_sql_base()}{_LM_SQL_SCORE}
    SELECT doc_id, n_bigrams, nll_fp, nll_rate_q
    FROM scq ORDER BY doc_id
    """,
    doc="LM PERPLEXITY SCORING: every document's exact integer negative "
    "log2-likelihood under the corpus bigram model (sum over bigram "
    "TOKENS of L(c1+V) - L(c12+1)) plus the division-free per-token "
    f"rate q = (nll_fp << {LM_RATE_Q}) div n_bigrams (perplexity = "
    "2^(q/2^{qshift}) conceptually — never computed as a float). "
    "100 TB: the corpus-sized bigram table shuffles once onto the "
    "model key; unigram model broadcasts; scores are one doc_id "
    "aggregation.".replace("{qshift}", str(LM_RATE_Q + LM_B)),
)
def lm_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lm_scores(spark, sf_dir).orderBy("doc_id")


@query(
    "lm_perplexity_gate",
    oracle=f"""
    WITH {_lm_sql_base()}{_LM_SQL_SCORE},
    h AS (SELECT nll_rate_q AS q, count(*) AS c FROM scq GROUP BY nll_rate_q),
    cum AS (SELECT q, sum(c) OVER (ORDER BY q) AS cum FROM h),
    cuts AS (
        SELECT min(CASE WHEN cum * 3 >= (SELECT count(*) FROM scq) THEN q END)
                   AS cut1,
               min(CASE WHEN cum * 3 >= 2 * (SELECT count(*) FROM scq) THEN q END)
                   AS cut2
        FROM cum
    )
    SELECT scq.doc_id, scq.nll_rate_q,
           CASE WHEN scq.nll_rate_q <= cuts.cut1 THEN 'head'
                WHEN scq.nll_rate_q <= cuts.cut2 THEN 'middle'
                ELSE 'tail' END AS band,
           scq.nll_rate_q <= cuts.cut2 AS keep
    FROM scq, cuts ORDER BY scq.doc_id
    """,
    doc="LM PERPLEXITY GATE (CCNet head/middle/tail): documents banded "
    "by TERCILES of the quantized per-token nll rate — cut_k = min q "
    "with 3*cum(q) >= k*N over the bounded rate histogram, "
    "cross-multiplied (no division, no percentile floats); keep = not "
    "tail. Terciles, not absolute thresholds, so the gate stays "
    "calibrated when the corpus is regenerated. 100 TB: the histogram "
    "and cuts are metadata-sized broadcasts; the corpus never sorts.",
)
def lm_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = managed_cache(_lm_scores(spark, sf_dir).select("doc_id", "nll_rate_q"))
    n_tot = sc.agg(F.count(F.lit(1)).alias("n"))
    hist = sc.groupBy("nll_rate_q").agg(F.count(F.lit(1)).alias("c"))
    # window over the bounded RATE HISTOGRAM (metadata), not the corpus
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(W.orderBy("nll_rate_q").rowsBetween(W.unboundedPreceding, 0)),
    )
    cuts = cum.crossJoin(F.broadcast(n_tot)).agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("n"), F.col("nll_rate_q"))
        ).alias("cut1"),
        F.min(
            F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("nll_rate_q"))
        ).alias("cut2"),
    )
    band = (
        F.when(F.col("nll_rate_q") <= F.col("cut1"), "head")
        .when(F.col("nll_rate_q") <= F.col("cut2"), "middle")
        .otherwise("tail")
    )
    return (
        sc.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "nll_rate_q",
            band.alias("band"),
            (F.col("nll_rate_q") <= F.col("cut2")).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Unigram-LM tokenizer trainer (round 10) — SentencePiece-style hard-EM
# --------------------------------------------------------------------------

# The tokenizer family's second real algorithm beside the iterative BPE
# rack above (Kudo '18's unigram LM is what SentencePiece trains by
# default; BPE and unigram are THE two production subword algorithms).
# Exact-arithmetic hard-EM, UNIG_ROUNDS rounds:
#
#   seed:   piece candidates = every substring of length 1..UNIG_MAXP of
#           every dictionary word; seed counts = occurrence counts
#           weighted by word multiplicity.
#   E-step: VITERBI-segment every dictionary word under the current
#           piece scores — maximize Σ v(piece) with v = L(c+1) − L(Ctot)
#           (L = the exact fixed-point log2 the LM perplexity gate
#           introduced, so the objective is a scaled integer
#           log-likelihood with add-one smoothing; the −L(Ctot) per
#           piece is the compression pressure that favors fewer, longer
#           pieces). The DP is an O(n·UNIG_MAXP) integer forward fold
#           per word (best score + chosen length per position; ties
#           prefer the LONGEST piece) and an O(n) backward extraction —
#           both built-in array folds (F.aggregate), JVM-side, no UDF.
#   M-step: usage counts from the chosen segmentations become the next
#           round's scores (hard-EM count re-estimation).
#
# Same discipline the iterative BPE pinned: the corpus is scanned ONCE
# (cached distinct-word dictionary); every round's joins touch
# dictionary/piece tables only, with counts and the log dictionary
# BROADCAST back; no per-word collect anywhere (the DP lives inside a
# projection). The oracle replays every round as unrolled MATERIALIZED
# CTEs, with the two sequential passes as RECURSIVE CTEs carrying the
# DP state lists — verified bit-identical to the Spark folds. 100 TB:
# training cost ∝ vocabulary, not corpus; serving is one broadcast
# joins chain, exactly like bpe_iterative_encode_counts.

UNIG_MAXP = 3  # max piece length; the DP below is unrolled for it
UNIG_ROUNDS = 2  # hard-EM rounds after the seed count
UNIG_MIN_USES = 5  # vocab query prune threshold
UNIG_NEG = -(1 << 50)  # invalid-candidate sentinel (dominates any real score)
UNIG_FILL = -(1 << 40)  # alignment filler for l > i slots (never read)


def _unig_sql_round(r: int) -> str:
    """One EM round as DuckDB CTEs: scores from c_{r-1}, Viterbi forward
    (RECURSIVE, state = best[] + chosen-length[] lists), backward piece
    extraction (RECURSIVE), usage recount into c_{r}."""
    c3 = f"(CASE WHEN i + 1 >= 3 THEN b[i - 1] + v[i * 3 + 3] ELSE {UNIG_NEG} END)"
    c2 = f"(CASE WHEN i + 1 >= 2 THEN b[i] + v[i * 3 + 2] ELSE {UNIG_NEG} END)"
    c1 = "(b[i + 1] + v[i * 3 + 1])"
    return f""",
    ct_{r} AS (SELECT CAST(sum(c) + 1 AS BIGINT) AS ct FROM c_{r - 1}),
    xs_{r} AS MATERIALIZED (
        SELECT DISTINCT x FROM (
            SELECT c + 1 AS x FROM c_{r - 1}
            UNION SELECT ct FROM ct_{r}
            UNION SELECT 1
        )
    ){_lm_log_sql(f"_{r}", f"xs_{r}")},
    ltot_{r} AS (SELECT lg_{r}.lgv AS lt FROM lg_{r}, ct_{r}
                 WHERE lg_{r}.x = ct_{r}.ct),
    vf_{r} AS MATERIALIZED (
        SELECT p.word, any_value(p.cnt) AS cnt,
               CAST(length(p.word) AS INT) AS n,
               list(CASE WHEN p.piece IS NULL THEN CAST({UNIG_FILL} AS BIGINT)
                         ELSE lgp.lgv - (SELECT lt FROM ltot_{r}) END
                    ORDER BY p.i, p.l) AS v
        FROM pieces p
        LEFT JOIN c_{r - 1} cc ON cc.piece = p.piece
        LEFT JOIN lg_{r} lgp ON lgp.x = coalesce(cc.c, 0) + 1
        GROUP BY p.word, n
    ),
    fwd_{r} AS (
        SELECT word, cnt, n, v, 0 AS i,
               [CAST(0 AS BIGINT)] AS b, []::INT[] AS bl
        FROM vf_{r}
        UNION ALL
        SELECT word, cnt, n, v, i + 1,
            list_append(b, CASE WHEN {c3} >= {c2} AND {c3} >= {c1} THEN {c3}
                                WHEN {c2} >= {c1} THEN {c2} ELSE {c1} END),
            list_append(bl, CASE WHEN {c3} >= {c2} AND {c3} >= {c1} THEN 3
                                 WHEN {c2} >= {c1} THEN 2 ELSE 1 END)
        FROM fwd_{r} WHERE i < n
    ),
    fin_{r} AS MATERIALIZED (
        SELECT word, cnt, n, b[n + 1] AS obj, bl FROM fwd_{r} WHERE i = n
    ),
    bwd_{r} AS (
        SELECT word, cnt, bl, CAST(n AS INT) AS pos, []::VARCHAR[] AS ps
        FROM fin_{r}
        UNION ALL
        SELECT word, cnt, bl, pos - bl[pos],
               list_append(ps, substr(word, pos - bl[pos] + 1, bl[pos]))
        FROM bwd_{r} WHERE pos > 0
    ),
    seg_{r} AS MATERIALIZED (
        SELECT s.word, s.cnt, s.ps, f.obj
        FROM (SELECT word, cnt, ps FROM bwd_{r} WHERE pos = 0) s
        JOIN fin_{r} f USING (word)
    ),
    c_{r} AS MATERIALIZED (
        SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
        FROM (SELECT cnt, unnest(ps) AS piece FROM seg_{r})
        GROUP BY piece
    )"""


def _unig_sql_base() -> str:
    return f"""dic AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({TX.sql_words('text')}) AS word FROM documents)
        WHERE length(word) >= 1
        GROUP BY word
    ),
    pieces AS MATERIALIZED (
        SELECT word, cnt, CAST(i AS INT) AS i, CAST(l AS INT) AS l,
               CASE WHEN l <= i
                    THEN substr(word, CAST(i - l + 1 AS INT), CAST(l AS INT))
               END AS piece
        FROM dic, unnest(range(1, length(word) + 1)) AS t(i),
             unnest([1, 2, 3]) AS u(l)
    ),
    c_0 AS MATERIALIZED (
        SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
        FROM pieces WHERE piece IS NOT NULL GROUP BY piece
    ){"".join(_unig_sql_round(r) for r in range(1, UNIG_ROUNDS + 1))}"""


def _unig_dic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    return managed_cache(
        d.select(F.explode(TX.words(F.col("text"))).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _unig_pieces(dic: DataFrame) -> DataFrame:
    """(word, cnt, i, l, piece): every (position, length) slot, l slots
    with l > i kept as NULL pieces so the per-word score list aligns to
    index (i-1)*UNIG_MAXP + l."""
    return (
        dic.select(
            "word", "cnt",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
        )
        .select(
            "word", "cnt", "i",
            F.explode(
                F.array(*[F.lit(l) for l in range(1, UNIG_MAXP + 1)])
            ).alias("l"),
        )
        .select(
            "word", "cnt",
            F.col("i").cast("int").alias("i"),
            F.col("l").cast("int").alias("l"),
            F.when(
                F.col("l") <= F.col("i"),
                F.col("word").substr(F.col("i") - F.col("l") + 1, F.col("l")),
            ).alias("piece"),
        )
    )


def _unig_seed_counts(pieces: DataFrame) -> DataFrame:
    return (
        pieces.filter(F.col("piece").isNotNull())
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )


def _unig_vflat(pieces: DataFrame, counts: DataFrame) -> DataFrame:
    """(word, cnt, n, v): per word the flat score list v[(i-1)*3 + l] =
    L(c(piece)+1) - L(Ctot), filler for invalid slots. Counts and the
    log dictionary broadcast; one shuffle on the piece key."""
    ctot = counts.agg((F.sum("c") + 1).cast("bigint").alias("ct"))
    xs = (
        counts.select((F.col("c") + 1).cast("bigint").alias("x"))
        .union(ctot.select(F.col("ct").alias("x")))
        .union(pieces.sparkSession.range(1, 2).select(F.col("id").alias("x")))
        .distinct()
    )
    lg = _fp_log2_dict(xs)
    ltot = ctot.join(F.broadcast(lg), ctot["ct"] == lg["x"]).select(
        F.col("lgv").alias("lt")
    )
    scored = (
        pieces.join(F.broadcast(counts), "piece", "left")
        .withColumn("x", (F.coalesce("c", F.lit(0)) + 1).cast("bigint"))
        .join(F.broadcast(lg), "x", "left")
        .crossJoin(F.broadcast(ltot))
        .select(
            "word", "cnt", "i", "l",
            F.when(
                F.col("piece").isNull(), F.lit(UNIG_FILL).cast("bigint")
            )
            .otherwise(F.col("lgv") - F.col("lt"))
            .alias("v"),
        )
    )
    return (
        scored.groupBy("word", "cnt")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "l", "v"))),
                lambda s: s["v"],
            ).alias("v")
        )
        .withColumn("n", F.length("word").cast("int"))
    )


def _unig_segment(vflat: DataFrame) -> DataFrame:
    """Viterbi E-step: (word, cnt, n, ps, obj) — forward DP fold (best
    score + chosen length per position, ties prefer the longest piece)
    then backward extraction fold. Pure built-in HOFs inside one
    projection; the DuckDB oracle replays both passes as RECURSIVE CTEs
    (fwd_{{r}}/bwd_{{r}}), verified bit-identical."""
    neg = F.lit(UNIG_NEG).cast("bigint")

    def cand(acc, i, l):
        return F.when(
            i >= l,
            F.element_at(acc["b"], i - F.lit(l) + 1)
            + F.element_at(F.col("v"), (i - 1) * 3 + F.lit(l)),
        ).otherwise(neg)

    def step(acc, i):
        c1, c2, c3 = cand(acc, i, 1), cand(acc, i, 2), cand(acc, i, 3)
        bestv = (
            F.when((c3 >= c2) & (c3 >= c1), c3).when(c2 >= c1, c2).otherwise(c1)
        )
        bestl = (
            F.when((c3 >= c2) & (c3 >= c1), F.lit(3))
            .when(c2 >= c1, F.lit(2))
            .otherwise(F.lit(1))
        )
        return F.struct(
            F.concat(acc["b"], F.array(bestv)).alias("b"),
            F.concat(acc["bl"], F.array(bestl.cast("int"))).alias("bl"),
        )

    init = F.struct(
        F.array(F.lit(0).cast("bigint")).alias("b"),
        F.array().cast("array<int>").alias("bl"),
    )
    fwd = vflat.withColumn(
        "acc", F.aggregate(F.sequence(F.lit(1), F.col("n")), init, step)
    ).select(
        "word", "cnt", "n",
        F.col("acc.bl").alias("bl"),
        F.element_at(F.col("acc.b"), F.col("n") + 1).alias("obj"),
    )

    def bstep(acc, _):
        ln = F.element_at(F.col("bl"), acc["pos"])
        return F.when(
            acc["pos"] > 0,
            F.struct(
                (acc["pos"] - ln).cast("int").alias("pos"),
                F.concat(
                    acc["ps"],
                    F.array(F.col("word").substr(acc["pos"] - ln + 1, ln)),
                ).alias("ps"),
            ),
        ).otherwise(acc)

    binit = F.struct(
        F.col("n").cast("int").alias("pos"),
        F.array().cast("array<string>").alias("ps"),
    )
    return fwd.withColumn(
        "seg",
        F.aggregate(
            F.sequence(F.lit(1), F.greatest(F.col("n"), F.lit(1))), binit, bstep
        ),
    ).select("word", "cnt", "n", F.col("seg.ps").alias("ps"), "obj")


def _unig_usage(seg: DataFrame) -> DataFrame:
    return (
        seg.select("cnt", F.explode("ps").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )


def _unig_em(spark: SparkSession, sf_dir: str):
    """Run the seed + UNIG_ROUNDS hard-EM rounds; returns the per-round
    segmentations and the final usage counts (all lazy/cached — no
    driver collect anywhere in the loop)."""
    dic = _unig_dic(spark, sf_dir)
    pieces = managed_cache(_unig_pieces(dic))
    counts = _unig_seed_counts(pieces)
    segs = []
    for _ in range(UNIG_ROUNDS):
        seg = managed_cache(_unig_segment(_unig_vflat(pieces, counts)))
        counts = _unig_usage(seg)
        segs.append(seg)
    return segs, counts


@query(
    "unigram_lm_vocab",
    oracle=f"""
    WITH RECURSIVE {_unig_sql_base()}
    SELECT piece, CAST(length(piece) AS INT) AS piece_len, c AS n_uses
    FROM c_{UNIG_ROUNDS}
    WHERE c >= {UNIG_MIN_USES}
    ORDER BY piece
    """,
    doc=f"UNIGRAM-LM TOKENIZER VOCABULARY (SentencePiece-style hard-EM, "
    f"{UNIG_ROUNDS} rounds): substring seed counts -> per-round exact "
    "integer Viterbi segmentation of the cached distinct-word "
    "dictionary under fixed-point log-likelihood scores -> usage "
    f"recount; final pieces with >= {UNIG_MIN_USES} weighted uses. "
    "Corpus scanned once; DP is an in-projection array fold (no UDF, "
    "no per-word collect); counts + log dictionary broadcast. Oracle "
    "replays every round as MATERIALIZED CTEs with RECURSIVE "
    "forward/backward DP passes.",
)
def unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, counts = _unig_em(spark, sf_dir)
    return (
        counts.filter(F.col("c") >= UNIG_MIN_USES)
        .select(
            "piece",
            F.length("piece").cast("int").alias("piece_len"),
            F.col("c").alias("n_uses"),
        )
        .orderBy("piece")
    )


@query(
    "unigram_lm_em_stats",
    oracle=f"""
    WITH RECURSIVE {_unig_sql_base()}
    SELECT * FROM (
        {" UNION ALL ".join(
            f'''SELECT {r} AS round,
               CAST(sum(cnt * len(ps)) AS BIGINT) AS n_tokens,
               (SELECT count(*) FROM c_{r}) AS n_pieces,
               CAST(sum(cnt * obj) AS BIGINT) AS objective_fp
        FROM seg_{r}'''
            for r in range(1, UNIG_ROUNDS + 1)
        )}
    ) ORDER BY round
    """,
    doc="UNIGRAM-EM ROUND AUDIT: per round the corpus token count under "
    "that round's Viterbi segmentation, the live piece count, and the "
    "exact integer objective Σ cnt·best(word) — the numbers a real "
    "SentencePiece run logs per iteration (token count falling / "
    "objective rising = the EM doing its job; reported, not assumed). "
    "All three are dictionary-weighted aggregates; no corpus rescan.",
)
def unigram_lm_em_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs, _ = _unig_em(spark, sf_dir)
    out = None
    for r, seg in enumerate(segs, start=1):
        pieces_n = _unig_usage(seg).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pieces")
        )
        row = (
            seg.agg(
                F.sum(F.col("cnt") * F.size("ps")).cast("bigint").alias("n_tokens"),
                F.sum(F.col("cnt") * F.col("obj")).cast("bigint").alias("objective_fp"),
            )
            .crossJoin(F.broadcast(pieces_n))
            .select(
                F.lit(r).cast("int").alias("round"),
                "n_tokens",
                "n_pieces",
                "objective_fp",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("round")


# --------------------------------------------------------------------------
# Trigram stupid-backoff scoring on a held-out split (round 10)
# --------------------------------------------------------------------------

# The bigram gate above scores the corpus under its own counts — every
# n-gram is seen, so no backoff path ever executes. This query makes
# the backoff REAL: the model trains on docs with doc_id % TGB_SPLIT
# != 0 and scores the HELD-OUT docs, where unseen trigrams (and some
# unseen bigrams) genuinely occur. Stupid backoff (Brants et al.,
# EMNLP'07 — the web-scale LM scheme that skips normalization exactly
# because at corpus scale you cannot afford Katz/KN bookkeeping) with
# alpha = 0.5, chosen because log2(0.5) = -1 is EXACT in the
# fixed-point L domain (one bit = 2^LM_B), keeping the whole score an
# exact integer:
#
#   level 3 (c123 >= 1):  nll = L(c12)  - L(c123)
#   level 2 (c23  >= 1):  nll = 2^B + L(c2) - L(c23)
#   level 1 (else, add-one unigram): nll = 2*2^B + L(C1 + V) - L(c3+1)
#
# Per held-out doc: total nll plus HOW OFTEN each backoff level fired —
# the audit face a real eval run logs (high backoff rates = domain
# shift). 100 TB: counts are partial-aggregable; every model table
# carries its L values via the broadcast log dictionary; the eval side
# shuffles once onto the trigram key.

TGB_SPLIT = 5  # doc_id % 5 == 0 -> held-out eval docs


def _tgb_sql() -> str:
    w = TX.sql_words("text")
    return f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, {w} AS w, doc_id % {TGB_SPLIT} = 0 AS heldout
        FROM documents
    ),
    tg AS MATERIALIZED (
        SELECT doc_id, heldout, w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
        FROM toks, unnest(range(1, len(w) - 1)) AS r(i)
        WHERE len(w) >= 3
    ),
    bg AS MATERIALIZED (
        SELECT doc_id, heldout, w[i] AS w2, w[i + 1] AS w3
        FROM toks, unnest(range(1, len(w))) AS r(i)
        WHERE len(w) >= 2
    ),
    ug AS MATERIALIZED (
        SELECT doc_id, heldout, unnest(w) AS w3 FROM toks
    ),
    c123 AS MATERIALIZED (
        SELECT w1, w2, w3, count(*) AS c FROM tg WHERE NOT heldout
        GROUP BY w1, w2, w3
    ),
    c12 AS MATERIALIZED (
        SELECT w1, w2, sum(c) AS c FROM c123 GROUP BY w1, w2
    ),
    c23 AS MATERIALIZED (
        SELECT w2, w3, count(*) AS c FROM bg WHERE NOT heldout GROUP BY w2, w3
    ),
    c2 AS MATERIALIZED (SELECT w2, sum(c) AS c FROM c23 GROUP BY w2),
    c3 AS MATERIALIZED (
        SELECT w3, count(*) AS c FROM ug WHERE NOT heldout GROUP BY w3
    ),
    tot AS (
        SELECT (SELECT count(*) FROM ug WHERE NOT heldout)
               + (SELECT count(DISTINCT w3) FROM ug WHERE NOT heldout) AS cv
    ),
    xs AS MATERIALIZED (
        SELECT DISTINCT x FROM (
            SELECT c AS x FROM c123 UNION SELECT c FROM c12
            UNION SELECT c FROM c23 UNION SELECT c FROM c2
            UNION SELECT c + 1 FROM c3
            UNION SELECT cv FROM tot UNION SELECT 1
        )
    ){_lm_log_sql()},
    scored AS MATERIALIZED (
        SELECT e.doc_id,
               CASE WHEN t3.c IS NOT NULL THEN 3
                    WHEN b2.c IS NOT NULL THEN 2 ELSE 1 END AS level,
               CASE WHEN t3.c IS NOT NULL THEN l12.lgv - l123.lgv
                    WHEN b2.c IS NOT NULL
                         THEN {1 << LM_B} + l2.lgv - l23.lgv
                    ELSE {2 << LM_B} + ltot.lgv - coalesce(l3.lgv, 0)
               END AS nll
        FROM (SELECT * FROM tg WHERE heldout) e
        LEFT JOIN c123 t3 ON t3.w1 = e.w1 AND t3.w2 = e.w2 AND t3.w3 = e.w3
        LEFT JOIN c12 p12 ON p12.w1 = e.w1 AND p12.w2 = e.w2
        LEFT JOIN c23 b2 ON b2.w2 = e.w2 AND b2.w3 = e.w3
        LEFT JOIN c2 p2 ON p2.w2 = e.w2
        LEFT JOIN c3 u3 ON u3.w3 = e.w3
        LEFT JOIN lg l123 ON l123.x = t3.c
        LEFT JOIN lg l12 ON l12.x = p12.c
        LEFT JOIN lg l23 ON l23.x = b2.c
        LEFT JOIN lg l2 ON l2.x = p2.c
        LEFT JOIN lg l3 ON l3.x = coalesce(u3.c, 0) + 1
        JOIN lg ltot ON ltot.x = (SELECT cv FROM tot)
    )
    SELECT doc_id,
           count(*) AS n_trigrams,
           CAST(sum(nll) AS BIGINT) AS nll_fp,
           CAST(sum(CASE WHEN level = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff2,
           CAST(sum(CASE WHEN level = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff1
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """


@query(
    "lm_trigram_backoff_score",
    oracle=_tgb_sql(),
    doc=f"TRIGRAM STUPID-BACKOFF SCORING on a held-out split (model: "
    f"doc_id % {TGB_SPLIT} != 0, eval: the rest — unseen n-grams "
    "genuinely occur, so the backoff path executes): level-3 trigram "
    "ratio, else 0.5x the bigram ratio, else 0.5^2 x add-one unigram — "
    "alpha = 0.5 makes every backoff step an EXACT +2^LM_B in the "
    "fixed-point log domain, so the whole score stays an exact integer "
    "(Brants et al.'s web-scale scheme, which drops normalization "
    "precisely because counting is all that scales). Emits per-doc NLL "
    "plus how often each backoff level fired — the domain-shift audit. "
    "One tokenize pass; counts partial-aggregable; the log dictionary "
    "and model tables broadcast into the eval join.",
)
def lm_trigram_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    toks = managed_cache(
        d.select(
            "doc_id",
            TX.words(F.col("text")).alias("w"),
            (F.col("doc_id") % TGB_SPLIT == 0).alias("heldout"),
        )
    )
    tg = toks.filter(F.size("w") >= 3).select(
        "doc_id",
        "heldout",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2), i -> "
                "struct(w[i - 1] AS w1, w[i] AS w2, w[i + 1] AS w3))"
            )
        ).alias("t"),
    ).select("doc_id", "heldout", "t.w1", "t.w2", "t.w3")
    bg = toks.filter(F.size("w") >= 2).select(
        "heldout",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), i -> "
                "struct(w[i - 1] AS w2, w[i] AS w3))"
            )
        ).alias("b"),
    ).select("heldout", "b.w2", "b.w3")
    ug = toks.select("heldout", F.explode("w").alias("w3"))

    train_tg = tg.filter(~F.col("heldout"))
    c123 = train_tg.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    c12 = c123.groupBy("w1", "w2").agg(F.sum("c").cast("bigint").alias("c"))
    c23 = (
        bg.filter(~F.col("heldout"))
        .groupBy("w2", "w3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    c2 = c23.groupBy("w2").agg(F.sum("c").cast("bigint").alias("c"))
    ug_train = ug.filter(~F.col("heldout"))
    c3 = ug_train.groupBy("w3").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = ug_train.agg(
        (F.count(F.lit(1)) + F.countDistinct("w3")).cast("bigint").alias("cv")
    )
    xs = (
        c123.select(F.col("c").alias("x"))
        .union(c12.select("c"))
        .union(c23.select("c"))
        .union(c2.select("c"))
        .union(c3.select((F.col("c") + 1).alias("c")))
        .union(tot.select(F.col("cv")))
        .union(toks.sparkSession.range(1, 2).select(F.col("id")))
        .distinct()
        .select(F.col("x").cast("bigint").alias("x"))
    )
    lg = _fp_log2_dict(xs)

    def with_l(df: DataFrame, name: str) -> DataFrame:
        return (
            df.withColumn("x", F.col("c").cast("bigint"))
            .join(F.broadcast(lg), "x")
            .drop("x")
            .withColumnRenamed("lgv", name)
        )

    t3 = with_l(c123, "l123")
    p12 = with_l(c12, "l12")
    b2 = with_l(c23, "l23")
    p2 = with_l(c2, "l2")
    u3 = with_l(c3.withColumn("c", F.col("c") + 1), "l3").withColumnRenamed(
        "c", "c3p"
    )
    ltot = tot.join(F.broadcast(lg), tot["cv"] == lg["x"]).select(
        F.col("lgv").alias("ltot")
    )

    ev = tg.filter(F.col("heldout"))
    level = (
        F.when(F.col("l123").isNotNull(), F.lit(3))
        .when(F.col("l23").isNotNull(), F.lit(2))
        .otherwise(F.lit(1))
    )
    nll = (
        F.when(F.col("l123").isNotNull(), F.col("l12") - F.col("l123"))
        .when(
            F.col("l23").isNotNull(),
            F.lit(1 << LM_B) + F.col("l2") - F.col("l23"),
        )
        .otherwise(
            F.lit(2 << LM_B) + F.col("ltot") - F.coalesce(F.col("l3"), F.lit(0))
        )
    )
    return (
        ev.join(F.broadcast(t3.select("w1", "w2", "w3", F.col("c").alias("ct3"), "l123")), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(p12.select("w1", "w2", "l12")), ["w1", "w2"], "left")
        .join(F.broadcast(b2.select("w2", "w3", "l23")), ["w2", "w3"], "left")
        .join(F.broadcast(p2.select("w2", "l2")), ["w2"], "left")
        .join(F.broadcast(u3.select("w3", "l3")), ["w3"], "left")
        .crossJoin(F.broadcast(ltot))
        .select("doc_id", level.alias("level"), nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.sum("nll").cast("bigint").alias("nll_fp"),
            F.sum(F.when(F.col("level") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_backoff2"),
            F.sum(F.when(F.col("level") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_backoff1"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# e2e corpus build v3 (round 10): the funnel composed with the LM gate
# --------------------------------------------------------------------------

# CCNet's actual stage order: cheap structural gates and exact dedup
# FIRST (so the LM never trains on boilerplate duplicates), THEN the
# LM perplexity gate on the surviving corpus, THEN the split. The v3
# composition proof locks that interaction: the bigram model is trained
# on the POST-funnel corpus (different counts than lm_bigram_train's
# whole-corpus model — the differential catches a v3 that lazily reuses
# the standalone model), the tercile cuts are computed over the kept
# docs only, the tail third is dropped, and the md5 split reports
# per-split docs / word tokens / summed exact NLL. One documents scan
# feeds everything; the LM stages reuse _lm_bigrams_from/_lm_scores_from
# verbatim, so constants, hashing and fixed-point log are shared with
# the standalone queries by construction.


@query(
    "e2e_corpus_build_v3",
    oracle=f"""
    WITH kept AS MATERIALIZED (
        SELECT doc_id, text, lang, len({TX.sql_words('text')}) AS n_tok
        FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY md5(lower(text))) AS keeper
            FROM documents
        )
        WHERE len({TX.sql_words('text')}) >= {FUNNEL_MIN_WORDS}
          AND lang IN {FUNNEL_LANGS!r}
          AND keeper = doc_id
    ),
    {_lm_sql_base('kept')}{_LM_SQL_SCORE},
    h AS (SELECT nll_rate_q AS q, count(*) AS c FROM scq GROUP BY nll_rate_q),
    cum AS (SELECT q, sum(c) OVER (ORDER BY q) AS cum FROM h),
    cuts AS (
        SELECT min(CASE WHEN cum * 3 >= 2 * (SELECT count(*) FROM scq) THEN q END)
                   AS cut2
        FROM cum
    ),
    gated AS (
        SELECT k.doc_id, k.lang, k.n_tok, s.nll_fp
        FROM kept k JOIN scq s USING (doc_id), cuts
        WHERE s.nll_rate_q <= cuts.cut2
    ),
    tagged AS (
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN {SPLIT_TRAIN!r} THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN {SPLIT_VAL!r} THEN 'val'
                 ELSE 'test'
               END AS split,
               lang, n_tok, nll_fp
        FROM gated
    )
    SELECT split,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(n_tok) AS BIGINT)    AS n_tokens,
           CAST(sum(nll_fp) AS BIGINT)   AS nll_sum,
           count(DISTINCT lang)          AS n_langs
    FROM tagged
    GROUP BY split
    ORDER BY split
    """,
    doc="E2E CORPUS BUILD v3 — the CCNet stage order composed in one "
    "plan: structural funnel (length + language + exact dedup) -> "
    "bigram LM trained ON THE SURVIVORS (not the raw corpus — the "
    "differential locks this interaction) -> tercile perplexity gate "
    "dropping the tail third -> md5 split -> per-split report of docs, "
    "word tokens, summed exact NLL and language coverage. One "
    "documents scan; the LM stages are the standalone queries' "
    "functions applied to the funnel output, so the composition shares "
    "every constant and the fixed-point log by construction.",
)
def e2e_corpus_build_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    d = spread(load(spark, sf_dir, "documents"))
    keeper = F.min("doc_id").over(
        PW.partitionBy(F.md5(F.lower(F.col("text")).cast("binary")))
    )
    kept = managed_cache(
        d.select(
            "doc_id",
            "text",
            "lang",
            F.size(TX.words(F.col("text"))).alias("n_tok"),
        )
        .withColumn("keeper", keeper)
        .filter(
            (F.col("n_tok") >= FUNNEL_MIN_WORDS)
            & F.col("lang").isin(*FUNNEL_LANGS)
            & (F.col("keeper") == F.col("doc_id"))
        )
        .select("doc_id", "text", "lang", "n_tok")
    )
    scores = managed_cache(
        _lm_scores_from(_lm_bigrams_from(kept)).select("doc_id", "nll_fp", "nll_rate_q")
    )
    n_tot = scores.agg(F.count(F.lit(1)).alias("n"))
    hist = scores.groupBy("nll_rate_q").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(W.orderBy("nll_rate_q").rowsBetween(W.unboundedPreceding, 0)),
    )
    cuts = cum.crossJoin(F.broadcast(n_tot)).agg(
        F.min(
            F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("nll_rate_q"))
        ).alias("cut2")
    )
    gated = (
        kept.join(scores, "doc_id")
        .crossJoin(F.broadcast(cuts))
        .filter(F.col("nll_rate_q") <= F.col("cut2"))
    )
    first_hex = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1
    )
    split = (
        F.when(first_hex.isin(*SPLIT_TRAIN), "train")
        .when(first_hex.isin(*SPLIT_VAL), "val")
        .otherwise("test")
    )
    return (
        gated.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("nll_fp").cast("bigint").alias("nll_sum"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (round 10)
# --------------------------------------------------------------------------

# Xie et al., "Data Selection for Language Models via Importance
# Resampling" (NeurIPS '23): select pretraining documents from a raw
# pool by how much they look like a TARGET domain, measured in a hashed
# n-gram feature space. Two bag-of-features models with add-one
# smoothing over B hash buckets — p (target) and q (raw pool) — give
# each candidate document the importance log-weight
#
#   log w(d) = Σ_b c_db · (log p_b − log q_b)
#            = Σ_b c_db · (L(t_b+1) − L(r_b+1)) + n_d · (L(R+B) − L(T+B))
#
# with c_db the doc's bucket counts, n_d = Σ_b c_db, t/r the global
# bucket counts, T/R their totals, and L the exact fixed-point log2 the
# LM perplexity gate introduced (_fp_log2_dict) — so the weight is an
# exact BIGINT and both engines agree bit-for-bit. Here the target is
# the English slice of `documents` (the paper's target is e.g.
# Wikipedia) and the candidate pool is everything else; the paper's
# Gumbel-noise resampling is replaced by deterministic top-K on
# (w_fp, doc_id) so the selection is reproducible and oracle-checkable.
#
# 100 TB: featurization is one narrow pass per corpus slice (SHA-256 +
# mod — no vocabulary, the feature space is B buckets by construction);
# bucket counts are partial-aggregable shuffles whose key space is B
# (bounded, skew-free); the model (B rows), the log dictionary and the
# totals all BROADCAST back into the per-doc scoring join, so the only
# corpus-sized shuffle is the groupBy(doc_id, bucket). Top-K selection
# compiles to TakeOrderedAndProject (per-partition heaps + driver merge
# of K) — no global sort, no single-reducer ranking window.

DSIR_B = 256  # hashed feature buckets (unigrams + bigrams share the space)
DSIR_K = 60  # deterministic top-K selection size
DSIR_TARGET_LANG = "en"  # the target-domain slice


def _dsir_sql_feats(pred: str) -> str:
    """Hashed unigram+bigram features of the docs satisfying ``pred``."""
    return f"""(
        SELECT doc_id, ({TX.sql_hash28('w[i]')}) % {DSIR_B} AS bucket
        FROM docs, unnest(range(1, len(w) + 1)) AS r(i) WHERE {pred}
        UNION ALL
        SELECT doc_id, ({TX.sql_hash28("w[i] || ' ' || w[i + 1]")}) % {DSIR_B}
        FROM docs, unnest(range(1, len(w))) AS r(i) WHERE {pred}
    )"""


_DSIR_SQL_BASE = f"""
    docs AS MATERIALIZED (
        SELECT doc_id, lang, {TX.sql_words('text')} AS w FROM documents
    ),
    tfe AS MATERIALIZED (
        SELECT * FROM {_dsir_sql_feats(f"lang = '{DSIR_TARGET_LANG}'")}
    ),
    cfe AS MATERIALIZED (
        SELECT * FROM {_dsir_sql_feats(f"lang <> '{DSIR_TARGET_LANG}'")}
    ),
    tb AS MATERIALIZED (SELECT bucket, count(*) AS t FROM tfe GROUP BY bucket),
    rb AS MATERIALIZED (SELECT bucket, count(*) AS r FROM cfe GROUP BY bucket),
    tot AS MATERIALIZED (
        SELECT (SELECT count(*) FROM tfe) AS tt,
               (SELECT count(*) FROM cfe) AS rr
    ),
    xs AS MATERIALIZED (
        SELECT DISTINCT x FROM (
            SELECT t + 1 AS x FROM tb
            UNION SELECT r + 1 FROM rb
            UNION SELECT CAST(1 AS BIGINT)
            UNION SELECT tt + {DSIR_B} FROM tot
            UNION SELECT rr + {DSIR_B} FROM tot
        )
    ){_lm_log_sql()},
    model AS MATERIALIZED (
        SELECT rb.bucket, lt.lgv AS ltv, lr.lgv AS lrv
        FROM rb LEFT JOIN tb USING (bucket)
        JOIN lg lt ON lt.x = coalesce(tb.t, 0) + 1
        JOIN lg lr ON lr.x = rb.r + 1
    ),
    cst AS MATERIALIZED (
        SELECT lr.lgv - lt.lgv AS adj
        FROM tot JOIN lg lt ON lt.x = tot.tt + {DSIR_B}
                 JOIN lg lr ON lr.x = tot.rr + {DSIR_B}
    ),
    dbc AS MATERIALIZED (
        SELECT doc_id, bucket, count(*) AS c FROM cfe GROUP BY doc_id, bucket
    ),
    wts AS MATERIALIZED (
        SELECT dbc.doc_id,
               CAST(sum(dbc.c) AS BIGINT) AS n_feats,
               CAST(sum(dbc.c * (m.ltv - m.lrv))
                    + sum(dbc.c) * (SELECT adj FROM cst) AS BIGINT) AS w_fp
        FROM dbc JOIN model m USING (bucket)
        GROUP BY dbc.doc_id
    )"""


def _dsir_feats(d: DataFrame) -> DataFrame:
    """(doc_id, bucket) hashed unigram+bigram features WITH multiplicity
    over a (doc_id, w: array<string>) relation."""
    uni = d.select("doc_id", F.explode("w").alias("tok"))
    bi = (
        d.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> concat(w[i - 1], ' ', w[i]))"
                )
            ).alias("tok"),
        )
    )
    return uni.unionAll(bi).select(
        "doc_id", (TX.hash28(F.col("tok")) % DSIR_B).cast("bigint").alias("bucket")
    )


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_feats, w_fp) for every candidate (non-target) doc."""
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "lang", TX.words(F.col("text")).alias("w")
    )
    tfe = _dsir_feats(d.filter(F.col("lang") == DSIR_TARGET_LANG))
    cfe = managed_cache(_dsir_feats(d.filter(F.col("lang") != DSIR_TARGET_LANG)))
    tb = tfe.groupBy("bucket").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    rb = cfe.groupBy("bucket").agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    tot = (
        tb.agg(F.coalesce(F.sum("t"), F.lit(0)).cast("bigint").alias("tt"))
        .crossJoin(
            rb.agg(F.coalesce(F.sum("r"), F.lit(0)).cast("bigint").alias("rr"))
        )
    )
    xs = (
        tb.select((F.col("t") + 1).cast("bigint").alias("x"))
        .union(rb.select((F.col("r") + 1).cast("bigint").alias("x")))
        .union(spark.range(1, 2).select(F.col("id").alias("x")))
        .union(tot.select((F.col("tt") + DSIR_B).cast("bigint").alias("x")))
        .union(tot.select((F.col("rr") + DSIR_B).cast("bigint").alias("x")))
        .distinct()
    )
    lg = _fp_log2_dict(xs)
    lt = lg.select(F.col("x").alias("xt"), F.col("lgv").alias("ltv"))
    lr = lg.select(F.col("x").alias("xr"), F.col("lgv").alias("lrv"))
    model = (
        rb.join(tb, "bucket", "left")
        .select(
            "bucket",
            (F.coalesce(F.col("t"), F.lit(0)) + 1).cast("bigint").alias("xt"),
            (F.col("r") + 1).cast("bigint").alias("xr"),
        )
        .join(F.broadcast(lt), "xt")
        .join(F.broadcast(lr), "xr")
        .select("bucket", "ltv", "lrv")
    )
    cst = (
        tot.select(
            (F.col("tt") + DSIR_B).cast("bigint").alias("xt"),
            (F.col("rr") + DSIR_B).cast("bigint").alias("xr"),
        )
        .join(F.broadcast(lt), "xt")
        .join(F.broadcast(lr), "xr")
        .select((F.col("lrv") - F.col("ltv")).alias("adj"))
    )
    dbc = cfe.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        dbc.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * (F.col("ltv") - F.col("lrv")))
            .cast("bigint")
            .alias("part"),
        )
        .crossJoin(F.broadcast(cst))
        .select(
            "doc_id",
            "n_feats",
            (F.col("part") + F.col("n_feats") * F.col("adj"))
            .cast("bigint")
            .alias("w_fp"),
        )
    )


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH {_DSIR_SQL_BASE}
    SELECT doc_id, n_feats, w_fp FROM wts ORDER BY doc_id
    """,
    doc="DSIR IMPORTANCE WEIGHTS (Xie et al. NeurIPS '23): every "
    "candidate (non-English) document scored by how target-like (how "
    "English-like) its hashed unigram+bigram feature counts are, as an "
    "EXACT fixed-point integer log-ratio under two add-one-smoothed "
    "bag-of-features models — see the block comment. No vocabulary, no "
    "floats, no UDF: SHA-256 bucket hashing, bounded-key count "
    "shuffles, broadcast model/log-dictionary joins. The oracle "
    "replays the arithmetic from first principles.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_weights(spark, sf_dir).orderBy("doc_id")


@query(
    "dsir_topk_selection",
    oracle=f"""
    WITH {_DSIR_SQL_BASE},
    ranked AS (
        SELECT w.doc_id, d.lang, w.n_feats, w.w_fp,
               row_number() OVER (ORDER BY w.w_fp DESC, w.doc_id) AS rn
        FROM wts w JOIN documents d USING (doc_id)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_selected,
           CAST(sum(n_feats) AS BIGINT) AS feat_sum,
           CAST(sum(w_fp) AS BIGINT) AS w_sum
    FROM ranked WHERE rn <= {DSIR_K}
    GROUP BY lang ORDER BY lang
    """,
    doc="DSIR TOP-K SELECTION — the deterministic stand-in for the "
    "paper's Gumbel resampling: the K most target-like candidates by "
    "(w_fp DESC, doc_id), reported as per-language composition so the "
    "distribution shift toward the target domain is the checked "
    "artifact. Engine side selects WITHOUT a global ranking window: "
    "orderBy+limit compiles to TakeOrderedAndProject (per-partition "
    "top-K heaps + driver merge), then the K-th (w_fp, doc_id) pair "
    "broadcasts back as a threshold filter — at 100 TB the corpus "
    "never single-partition-sorts. The oracle's ranking window is the "
    "same relation computed the naive way.",
)
def dsir_topk_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = managed_cache(_dsir_weights(spark, sf_dir))
    # K-th largest (w_fp, doc_id) via TakeOrderedAndProject, then a
    # broadcast threshold filter — no global ranking window.
    cut = (
        w.orderBy(F.desc("w_fp"), F.asc("doc_id"))
        .limit(DSIR_K)
        .orderBy(F.asc("w_fp"), F.desc("doc_id"))
        .limit(1)
        .select(F.col("w_fp").alias("cw"), F.col("doc_id").alias("cd"))
    )
    sel = w.crossJoin(F.broadcast(cut)).filter(
        (F.col("w_fp") > F.col("cw"))
        | ((F.col("w_fp") == F.col("cw")) & (F.col("doc_id") <= F.col("cd")))
    )
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        d.join(F.broadcast(sel), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_selected"),
            F.sum("n_feats").cast("bigint").alias("feat_sum"),
            F.sum("w_fp").cast("bigint").alias("w_sum"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Word-entropy quality score (round 10) — the diversity face
# --------------------------------------------------------------------------

# Shannon entropy of a document's unigram distribution — the classic
# lexical-diversity quality signal (low entropy = keyword stuffing,
# boilerplate, generated spam; complements the repetition and Gini
# signals that look at other shapes of degeneracy). Exact arithmetic:
# for token counts c_w with n = Σ c_w,
#
#   n·H(d) = n·log2 n − Σ_w c_w·log2 c_w
#
# so nh_fp = n·L(n) − Σ_w c_w·L(c_w) is an exact non-negative BIGINT
# under the shared fixed-point log2 L (_fp_log2_dict), and the
# per-token rate quantizes division-free as (nh_fp << LM_RATE_Q) div n
# — the same discipline as the LM perplexity score, so both engines
# agree bit-for-bit. 100 TB: one tokenize pass; the (doc_id, token)
# count shuffle is the only corpus-sized exchange; the log dictionary
# is bounded by distinct count values and broadcasts back.


@query(
    "word_entropy_quality",
    oracle=f"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id, w[i] AS tok
        FROM (SELECT doc_id, {TX.sql_words('text')} AS w FROM documents),
             unnest(range(1, len(w) + 1)) AS r(i)
    ),
    wc AS MATERIALIZED (
        SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
    ),
    dn AS MATERIALIZED (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_distinct
        FROM wc GROUP BY doc_id
    ),
    xs AS MATERIALIZED (
        SELECT DISTINCT x FROM (
            SELECT c AS x FROM wc UNION SELECT n FROM dn
        )
    ){_lm_log_sql()},
    sumc AS MATERIALIZED (
        SELECT wc.doc_id, CAST(sum(wc.c * lg.lgv) AS BIGINT) AS s
        FROM wc JOIN lg ON lg.x = wc.c GROUP BY wc.doc_id
    )
    SELECT dn.doc_id, dn.n AS n_tokens, dn.n_distinct,
           CAST(dn.n * lgn.lgv - sumc.s AS BIGINT) AS nh_fp,
           CAST(((dn.n * lgn.lgv - sumc.s) << {LM_RATE_Q}) // dn.n AS BIGINT)
               AS h_rate_q
    FROM dn JOIN lg lgn ON lgn.x = dn.n
            JOIN sumc USING (doc_id)
    ORDER BY dn.doc_id
    """,
    doc="WORD-ENTROPY QUALITY SCORE: per-document Shannon entropy of "
    "the unigram distribution as an EXACT scaled integer — nh_fp = "
    "n·L(n) − Σ c·L(c) with the shared fixed-point log2, plus the "
    "division-free per-token rate. Low values flag keyword stuffing "
    "and template spam that length/repetition heuristics miss. No "
    "floats, no UDF; the oracle replays the arithmetic exactly.",
)
def word_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", TX.words(F.col("text")).alias("w")
    )
    return _entropy_scores_from(d).orderBy("doc_id")


def _entropy_scores_from(d: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, nh_fp, h_rate_q) over any
    (doc_id, w: array<string>) relation — the shared entropy scorer
    word_entropy_quality and e2e_corpus_build_v4 both run."""
    wc = managed_cache(
        d.select("doc_id", F.explode("w").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    dn = managed_cache(
        wc.groupBy("doc_id").agg(
            F.sum("c").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        )
    )
    xs = (
        wc.select(F.col("c").alias("x"))
        .union(dn.select(F.col("n").alias("x")))
        .distinct()
    )
    lg = _fp_log2_dict(xs)
    sumc = (
        wc.join(F.broadcast(lg), wc["c"] == lg["x"])
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lgv")).cast("bigint").alias("s"))
    )
    lgn = lg.select(F.col("x").alias("n"), F.col("lgv").alias("ln"))
    nh = (F.col("n") * F.col("ln") - F.col("s")).cast("bigint")
    return (
        dn.join(F.broadcast(lgn), "n")
        .join(sumc, "doc_id")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            "n_distinct",
            nh.alias("nh_fp"),
            F.expr(f"shiftleft(n * ln - s, {LM_RATE_Q}) div n").alias("h_rate_q"),
        )
    )


# --------------------------------------------------------------------------
# Perplexity-stratified sampling (round 10) — CCNet's band-rate policy
# --------------------------------------------------------------------------

# CCNet (Wenzek et al. '19) does not gate binary on perplexity: the
# HEAD band is kept whole, the MIDDLE is kept whole (or downsampled),
# and the TAIL is retained at a reduced rate so rare registers are not
# erased from the corpus. This composes the tercile bands of
# lm_perplexity_gate with the repo's deterministic md5 Bernoulli
# sampling (split_train_val_test's mechanism): tail docs survive iff
# the first hex digit of md5(doc_id) lands in a fixed 4/16 alphabet —
# reproducible, engine-agnostic, and stable under corpus regeneration.
# Output is the per-band funnel report (candidates, selected, kept
# bigram mass), the artifact a mixing/budget stage consumes.
#
# 100 TB: everything reuses the gate's machinery — one corpus tokenize
# pass, bounded rate-histogram cuts broadcast back; the sampling adds
# one md5 per doc (no shuffle) and the report is a bounded groupBy.

PPL_TAIL_KEEP_HEX = tuple("0123")  # tail survives at 4/16 = 1/4


@query(
    "ppl_stratified_sampling",
    oracle=f"""
    WITH {_lm_sql_base()}{_LM_SQL_SCORE},
    h AS (SELECT nll_rate_q AS q, count(*) AS c FROM scq GROUP BY nll_rate_q),
    cum AS (SELECT q, sum(c) OVER (ORDER BY q) AS cum FROM h),
    cuts AS (
        SELECT min(CASE WHEN cum * 3 >= (SELECT count(*) FROM scq) THEN q END)
                   AS cut1,
               min(CASE WHEN cum * 3 >= 2 * (SELECT count(*) FROM scq) THEN q END)
                   AS cut2
        FROM cum
    ),
    banded AS (
        SELECT scq.doc_id, scq.n_bigrams,
               CASE WHEN scq.nll_rate_q <= cuts.cut1 THEN 'head'
                    WHEN scq.nll_rate_q <= cuts.cut2 THEN 'middle'
                    ELSE 'tail' END AS band
        FROM scq, cuts
    ),
    sel AS (
        SELECT *,
               band <> 'tail'
               OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                  IN {PPL_TAIL_KEEP_HEX!r} AS selected
        FROM banded
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT)
               AS n_selected,
           CAST(sum(CASE WHEN selected THEN n_bigrams ELSE 0 END) AS BIGINT)
               AS bigrams_selected
    FROM sel GROUP BY band ORDER BY band
    """,
    doc="PERPLEXITY-STRATIFIED SAMPLING — CCNet's actual retention "
    "policy composed from lm_perplexity_gate's tercile bands: head "
    "and middle kept whole, tail retained at a deterministic 1/4 via "
    "the md5 first-hex-digit Bernoulli the split stage already uses "
    "(no RNG, reproducible across engines and reruns). Per-band "
    "funnel report: candidates, survivors, surviving bigram mass. "
    "100 TB: the gate's bounded histogram cuts broadcast back; the "
    "sample adds one md5 per doc, shuffle-free.",
)
def ppl_stratified_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = managed_cache(
        _lm_scores(spark, sf_dir).select("doc_id", "n_bigrams", "nll_rate_q")
    )
    n_tot = sc.agg(F.count(F.lit(1)).alias("n"))
    hist = sc.groupBy("nll_rate_q").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(W.orderBy("nll_rate_q").rowsBetween(W.unboundedPreceding, 0)),
    )
    cuts = cum.crossJoin(F.broadcast(n_tot)).agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("n"), F.col("nll_rate_q"))
        ).alias("cut1"),
        F.min(
            F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("nll_rate_q"))
        ).alias("cut2"),
    )
    band = (
        F.when(F.col("nll_rate_q") <= F.col("cut1"), "head")
        .when(F.col("nll_rate_q") <= F.col("cut2"), "middle")
        .otherwise("tail")
    )
    first_hex = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1
    )
    selected = (F.col("band") != "tail") | first_hex.isin(*PPL_TAIL_KEEP_HEX)
    return (
        sc.crossJoin(F.broadcast(cuts))
        .select("doc_id", "n_bigrams", band.alias("band"))
        .withColumn("selected", selected)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum(F.when(F.col("selected"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_selected"),
            F.sum(F.when(F.col("selected"), F.col("n_bigrams")).otherwise(0))
            .cast("bigint")
            .alias("bigrams_selected"),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# Unigram-tokenizer fertility by language (round 10) — the serve face
# --------------------------------------------------------------------------

# bpe_fertility_by_lang gives the BPE rack its serving/eval metric;
# this is the twin for the unigram-LM tokenizer: per language, tokens
# emitted per word under the FINAL EM round's Viterbi segmentation.
# Together they let the two production tokenizer families be compared
# on the same corpus with the same metric (fertility in exact integer
# ppm). Serving is dictionary-shaped, exactly like the BPE encode: the
# corpus contributes only (lang, word) multiplicities; the trained
# segmentation (word -> piece count) is a dictionary-sized broadcast.


@query(
    "unigram_fertility_by_lang",
    oracle=f"""
    WITH RECURSIVE {_unig_sql_base()},
    dl AS (
        SELECT lang, word, count(*) AS cl
        FROM (SELECT lang, unnest({TX.sql_words('text')}) AS word
              FROM documents)
        WHERE length(word) >= 1
        GROUP BY lang, word
    )
    SELECT dl.lang,
           CAST(sum(dl.cl) AS BIGINT)               AS n_words,
           CAST(sum(dl.cl * len(s.ps)) AS BIGINT)   AS n_pieces,
           CAST(sum(dl.cl * len(s.ps)) * 1000000 // sum(dl.cl) AS BIGINT)
               AS fertility_ppm
    FROM dl JOIN seg_{UNIG_ROUNDS} s USING (word)
    GROUP BY dl.lang
    ORDER BY dl.lang
    """,
    doc="UNIGRAM-TOKENIZER FERTILITY by language — the serve/eval face "
    "of unigram_lm_vocab and the twin of bpe_fertility_by_lang: "
    "tokens-per-word (exact integer ppm) under the final EM round's "
    "Viterbi segmentation, per language. The corpus contributes only "
    "(lang, word) multiplicities (one tokenize pass, one bounded-key "
    "shuffle); the trained word->pieces segmentation broadcasts back, "
    "so serving cost ∝ vocabulary exactly like the BPE encode path. "
    "Oracle replays the full EM as RECURSIVE CTEs and joins the same "
    "final segmentation.",
)
def unigram_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs, _ = _unig_em(spark, sf_dir)
    seg = segs[-1].select("word", F.size("ps").cast("bigint").alias("np"))
    d = spread(load(spark, sf_dir, "documents"))
    dl = (
        d.select("lang", F.explode(TX.words(F.col("text"))).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cl"))
    )
    return (
        dl.join(F.broadcast(seg), "word")
        .groupBy("lang")
        .agg(
            F.sum("cl").cast("bigint").alias("n_words"),
            F.sum(F.col("cl") * F.col("np")).cast("bigint").alias("n_pieces"),
            F.expr("sum(cl * np) * 1000000 div sum(cl)")
            .cast("bigint")
            .alias("fertility_ppm"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# E2E corpus build v4 (round 10) — the funnel with this round's stages
# --------------------------------------------------------------------------

# v3 composed funnel -> LM gate -> split. v4 upgrades two stages to
# what production pipelines actually run and adds a third:
#   1. structural funnel (length + language + exact dedup) — unchanged;
#   2. WORD-ENTROPY FLOOR (new): drop low-diversity documents BEFORE
#      the LM ever trains on them, at an absolute 3-bits-per-token bar
#      (natural prose in this corpus sits at 2.4-4.8 bits/token, so
#      the floor genuinely fires; absolute, not a quantile, because a
#      diversity bar should not drift with corpus composition);
#   3. the LM trains on the entropy survivors (the differential locks
#      this interaction: a leaked low-entropy doc changes the model,
#      not just its own row);
#   4. STRATIFIED band retention (ppl_stratified_sampling) replaces
#      v3's binary gate: head+middle whole, tail at the deterministic
#      md5 1/4 — CCNet's real policy;
#   5. md5 split; report per (split, band) so the band mix inside each
#      split is the checked artifact.
# One documents scan feeds everything; every stage reuses the
# standalone queries' functions, so constants and the fixed-point log
# are shared by construction.

ENT_V4_MIN_BITS = 3
ENT_V4_MIN = ENT_V4_MIN_BITS << (LM_B + LM_RATE_Q)  # h_rate_q floor


@query(
    "e2e_corpus_build_v4",
    oracle=f"""
    WITH kept AS MATERIALIZED (
        SELECT doc_id, text, lang, len({TX.sql_words('text')}) AS n_tok
        FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY md5(lower(text))) AS keeper
            FROM documents
        )
        WHERE len({TX.sql_words('text')}) >= {FUNNEL_MIN_WORDS}
          AND lang IN {FUNNEL_LANGS!r}
          AND keeper = doc_id
    ),
    etok AS MATERIALIZED (
        SELECT doc_id, w[i] AS tok
        FROM (SELECT doc_id, {TX.sql_words('text')} AS w FROM kept),
             unnest(range(1, len(w) + 1)) AS r(i)
    ),
    ewc AS MATERIALIZED (
        SELECT doc_id, tok, count(*) AS c FROM etok GROUP BY doc_id, tok
    ),
    edn AS MATERIALIZED (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM ewc GROUP BY doc_id
    ),
    exs AS MATERIALIZED (
        SELECT DISTINCT x FROM (
            SELECT c AS x FROM ewc UNION SELECT n FROM edn
        )
    ){_lm_log_sql('_e', 'exs')},
    esc AS MATERIALIZED (
        SELECT edn.doc_id,
               ((edn.n * lgn.lgv - s.s) << {LM_RATE_Q}) // edn.n AS h_rate_q
        FROM edn
        JOIN lg_e lgn ON lgn.x = edn.n
        JOIN (SELECT ewc.doc_id, CAST(sum(ewc.c * lg_e.lgv) AS BIGINT) AS s
              FROM ewc JOIN lg_e ON lg_e.x = ewc.c
              GROUP BY ewc.doc_id) s USING (doc_id)
    ),
    surv AS MATERIALIZED (
        SELECT kept.doc_id, kept.text, kept.lang, kept.n_tok
        FROM kept JOIN esc USING (doc_id)
        WHERE esc.h_rate_q >= {ENT_V4_MIN}
    ),
    {_lm_sql_base('surv')}{_LM_SQL_SCORE},
    h AS (SELECT nll_rate_q AS q, count(*) AS c FROM scq GROUP BY nll_rate_q),
    cum AS (SELECT q, sum(c) OVER (ORDER BY q) AS cum FROM h),
    cuts AS (
        SELECT min(CASE WHEN cum * 3 >= (SELECT count(*) FROM scq) THEN q END)
                   AS cut1,
               min(CASE WHEN cum * 3 >= 2 * (SELECT count(*) FROM scq) THEN q END)
                   AS cut2
        FROM cum
    ),
    banded AS (
        SELECT scq.doc_id, scq.nll_fp,
               CASE WHEN scq.nll_rate_q <= cuts.cut1 THEN 'head'
                    WHEN scq.nll_rate_q <= cuts.cut2 THEN 'middle'
                    ELSE 'tail' END AS band
        FROM scq, cuts
    ),
    sel AS (
        SELECT b.doc_id, b.nll_fp, b.band, k.lang, k.n_tok
        FROM banded b JOIN surv k USING (doc_id)
        WHERE b.band <> 'tail'
           OR substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 1)
              IN {PPL_TAIL_KEEP_HEX!r}
    ),
    tagged AS (
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN {SPLIT_TRAIN!r} THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN {SPLIT_VAL!r} THEN 'val'
                 ELSE 'test'
               END AS split,
               band, lang, n_tok, nll_fp
        FROM sel
    )
    SELECT split, band,
           CAST(count(*) AS BIGINT)    AS n_docs,
           CAST(sum(n_tok) AS BIGINT)  AS n_tokens,
           CAST(sum(nll_fp) AS BIGINT) AS nll_sum,
           count(DISTINCT lang)        AS n_langs
    FROM tagged
    GROUP BY split, band
    ORDER BY split, band
    """,
    doc="E2E CORPUS BUILD v4 — the production stage order with this "
    "round's operators composed in: structural funnel -> ABSOLUTE "
    "word-entropy floor (3 bits/token, fires before the LM trains, so "
    "a leaked degenerate doc would shift the model — the differential "
    "locks the interaction) -> bigram LM on the survivors -> CCNet "
    "STRATIFIED band retention (head+middle whole, tail at md5 1/4, "
    "replacing v3's binary gate) -> md5 split -> per-(split, band) "
    "report. One documents scan; every stage is the standalone "
    "query's function, sharing constants and the fixed-point log by "
    "construction.",
)
def e2e_corpus_build_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    d = spread(load(spark, sf_dir, "documents"))
    keeper = F.min("doc_id").over(
        PW.partitionBy(F.md5(F.lower(F.col("text")).cast("binary")))
    )
    kept = managed_cache(
        d.select(
            "doc_id",
            "text",
            "lang",
            F.size(TX.words(F.col("text"))).alias("n_tok"),
        )
        .withColumn("keeper", keeper)
        .filter(
            (F.col("n_tok") >= FUNNEL_MIN_WORDS)
            & F.col("lang").isin(*FUNNEL_LANGS)
            & (F.col("keeper") == F.col("doc_id"))
        )
        .select("doc_id", "text", "lang", "n_tok")
    )
    ent = _entropy_scores_from(
        kept.select("doc_id", TX.words(F.col("text")).alias("w"))
    ).select("doc_id", "h_rate_q")
    surv = managed_cache(
        kept.join(ent, "doc_id")
        .filter(F.col("h_rate_q") >= ENT_V4_MIN)
        .select("doc_id", "text", "lang", "n_tok")
    )
    scores = managed_cache(
        _lm_scores_from(_lm_bigrams_from(surv)).select(
            "doc_id", "nll_fp", "nll_rate_q"
        )
    )
    n_tot = scores.agg(F.count(F.lit(1)).alias("n"))
    hist = scores.groupBy("nll_rate_q").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(W.orderBy("nll_rate_q").rowsBetween(W.unboundedPreceding, 0)),
    )
    cuts = cum.crossJoin(F.broadcast(n_tot)).agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("n"), F.col("nll_rate_q"))
        ).alias("cut1"),
        F.min(
            F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("nll_rate_q"))
        ).alias("cut2"),
    )
    band = (
        F.when(F.col("nll_rate_q") <= F.col("cut1"), "head")
        .when(F.col("nll_rate_q") <= F.col("cut2"), "middle")
        .otherwise("tail")
    )
    first_hex = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1
    )
    sel = (
        surv.join(scores, "doc_id")
        .crossJoin(F.broadcast(cuts))
        .withColumn("band", band)
        .filter((F.col("band") != "tail") | first_hex.isin(*PPL_TAIL_KEEP_HEX))
    )
    split = (
        F.when(first_hex.isin(*SPLIT_TRAIN), "train")
        .when(first_hex.isin(*SPLIT_VAL), "val")
        .otherwise("test")
    )
    return (
        sel.groupBy(split.alias("split"), "band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("nll_fp").cast("bigint").alias("nll_sum"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split", "band")
    )


# --------------------------------------------------------------------------
# Tokenizer-family comparison + DSIR-vs-random baseline (round 10)
# --------------------------------------------------------------------------


@query(
    "tokenizer_family_compare",
    oracle=f"""
    WITH RECURSIVE {_bpe_sql_m_cte()},
    {_bpe_sql_enc_cte()},
    {_unig_sql_base()},
    bw AS (SELECT lang, unnest({TX.sql_words('text')}) AS word FROM documents),
    bpe AS (
        SELECT bw.lang,
               CAST(sum(e.n_bpe) * 1000000 // count(*) AS BIGINT) AS bpe_ppm
        FROM bw JOIN enc e ON e.word = bw.word
        GROUP BY bw.lang
    ),
    ul AS (
        SELECT lang, word, count(*) AS cl FROM bw
        WHERE length(word) >= 1 GROUP BY lang, word
    ),
    ug AS (
        SELECT ul.lang,
               CAST(sum(ul.cl * len(s.ps)) * 1000000 // sum(ul.cl) AS BIGINT)
                   AS unigram_ppm
        FROM ul JOIN seg_{UNIG_ROUNDS} s USING (word)
        GROUP BY ul.lang
    )
    SELECT lang, bpe_ppm, unigram_ppm,
           unigram_ppm - bpe_ppm AS delta_ppm
    FROM bpe JOIN ug USING (lang)
    ORDER BY lang
    """,
    doc="TOKENIZER FAMILY COMPARISON — the vocabulary-selection eval a "
    "real tokenizer swap runs: per language, fertility (exact ppm) "
    "under the one-shot BPE merge table vs the unigram-LM trainer's "
    "final Viterbi segmentation, side by side with the signed delta. "
    "Both racks serve dictionary-shaped (corpus contributes word "
    "multiplicities once; trained tables broadcast), so the compare "
    "costs two vocabulary passes, not two corpus passes. The oracle "
    "replays BOTH trainers in one statement.",
)
def tokenizer_family_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bpe_fertility_by_lang(spark, sf_dir).select(
        "lang", F.col("fertility_ppm").alias("bpe_ppm")
    )
    u = unigram_fertility_by_lang(spark, sf_dir).select(
        "lang", F.col("fertility_ppm").alias("unigram_ppm")
    )
    return (
        b.join(u, "lang")
        .select(
            "lang",
            "bpe_ppm",
            "unigram_ppm",
            (F.col("unigram_ppm") - F.col("bpe_ppm")).alias("delta_ppm"),
        )
        .orderBy("lang")
    )


@query(
    "dsir_vs_random_baseline",
    oracle=f"""
    WITH {_DSIR_SQL_BASE},
    dsel AS (
        SELECT w_fp FROM (
            SELECT w_fp, row_number() OVER (ORDER BY w_fp DESC, doc_id) AS rn
            FROM wts
        ) WHERE rn <= {DSIR_K}
    ),
    rsel AS (
        SELECT w_fp FROM (
            SELECT w_fp,
                   row_number() OVER (
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM wts
        ) WHERE rn <= {DSIR_K}
    )
    SELECT * FROM (
        SELECT 'dsir' AS method, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(w_fp) AS BIGINT) AS w_sum
        FROM dsel
        UNION ALL
        SELECT 'random', CAST(count(*) AS BIGINT), CAST(sum(w_fp) AS BIGINT)
        FROM rsel
    ) ORDER BY method
    """,
    doc="DSIR vs RANDOM BASELINE — the paper's headline eval, "
    "deterministic: summed importance log-weight of the DSIR top-K "
    "selection vs a same-size md5-ordered (pseudo-random, "
    "reproducible) sample from the same candidate pool. The DSIR sum "
    "is the K-subset maximum by construction, so dsir >= random is a "
    "PROVABLE invariant the differential re-checks each run; the gap "
    "magnitude is the distribution-shift evidence. Engine side: two "
    "TakeOrderedAndProject top-K passes over the cached weight table "
    "— no ranking window, one weights computation.",
)
def dsir_vs_random_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = managed_cache(_dsir_weights(spark, sf_dir))

    def _pick(df: DataFrame, method: str) -> DataFrame:
        return df.limit(DSIR_K).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w_fp").cast("bigint").alias("w_sum"),
        ).select(F.lit(method).alias("method"), "n_docs", "w_sum")

    dsel = _pick(w.orderBy(F.desc("w_fp"), F.asc("doc_id")), "dsir")
    rsel = _pick(
        w.orderBy(
            F.md5(F.col("doc_id").cast("string").cast("binary")), F.asc("doc_id")
        ),
        "random",
    )
    return dsel.unionByName(rsel).orderBy("method")


# --------------------------------------------------------------------------
# Quality-signal rank correlation (round 10) — do the gates agree?
# --------------------------------------------------------------------------

# A pipeline running several quality signals (LM perplexity, word
# entropy, heuristics) needs to know whether they measure the same
# thing — highly correlated signals are redundant gates, anti-
# correlated ones flag a bug or a genuinely orthogonal axis. Spearman
# rank correlation over the (signal, doc_id) TOTAL order (unique
# tie-break by doc_id, so ranks are deterministic and the statistic
# reproducible; with the quantized rates' few ties this is standard
# Spearman to within tie noise):
#
#   rho = 1 − 6·Σd² / (n·(n²−1)),   d = rank_entropy − rank_nll
#
# Ranks are computed DISTRIBUTED (no global-order window): rank =
# (docs with smaller rate, from the bounded broadcast rate-histogram
# prefix) + (row_number within the rate group ordered by doc_id) —
# the mannwhitney_u_values block-prefix pattern. Σd² aggregates as
# decimal(38,0) (bound n³ overflows int64 past n ≈ 2e6); the final
# rho, in exact integer ppm, is computed driver-side from the single
# (n, Σd²) row with Python bigints — no scale-dependent overflow
# anywhere (the Cramer-guard discipline), truncation-division
# semantics matching the DuckDB oracle.


def _rank_distributed(df: DataFrame, col: str, out: str) -> DataFrame:
    """(doc_id, out=rank): 1-based rank under the (col, doc_id) total
    order, computed without a global-order window."""
    hist = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
    pwin = W.orderBy(col).rowsBetween(W.unboundedPreceding, -1)
    # window over the bounded RATE HISTOGRAM (domain-sized), not rows
    prefix = hist.select(
        col, F.coalesce(F.sum("c").over(pwin), F.lit(0)).alias("p")
    )
    rwin = W.partitionBy(col).orderBy("doc_id")
    return (
        df.join(F.broadcast(prefix), col)
        .select(
            "doc_id",
            (F.col("p") + F.row_number().over(rwin)).cast("bigint").alias(out),
        )
    )


@query(
    "quality_signal_correlation",
    oracle=f"""
    WITH {_lm_sql_base()}{_LM_SQL_SCORE},
    etok AS MATERIALIZED (
        SELECT doc_id, w[i] AS tok
        FROM (SELECT doc_id, {TX.sql_words('text')} AS w FROM documents),
             unnest(range(1, len(w) + 1)) AS r(i)
    ),
    ewc AS MATERIALIZED (
        SELECT doc_id, tok, count(*) AS c FROM etok GROUP BY doc_id, tok
    ),
    edn AS MATERIALIZED (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM ewc GROUP BY doc_id
    ),
    exs AS MATERIALIZED (
        SELECT DISTINCT x FROM (SELECT c AS x FROM ewc UNION SELECT n FROM edn)
    ){_lm_log_sql('_e', 'exs')},
    esc AS MATERIALIZED (
        SELECT edn.doc_id,
               ((edn.n * lgn.lgv - s.s) << {LM_RATE_Q}) // edn.n AS h_rate_q
        FROM edn
        JOIN lg_e lgn ON lgn.x = edn.n
        JOIN (SELECT ewc.doc_id, CAST(sum(ewc.c * lg_e.lgv) AS BIGINT) AS s
              FROM ewc JOIN lg_e ON lg_e.x = ewc.c
              GROUP BY ewc.doc_id) s USING (doc_id)
    ),
    j AS MATERIALIZED (
        SELECT e.doc_id, e.h_rate_q, q.nll_rate_q
        FROM esc e JOIN scq q USING (doc_id)
    ),
    ranked AS (
        SELECT row_number() OVER (ORDER BY h_rate_q, doc_id) AS rh,
               row_number() OVER (ORDER BY nll_rate_q, doc_id) AS rl
        FROM j
    ),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS n_docs,
               sum(CAST(rh - rl AS HUGEINT) * CAST(rh - rl AS HUGEINT))
                   AS sum_d2_h
        FROM ranked
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(CASE WHEN sum_d2_h <= 9223372036854775807
                THEN sum_d2_h END AS BIGINT) AS sum_d2,
           CAST(CASE WHEN n_docs <= 1 THEN 1000000
                ELSE (1000000 * (n_docs * (n_docs * n_docs - 1))
                      - 6000000 * sum_d2_h)
                     // (n_docs * (n_docs * n_docs - 1)) END
                AS BIGINT) AS rho_ppm
    FROM agg
    """,
    doc="QUALITY-SIGNAL RANK CORRELATION — Spearman rho (exact integer "
    "ppm) between the word-entropy rate and the LM nll rate over the "
    "docs both signals score, with deterministic doc_id tie-breaks. "
    "Tells the pipeline whether its gates are redundant or "
    "orthogonal. Ranks computed distributed (bounded rate-histogram "
    "prefix broadcast + within-group row_number — never a global-"
    "order window); Σd² accumulated exactly (decimal(38,0) / HUGEINT) "
    "and REPORTED as NULL past int64 (Σd² ≤ n³/3 exceeds int64 near "
    "n ≈ 3M docs — both engines null identically rather than "
    "overflow); rho finished from the exact wide sum (driver-side "
    "Python bigints / HUGEINT) with truncation division matching "
    "DuckDB — rho itself exact at any n.",
)
def quality_signal_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", TX.words(F.col("text")).alias("w")
    )
    # The two score frames are independent and each materializes its
    # own fixed-point log dictionary eagerly at CONSTRUCTION time
    # (_fp_log2_dict's localCheckpoint — profiled at 4.5 s of the 8.4 s
    # query when built serially). Construct them from driver threads so
    # the two dictionary jobs overlap (optimization r14, guide §2.6);
    # plans and values unchanged.
    from ..catalog import run_parallel

    ent, lm = run_parallel(
        [
            lambda: _entropy_scores_from(d).select("doc_id", "h_rate_q"),
            lambda: _lm_scores(spark, sf_dir).select("doc_id", "nll_rate_q"),
        ]
    )
    j = managed_cache(ent.join(lm, "doc_id"))
    rh = _rank_distributed(j, "h_rate_q", "rh")
    rl = _rank_distributed(j, "nll_rate_q", "rl")
    dd = F.col("rh") - F.col("rl")
    row = (
        rh.join(rl, "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((dd * dd).cast("decimal(38,0)")).alias("s"),
        )
        .collect()[0]  # bounded: the single (n, sum_d2) row
    )
    n, s = int(row["n"]), int(row["s"] or 0)
    den = n * (n * n - 1)
    if den == 0:  # n <= 1: rho degenerates; both engines pin it to 1.0
        rho = 1000000
    else:
        num = 1000000 * den - 6000000 * s
        # truncation division (DuckDB // semantics), exact Python bigints
        rho = -((-num) // den) if num < 0 else num // den
    s_rep = s if s <= (1 << 63) - 1 else None  # NULL past int64, like oracle
    return spark.createDataFrame(
        [(n, s_rep, rho)], "n_docs bigint, sum_d2 bigint, rho_ppm bigint"
    )


# --------------------------------------------------------------------------
# Gate cross-audits (round 10) — contingency and length bias
# --------------------------------------------------------------------------

# quality_signal_correlation gives one number; these give the joint
# distributions a pipeline review actually reads:
# - the entropy x perplexity 3x3 contingency table (which cells hold
#   the docs the two gates DISAGREE about — high-diversity but
#   high-perplexity = rare-domain text an LM-only gate would wrongly
#   drop, low-diversity but low-perplexity = fluent boilerplate an
#   entropy-only gate would wrongly drop);
# - the length x perplexity table — the classic hidden bias of
#   per-token LM scores (short docs have higher variance; a gate that
#   silently skews against short docs erases whole registers).
# Both band every axis by TERCILES over the bounded rate histogram
# (the lm_perplexity_gate cuts), so the tables are calibration-free
# and the output is <= 9 metadata-sized rows from one scoring pass.


def _tercile_cuts(df: DataFrame, col: str):
    """(cut1, cut2) over the bounded histogram of an integer column."""
    n_tot = df.agg(F.count(F.lit(1)).alias("n"))
    hist = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(W.orderBy(col).rowsBetween(W.unboundedPreceding, 0)),
    )
    return cum.crossJoin(F.broadcast(n_tot)).agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col(col))).alias("cut1"),
        F.min(F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col(col))).alias("cut2"),
    )


def _band(col: str, lo: str, mid: str, hi: str):
    return (
        F.when(F.col(col) <= F.col(f"{col}_cut1"), lo)
        .when(F.col(col) <= F.col(f"{col}_cut2"), mid)
        .otherwise(hi)
    )


def _sql_tercile_band(src: str, col: str, lo: str, mid: str, hi: str) -> str:
    """CASE expression banding ``src.col`` by its own terciles — the
    cuts are correlated subqueries over the bounded rate histogram."""
    cut = (
        "(SELECT min(q) FROM (SELECT {c} AS q, sum(count(*)) OVER (ORDER BY {c})"
        " AS cum, (SELECT count(*) FROM " + src + ") AS nn FROM " + src +
        " GROUP BY {c}) WHERE cum * 3 >= {k} * nn)"
    )
    c1 = cut.format(c=col, k=1)
    c2 = cut.format(c=col, k=2)
    return (
        f"CASE WHEN {col} <= {c1} THEN '{lo}' "
        f"WHEN {col} <= {c2} THEN '{mid}' ELSE '{hi}' END"
    )


@query(
    "quality_signal_contingency",
    oracle=f"""
    WITH {_lm_sql_base()}{_LM_SQL_SCORE},
    etok AS MATERIALIZED (
        SELECT doc_id, w[i] AS tok
        FROM (SELECT doc_id, {TX.sql_words('text')} AS w FROM documents),
             unnest(range(1, len(w) + 1)) AS r(i)
    ),
    ewc AS MATERIALIZED (
        SELECT doc_id, tok, count(*) AS c FROM etok GROUP BY doc_id, tok
    ),
    edn AS MATERIALIZED (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM ewc GROUP BY doc_id
    ),
    exs AS MATERIALIZED (
        SELECT DISTINCT x FROM (SELECT c AS x FROM ewc UNION SELECT n FROM edn)
    ){_lm_log_sql('_e', 'exs')},
    esc AS MATERIALIZED (
        SELECT edn.doc_id,
               ((edn.n * lgn.lgv - s.s) << {LM_RATE_Q}) // edn.n AS h_rate_q
        FROM edn
        JOIN lg_e lgn ON lgn.x = edn.n
        JOIN (SELECT ewc.doc_id, CAST(sum(ewc.c * lg_e.lgv) AS BIGINT) AS s
              FROM ewc JOIN lg_e ON lg_e.x = ewc.c
              GROUP BY ewc.doc_id) s USING (doc_id)
    ),
    j AS MATERIALIZED (
        SELECT e.doc_id, e.h_rate_q, q.nll_rate_q
        FROM esc e JOIN scq q USING (doc_id)
    )
    SELECT {_sql_tercile_band('j', 'h_rate_q', 'low', 'mid', 'high')}
               AS entropy_band,
           {_sql_tercile_band('j', 'nll_rate_q', 'head', 'middle', 'tail')}
               AS lm_band,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM j
    GROUP BY entropy_band, lm_band
    ORDER BY entropy_band, lm_band
    """,
    doc="QUALITY-GATE CONTINGENCY TABLE — the 3x3 joint distribution "
    "of the entropy terciles x the LM perplexity terciles, the table "
    "a pipeline review reads to find the docs the two gates DISAGREE "
    "about (high-diversity/high-perplexity = rare domains an LM-only "
    "gate wrongly drops; low-diversity/low-perplexity = fluent "
    "boilerplate an entropy-only gate wrongly drops). One scoring "
    "pass per signal; cuts over bounded rate histograms; <= 9 rows.",
)
def quality_signal_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", TX.words(F.col("text")).alias("w")
    )
    # Same driver-threaded construction as quality_signal_correlation
    # (r14): the two log-dictionary materializations overlap.
    from ..catalog import run_parallel

    ent, lm = run_parallel(
        [
            lambda: _entropy_scores_from(d).select("doc_id", "h_rate_q"),
            lambda: _lm_scores(spark, sf_dir).select("doc_id", "nll_rate_q"),
        ]
    )
    j = managed_cache(ent.join(lm, "doc_id"))
    ch = _tercile_cuts(j, "h_rate_q").select(
        F.col("cut1").alias("h_rate_q_cut1"), F.col("cut2").alias("h_rate_q_cut2")
    )
    cl = _tercile_cuts(j, "nll_rate_q").select(
        F.col("cut1").alias("nll_rate_q_cut1"), F.col("cut2").alias("nll_rate_q_cut2")
    )
    return (
        j.crossJoin(F.broadcast(ch))
        .crossJoin(F.broadcast(cl))
        .select(
            _band("h_rate_q", "low", "mid", "high").alias("entropy_band"),
            _band("nll_rate_q", "head", "middle", "tail").alias("lm_band"),
        )
        .groupBy("entropy_band", "lm_band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("entropy_band", "lm_band")
    )


@query(
    "gate_length_bias_audit",
    oracle=f"""
    WITH {_lm_sql_base()}{_LM_SQL_SCORE},
    j AS MATERIALIZED (
        SELECT doc_id, n_bigrams, nll_rate_q FROM scq
    )
    SELECT {_sql_tercile_band('j', 'n_bigrams', 'short', 'medium', 'long')}
               AS length_band,
           {_sql_tercile_band('j', 'nll_rate_q', 'head', 'middle', 'tail')}
               AS lm_band,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS bigram_sum
    FROM j
    GROUP BY length_band, lm_band
    ORDER BY length_band, lm_band
    """,
    doc="GATE LENGTH-BIAS AUDIT — the classic hidden failure of "
    "per-token LM gates: short documents have higher score variance "
    "and a miscalibrated gate silently skews against them, erasing "
    "whole registers (tweets, titles, dialogue turns). Length "
    "terciles x perplexity terciles with doc and token mass per cell; "
    "a gate with no length bias shows a flat tail share across length "
    "bands. Reads the existing scoring pass; cuts over bounded "
    "histograms; <= 9 rows.",
)
def gate_length_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = managed_cache(
        _lm_scores(spark, sf_dir).select("doc_id", "n_bigrams", "nll_rate_q")
    )
    cb = _tercile_cuts(sc, "n_bigrams").select(
        F.col("cut1").alias("n_bigrams_cut1"), F.col("cut2").alias("n_bigrams_cut2")
    )
    cl = _tercile_cuts(sc, "nll_rate_q").select(
        F.col("cut1").alias("nll_rate_q_cut1"), F.col("cut2").alias("nll_rate_q_cut2")
    )
    return (
        sc.crossJoin(F.broadcast(cb))
        .crossJoin(F.broadcast(cl))
        .select(
            _band("n_bigrams", "short", "medium", "long").alias("length_band"),
            _band("nll_rate_q", "head", "middle", "tail").alias("lm_band"),
            "n_bigrams",
        )
        .groupBy("length_band", "lm_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("bigram_sum"),
        )
        .orderBy("length_band", "lm_band")
    )


# --------------------------------------------------------------------------
# Pipeline order-sensitivity audit (round 10) — dedup first or gate first?
# --------------------------------------------------------------------------

# CCNet dedups BEFORE training its LM for a reason: duplicated text
# inflates its own n-gram counts, so a gate trained on the raw corpus
# systematically favors whatever is duplicated (spam most of all).
# This audit runs BOTH orders end-to-end — (gate on raw model, then
# exact dedup among survivors) vs (exact dedup, then gate on the
# deduped model) — and reports the surviving doc/bigram mass of each,
# making the order's effect a measured number instead of folklore.
# Both orders share one tokenize pass per corpus variant; the oracle
# replays the second order's full model chain under '_b'-suffixed
# CTEs since the two models are genuinely different relations.

_OSA_DEDUP_B = f"""
    ded AS MATERIALIZED (
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   min(doc_id) OVER (PARTITION BY md5(lower(text))) AS keeper
            FROM documents
        ) WHERE keeper = doc_id
    ),
    bg_b AS MATERIALIZED (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM (SELECT doc_id, {TX.sql_words('text')} AS w FROM ded) t,
             unnest(range(1, len(w))) AS r(i)
        WHERE len(w) >= 2
    ),
    c12_b AS MATERIALIZED (
        SELECT w1, w2, count(*) AS c12 FROM bg_b GROUP BY w1, w2
    ),
    c1_b AS MATERIALIZED (SELECT w1, sum(c12) AS c1 FROM c12_b GROUP BY w1),
    voc_b AS MATERIALIZED (
        SELECT count(DISTINCT w) AS v
        FROM (SELECT w1 AS w FROM bg_b UNION ALL SELECT w2 FROM bg_b)
    ),
    xs_b AS MATERIALIZED (
        SELECT DISTINCT x FROM (
            SELECT c12 + 1 AS x FROM c12_b
            UNION
            SELECT c1 + (SELECT v FROM voc_b) AS x FROM c1_b
        )
    ){_lm_log_sql('_b', 'xs_b')},
    c12l_b AS MATERIALIZED (
        SELECT c12_b.w1, c12_b.w2, lg_b.lgv AS l12
        FROM c12_b JOIN lg_b ON lg_b.x = c12_b.c12 + 1
    ),
    c1l_b AS MATERIALIZED (
        SELECT c1_b.w1, lg_b.lgv AS l1
        FROM c1_b JOIN lg_b ON lg_b.x = c1_b.c1 + (SELECT v FROM voc_b)
    ),
    scq_b AS MATERIALIZED (
        SELECT doc_id, n_bigrams,
               (nll_fp << {LM_RATE_Q}) // n_bigrams AS nll_rate_q
        FROM (
            SELECT bg_b.doc_id, count(*) AS n_bigrams,
                   sum(c1l_b.l1 - c12l_b.l12) AS nll_fp
            FROM bg_b
            JOIN c12l_b ON bg_b.w1 = c12l_b.w1 AND bg_b.w2 = c12l_b.w2
            JOIN c1l_b ON bg_b.w1 = c1l_b.w1
            GROUP BY bg_b.doc_id
        )
    ),
    cut_b AS MATERIALIZED (
        SELECT min(CASE WHEN cum * 3 >= 2 * (SELECT count(*) FROM scq_b)
                        THEN q END) AS cut2
        FROM (SELECT q, sum(c) OVER (ORDER BY q) AS cum
              FROM (SELECT nll_rate_q AS q, count(*) AS c
                    FROM scq_b GROUP BY nll_rate_q))
    )"""


@query(
    "pipeline_order_sensitivity",
    oracle=f"""
    WITH {_lm_sql_base()}{_LM_SQL_SCORE},
    cut_a AS MATERIALIZED (
        SELECT min(CASE WHEN cum * 3 >= 2 * (SELECT count(*) FROM scq)
                        THEN q END) AS cut2
        FROM (SELECT q, sum(c) OVER (ORDER BY q) AS cum
              FROM (SELECT nll_rate_q AS q, count(*) AS c
                    FROM scq GROUP BY nll_rate_q))
    ),
    surv_a AS MATERIALIZED (
        SELECT scq.doc_id, scq.n_bigrams, d.text
        FROM scq JOIN documents d USING (doc_id), cut_a
        WHERE scq.nll_rate_q <= cut_a.cut2
    ),
    deda AS (
        SELECT doc_id, n_bigrams FROM (
            SELECT doc_id, n_bigrams,
                   min(doc_id) OVER (PARTITION BY md5(lower(text))) AS keeper
            FROM surv_a
        ) WHERE keeper = doc_id
    ),
    {_OSA_DEDUP_B},
    surv_b AS (
        SELECT scq_b.doc_id, scq_b.n_bigrams
        FROM scq_b, cut_b WHERE scq_b.nll_rate_q <= cut_b.cut2
    )
    SELECT * FROM (
        SELECT 'dedup_first' AS pipeline_order,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_bigrams) AS BIGINT) AS bigram_sum
        FROM surv_b
        UNION ALL
        SELECT 'gate_first', CAST(count(*) AS BIGINT),
               CAST(sum(n_bigrams) AS BIGINT)
        FROM deda
    ) ORDER BY pipeline_order
    """,
    doc="PIPELINE ORDER-SENSITIVITY AUDIT — runs the exact-dedup and "
    "LM-tercile-gate stages in BOTH orders end-to-end: gate_first "
    "trains the model on the RAW corpus (duplicates inflating their "
    "own n-gram counts — the bias CCNet dedups first to avoid) then "
    "dedups survivors; dedup_first trains on the deduped corpus then "
    "gates. Surviving doc and bigram mass per order; the delta is the "
    "duplication bias, measured, not folklore. The oracle replays the "
    "second model chain under suffixed CTEs because the two LMs are "
    "genuinely different relations. One tokenize pass per corpus "
    "variant; everything else broadcast or bounded.",
)
def pipeline_order_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as PW

    d = spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    keeper = F.min("doc_id").over(
        PW.partitionBy(F.md5(F.lower(F.col("text")).cast("binary")))
    )

    def _cut2(scores: DataFrame):
        n_tot = scores.agg(F.count(F.lit(1)).alias("n"))
        hist = scores.groupBy("nll_rate_q").agg(F.count(F.lit(1)).alias("c"))
        cum = hist.withColumn(
            "cum",
            F.sum("c").over(
                W.orderBy("nll_rate_q").rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        return cum.crossJoin(F.broadcast(n_tot)).agg(
            F.min(
                F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("nll_rate_q"))
            ).alias("cut2")
        )

    def _gate(scores: DataFrame) -> DataFrame:
        return (
            scores.crossJoin(F.broadcast(_cut2(scores)))
            .filter(F.col("nll_rate_q") <= F.col("cut2"))
            .select("doc_id", "n_bigrams")
        )

    # The two orders are independent legs, and each trains its own LM
    # (its _fp_log2_dict log dictionary materializes eagerly at plan
    # CONSTRUCTION time) — built from driver threads so the two
    # dictionary jobs overlap (optimization r14, guide §2.6; the legs
    # touch disjoint managed caches). Plans and values unchanged.
    def _order_a() -> DataFrame:
        # order A: gate on the raw-corpus model, dedup among survivors
        sc_a = managed_cache(
            _lm_scores(spark, sf_dir).select("doc_id", "n_bigrams", "nll_rate_q")
        )
        return (
            _gate(sc_a)
            .join(d, "doc_id")
            .withColumn("keeper", keeper)
            .filter(F.col("keeper") == F.col("doc_id"))
            .select("doc_id", "n_bigrams")
        )

    def _order_b() -> DataFrame:
        # order B: dedup first, model trained on the deduped corpus
        ded = managed_cache(
            d.withColumn("keeper", keeper)
            .filter(F.col("keeper") == F.col("doc_id"))
            .select("doc_id", "text")
        )
        sc_b = _lm_scores_from(_lm_bigrams_from(ded)).select(
            "doc_id", "n_bigrams", "nll_rate_q"
        )
        return _gate(managed_cache(sc_b))

    from ..catalog import run_parallel

    deda, surv_b = run_parallel([_order_a, _order_b])

    def _mass(dfx: DataFrame, order: str) -> DataFrame:
        return dfx.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("bigram_sum"),
        ).select(F.lit(order).alias("pipeline_order"), "n_docs", "bigram_sum")

    return (
        _mass(surv_b, "dedup_first")
        .unionByName(_mass(deda, "gate_first"))
        .orderBy("pipeline_order")
    )


# --------------------------------------------------------------------------
# DP-privatized data card (round 12) — the release artifact, privatized
# --------------------------------------------------------------------------

from .analytics import DP_EPS_PPM, _dp_sql_geom, dp_geom  # noqa: E402

DP_DC_CLAMP = 4  # per-doc token contribution bound => sum sensitivity
DP_DC_EPS_TOTAL_PPM = (2 + DP_DC_CLAMP) * DP_EPS_PPM  # sequential comp.


def _dc_sql_u(salt: str) -> str:
    return TX.sql_hash28(f"'{salt}|' || source")


@query(
    "corpus_datacard_dp",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source, lang, {TX.sql_words('text')} AS w
        FROM documents
    ),
    qc AS (
        SELECT doc_id,
               {QC_BIAS} + sum({_qc_weight_sql(f"{TX.sql_hash28('tok')} % {FH_DIM}")})
                   AS score
        FROM (SELECT doc_id, unnest(list_distinct(w)) AS tok FROM w)
        GROUP BY doc_id
    ),
    cls AS (
        SELECT w.source,
               count(*) AS n_docs,
               count(DISTINCT w.lang) AS n_langs,
               count(CASE WHEN q.score >= {QC_KEEP_MIN} THEN 1 END) AS n_keep,
               sum(least({DP_DC_CLAMP}, len(w.w))) AS tok_band
        FROM w JOIN qc q ON q.doc_id = w.doc_id
        GROUP BY w.source
    ),
    keyed AS (
        SELECT *,
               {_dc_sql_u('dcd1')} AS ud1, {_dc_sql_u('dcd2')} AS ud2,
               {_dc_sql_u('dck1')} AS uk1, {_dc_sql_u('dck2')} AS uk2,
               {_dc_sql_u('dct1')} AS ut1, {_dc_sql_u('dct2')} AS ut2
        FROM cls
    )
    SELECT source,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(n_docs + {_dp_sql_geom('ud1')} - {_dp_sql_geom('ud2')}
               AS BIGINT) AS noisy_n_docs,
           CAST(n_keep + {_dp_sql_geom('uk1')} - {_dp_sql_geom('uk2')}
               AS BIGINT) AS noisy_quality_keep,
           CAST(tok_band + {_dp_sql_geom('ut1')} - {_dp_sql_geom('ut2')}
               AS BIGINT) AS noisy_token_band_sum,
           CAST({DP_EPS_PPM} AS BIGINT) AS eps_docs_ppm,
           CAST({DP_EPS_PPM} AS BIGINT) AS eps_keep_ppm,
           CAST({DP_DC_CLAMP * DP_EPS_PPM} AS BIGINT) AS eps_tokens_ppm,
           CAST({DP_DC_EPS_TOTAL_PPM} AS BIGINT) AS eps_total_ppm
    FROM keyed
    ORDER BY source
    """,
    doc="DP-PRIVATIZED DATA CARD (judge r11 #7) — dp_release_gate's "
    "mechanism composed into corpus_datacard_report: the per-source "
    "release artifact a real pipeline publishes next to the corpus, "
    "with document counts, quality-classifier keep counts, and a "
    f"clamped token sum (per-doc contribution bounded at {DP_DC_CLAMP} "
    "=> sum sensitivity) released under the exact-integer geometric "
    "mechanism (alpha = 1/2, same inverse-CDF draw over salted 28-bit "
    "sha256 uniforms — bit-identical in both engines; same PUBLIC-seed "
    "caveat as dp_release_gate: this demonstrates the arithmetic and "
    "accounting, production swaps in a curator-held secret seed). "
    "Three statistics over the SAME documents per source compose "
    f"SEQUENTIALLY: eps_total = (1 + 1 + {DP_DC_CLAMP})*ln 2, carried "
    "by the ppm ledger columns; n_langs is the declared NON-PRIVATE "
    "coverage column and reconciles exactly with the standalone data "
    "card (tests/test_dp_release.py). 100 TB: one documents scan, one "
    "partial-aggregable per-source rollup; the noise is a bounded-"
    "class-space projection — metadata-sized.",
)
def corpus_datacard_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    w = d.select("doc_id", "source", "lang", TX.words(F.col("text")).alias("w"))
    qc = (
        w.select(
            "doc_id",
            F.explode(F.array_distinct(F.col("w"))).alias("tok"),
        )
        .select("doc_id", (TX.hash28(F.col("tok")) % FH_DIM).alias("bucket"))
        .groupBy("doc_id")
        .agg(
            (F.lit(QC_BIAS) + F.sum((F.col("bucket") * 37 + 11) % 21 - 10)).alias(
                "score"
            )
        )
    )
    cls = (
        w.join(qc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.count(F.when(F.col("score") >= QC_KEEP_MIN, 1))
            .cast("bigint")
            .alias("n_keep"),
            F.sum(F.least(F.lit(DP_DC_CLAMP), F.size("w")))
            .cast("bigint")
            .alias("tok_band"),
        )
    )

    def u(salt: str) -> F.Column:
        return TX.hash28(F.concat_ws("|", F.lit(salt), F.col("source")))

    return cls.select(
        "source",
        F.col("n_langs").cast("bigint").alias("n_langs"),
        (F.col("n_docs") + dp_geom(u("dcd1")) - dp_geom(u("dcd2")))
        .cast("bigint")
        .alias("noisy_n_docs"),
        (F.col("n_keep") + dp_geom(u("dck1")) - dp_geom(u("dck2")))
        .cast("bigint")
        .alias("noisy_quality_keep"),
        (F.col("tok_band") + dp_geom(u("dct1")) - dp_geom(u("dct2")))
        .cast("bigint")
        .alias("noisy_token_band_sum"),
        F.lit(DP_EPS_PPM).cast("bigint").alias("eps_docs_ppm"),
        F.lit(DP_EPS_PPM).cast("bigint").alias("eps_keep_ppm"),
        F.lit(DP_DC_CLAMP * DP_EPS_PPM).cast("bigint").alias("eps_tokens_ppm"),
        F.lit(DP_DC_EPS_TOTAL_PPM).cast("bigint").alias("eps_total_ppm"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# PSI drift with exact fixed-point log2 (round 13) — ks_drift_binned's
# industry-standard twin, on the same slices and the same binning
# --------------------------------------------------------------------------

from .analytics import KS_A as _KS_A  # noqa: E402
from .analytics import KS_B as _KS_B  # noqa: E402
from .analytics import KS_K as _KS_K  # noqa: E402

# L(x) is exact for any bigint x >= 1 (mantissa normalization bounds
# every intermediate), but the PSI arguments are count PRODUCTS
# (n_b+1)*(M+K): past 2^62 the Spark product wraps silently where the
# DuckDB HUGEINT would keep going — fail LOUDLY at the same boundary
# instead (the _qct_overflow_guard discipline). PSI is ratio-based, so
# a corpus past the bound quantizes counts (e.g. to ppb) first.
_PSI_DOMAIN = 1 << 62


def _psi_guard(c: "F.Column") -> "F.Column":
    return F.when(
        c < F.lit(_PSI_DOMAIN).cast("decimal(20,0)"), c.cast("bigint")
    ).otherwise(
        F.raise_error(
            F.lit(
                "psi: count product exceeds the exact log2 domain (2^62) "
                "— quantize counts before the PSI pass"
            )
        ).cast("bigint")
    )


@query(
    "psi_drift_fixed_point",
    oracle=f"""
    WITH v AS (SELECT value, event_type FROM events
               WHERE event_type IN ('{_KS_A}', '{_KS_B}')),
    r AS (SELECT min(value) AS lo, max(value) AS hi FROM v),
    bc AS (
        SELECT CASE WHEN r.hi = r.lo THEN 0
               ELSE LEAST({_KS_K - 1},
                          CAST(floor((v.value - r.lo) / (r.hi - r.lo)
                                     * CAST({_KS_K} AS DOUBLE)) AS INT))
               END AS bin,
               count(*) FILTER (WHERE event_type = '{_KS_A}') AS ca,
               count(*) FILTER (WHERE event_type = '{_KS_B}') AS cb
        FROM v, r GROUP BY 1
    ),
    spine AS (SELECT CAST(unnest(range(0, {_KS_K})) AS INT) AS bin),
    b AS (
        SELECT s.bin, coalesce(bc.ca, 0) AS ca, coalesce(bc.cb, 0) AS cb
        FROM spine s LEFT JOIN bc ON bc.bin = s.bin
    ),
    t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                 CAST(sum(cb) AS BIGINT) AS nb FROM b),
    sm AS (
        SELECT bin,
               CAST(ca + 1 AS BIGINT) AS np, CAST(cb + 1 AS BIGINT) AS mp,
               CAST(t.na + {_KS_K} AS BIGINT) AS np_tot,
               CAST(t.nb + {_KS_K} AS BIGINT) AS mp_tot
        FROM b, t
    ),
    ab AS (
        SELECT bin, np_tot, mp_tot,
               CASE WHEN CAST(np AS HUGEINT) * mp_tot >= {_PSI_DOMAIN}
                    THEN CAST(error('psi: count product exceeds the exact '
                                    'log2 domain (2^62)') AS BIGINT)
                    ELSE CAST(CAST(np AS HUGEINT) * mp_tot AS BIGINT)
               END AS a,
               CASE WHEN CAST(mp AS HUGEINT) * np_tot >= {_PSI_DOMAIN}
                    THEN CAST(error('psi: count product exceeds the exact '
                                    'log2 domain (2^62)') AS BIGINT)
                    ELSE CAST(CAST(mp AS HUGEINT) * np_tot AS BIGINT)
               END AS bq
        FROM sm
    ),
    xspsi AS (
        SELECT DISTINCT x FROM (
            SELECT a AS x FROM ab UNION SELECT bq FROM ab
        )
    ){_lm_log_sql('psi', 'xspsi')},
    terms AS (
        SELECT ab.a, ab.bq, la.lgv AS la, lb.lgv AS lb
        FROM ab
        JOIN lgpsi la ON la.x = ab.a
        JOIN lgpsi lb ON lb.x = ab.bq
    ),
    s AS (
        SELECT CAST(sum(CAST(a - bq AS HUGEINT) * (la - lb)) AS HUGEINT)
               AS psi_fp
        FROM terms
    ),
    dd AS (
        SELECT DISTINCT CAST(np_tot AS HUGEINT) * mp_tot * {1 << LM_B} AS den
        FROM sm
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           CAST(s.psi_fp AS DECIMAL(38,0)) AS psi_fp,
           CAST(s.psi_fp AS DOUBLE) / CAST(dd.den AS DOUBLE) AS psi_bits,
           s.psi_fp * 4 > dd.den AS psi_gt_025
    FROM t, s, dd
    """,
    doc=f"POPULATION STABILITY INDEX, division-free: the industry-"
    f"standard drift score Σ_b (p_b − q_b)·log2(p_b/q_b) between "
    f"'{_KS_A}' and '{_KS_B}' event values over ks_drift_binned's exact "
    f"{_KS_K}-bin equi-width histogram (same slices, same binning — the "
    "two monitors read side by side), with add-one smoothing per bin so "
    "empty bins are defined (the standard epsilon treatment, declared: "
    f"n'=n+1, N'=N+{_KS_K}). Each term is rewritten as the exact "
    "integer (n'M' − m'N')·(L(n'M') − L(m'N')) where L is the "
    "shift-and-square fixed-point log2 the LM gate trains with "
    f"(LM_B={LM_B} fractional bits, evaluated once per distinct "
    "product value — a ≤ 2·{_KS_K}-row dictionary); sign-consistency "
    "of the two factors makes every term ≥ 0 exactly as in the real "
    "function, and the sum is a single decimal. psi_bits (the log2-"
    "base PSI; multiply by ln 2 for nats) is the query's only float "
    "division, and the classic 0.25 alarm threshold is evaluated "
    "CROSS-MULTIPLIED in exact integers (psi_fp·4 > N'M'·2^B), so the "
    "alert line every drift monitor pages on is float-free. 100 TB: "
    "one partial-aggregable GROUP BY over a bounded bin space, a "
    "128-value log dictionary, a 64-row fold — scan-bound, like the "
    "KS twin. Products past 2^62 fail loudly on BOTH engines (Spark "
    "raise_error guard, DuckDB HUGEINT-vs-error CASE) — quantize "
    "counts first at that scale.",
)
def psi_drift_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_A, _KS_B))
        .select("value", "event_type")
    )
    r = v.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bin_ = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(_KS_K - 1),
            F.floor(
                (F.col("value") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * F.lit(float(_KS_K))
            ).cast("int"),
        )
    )
    bc = (
        v.crossJoin(F.broadcast(r))
        .select(bin_.alias("bin"), "event_type")
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("event_type") == _KS_A, 1)).alias("ca"),
            F.count(F.when(F.col("event_type") == _KS_B, 1)).alias("cb"),
        )
    )
    spine = spark.range(_KS_K).select(F.col("id").cast("int").alias("bin"))
    b = spine.join(bc, "bin", "left").select(
        "bin",
        F.coalesce("ca", F.lit(0)).cast("bigint").alias("ca"),
        F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb"),
    )
    b = managed_cache(b)
    t = b.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    sm = b.crossJoin(F.broadcast(t)).select(
        "bin",
        (F.col("ca") + 1).alias("np"),
        (F.col("cb") + 1).alias("mp"),
        (F.col("na") + _KS_K).alias("np_tot"),
        (F.col("nb") + _KS_K).alias("mp_tot"),
    )
    dec19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    ab = sm.select(
        "bin",
        "np_tot",
        "mp_tot",
        _psi_guard(dec19("np") * dec19("mp_tot")).alias("a"),
        _psi_guard(dec19("mp") * dec19("np_tot")).alias("bq"),
    )
    ab = managed_cache(ab)
    xs = ab.select(F.col("a").alias("x")).union(
        ab.select(F.col("bq").alias("x"))
    ).distinct()
    lg = _fp_log2_dict(xs)  # bounded: <= 2*_KS_K rows, localCheckpointed
    terms = (
        ab.join(
            F.broadcast(lg.select(F.col("x").alias("a"), F.col("lgv").alias("la"))),
            "a",
        )
        .join(
            F.broadcast(
                lg.select(F.col("x").alias("bq"), F.col("lgv").alias("lb"))
            ),
            "bq",
        )
        .select(
            "np_tot",
            "mp_tot",
            (
                (F.col("a") - F.col("bq")).cast("decimal(20,0)")
                * (F.col("la") - F.col("lb")).cast("decimal(10,0)")
            ).alias("term"),
        )
    )
    s = terms.agg(
        F.sum("term").cast("decimal(38,0)").alias("psi_fp"),
        (
            F.max("np_tot").cast("decimal(19,0)")
            * F.max("mp_tot").cast("decimal(19,0)")
            * F.lit(1 << LM_B).cast("decimal(10,0)")
        ).alias("den"),
    )
    return t.crossJoin(F.broadcast(s)).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.col("psi_fp"),
        (F.col("psi_fp").cast("double") / F.col("den").cast("double")).alias(
            "psi_bits"
        ),
        (F.col("psi_fp") * 4 > F.col("den")).alias("psi_gt_025"),
    )
