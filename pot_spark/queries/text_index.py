"""Text ranking / indexing / quality-trim operators for training-data
pipelines: character entropy, repetition ratio (Gopher-style quality
signals), TF-IDF term ranking, inverted-index construction, and
percentile-based length trimming.

All hot paths are JVM column expressions or built-in aggregations —
per-document signals (entropy terms, bigram dedup ratios) are computed
with higher-order array functions inside whole-stage codegen wherever the
semantics allow, so a 100 TB corpus is one scan; only the corpus-level
statistics (document frequency, percentile bounds) shuffle, and they
shuffle on low-cardinality keys (term, lang) with map-side partial
aggregation.

No reference counterpart: petomalina/pot has no text processing of any
kind (SURVEY.md §2-A — its operator surface is KV upsert/get/remove/list/
archive, server.go:272-614).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load


@query(
    "q_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS cnt
        FROM documents,
             unnest(list_filter(string_split(text, ''), x -> x <> '')) AS t(c)
        GROUP BY doc_id, c
    )
    SELECT doc_id,
           ROUND(LN(SUM(cnt)) - SUM(cnt * LN(cnt)) / SUM(cnt), 6) AS entropy,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars
    FROM chars
    GROUP BY doc_id
    """,
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (a classic low-quality
    /boilerplate detector: near-zero entropy = repeated filler). Uses the
    shuffle-stable form H = ln(n) - sum(c*ln c)/n over per-char counts so
    both engines compute identical partial sums. The (doc_id, char) explode
    partial-aggregates map-side (distinct chars per doc is tiny), so the
    shuffle volume is O(docs * alphabet), not O(corpus chars)."""
    docs = load(spark, sf_dir, "documents")
    chars = (
        docs.select(
            "doc_id",
            F.explode(F.filter(F.split("text", ""), lambda x: x != "")).alias("c"),
        )
        .groupBy("doc_id", "c")
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    return chars.groupBy("doc_id").agg(
        F.round(
            F.log(F.sum("cnt")) - F.sum(F.col("cnt") * F.log("cnt")) / F.sum("cnt"),
            6,
        ).alias("entropy"),
        F.count("*").alias("n_distinct_chars"),
    )


@query(
    "q_repetition_ratio",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(t) - 1 AS BIGINT) AS n_bigrams,
           ROUND(1.0 - CAST(len(list_distinct(
               list_transform(generate_series(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i + 1])
           )) AS DOUBLE) / (len(t) - 1), 6) AS dup_bigram_ratio
    FROM toks
    WHERE len(t) >= 2
    """,
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram fraction per document (the Gopher repetition
    filter family: high ratio = templated/spammy text). Entirely per-row
    higher-order array expressions — zero shuffles, one corpus scan, and
    the bigram arrays never leave the executor."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"),
    ).where(F.size("t") >= 2)
    bigrams = F.expr(
        "transform(sequence(1, size(t) - 1),"
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    )
    return toks.select(
        "doc_id",
        "lang",
        (F.size("t") - 1).cast("bigint").alias("n_bigrams"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(bigrams)).cast("double") / (F.size("t") - 1),
            6,
        ).alias("dup_bigram_ratio"),
    )


@query(
    "q_tfidf_top_terms",
    oracle="""
    WITH tf AS (
        SELECT doc_id, tok AS term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM documents,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS u(tok)
        GROUP BY doc_id, tok
    ),
    df AS (
        SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * LN(n.n_docs / df.df), 6) AS tfidf,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * LN(n.n_docs / df.df) DESC, tf.term
               ) AS rn
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM scored WHERE rn = 1
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF term per document. Term frequencies partial-aggregate
    map-side before the (doc_id, term) shuffle; document frequency reuses
    the same exploded relation with a second, much smaller shuffle on term
    alone; N is a broadcast 1-row aggregate. Deterministic across ties via
    (score DESC, term ASC). At 100 TB the df table is vocabulary-sized and
    therefore unbounded — no broadcast hint: AQE broadcasts it while it
    fits and falls back to a term-keyed shuffle (skew-join-split) when the
    vocabulary outgrows the limit."""
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    n_docs = docs.count()
    scored = tf.join(df, "term").withColumn(
        "score", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "term", F.round("score", 6).alias("tfidf"))
    )


@query(
    "q_inverted_index",
    oracle="""
    WITH posting AS (
        SELECT DISTINCT tok AS term, doc_id
        FROM documents,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS u(tok)
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           list_sort(list(doc_id)) AS postings
    FROM posting
    GROUP BY term
    HAVING COUNT(*) >= 10
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term -> sorted posting list of doc_ids, for
    terms appearing in >= 10 docs. The distinct + groupBy share one hash
    partitioning on term (Catalyst reuses the Exchange), and posting lists
    are sorted inside the executor (`array_sort`), never on the driver.
    This is the build step for the q_ngram_jaccard-style candidate
    blocking used by the dedup family."""
    docs = load(spark, sf_dir, "documents")
    posting = (
        docs.select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("term"),
        )
        .distinct()
    )
    return (
        posting.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.array_sort(F.collect_list("doc_id")).alias("postings"),
        )
        .where(F.col("df") >= 10)
    )


@query(
    "q_len_trim_filter",
    oracle="""
    WITH bounds AS (
        SELECT lang,
               quantile_cont(n_chars, 0.05) AS lo,
               quantile_cont(n_chars, 0.95) AS hi
        FROM documents GROUP BY lang
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(AVG(CAST(d.n_chars AS DOUBLE)), 6) AS avg_kept_chars
    FROM documents d JOIN bounds b ON d.lang = b.lang
    WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
    GROUP BY d.lang
    """,
)
def q_len_trim_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-based length trimming: drop docs outside their
    language's [p05, p95] char-length band (tail trimming before
    training). The per-lang bounds are a tiny aggregate broadcast back
    onto the corpus scan — the full table is read once and never
    re-shuffled; only the per-lang result aggregation shuffles."""
    docs = load(spark, sf_dir, "documents")
    bounds = docs.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.05)).alias("lo"),
        F.percentile("n_chars", F.lit(0.95)).alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounds), "lang")
        .where((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_kept_chars"),
        )
    )


@query(
    "q_token_pmi",
    oracle="""
    WITH toks AS (
        SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents
    ),
    uni AS (
        SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c
        FROM toks, unnest(t) AS u(tok) GROUP BY tok
    ),
    n_uni AS (SELECT SUM(c) AS n FROM uni),
    big AS (
        SELECT bg, CAST(COUNT(*) AS DOUBLE) AS c
        FROM (SELECT list_transform(generate_series(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i + 1]) AS bgs
              FROM toks WHERE len(t) >= 2),
             unnest(bgs) AS u(bg)
        GROUP BY bg
    ),
    n_big AS (SELECT SUM(c) AS n FROM big)
    SELECT split_part(bg, ' ', 1) AS w1,
           split_part(bg, ' ', 2) AS w2,
           CAST(big.c AS BIGINT) AS n_pair,
           ROUND(LN((big.c / n_big.n) /
                    ((u1.c / n_uni.n) * (u2.c / n_uni.n))), 6) AS pmi
    FROM big, n_big, n_uni
    JOIN uni u1 ON u1.tok = split_part(bg, ' ', 1)
    JOIN uni u2 ON u2.tok = split_part(bg, ' ', 2)
    WHERE big.c >= 5
    """,
)
def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent token pairs (collocation
    mining; the association score behind phrase detection in corpus prep).
    Unigram and bigram counts partial-aggregate map-side from the same
    scan; the vocabulary-sized unigram table broadcasts back onto the
    bigram counts (two small shuffles, zero corpus re-reads). The PMI
    expression mirrors the oracle's operation order exactly so IEEE
    doubles agree to well past the 6-digit round."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.filter(F.split("text", " "), lambda x: x != "").alias("t"))
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("double").alias("c"))
    )
    n_uni = float(uni.agg(F.sum("c")).collect()[0][0])
    bigrams = F.expr(
        "transform(sequence(1, size(t) - 1),"
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    )
    big = (
        toks.where(F.size("t") >= 2)
        .select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").cast("double").alias("c"))
    )
    n_big = float(big.agg(F.sum("c")).collect()[0][0])
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    return (
        big.where(F.col("c") >= 5)
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            F.col("c"),
        )
        # unigram vocab is unbounded at corpus scale — no broadcast hint;
        # AQE broadcasts while it fits, else shuffles on the word key
        .join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("c") / F.lit(n_big))
                    / ((F.col("c1") / F.lit(n_uni)) * (F.col("c2") / F.lit(n_uni)))
                ),
                6,
            ).alias("pmi"),
        )
    )
