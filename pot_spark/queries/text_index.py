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
from pot_spark.tables import load, load_spread


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
           ROUND(LN(SUM(cnt))
                 - SUM(CAST(cnt * LN(cnt) AS DECIMAL(28,12))) / SUM(cnt),
                 6) AS entropy,
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
    shuffle volume is O(docs * alphabet), not O(corpus chars). The scan
    is spread (r13 opt): the per-CHARACTER explode is heavy scan-side
    compute and ran on one core of the single-split fixture — A/B
    interleaved: sf0.1 2.82 -> 1.85 s, true-sf1 11.7 -> 2.7 s, a win at
    BOTH scales so the spread is unconditional (no min_bytes gate)."""
    docs = load_spread(spark, sf_dir, "documents")
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
            F.log(F.sum("cnt"))
            - F.sum((F.col("cnt") * F.log("cnt")).cast("decimal(28,12)"))
            / F.sum("cnt"),
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
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)
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
    docs = load_spread(spark, sf_dir, "documents")
    # not-null filter: no-op that equalizes the branches' pushed-filter
    # sets; sum(when(tf > 0, 1)) instead of count(*) keeps tf required
    # so column pruning cannot collapse the df branch into a
    # distinct-aggregate whose exchange no longer matches tf's (count
    # ("tf") is NOT enough: tf is provably non-null, so Catalyst
    # rewrites it back to count(1)) — together they let stage reuse
    # collapse the duplicated scan+explode (q_unigram_logprob r13
    # pattern; tf >= 1 always, so the sums equal the counts)
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("term"),
        )
        .where(F.col("term").isNotNull())
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df = tf.groupBy("term").agg(
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
        .cast("double")
        .alias("df")
    )
    # N stays IN the plan as a broadcast 1-row aggregate: docs.count()
    # here would run an extra eager full-corpus scan before the query
    # proper even starts (the q_token_pmi totals pattern)
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
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
           list_aggr(list_sort(list(doc_id)), 'string_agg', ',') AS postings
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
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)
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
            # posting list emitted as a joined string (q_array_agg
            # pattern): raw arrays crash the external harness's
            # pandas canonical sort. Sort numerically, then stringify.
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
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
    # one percentile buffer for both bounds (array form — see
    # q_equidepth_bins in analytics_extra)
    bounds = docs.groupBy("lang").agg(
        F.percentile(
            "n_chars", F.array(F.lit(0.05), F.lit(0.95))
        ).alias("_b")
    ).select(
        "lang", F.col("_b")[0].alias("lo"), F.col("_b")[1].alias("hi")
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
    bigram counts (two small shuffles, zero corpus re-reads), and the two
    corpus totals ride along as broadcast 1-row aggregates instead of
    driver-side collected scalars. The PMI
    expression mirrors the oracle's operation order exactly so IEEE
    doubles agree to well past the 6-digit round."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(F.filter(F.split("text", " "), lambda x: x != "").alias("t"))
    # not-null filters are no-ops (explode of split never yields nulls)
    # that equalize every branch's pushed-filter set so the totals'
    # broadcast branches reuse the count branches' exchanges instead of
    # re-scanning (the q_unigram_logprob r13 pattern); bigrams explode
    # as (w1, w2) structs so the PMI join keys ARE the group keys —
    # counts by (w1, w2) equal counts by the joined string (tokens
    # cannot contain the separator), and the inferred join null-filters
    # land on the same columns in every branch.
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .where(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count("*").cast("double").alias("c"))
    )
    bigrams = F.expr(
        "transform(sequence(1, size(t) - 1),"
        " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
    )
    big = (
        toks.where(F.size("t") >= 2)
        .select(F.explode(bigrams).alias("p"))
        .select("p.w1", "p.w2")
        .where(F.col("w1").isNotNull() & F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("double").alias("c"))
    )
    # the two corpus totals stay IN the plan as 1-row aggregates
    # broadcast onto every row — one Spark job, no driver round-trips.
    # Each count is an integer-valued double, so the sums are exact
    # (< 2^53) and aggregation order cannot perturb them.
    tot_uni = uni.agg(F.sum("c").alias("n_uni"))
    tot_big = big.agg(F.sum("c").alias("n_big"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    return (
        big.where(F.col("c") >= 5)
        # unigram vocab is unbounded at corpus scale — no broadcast hint;
        # AQE broadcasts while it fits, else shuffles on the word key
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot_big))
        .crossJoin(F.broadcast(tot_uni))
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("c") / F.col("n_big"))
                    / (
                        (F.col("c1") / F.col("n_uni"))
                        * (F.col("c2") / F.col("n_uni"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


_BM25_TERMS = ("hash", "join", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "q_bm25",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM d),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS m
        FROM d, unnest(t) AS u(tok)
        WHERE tok IN ('hash', 'join', 'vector')
        GROUP BY doc_id, tok
    ),
    dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    s AS (
        SELECT tf.doc_id, tf.tok,
               ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
               * ((tf.m * 2.2)
                  / (tf.m + 1.2 * (0.25 + 0.75 * (dl.dl / stats.avgdl)))) AS s
        FROM tf
        JOIN dfq USING (tok)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(COALESCE(MAX(CASE WHEN tok = 'hash' THEN s END), 0)
               + COALESCE(MAX(CASE WHEN tok = 'join' THEN s END), 0)
               + COALESCE(MAX(CASE WHEN tok = 'vector' THEN s END), 0), 6)
             AS bm25
    FROM s GROUP BY doc_id
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring of every document against a fixed probe
    term set (k1=1.2, b=0.75, Lucene idf) — the retrieval-side ranking
    primitive next to q_tfidf_top_terms' indexing side. Tokens are
    filtered to the probe terms BEFORE the tf shuffle, so the shuffled
    relation is bounded by matching postings, never the corpus token
    stream; document length is a scan-side column; corpus stats are a
    1-row broadcast. Per-term scores are summed in a fixed literal
    order (coalesced conditional aggregates), so the 3-double addition
    is bit-identical across engines — a plain SUM over the term rows
    would be partial-aggregation-order-dependent.

    No reference counterpart: petomalina/pot has no text search
    (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"),
    )
    dl = toks.select("doc_id", F.size("t").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("tok"))
        .filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("double").alias("m"))
    )
    dfq = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("m") + _BM25_K1 * (
        F.lit(1.0 - _BM25_B) + _BM25_B * (F.col("dl") / F.col("avgdl"))
    )
    s = (
        tf.join(dfq, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "tok", (idf * ((F.col("m") * 2.2) / denom)).alias("s")
        )
    )
    term_score = [
        F.coalesce(F.max(F.when(F.col("tok") == t, F.col("s"))), F.lit(0.0))
        for t in _BM25_TERMS
    ]
    return s.groupBy("doc_id").agg(
        F.count("*").alias("n_terms"),
        F.round(term_score[0] + term_score[1] + term_score[2], 6).alias("bm25"),
    )


@query(
    "q_tokenizer_vocab",
    oracle="""
    WITH tok AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        FROM documents
    ),
    vocab AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY t),
    tot AS (SELECT SUM(freq) AS n FROM vocab),
    ranked AS (
        SELECT t, freq,
               row_number() OVER (ORDER BY freq DESC, t) AS rank,
               SUM(freq) OVER (ORDER BY freq DESC, t
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
        FROM vocab
    )
    SELECT rank, t AS token, freq,
           CAST(floor(cum * 1000000.0 / tot.n) AS BIGINT) AS coverage_ppm
    FROM ranked CROSS JOIN tot
    WHERE rank <= 100
    """,
)
def q_tokenizer_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary construction: the top-100 tokens by corpus
    frequency with cumulative coverage (ppm of all token occurrences) —
    the curve you read before picking a vocab size. The corpus-scale
    token stream collapses to the vocab via one map-side-combined
    shuffle; a per-partition top-100 then prunes the vocab (whose
    distinct-token count grows heap-style with the corpus — typos,
    URLs, code) to O(100 x partitions) candidates before the global
    ranking window, and coverage is an exact integer ppm (floor of a
    BIGINT-product ratio — no float sum order anywhere). Ties break
    lexicographically so the rank is total.

    No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t")
    )
    vocab = tok.groupBy("t").agg(F.count("*").alias("freq"))
    total = vocab.agg(F.sum("freq").alias("n"))
    # pre-prune before the global ranking window: keep each partition's
    # top-100 only. A pruned token has >= 100 tokens ahead of it in its
    # own partition, so it can never be in the GLOBAL top-100, and every
    # token ranked above a surviving top-100 token is itself global
    # top-100 (hence also a candidate) — rank and cumulative frequency
    # are unchanged. The unpartitioned window then sorts
    # O(100 x n_partitions) candidate rows, never the full vocabulary
    # (distinct-token count grows heap-style with the corpus).
    w_local = Window.partitionBy("pid").orderBy(F.desc("freq"), F.asc("t"))
    cand = (
        vocab.withColumn("pid", F.spark_partition_id())
        .withColumn("local_rank", F.row_number().over(w_local))
        .where(F.col("local_rank") <= 100)
        .drop("pid", "local_rank")
    )
    w = Window.orderBy(F.desc("freq"), F.asc("t"))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = cand.select(
        "t",
        "freq",
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.sum("freq").over(wc).alias("cum"),
    ).where(F.col("rank") <= 100)
    return ranked.crossJoin(F.broadcast(total)).select(
        F.col("rank"),
        F.col("t").alias("token"),
        "freq",
        F.floor(F.col("cum") * 1000000.0 / F.col("n"))
        .cast("bigint")
        .alias("coverage_ppm"),
    )


# ---------------------------------------------------------------------------
# BPE merge step: the inner loop of tokenizer training — count adjacent
# symbol pairs weighted by word frequency, rank the merge candidates.
# ---------------------------------------------------------------------------


@query(
    "q_bpe_pair_counts",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wf AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM words WHERE len(word) >= 2 GROUP BY word
    ),
    pairs AS (
        SELECT substr(word, CAST(i AS INTEGER), 2) AS pair,
               CAST(SUM(freq) AS BIGINT) AS n
        FROM wf, unnest(generate_series(1, len(word) - 1)) AS u(i)
        GROUP BY 1
    )
    SELECT pair, n FROM pairs ORDER BY n DESC, pair LIMIT 20
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training iteration: character-level adjacent-pair counts
    weighted by word frequency — the statistic whose argmax becomes the
    next merge rule. Two rollups, both with map-side partial
    aggregation: corpus tokens collapse to the word-frequency table
    FIRST (types, not tokens — pair extraction then runs over distinct
    words only, ~Zipf-bounded, not over every corpus occurrence), and
    pair counts collapse to the bounded charset^2 relation. The final
    top-20 plans as TakeOrderedAndProject (per-partition heaps, no
    global sort shuffle). At 100 TB the heavy relation is the first
    rollup's token stream; everything after is type-scale."""
    words = load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    wf = (
        words.filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    pairs = wf.select(
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
        F.col("word"),
    ).select(F.expr("substring(word, i, 2)").alias("pair"), "freq")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


@query(
    "q_boilerplate_ngrams",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, source, toks[i] || ' ' || toks[i+1] AS gram
      FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
      WHERE len(toks) >= 2
    ),
    dfreq AS (
      SELECT source, gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1, 2
    ),
    srcn AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs FROM t GROUP BY 1),
    boiler AS (
      SELECT dfreq.source, dfreq.gram FROM dfreq JOIN srcn USING (source)
      WHERE dfreq.df * 5 >= srcn.n_docs
    )
    SELECT g.doc_id,
           g.source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(b.gram) AS BIGINT) AS n_boiler,
           CAST(COUNT(b.gram) * 1000000 // COUNT(*) AS BIGINT) AS boiler_ppm
    FROM g LEFT JOIN boiler b ON g.source = b.source AND g.gram = b.gram
    GROUP BY 1, 2
    """,
)
def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection, the CCNet/RefinedWeb preprocessing
    step: a bigram is boilerplate for a source when it appears in >= 20%
    of that source's documents (nav bars, footers, license headers —
    text shared across a crawl domain rather than authored per page),
    and each document reports its boilerplate fraction in exact floored
    ppm (integer `div` on both engines — no float threshold anywhere;
    the df cut is the integer cross-product ``df * 5 >= n_docs``).

    Plan shape at 100 TB: the bigram explode is scan-side codegen
    (split + transform over token index — no Python); document
    frequency shuffles once on (source, gram) with map-side partial
    aggregation; the boilerplate set is by construction the tiny
    high-df head of the Zipf curve, so the back-join of every gram
    occurrence against it is an AQE-broadcast; the per-doc rollup
    shuffles on doc_id. Production variant would join on
    ``xxhash64(gram)`` to cut shuffle bytes — kept as strings here so
    the DuckDB oracle can replay the exact pipeline. No reference
    counterpart (pot has no text ops, SURVEY.md §2-A)."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", F.split("text", " ").alias("toks"))
    grams = toks.filter(F.size("toks") >= 2).select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("gram"),
    )
    dfreq = grams.groupBy("source", "gram").agg(
        F.countDistinct("doc_id").alias("df")
    )
    srcn = docs.groupBy("source").agg(F.countDistinct("doc_id").alias("n_docs"))
    boiler = (
        dfreq.join(srcn, "source")
        .filter(F.col("df") * 5 >= F.col("n_docs"))
        .select("source", "gram", F.lit(1).alias("is_b"))
    )
    marked = grams.join(boiler, ["source", "gram"], "left")
    return (
        marked.groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.count("is_b").cast("bigint").alias("n_boiler"),
        )
        .withColumn(
            "boiler_ppm",
            F.expr("CAST(n_boiler * 1000000 DIV n_grams AS BIGINT)"),
        )
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion: merge two independent per-language document
# rankings (lexical richness, length) into one retrieval ordering —
# the standard way hybrid search combines BM25 and vector hits.
# ---------------------------------------------------------------------------


@query(
    "q_rank_fusion",
    oracle="""
    WITH scored AS (
        SELECT lang, doc_id,
               COALESCE(len(list_distinct(list_filter(
                   string_split(text, ' '), x -> x <> ''))), -1) AS lex_score,
               COALESCE(n_chars, -1) AS len_score
        FROM documents
    ),
    ranked AS (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY lex_score DESC, doc_id ASC NULLS FIRST) AS lex_rank,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY len_score DESC, doc_id ASC NULLS FIRST) AS len_rank
        FROM scored
    ),
    fused AS (
        SELECT lang, doc_id,
               CAST(lex_rank AS BIGINT) AS lex_rank,
               CAST(len_rank AS BIGINT) AS len_rank,
               1.0 / (60 + lex_rank) + 1.0 / (60 + len_rank) AS rrf_score,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY 1.0 / (60 + lex_rank) + 1.0 / (60 + len_rank) DESC,
                            doc_id ASC NULLS FIRST) AS fused_rank
        FROM ranked
    )
    SELECT lang, doc_id, lex_rank, len_rank, rrf_score,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM fused WHERE fused_rank <= 10
    """,
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (k=60): two independent per-language
    rankings — lexical richness (distinct tokens) and document length —
    fuse via 1/(k+rank) sums, keeping the top 10 per language. The two
    row_number passes and the fused top-k share the lang partitioning, so
    Spark plans ONE exchange; the fused_rank <= 10 filter becomes a
    WindowGroupLimit (rank pushdown), so at 100 TB each partition keeps a
    10-row heap instead of materializing the full sort. Scores are
    COALESCEd to -1 sentinels before ranking (NULL ordering differs
    between engines); ranks are integers, so the RRF doubles are the same
    two correctly-rounded IEEE divisions on both engines. This is the
    hybrid-retrieval merge step (BM25 + ANN) with engine-checkable
    surrogate scorers. No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        "doc_id",
        F.coalesce(
            F.size(F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))),
            F.lit(-1),
        ).alias("lex_score"),
        F.coalesce(F.col("n_chars"), F.lit(-1)).alias("len_score"),
    )
    w_lex = Window.partitionBy("lang").orderBy(F.desc("lex_score"), F.asc("doc_id"))
    w_len = Window.partitionBy("lang").orderBy(F.desc("len_score"), F.asc("doc_id"))
    ranked = scored.select(
        "lang",
        "doc_id",
        F.row_number().over(w_lex).cast("bigint").alias("lex_rank"),
        F.row_number().over(w_len).cast("bigint").alias("len_rank"),
    )
    rrf = F.lit(1.0) / (F.col("lex_rank") + 60) + F.lit(1.0) / (
        F.col("len_rank") + 60
    )
    w_fuse = Window.partitionBy("lang").orderBy(
        F.desc(rrf), F.asc("doc_id")
    )
    return (
        ranked.withColumn("rrf_score", rrf)
        .withColumn("fused_rank", F.row_number().over(w_fuse).cast("bigint"))
        .filter(F.col("fused_rank") <= 10)
        .select("lang", "doc_id", "lex_rank", "len_rank", "rrf_score", "fused_rank")
    )


# ---------------------------------------------------------------------------
# Feature hashing (the "hashing trick"): fixed-width sparse featurization
# with no vocabulary table — the streaming-friendly vectorizer.
# ---------------------------------------------------------------------------


@query(
    "q_feature_hash",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS term
        FROM documents
    ),
    bc AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 64 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           string_agg(CAST(bucket AS VARCHAR) || ':' || CAST(cnt AS VARCHAR),
                      ',' ORDER BY bucket) AS features
    FROM bc GROUP BY doc_id
    """,
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: tokens hash into 64 fixed buckets
    (md5-derived, engine-identical), per-doc bucket counts serialize as
    a sorted "bucket:count" sparse-vector string (the canonicalizer-safe
    array encoding). The whole op is vocabulary-free — no dictionary
    shuffle, no OOV growth — which is why streaming featurizers use it:
    at 100 TB the only exchange is the (doc_id, bucket) partial-agg'd
    rollup, whose width is bounded by 64 x docs regardless of corpus
    vocabulary. Collisions are the accepted tradeoff (document them, not
    the vocab). No reference counterpart (SURVEY.md §2-A)."""
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("term"),
    )
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint") % 64
    )
    bc = toks.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count("*").alias("cnt")
    )
    per_doc = bc.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.array_sort(F.collect_list(F.struct("bucket", "cnt"))).alias("arr"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.concat_ws(
            ",",
            F.transform(
                "arr",
                lambda s: F.concat_ws(
                    ":",
                    s.getField("bucket").cast("string"),
                    s.getField("cnt").cast("string"),
                ),
            ),
        ).alias("features"),
    )


# ---------------------------------------------------------------------------
# BPE encode (tokenizer APPLY): completes the tokenizer story —
# q_bpe_pair_counts / q_tokenizer_vocab are the training side, this is
# the "train small, apply at scale" encode pass.
# ---------------------------------------------------------------------------

_BPE_MERGES = 20
_BPE_TOP_WORDS = 500


def _bpe_train(word_freqs, n_merges=_BPE_MERGES):
    """Classic BPE training over a (word, freq) table: repeatedly merge
    the highest-count adjacent symbol pair (ties broken lexicographically
    so the merge list is a total, deterministic order). Pure Python on a
    BOUNDED vocabulary slice — the codebook-training pattern (q_kmeans /
    q_ann_pq): train on O(500) rows driver-side, apply corpus-wide."""
    vocab = [(tuple(w), f) for w, f in word_freqs]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        nxt = []
        for syms, f in vocab:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((tuple(out), f))
        vocab = nxt
    return merges


def _bpe_token_count(word, merges, ranks):
    """GPT-2-style encode: while any learned pair is present, merge ALL
    occurrences of the best-ranked (earliest-learned) pair left-to-right.
    Returns the resulting symbol count."""
    syms = list(word)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = merges[best]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


@query("q_bpe_encode")
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE over the corpus: train 20 merges on the top-500 words
    (a bounded, deterministic driver-side codebook — freq desc, word asc
    total order), then tokenize every document with an Arrow-batched
    mapInPandas pass and report per-doc word vs BPE-token counts (the
    fertility statistic that prices a corpus in tokens). A task-lifetime
    word memo — BOUNDED at 2^18 entries so a partition's distinct-word
    tail can never grow executor memory unboundedly — makes the encode
    cost ~O(distinct head words) under Zipf, not O(tokens). Rows-only by declared contract (iterative merge
    application is not SQL-expressible): evidence is exact-equality
    pytest coverage — hand-computed micro examples anchor the train and
    encode semantics, and a pure-pandas reference over sf0.001 must
    match the Spark output row-for-row (tests/test_sketches.py;
    ERROR_BOUNDS.json carries the measured zero-mismatch entry). No
    reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w")
    )
    top = (
        words.groupBy("w")
        .agg(F.count("*").alias("f"))
        .orderBy(F.desc("f"), F.asc("w"))
        .limit(_BPE_TOP_WORDS)
        .collect()
    )
    merges = _bpe_train([(r.w, r.f) for r in top])
    ranks = {p: i for i, p in enumerate(merges)}

    def encode(batches):
        import pandas as pd

        # word->token-count memo, shared across the task's Arrow batches
        # but BOUNDED: Zipf makes the hot head carry nearly all the hit
        # rate, so once the memo fills, misses are computed uncached
        # rather than growing executor memory with the unbounded
        # distinct-word tail of a 100 TB partition (advisor round 6)
        _CACHE_MAX = 1 << 18  # ~256k words; few tens of MB worst case
        cache = {}
        for pdf in batches:
            n_words, n_bpe = [], []
            for text in pdf["text"]:
                if text is None:
                    n_words.append(0)
                    n_bpe.append(0)
                    continue
                ws = [w for w in text.split(" ") if w]
                tot = 0
                for w in ws:
                    c = cache.get(w)
                    if c is None:
                        c = _bpe_token_count(w, merges, ranks)
                        if len(cache) < _CACHE_MAX:
                            cache[w] = c
                    tot += c
                n_words.append(len(ws))
                n_bpe.append(tot)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.Series(n_bpe, dtype="int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        encode, "doc_id bigint, n_words bigint, n_bpe_tokens bigint"
    )


# ---------------------------------------------------------------------------
# N-gram diversity audit: distinct-n ratios per source — the standard
# corpus-level self-repetition statistic (low distinct-n flags template
# farms, decode loops in synthetic data, or over-deduplicated crawls).
# ---------------------------------------------------------------------------


@query(
    "q_distinct_ngrams",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS toks
      FROM documents
    ),
    uni AS (
      SELECT source, tok FROM t, unnest(toks) AS u(tok)
    ),
    bi AS (
      SELECT doc_id, source, toks[i] || ' ' || toks[i+1] AS gram
      FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
      WHERE len(toks) >= 2
    ),
    u_roll AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS d_tokens
      FROM uni GROUP BY source
    ),
    b_roll AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(COUNT(DISTINCT gram) AS BIGINT) AS d_bigrams
      FROM bi GROUP BY source
    )
    SELECT u.source, u.n_tokens, u.d_tokens,
           CAST(u.d_tokens * 1000000 // u.n_tokens AS BIGINT)
             AS distinct1_ppm,
           COALESCE(b.n_bigrams, 0) AS n_bigrams,
           COALESCE(b.d_bigrams, 0) AS d_bigrams,
           CAST(COALESCE(b.d_bigrams * 1000000 // b.n_bigrams, 0) AS BIGINT)
             AS distinct2_ppm
    FROM u_roll u LEFT JOIN b_roll b ON u.source = b.source
    """,
)
def q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity audit per source: unique-token and
    unique-bigram ratios (exact floored ppm — integer div on both
    engines) over each source's token stream. The corpus-health twin of
    q_boilerplate_ngrams: boilerplate finds WHICH grams repeat, this
    measures HOW repetitive the stream is overall — the distinct-1/-2
    statistic used to audit synthetic corpora for decode loops and
    template farms.

    Scale posture: both rollups are (source, gram)-keyed distinct
    aggregates — Spark plans COUNT DISTINCT as the two-phase
    partial/final expand, so the shuffle carries (source, gram) pairs
    once, pre-combined map-side; sources with empty token streams keep
    a zero bigram row via the left join (COALESCE'd identically in the
    oracle). No reference counterpart (SURVEY.md §2-A)."""
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)
    t = docs.select(
        "doc_id",
        "source",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias(
            "toks"
        ),
    )
    uni = t.select("source", F.explode("toks").alias("tok"))
    bi = t.filter(F.size("toks") >= 2).select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("gram"),
    )
    u_roll = uni.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.countDistinct("tok").cast("bigint").alias("d_tokens"),
    )
    b_roll = bi.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.countDistinct("gram").cast("bigint").alias("d_bigrams"),
    )
    return (
        u_roll.join(b_roll, "source", "left")
        .select(
            "source",
            "n_tokens",
            "d_tokens",
            F.expr("CAST(d_tokens * 1000000 DIV n_tokens AS BIGINT)").alias(
                "distinct1_ppm"
            ),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("d_bigrams", F.lit(0)).cast("bigint").alias("d_bigrams"),
            F.coalesce(
                F.expr("CAST(d_bigrams * 1000000 DIV n_bigrams AS BIGINT)"),
                F.lit(0),
            ).alias("distinct2_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-growth / cross-source vocabulary audits: first-occurrence novelty,
# Heaps-law vocabulary growth, and pairwise source vocabulary overlap — the
# mixture-design statistics that decide whether adding a source buys new
# content or re-buys what the corpus already has.
# ---------------------------------------------------------------------------


@query(
    "q_ngram_novelty",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents WHERE len(list_filter(string_split(lower(text), ' '),
                                           x -> x <> '')) >= 3
    ),
    inc AS (
      SELECT DISTINCT doc_id, source,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
      FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) u
    ),
    firsts AS (
      SELECT gram, MIN(doc_id) AS first_doc FROM inc GROUP BY gram
    ),
    nf AS (
      SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_first
      FROM firsts GROUP BY first_doc
    ),
    novel AS (
      SELECT d.source, CAST(SUM(nf.n_first) AS BIGINT) AS n_novel
      FROM nf JOIN documents d USING (doc_id) GROUP BY d.source
    ),
    denom AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_doc_grams
      FROM inc GROUP BY source
    )
    SELECT de.source, de.n_doc_grams,
           COALESCE(nv.n_novel, 0) AS n_novel,
           CAST(COALESCE(nv.n_novel, 0) * 1000000 // de.n_doc_grams
                AS BIGINT) AS novelty_ppm
    FROM denom de LEFT JOIN novel nv ON de.source = nv.source
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram NOVELTY: of the distinct (doc, trigram)
    incidences a source contributes, how many are the gram's global
    FIRST occurrence (min doc_id over the corpus). Low novelty means the
    source re-buys content the corpus already holds — the curation
    complement of q_dedup_rate_by_source (which needs verbatim dups;
    this catches paraphrase-level re-crawls gram by gram).

    Scale posture: one distinct over (doc, source, gram) — the same
    shuffle as any gram-keyed rollup, map-side combined; the gram
    first-occurrence table collapses to doc-scale (first_doc, n_first)
    BEFORE touching documents again, so the only joins are a doc-keyed
    linear join and a source-typed left join. No gram-keyed join back to
    the corpus, no pair join. Docs with NULL doc_id can never be a
    "first" (MIN skips NULL on both engines) but still count in the
    denominator — identically on both engines. No reference counterpart
    (SURVEY.md §2-A)."""
    docs = load_spread(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias(
            "toks"
        ),
    ).filter(F.size("toks") >= 3)
    inc = t.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2), i -> "
                "concat_ws(' ', slice(toks, i, 3)))"
            )
        ).alias("gram"),
    ).distinct()
    firsts = inc.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    nf = (
        firsts.groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count("*").cast("bigint").alias("n_first"))
    )
    novel = (
        nf.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("n_first").cast("bigint").alias("n_novel"))
    )
    denom = inc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_doc_grams")
    )
    return denom.join(novel, "source", "left").select(
        "source",
        "n_doc_grams",
        F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        F.expr(
            "CAST(COALESCE(n_novel, 0) * 1000000 DIV n_doc_grams AS BIGINT)"
        ).alias("novelty_ppm"),
    )


# Heaps-law checkpoints: powers of two spanning the test scales and well
# past them (saturated rows past the corpus are deterministic and cheap)
_VOCAB_KS = [64, 128, 256, 512, 1024, 2048, 4096, 8192]


@query(
    "q_vocab_growth",
    oracle=f"""
    WITH ks AS (
      SELECT UNNEST([{', '.join(str(k) for k in _VOCAB_KS)}]) AS k
    ),
    tok AS (
      SELECT doc_id, tok
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '')
                     AS toks
            FROM documents) t, unnest(toks) AS u(tok)
    ),
    firsts AS (SELECT tok, MIN(doc_id) AS first_doc FROM tok GROUP BY tok),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
      FROM tok GROUP BY doc_id
    ),
    v AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_vocab
      FROM ks JOIN firsts ON firsts.first_doc < ks.k GROUP BY k
    ),
    d AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM ks JOIN per_doc ON per_doc.doc_id < ks.k GROUP BY k
    )
    SELECT CAST(ks.k AS BIGINT) AS checkpoint,
           COALESCE(d.n_docs, 0) AS n_docs,
           COALESCE(d.n_tokens, 0) AS n_tokens,
           COALESCE(v.n_vocab, 0) AS n_vocab
    FROM ks LEFT JOIN d ON d.k = ks.k LEFT JOIN v ON v.k = ks.k
    """,
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve: distinct-token count after the
    first k documents, at power-of-two checkpoints — the statistic that
    says whether a corpus is still contributing new vocabulary or has
    gone asymptotic (keep crawling vs stop). Membership in "first k" is
    doc_id < k, so the curve is deterministic and engine-exact.

    Scale posture: ONE pass builds the token first-occurrence table
    (type-scale) and the per-doc token counts (doc-scale); each then
    theta-joins the 8-row broadcast checkpoint table (a
    BroadcastNestedLoopJoin over 8 literals — constant fan-out, NOT a
    pair join) and rolls up by checkpoint. Checkpoints beyond the corpus
    saturate instead of vanishing (LEFT join + COALESCE on both
    engines). No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    ks = spark.createDataFrame(
        [(k,) for k in _VOCAB_KS], "k bigint"
    )
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("tok"),
    )
    firsts = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tok")
    )
    v = (
        firsts.join(F.broadcast(ks), firsts.first_doc < ks.k)
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n_vocab"))
    )
    d = (
        per_doc.join(F.broadcast(ks), per_doc.doc_id < ks.k)
        .groupBy("k")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )
    return (
        ks.join(d, "k", "left")
        .join(v, "k", "left")
        .select(
            F.col("k").cast("bigint").alias("checkpoint"),
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("n_vocab", F.lit(0)).cast("bigint").alias("n_vocab"),
        )
    )


@query(
    "q_vocab_overlap",
    oracle="""
    WITH st AS (
      SELECT DISTINCT source, tok
      FROM (SELECT source,
                   list_filter(string_split(lower(text), ' '), x -> x <> '')
                     AS toks
            FROM documents) t, unnest(toks) AS u(tok)
      WHERE source IS NOT NULL
    ),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM st GROUP BY source),
    common AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT c.source_a, c.source_b, x.v AS v_a, y.v AS v_b, c.n_common,
           CAST(c.n_common * 1000000 // (x.v + y.v - c.n_common)
                AS BIGINT) AS jaccard_ppm,
           CAST(c.n_common * 1000000 // LEAST(x.v, y.v)
                AS BIGINT) AS containment_ppm
    FROM common c
    JOIN sizes x ON x.source = c.source_a
    JOIN sizes y ON y.source = c.source_b
    """,
)
def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source VOCABULARY overlap: exact token-set Jaccard and
    containment (vs the smaller vocabulary) for every source pair — the
    mixture-design matrix that flags mirror feeds (containment near 10⁶)
    before they are weighted as independent sources.

    Scale posture: the token self-join is keyed on tok and bounded by
    the SOURCE CARDINALITY, not the corpus — each token type contributes
    at most C(n_sources, 2) pairs (sources are type-scale: tens, not
    millions), so candidate volume is linear in vocabulary size. The
    distinct (source, tok) stream map-side combines; sizes join back on
    the type-scale source key. NULL sources cannot pair (strict
    inequality drops them on both engines). No reference counterpart
    (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    st = (
        docs.filter(F.col("source").isNotNull())
        .select(
            "source",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("tok"),
        )
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count("*").cast("bigint").alias("v"))
    a = st.select(F.col("source").alias("source_a"), "tok")
    b = st.select(F.col("source").alias("source_b"), "tok")
    common = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"),
                                     F.col("v").alias("v_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"),
                                     F.col("v").alias("v_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "v_a",
            "v_b",
            "n_common",
            F.expr(
                "CAST(n_common * 1000000 DIV (v_a + v_b - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
            F.expr(
                "CAST(n_common * 1000000 DIV LEAST(v_a, v_b) AS BIGINT)"
            ).alias("containment_ppm"),
        )
    )


@query(
    "q_zipf_fit",
    oracle="""
    WITH freqs AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT lang,
                   list_filter(string_split(lower(text), ' '), x -> x <> '')
                     AS toks
            FROM documents) d, unnest(toks) AS u(tok)
      GROUP BY lang, tok
    ),
    ranked AS (
      SELECT lang,
             CAST(ROUND(LN(row_number() OVER (
               PARTITION BY lang ORDER BY f DESC, tok
             )), 6) AS DECIMAL(18,6)) AS x,
             CAST(ROUND(LN(f), 6) AS DECIMAL(18,6)) AS y
      FROM freqs
    ),
    s AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
      FROM ranked GROUP BY lang
    )
    SELECT lang, n AS vocab_size,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
    FROM s WHERE n >= 2
    """,
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent per language: least-squares slope of
    ln(frequency) on ln(rank) over the full vocabulary. Natural text
    sits near −1; template farms and synthetic decode loops bend the
    curve — the corpus-health twin of q_distinct_ngrams at distribution
    level. Both ln() outputs are ROUNDED to 6dp then fixed as
    DECIMAL(18,6) BEFORE any aggregation, and all four regression sums
    accumulate in exact DECIMAL(38,12) — shuffle order cannot move the
    slope; the only doubles are the final division (IEEE-exact) and its
    6dp round.

    Scale posture: one (lang, tok) rollup (map-side combined), a
    per-lang rank window over the TYPE-scale vocabulary, one per-lang
    rollup. The corpus-facing cost is the token count; everything after
    is vocabulary-sized. No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    freqs = (
        docs.select(
            "lang",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("tok"),
        )
        .groupBy("lang", "tok")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("f"), F.asc("tok"))
    ranked = freqs.select(
        "lang",
        F.round(F.log(F.row_number().over(w)), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log("f"), 6).cast("decimal(18,6)").alias("y"),
    )
    s = ranked.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("sxx"),
    )
    return s.filter(F.col("n") >= 2).select(
        "lang",
        F.col("n").alias("vocab_size"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            ),
            6,
        ).alias("zipf_slope"),
    )


@query(
    "q_heaps_fit",
    oracle=f"""
    WITH ks AS (
      SELECT UNNEST([{', '.join(str(k) for k in _VOCAB_KS)}]) AS k
    ),
    tok AS (
      SELECT doc_id, tok
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '')
                     AS toks
            FROM documents) t, unnest(toks) AS u(tok)
    ),
    firsts AS (SELECT tok, MIN(doc_id) AS first_doc FROM tok GROUP BY tok),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
      FROM tok GROUP BY doc_id
    ),
    v AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_vocab
      FROM ks JOIN firsts ON firsts.first_doc < ks.k GROUP BY k
    ),
    d AS (
      SELECT k, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM ks JOIN per_doc ON per_doc.doc_id < ks.k GROUP BY k
    ),
    pts AS (
      SELECT DISTINCT d.n_tokens, v.n_vocab
      FROM d JOIN v ON v.k = d.k
      WHERE d.n_tokens > 0 AND v.n_vocab > 0
    ),
    xy AS (
      SELECT CAST(ROUND(LN(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))
               AS x,
             CAST(ROUND(LN(CAST(n_vocab AS DOUBLE)), 6) AS DECIMAL(18,6))
               AS y
      FROM pts
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
      FROM xy
    )
    SELECT n AS n_points,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS heaps_beta,
           ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS heaps_ln_k
    FROM s WHERE n >= 2
    """,
)
def q_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V = K * N^beta over the q_vocab_growth
    checkpoints: the least-squares line of ln(vocab) on ln(tokens) —
    beta near 0.5 is natural text, beta collapsing toward 0 says the
    crawl has gone asymptotic (new data is re-paying for old
    vocabulary), beta near 1 flags id/hash-like token soup. Saturated
    checkpoints past the corpus repeat the same (N, V) point and are
    DEDUPLICATED before the fit (they would otherwise over-weight the
    tail); the intercept is reported as ln(K) — pure arithmetic on the
    decimal-fixed sums — rather than K itself, because exp() is libm
    and not engine-exact. Regression sums follow q_zipf_fit: 6dp-fixed
    DECIMAL inputs, DECIMAL(38,12) accumulation, IEEE division, 6dp
    round.

    Scale posture: q_vocab_growth's (first-occurrence table x 8-row
    broadcast checkpoint join) feeds an 8-point regression — the
    corpus-facing cost is one token pass. No reference counterpart
    (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    ks = spark.createDataFrame([(k,) for k in _VOCAB_KS], "k bigint")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("tok"),
    )
    firsts = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tok")
    )
    v = (
        firsts.join(F.broadcast(ks), firsts.first_doc < ks.k)
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n_vocab"))
    )
    d = (
        per_doc.join(F.broadcast(ks), per_doc.doc_id < ks.k)
        .groupBy("k")
        .agg(F.sum("n_tok").cast("bigint").alias("n_tokens"))
    )
    pts = (
        d.join(v, "k")
        .filter((F.col("n_tokens") > 0) & (F.col("n_vocab") > 0))
        .select("n_tokens", "n_vocab")
        .distinct()
    )
    xy = pts.select(
        F.round(F.log(F.col("n_tokens").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.col("n_vocab").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    s = xy.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("sxx"),
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    return s.filter(F.col("n") >= 2).select(
        F.col("n").alias("n_points"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / den,
            6,
        ).alias("heaps_beta"),
        F.round(
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast(
                "double"
            )
            / den,
            6,
        ).alias("heaps_ln_k"),
    )


_DRIFT_MIN_DF = 10  # min combined doc frequency before a token is scored
_DRIFT_TOPN = 20


@query(
    "q_term_drift",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, doc_id % 2 AS half, tok
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '')
                     AS toks
            FROM documents WHERE doc_id IS NOT NULL) t, unnest(toks) AS u(tok)
    ),
    df AS (
      SELECT tok,
             CAST(COUNT(CASE WHEN half = 0 THEN 1 END) AS BIGINT) AS df_even,
             CAST(COUNT(CASE WHEN half = 1 THEN 1 END) AS BIGINT) AS df_odd
      FROM dt GROUP BY tok
    )
    SELECT tok, df_even, df_odd,
           ROUND(ABS(LN((df_even + 1.0) / (df_odd + 1.0))), 6) AS drift
    FROM df
    WHERE df_even + df_odd >= {_DRIFT_MIN_DF}
    ORDER BY drift DESC, tok
    LIMIT {_DRIFT_TOPN}
    """,
)
def q_term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-frequency DRIFT movers: the {_DRIFT_TOPN} tokens whose
    document frequency shifts hardest between the even and odd doc_id
    halves (standing in for yesterday's vs today's crawl batch) —
    add-one-smoothed |log df ratio|, the token-level early warning that
    a source changed templates or a topic burst entered the feed
    (q_vocab_overlap sees set-level drift; this names the tokens).
    Tokens below {_DRIFT_MIN_DF} combined df are excluded (rare-word
    noise swamps the log ratio). The ratio is deterministic double
    arithmetic on exact integer df counts, rounded to 6dp; the top-N
    order is the total order (drift desc, tok), so the selected SET is
    engine-exact.

    Scale posture: distinct (doc, half, tok) pre-aggregation bounds the
    df rollup by doc frequency, and the top-20 is a
    TakeOrderedAndProject (per-partition heaps), never a global sort.
    No reference counterpart (SURVEY.md §2-A)."""
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)
    dt = (
        docs.filter(F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            (F.col("doc_id") % 2).alias("half"),
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("tok"),
        )
        .distinct()
    )
    df = dt.groupBy("tok").agg(
        F.count(F.when(F.col("half") == 0, 1)).cast("bigint").alias(
            "df_even"
        ),
        F.count(F.when(F.col("half") == 1, 1)).cast("bigint").alias(
            "df_odd"
        ),
    )
    return (
        df.filter(F.col("df_even") + F.col("df_odd") >= _DRIFT_MIN_DF)
        .select(
            "tok",
            "df_even",
            "df_odd",
            F.round(
                F.abs(
                    F.log(
                        (F.col("df_even") + F.lit(1.0))
                        / (F.col("df_odd") + F.lit(1.0))
                    )
                ),
                6,
            ).alias("drift"),
        )
        .orderBy(F.desc("drift"), F.asc("tok"))
        .limit(_DRIFT_TOPN)
    )


# tokenizer-budget candidates priced by q_vocab_coverage
_COVERAGE_KS = [256, 1024, 4096, 16384]


@query(
    "q_vocab_coverage",
    oracle=f"""
    WITH ks AS (
      SELECT UNNEST([{', '.join(str(k) for k in _COVERAGE_KS)}]) AS k
    ),
    vc AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT list_filter(string_split(lower(text), ' '), x -> x <> '')
              AS toks
            FROM documents) t, unnest(toks) AS u(tok)
      GROUP BY tok
    ),
    fh AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS cnt FROM vc GROUP BY f),
    cum AS (
      SELECT f, cnt,
             SUM(cnt) OVER (ORDER BY f DESC ROWS UNBOUNDED PRECEDING)
               AS cum_types,
             SUM(f * cnt) OVER (ORDER BY f DESC ROWS UNBOUNDED PRECEDING)
               AS cum_mass
      FROM fh
    ),
    tot AS (SELECT CAST(SUM(f * cnt) AS BIGINT) AS n,
                   CAST(SUM(cnt) AS BIGINT) AS v FROM fh),
    hit AS (
      SELECT ks.k,
             CAST(MIN(cum.cum_mass - (cum.cum_types - ks.k) * cum.f)
                  AS BIGINT) AS covered
      FROM ks JOIN cum
        ON cum.cum_types >= ks.k AND cum.cum_types - cum.cnt < ks.k
      GROUP BY ks.k
    )
    SELECT CAST(ks.k AS BIGINT) AS vocab_budget,
           tot.v AS vocab_size,
           CAST(COALESCE(hit.covered, tot.n, 0) AS BIGINT) AS covered_tokens,
           CAST(COALESCE(hit.covered, tot.n, 0) * 1000000 // tot.n
                AS BIGINT) AS coverage_ppm
    FROM ks CROSS JOIN tot LEFT JOIN hit ON hit.k = ks.k
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-BUDGET coverage table: what fraction of corpus token
    mass the top-k vocabulary covers at candidate budgets — the sizing
    decision every word-level tokenizer (and the BPE base-vocab choice)
    starts from: a budget whose coverage has plateaued is wasted
    embedding rows; one still climbing forces UNK/byte-fallback mass.
    The top-k token MASS is tie-invariant (tokens sharing a frequency
    are interchangeable: however the boundary tie is broken, each
    selected boundary type contributes the same f), so the exact value
    reads off the FREQUENCY histogram's descending cumulative counts:
    covered(k) = cum_mass - (cum_types - k) * f at the boundary
    frequency — the round-8 histogram technique applied to a top-k sum.

    Scale posture: one (tok) rollup with map-side combine, then a
    frequency-histogram rollup; the only window runs over DISTINCT
    frequency values (Zipf: roughly sqrt-of-token-count many — far
    smaller than the vocabulary a rank window would sort). The 4-row
    budget table broadcasts onto the boundary lookup. Budgets past the
    vocabulary saturate to full coverage instead of vanishing. No
    reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    vc = (
        docs.select(
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("tok"),
        )
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    fh = vc.groupBy("f").agg(F.count("*").cast("bigint").alias("cnt"))
    w = Window.orderBy(F.desc("f")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = fh.select(
        "f",
        "cnt",
        F.sum("cnt").over(w).alias("cum_types"),
        F.sum(F.col("f") * F.col("cnt")).over(w).alias("cum_mass"),
    )
    tot = fh.agg(
        F.sum(F.col("f") * F.col("cnt")).cast("bigint").alias("n"),
        F.sum("cnt").cast("bigint").alias("v"),
    )
    ks = spark.createDataFrame([(k,) for k in _COVERAGE_KS], "k bigint")
    # boundary lookup: the one histogram row whose cumulative type count
    # first reaches k (<=1 row per budget; k past the vocab matches none
    # and saturates to the full mass via the left join)
    hit = (
        cum.join(
            F.broadcast(ks),
            (F.col("cum_types") >= F.col("k"))
            & (F.col("cum_types") - F.col("cnt") < F.col("k")),
        )
        .groupBy("k")
        .agg(
            F.min(
                F.col("cum_mass")
                - (F.col("cum_types") - F.col("k")) * F.col("f")
            )
            .cast("bigint")
            .alias("covered")
        )
    )
    return (
        ks.crossJoin(F.broadcast(tot))
        .join(hit, "k", "left")
        .select(
            F.col("k").cast("bigint").alias("vocab_budget"),
            F.col("v").alias("vocab_size"),
            F.coalesce("covered", "n", F.lit(0))
            .cast("bigint")
            .alias("covered_tokens"),
            F.expr(
                "CAST(COALESCE(covered, n, 0) * 1000000 DIV n AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )
