"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting, corpus stats.

These run over the `documents` fixture table and are designed as pure
column expressions (JVM-side, whole-stage-codegen) — no Python in the hot
path — so they stream through a 100 TB corpus with one scan and at most
one aggregation shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load, load_spread

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_SW_SQL = "('the','a','of','and','to','in','is')"


@query(
    "q_text_stats",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (doc counts, char/token totals)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("sum_tokens"),
    )


@query(
    "q_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
                WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
                WHEN list_contains(string_split(text, ' '), 'el')  THEN 'es'
                WHEN list_contains(string_split(text, ' '), 'le')  THEN 'fr'
                ELSE 'unknown' END AS pred_lang,
           CAST(len(list_filter(string_split(text, ' '), x -> x IN {_SW_SQL}))
                AS INTEGER) AS n_stopwords
    FROM documents
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (the n-gram-profile approach
    reduced to its deterministic core so the oracle can replay it)."""
    toks = F.split("text", " ")
    pred = (
        F.when(F.array_contains(toks, "the"), "en")
        .when(F.array_contains(toks, "der"), "de")
        .when(F.array_contains(toks, "el"), "es")
        .when(F.array_contains(toks, "le"), "fr")
        .otherwise("unknown")
    )
    n_sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return load(spark, sf_dir, "documents").select(
        "doc_id", "lang", pred.alias("pred_lang"), n_sw.alias("n_stopwords")
    )


@query(
    "q_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 6)
             AS avg_token_len,
           round(CAST(len(list_filter(string_split(text, ' '), x -> x IN {_SW_SQL}))
                      AS DOUBLE) / len(string_split(text, ' ')), 6) AS stopword_ratio,
           round(least(CAST(n_chars AS DOUBLE) / 200, 1.0) * 0.5
                 + (CAST(len(list_filter(string_split(text, ' '), x -> x IN {_SW_SQL}))
                         AS DOUBLE) / len(string_split(text, ' '))) * 0.3
                 + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 30, 1.0) * 0.2,
                 6) AS quality
    FROM documents
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality score: length, stopword density, token
    count — the classic cheap pre-filter before expensive dedup/training."""
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    sw_ratio = n_sw.cast("double") / n_tokens
    quality = (
        F.least(F.col("n_chars").cast("double") / 200, F.lit(1.0)) * 0.5
        + sw_ratio * 0.3
        + F.least(n_tokens.cast("double") / 30, F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(F.col("n_chars").cast("double") / n_tokens, 6).alias("avg_token_len"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


@query(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                AS INTEGER) AS bpe_ish_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_computed
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (letters runs,
    digit runs, single punctuation)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).alias(
            "bpe_ish_tokens"
        ),
        F.length("text").alias("n_chars_computed"),
    )


@query(
    "q_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           substr(sha256(lower(text)), 1, 16) AS fp,
           substr(sha256(lower(text)), 1, 1) AS shard,
           -- NULL text must hash to NULL: DuckDB's list_prepend(7, NULL)
           -- yields [7] (reduce -> 7) where Spark's aggregate over a
           -- NULL array is NULL
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(list_reduce(list_prepend(CAST(7 AS BIGINT),
                         list_transform(string_split(text, ' '),
                         x -> CAST(ascii(x) AS BIGINT))),
                         (acc, x) -> (acc * 31 + x) % 1000000007)
                     AS BIGINT) END AS rolling_hash
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: content hash (sha256 prefix), shard key, and
    a polynomial rolling hash folded over token head-chars — all exact
    integer arithmetic, replayable in the oracle."""
    docs = load(spark, sf_dir, "documents")
    fp = F.substring(F.sha2(F.lower(F.col("text")), 256), 1, 16)
    rolling = F.aggregate(
        F.split("text", " "),
        F.lit(7).cast("bigint"),
        lambda acc, x: (acc * 31 + F.ascii(x)) % 1000000007,
    )
    return docs.select(
        "doc_id",
        fp.alias("fp"),
        F.substring(F.sha2(F.lower(F.col("text")), 256), 1, 1).alias("shard"),
        rolling.cast("bigint").alias("rolling_hash"),
    )


@query(
    "q_corpus_select",
    oracle=f"""
    WITH reps AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    scored AS (
        SELECT doc_id, lang,
               CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
                    WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
                    WHEN list_contains(string_split(text, ' '), 'el')  THEN 'es'
                    WHEN list_contains(string_split(text, ' '), 'le')  THEN 'fr'
                    ELSE 'unknown' END AS pred_lang,
               round(least(CAST(n_chars AS DOUBLE) / 200, 1.0) * 0.5
                     + (CAST(len(list_filter(string_split(text, ' '),
                                             x -> x IN {_SW_SQL}))
                             AS DOUBLE) / len(string_split(text, ' '))) * 0.3
                     + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 30,
                             1.0) * 0.2,
                     6) AS quality
        FROM documents
    )
    SELECT s.doc_id, s.lang, s.pred_lang, s.quality
    FROM scored s JOIN reps USING (doc_id)
    WHERE s.quality >= 0.55 AND s.pred_lang <> 'unknown'
    """,
)
def q_corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-set selection: exact-dup representative
    (min doc_id per content hash) ∧ quality >= 0.55 ∧ confident language
    ID — the composed pre-training filter pipeline. One scan computes all
    predicates; the dedup stage adds the single content-hash shuffle, and
    the representative probe is a semi join that AQE turns into a
    broadcast at any realistic dup rate."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    quality = F.round(
        F.least(F.col("n_chars").cast("double") / 200, F.lit(1.0)) * 0.5
        + (n_sw.cast("double") / n_tokens) * 0.3
        + F.least(n_tokens.cast("double") / 30, F.lit(1.0)) * 0.2,
        6,
    )
    pred = (
        F.when(F.array_contains(toks, "the"), "en")
        .when(F.array_contains(toks, "der"), "de")
        .when(F.array_contains(toks, "el"), "es")
        .when(F.array_contains(toks, "le"), "fr")
        .otherwise("unknown")
    )
    reps = docs.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    scored = docs.select(
        "doc_id", "lang", pred.alias("pred_lang"), quality.alias("quality")
    )
    return scored.join(reps.select("doc_id"), "doc_id", "left_semi").filter(
        (F.col("quality") >= 0.55) & (F.col("pred_lang") != "unknown")
    )


@query(
    "q_text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS norm_text,
           CAST(len(string_split(trim(regexp_replace(
                regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                ' +', ' ', 'g')), ' ')) AS INTEGER) AS norm_tokens
    FROM documents
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text normalization: lowercase, strip non-alphanumerics,
    collapse whitespace — the canonical cleaning pass before hashing /
    shingling, as pure JVM regex expressions (one scan, zero Python)."""
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(F.split(norm, " ")).alias("norm_tokens"),
    )


@query(
    "q_corpus_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
          < 6553
    """,
)
def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample: a doc is selected iff the first
    16 bits of md5(doc_id) fall under the rate threshold. Unlike
    RNG-seeded sampling this is reproducible across engines, runs and
    partitionings — the property that makes held-out splits and A/B
    slices of a 100 TB corpus auditable. Pure scan-side filter: no
    shuffle, pushes nothing but compute into the scan stage."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    # 6553 = 65536 * 10 // 100 as an integer LITERAL on both sides:
    # the old oracle's CAST(0.10*65536 AS INTEGER) ROUNDS (DuckDB) to
    # 6554 while Python int() truncates to 6553 — a one-bucket latent
    # hash divergence (~1/65536 of docs)
    return docs.filter(bucket < 65536 * 10 // 100).select(
        "doc_id", "lang", "n_chars"
    )


# tier -> keep rate in integer 16-bit buckets (65536 * pct // 100):
# float-derived thresholds truncate in Python but ROUND in a DuckDB cast,
# so the contract is integer literals on both sides
_MIX_BUCKETS = {"high": 52428, "mid": 26214, "low": 6553}


@query(
    "q_corpus_mixture",
    oracle="""
    WITH tiered AS (
        SELECT doc_id, source,
               CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5  THEN 'high'
                    WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 'mid'
                    ELSE 'low' END AS tier,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                    AS INTEGER) AS h
        FROM documents
    )
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM tiered
    WHERE h < CASE tier WHEN 'high' THEN 52428
                        WHEN 'mid' THEN 26214
                        ELSE 6553 END
    GROUP BY tier
    """,
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture sampling: each source tier keeps a different fraction
    (web-crawl 10%, curated 40%, premium 80% — the corpus-weighting step
    of training-set assembly), decided per doc by the same deterministic
    md5 bucket as q_corpus_sample so mixtures are reproducible and
    auditable. One scan, no shuffle before the tier rollup."""
    docs = load(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    tier = (
        F.when(src_num < 5, "high").when(src_num < 10, "mid").otherwise("low")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    rate = (
        F.when(tier == "high", F.lit(_MIX_BUCKETS["high"]))
        .when(tier == "mid", F.lit(_MIX_BUCKETS["mid"]))
        .otherwise(F.lit(_MIX_BUCKETS["low"]))
    )
    return (
        docs.select("doc_id", tier.alias("tier"), h.alias("h"), rate.alias("r"))
        .filter(F.col("h") < F.col("r"))
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("doc_id").alias("first_doc"),
        )
    )


_CONTAM_N = 4  # n-gram size for overlap detection
_PROBE_MOD = 101  # docs with doc_id % _PROBE_MOD == 0 form the benchmark set


@query(
    "q_contamination",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i:i+{_CONTAM_N - 1}], ' ') AS gram
        FROM toks, UNNEST(generate_series(1, len(t) - {_CONTAM_N - 1})) AS u(i)
    ),
    probe AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {_PROBE_MOD} = 0),
    cand AS (SELECT doc_id, gram FROM grams WHERE doc_id % {_PROBE_MOD} <> 0)
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(p.gram) AS BIGINT) AS n_hit,
           round(CAST(COUNT(p.gram) AS DOUBLE) / COUNT(*), 6) AS contamination
    FROM cand c LEFT JOIN probe p ON c.gram = p.gram
    GROUP BY c.doc_id
    HAVING COUNT(p.gram) > 0
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing word
    n-grams (n = _CONTAM_N) with a held-out probe set (here: every doc
    whose id is divisible by _PROBE_MOD, standing in for a benchmark). Per
    candidate doc: distinct-gram count, grams hit in the probe set, and
    the contamination ratio — the n-gram-overlap filter every serious
    pretraining pipeline runs before training. At scale the probe-set
    gram inventory is tiny relative to the corpus (an eval suite, not
    another corpus), so it broadcasts; the candidate side needs exactly
    one shuffle (the per-doc rollup)."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = F.when(
        F.size(toks) >= _CONTAM_N,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (_CONTAM_N - 1)),
            lambda i: F.array_join(F.slice(toks, i, _CONTAM_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )
    probe = (
        g.filter(F.col("doc_id") % _PROBE_MOD == 0).select("gram").distinct()
    )
    cand = g.filter(F.col("doc_id") % _PROBE_MOD != 0)
    return (
        cand.join(F.broadcast(probe.withColumn("hit", F.lit(1))), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").alias("n_hit"),
            F.round(F.count("hit").cast("double") / F.count("*"), 6).alias(
                "contamination"
            ),
        )
        .filter(F.col("n_hit") > 0)
    )


@query(
    "q_unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, t
        FROM documents,
             unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS u(t)
    ),
    vocab AS (
        SELECT t, CAST(COUNT(*) AS DOUBLE) AS n FROM toks GROUP BY t
    ),
    tot AS (SELECT SUM(n) AS big_n FROM vocab),
    doc_tok AS (
        SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS m
        FROM toks GROUP BY doc_id, t
    )
    SELECT d.doc_id,
           CAST(SUM(m) AS BIGINT) AS n_tokens,
           ROUND(LN((SELECT big_n FROM tot))
                 - SUM(CAST(m * LN(v.n) AS DECIMAL(28,12))) / SUM(m), 6)
               AS avg_neg_logprob
    FROM doc_tok d JOIN vocab v ON v.t = d.t
    GROUP BY d.doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical language-model quality score: train a unigram LM on
    the corpus itself (token -> corpus frequency), then score each doc
    by its average negative log-probability — the classic cheap
    perplexity proxy for filtering gibberish/outlier documents before
    LLM training. avg(-ln(n_t/N)) is computed in the shuffle-stable
    form ln(N) - sum(m*ln(n))/sum(m) over per-(doc,token) counts, so
    partial-sum order cannot move the rounded result. Two shuffles
    (vocab by token, doc rollup by doc_id); the token-keyed join is
    Zipf-skewed at scale, which AQE's skew-join split absorbs — and the
    per-(doc,token) pre-aggregation bounds any single key's rows by the
    doc count, not the corpus token count.

    One corpus pass: the per-(doc,token) aggregate is the single base
    relation — vocab is its exact re-aggregation (sum of per-doc counts
    == corpus count, integers under 2^53 in doubles) and the total
    derives from vocab, so ReuseExchange collapses what used to be
    three scan+explode passes into one (measured r13, guide §2.4)."""
    docs = load_spread(spark, sf_dir, "documents")
    # the explicit not-null filter is a no-op (explode of split never
    # yields nulls) but makes every branch's pushed-filter set identical
    # — without it the join branches carry an INFERRED isnotnull(t) the
    # broadcast-total branch lacks, which breaks the canonical plan
    # equality that exchange/stage reuse needs (measured r13)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("t"),
    ).where(F.col("t").isNotNull())
    doc_tok = toks.groupBy("doc_id", "t").agg(
        F.count("*").cast("double").alias("m")
    )
    vocab = doc_tok.groupBy("t").agg(F.sum("m").alias("n"))
    tot = vocab.agg(F.sum("n").alias("big_n"))
    return (
        doc_tok.join(vocab, "t")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("bigint").alias("n_tokens"),
            F.sum((F.col("m") * F.log("n")).cast("decimal(28,12)")).alias(
                "_sum_mln"
            ),
            F.sum("m").alias("_sum_m"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.log("big_n") - F.col("_sum_mln") / F.col("_sum_m"), 6
            ).alias("avg_neg_logprob"),
        )
    )


@query(
    "q_seq_pack",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS BIGINT) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                   AS cum
        FROM toks
    )
    SELECT doc_id, n_tok,
           CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS win_id,
           CAST((cum - n_tok) - CAST(floor((cum - n_tok) / 2048.0) AS BIGINT)
               * 2048 AS BIGINT) AS win_offset,
           CAST(floor((cum - 1) / 2048.0) AS BIGINT)
               - CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) + 1
               AS n_windows
    FROM c WHERE n_tok > 0
    """,
)
def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing (GPT-style concatenate-and-chunk
    training prep): documents are laid end-to-end in doc_id order and
    cut into 2048-token windows; each doc reports its window id, offset
    in the window, and how many windows it spans. The global running
    token count is NOT a single-partition window at scale — it's the
    distributed prefix-sum pattern: an in-shard cumulative sum
    (window partitioned by doc_id shard) plus broadcast per-shard base
    offsets (a cumulative sum over the tiny shard-totals table), so no
    executor ever sees more than one shard's rows. The oracle computes
    the same cumsum with one global window, which a single DuckDB node
    can afford at test scale. All outputs are integers — exact hash."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).cast("bigint").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    sharded = toks.withColumn("shard", F.floor(F.col("doc_id") / 1024))
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_shard = sharded.withColumn("cum_in", F.sum("n_tok").over(w_in))
    # per-shard totals are O(shards) rows — small, but shard count GROWS
    # with the corpus (n_docs/1024), so (a) no broadcast hint: AQE
    # broadcasts while the offsets fit and falls back to a shard-keyed
    # shuffle otherwise, and (b) the prefix sum over the shard totals is
    # ITSELF two-level (supershard = 1024 shards): the in-supershard
    # prefix is a partitioned window, and the only unpartitioned window
    # left runs over O(n_docs/1024^2) supershard rows (~10 rows at 10^10
    # docs) — no task ever sorts a relation that grows linearly
    shard_tots = sharded.groupBy("shard").agg(
        F.sum("n_tok").alias("shard_tot")
    ).withColumn("sup", F.floor(F.col("shard") / 1024))
    w_sh = (
        Window.partitionBy("sup")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shard_tots = shard_tots.withColumn(
        "cum_in_sup", F.sum("shard_tot").over(w_sh)
    )
    w_sup = Window.orderBy("sup").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sup_bases = (
        shard_tots.groupBy("sup")
        .agg(F.sum("shard_tot").alias("sup_tot"))
        .select(
            "sup",
            (F.sum("sup_tot").over(w_sup) - F.col("sup_tot")).alias("sup_base"),
        )
    )
    offsets = shard_tots.join(sup_bases, "sup").select(
        "shard",
        (F.col("sup_base") + F.col("cum_in_sup") - F.col("shard_tot")).alias("base"),
    )
    cum = (
        in_shard.join(offsets, "shard")
        .withColumn("cum", F.col("base") + F.col("cum_in"))
    )
    start = F.col("cum") - F.col("n_tok")
    win_id = F.floor(start / 2048.0).cast("bigint")
    last_win = F.floor((F.col("cum") - 1) / 2048.0).cast("bigint")
    return cum.select(
        "doc_id",
        "n_tok",
        win_id.alias("win_id"),
        (start - win_id * 2048).alias("win_offset"),
        (last_win - win_id + 1).alias("n_windows"),
    )


@query(
    "q_group_cap_sample",
    oracle="""
    WITH ranked AS (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id
               ) AS rn
        FROM documents
    )
    SELECT lang,
           CAST(SUM(CASE WHEN rn <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           -- COALESCE: a lang whose <=50 kept docs ALL have NULL
           -- n_chars sums to NULL here but 0 on the Spark side
           -- (round-8 advice) — both engines must report 0
           CAST(COALESCE(SUM(CASE WHEN rn <= 50 THEN n_chars ELSE 0 END), 0)
                AS BIGINT) AS kept_chars,
           CAST(SUM(CASE WHEN rn <= 50 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
    FROM ranked
    GROUP BY lang
    """,
)
def q_group_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source capped sampling: every lang contributes at most 50
    docs, chosen by a deterministic md5 shuffle order (reproducible
    across runs/engines — no RNG). This is the "cap the over-represented
    source" step of corpus mixture building: kept_chars depends on WHICH
    50 docs the hash order selects, so the oracle verifies the selection
    itself, not just counts.

    Scale posture (r8): the rank filter `rn <= 50` sits DIRECTLY on the
    window so Catalyst inserts a WindowGroupLimit — every partition
    keeps at most 50 rows per language BEFORE the exchange, and the
    reducer-side sort handles 50 x partitions rows, not the language's
    documents (the previous form aggregated over the full ranked
    relation, which blocked the group-limit pushdown and sort-bounded
    on a skewed lang — the r7 weak pattern). The drop count comes from
    a separate map-side-combined total, joined on the type-scale lang
    relation.

    No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cap"))),
        "doc_id",
    )
    kept = (
        docs.select(
            "lang", "n_chars", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 50)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            # all-NULL kept n_chars must still report 0 (the previous
            # conditional-sum form summed explicit 0s for dropped rows)
            F.coalesce(F.sum("n_chars"), F.lit(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
    )
    totals = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_total")
    )
    return (
        totals.alias("t")
        .join(
            kept.alias("kp"),
            F.col("t.lang").eqNullSafe(F.col("kp.lang")),
            "left",
        )
        .select(
            F.col("t.lang").alias("lang"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0))
            .cast("bigint")
            .alias("kept_chars"),
            (F.col("n_total") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )


@query(
    "q_train_split",
    oracle="""
    WITH assigned AS (
        SELECT lang, n_chars,
               CASE
                 WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                               || ':split'), 1, 8)) AS BIGINT)
                      % 100 < 80 THEN 'train'
                 WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                               || ':split'), 1, 8)) AS BIGINT)
                      % 100 < 90 THEN 'val'
                 ELSE 'test'
               END AS split
        FROM documents
    )
    SELECT lang, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM assigned GROUP BY lang, split
    """,
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split, reported per
    language: the split is a pure function of doc_id (salted md5 lane
    mod 100), so it is reproducible on any engine, stable under
    re-partitioning, and membership is computable at scan time with no
    shuffle — the only exchange is the reporting rollup. The per-lang
    breakdown is the stratification audit: skewed per-language splits
    are how eval sets silently go out-of-distribution.

    No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    lane = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    split = (
        F.when(lane % 100 < 80, "train")
        .when(lane % 100 < 90, "val")
        .otherwise("test")
    )
    return (
        docs.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )


@query(
    "q_pii_scrub",
    oracle="""
    WITH seeded AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 10 = 0
                    THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com or +1-555-'
                         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE text END AS text
        FROM documents
    ),
    scrubbed AS (
        SELECT doc_id, lang,
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean,
               text
        FROM seeded
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(contains(text, '@example.com') AS INTEGER)) AS BIGINT)
             AS n_had_email,
           CAST(SUM(len(text) - len(clean)) AS BIGINT) AS chars_redacted,
           CAST(SUM(CAST(contains(clean, '<EMAIL>') AS INTEGER)) AS BIGINT)
             AS n_email_redacted,
           CAST(SUM(CAST(contains(clean, '<PHONE>') AS INTEGER)) AS BIGINT)
             AS n_phone_redacted
    FROM scrubbed GROUP BY lang
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex-redact email addresses and phone numbers from
    document text, reporting per-lang redaction counts and the char
    delta. The fixture corpus is synthetic, so deterministic PII is
    seeded into every 10th doc first — the scrub then has real work whose
    effect both engines must agree on byte-for-byte. Regex patterns are
    restricted to the RE2 ∩ Java-regex common subset (character classes,
    bounded repetition — no backrefs/lookahead), which is the portability
    contract any cross-engine scrubber must hold. Pure scan-side
    regexp_replace in whole-stage codegen; one rollup shuffle.

    No reference counterpart (SURVEY.md §2-A)."""
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)
    seeded = docs.select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+1-[0-9]{3}-[0-9]{4}"
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
        phone_re,
        "<PHONE>",
    )
    scrubbed = seeded.select(
        "lang",
        "text",
        clean.alias("clean"),
    )
    return scrubbed.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.contains(F.col("text"), F.lit("@example.com")).cast("int"))
        .cast("bigint")
        .alias("n_had_email"),
        F.sum(F.length("text") - F.length("clean"))
        .cast("bigint")
        .alias("chars_redacted"),
        F.sum(F.contains(F.col("clean"), F.lit("<EMAIL>")).cast("int"))
        .cast("bigint")
        .alias("n_email_redacted"),
        F.sum(F.contains(F.col("clean"), F.lit("<PHONE>")).cast("int"))
        .cast("bigint")
        .alias("n_phone_redacted"),
    )


# ---------------------------------------------------------------------------
# Weight-proportional sampling: inclusion probability follows document
# length, so the sample's token budget tracks long docs without an RNG.
# ---------------------------------------------------------------------------


@query(
    "q_weighted_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
          < LEAST(65536, CAST(n_chars AS INTEGER) * 32)
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sample: doc i is kept with probability
    min(1, n_chars_i / 2048) — longer documents (more training tokens)
    are proportionally more likely to survive, the sampling shape used
    when a token budget, not a document budget, defines the subset.
    The coin is the first 16 bits of md5(doc_id) compared against the
    integer threshold n_chars * 32 (= p * 65536 exactly, since
    65536/2048 = 32): pure integer arithmetic, so the same docs are
    selected by any engine, any run, any partitioning — reproducibility
    that rand()-based sampling cannot give. Pure scan-side filter, zero
    shuffle; at 100 TB this runs at full scan speed."""
    docs = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    thresh = F.least(F.lit(65536), F.col("n_chars").cast("int") * 32)
    return docs.filter(h < thresh).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------------------
# RAG-style chunking: fixed-size overlapping token windows per document.
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


@query(
    "q_doc_chunk",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    )
    SELECT doc_id,
           CAST(s / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(s AS BIGINT) AS start_tok,
           CAST(LEAST({_CHUNK_SIZE}, n - s) AS BIGINT) AS chunk_len,
           toks[s + 1] AS first_token,
           toks[s + LEAST({_CHUNK_SIZE}, n - s)] AS last_token
    FROM t, unnest(generate_series(0, n - 1, {_CHUNK_STRIDE})) AS u(s)
    """,
)
def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-style chunker: each document becomes overlapping
    32-token windows at stride 24 (8-token
    overlap), emitting (chunk_idx, start_tok, chunk_len, first/last
    token) per chunk — the shape an embedding/RAG indexing stage
    consumes. Row-expanding but narrow: one explode over a generated
    start-position sequence, no shuffle at all (the chunk table inherits
    the scan's partitioning), so a 100 TB corpus chunks at scan speed
    and downstream embedding stages repartition as they see fit."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n = F.size("toks")
    chunks = docs.select(
        "doc_id",
        "toks",
        n.alias("n"),
        F.explode(
            F.sequence(F.lit(0), n - 1, F.lit(_CHUNK_STRIDE))
        ).alias("s"),
    )
    chunk_len = F.least(F.lit(_CHUNK_SIZE), F.col("n") - F.col("s"))
    return chunks.select(
        "doc_id",
        (F.col("s") / _CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.col("s").cast("bigint").alias("start_tok"),
        chunk_len.cast("bigint").alias("chunk_len"),
        F.element_at("toks", F.col("s") + 1).alias("first_token"),
        F.element_at("toks", F.col("s") + chunk_len).alias("last_token"),
    )


# ---------------------------------------------------------------------------
# Temperature-flattened mixture sampling: alpha=0.5 source re-weighting,
# the multinomial mixture shape multilingual/multi-source LLM training uses.
# ---------------------------------------------------------------------------


@query(
    "q_temperature_mixture",
    oracle="""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    ),
    lo AS (SELECT MIN(n_docs) AS n_min FROM counts),
    rates AS (
        SELECT source, n_docs,
               CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_docs) * 65536)
                    AS BIGINT) AS thresh
        FROM counts, lo
    )
    SELECT d.source,
           MAX(r.n_docs) AS n_docs,
           CAST(COUNT(CASE WHEN
                CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
                     AS INTEGER) < r.thresh THEN 1 END) AS BIGINT) AS n_kept,
           MAX(r.thresh) AS thresh
    FROM documents d JOIN rates r ON d.source = r.source
    GROUP BY d.source
    """,
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture (alpha = 0.5): per-source
    keep rate sqrt(n_min / n_s), so sampled counts grow as sqrt(n_s) —
    big sources are damped, small sources survive whole, the standard
    fix for web-crawl domination of multilingual training mixes. The
    per-doc coin is the integer md5 bucket against floor(rate * 65536);
    sqrt and one double division are both correctly-rounded IEEE ops,
    so the threshold — and therefore the exact selected set — is
    identical on any engine.

    Scale posture: pass 1 is one partial-agg'd rollup to source counts
    (tiny); the rates relation broadcasts back onto the scan, and
    selection + audit is one more rollup. The 100 TB corpus is read
    twice but shuffled only as per-source partial aggregates."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    lo = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(lo)).select(
        "source",
        "n_docs",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_docs")) * 65536
        )
        .cast("bigint")
        .alias("thresh"),
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.count(F.when(h < F.col("thresh"), 1)).alias("n_kept"),
            F.max("thresh").alias("thresh"),
        )
    )


# ---------------------------------------------------------------------------
# Interpolated bigram language model: the next step up from the unigram
# perplexity proxy — context-sensitive fluency scoring.
# ---------------------------------------------------------------------------


@query(
    "q_bigram_lm",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                   x -> x <> '') AS ts
        FROM documents
    ),
    bi AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
    ),
    uni AS (
        SELECT t, CAST(COUNT(*) AS DOUBLE) AS n
        FROM toks, unnest(ts) AS v(t) GROUP BY t
    ),
    tot AS (SELECT SUM(n) AS big_n FROM uni),
    cb AS (
        SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c FROM bi GROUP BY w1, w2
    ),
    doc_bi AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS DOUBLE) AS m
        FROM bi GROUP BY doc_id, w1, w2
    )
    SELECT d.doc_id,
           CAST(SUM(m) AS BIGINT) AS n_bigrams,
           ROUND(-SUM(CAST(m * LN(0.75 * cb.c / u1.n
                                  + 0.25 * u2.n / (SELECT big_n FROM tot))
                           AS DECIMAL(28,12)))
                 / SUM(m), 6) AS avg_neg_logprob
    FROM doc_bi d
    JOIN cb ON cb.w1 = d.w1 AND cb.w2 = d.w2
    JOIN uni u1 ON u1.t = d.w1
    JOIN uni u2 ON u2.t = d.w2
    GROUP BY d.doc_id
    """,
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM score: p(w2|w1) = 0.75·c(w1,w2)/c(w1) +
    0.25·c(w2)/N, per-doc average negative log-probability — the
    context-sensitive fluency filter that catches shuffled-word salad a
    unigram model scores as fluent. Shuffle-stability: each m·ln(p) term
    is cast to DECIMAL(28,12) BEFORE the sum, so the aggregate is exact
    and order-independent (a raw double sum varies with partition merge
    order, and round(...,6) cannot repair a boundary straddle); the ln
    itself is bit-identical across engines (one libm on this host), and
    the term-level cast is deterministic given identical doubles.

    Scale posture: the bigram model table is type-scale (Zipf-bounded),
    not token-scale; the three model joins are keyed on bigram/token
    types — Zipf-hot keys are bounded per doc by pre-aggregation and
    AQE's skew split absorbs the rest. One extra shuffle vs the unigram
    scorer buys conditional context."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("ts"),
    )
    # guard the position sequence: sequence(1, n-1) with n < 2 COUNTS
    # DOWN (Spark auto-steps -1 when start > stop) and element_at then
    # indexes 0/-1 into an empty array — a single empty or one-token
    # document would abort the whole job. Docs with no bigram emit
    # nothing, which is also what the oracle's position join produces.
    bi = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.when(
                    F.size("ts") >= 2, F.sequence(F.lit(1), F.size("ts") - 1)
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.struct(
                    F.element_at("ts", i).alias("w1"),
                    F.element_at("ts", i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2").where(
        # no-op filter (element_at within bounds never yields null here):
        # equalizes every branch's pushed-filter set so exchange reuse
        # fires (see q_unigram_logprob)
        F.col("w1").isNotNull() & F.col("w2").isNotNull()
    )
    uni = (
        toks.select(F.explode("ts").alias("t"))
        .where(F.col("t").isNotNull())
        .groupBy("t")
        .agg(F.count("*").cast("double").alias("n"))
    )
    tot = uni.agg(F.sum("n").alias("big_n"))
    # cb is doc_bi's exact re-aggregation (sum of per-doc bigram counts
    # == corpus count), so ReuseExchange collapses the bigram-side
    # scan+explode subtrees into one; only the unigram stream needs its
    # own pass (unigram counts are not derivable from bigrams — the last
    # token of every doc is absent from the w1 stream). 5 scans → 2
    # (measured r13, guide §2.4).
    doc_bi = bi.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("double").alias("m")
    )
    cb = doc_bi.groupBy("w1", "w2").agg(F.sum("m").alias("c"))
    u1 = uni.select(F.col("t").alias("w1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("t").alias("w2"), F.col("n").alias("n2"))
    scored = (
        doc_bi.join(cb, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
    )
    p = 0.75 * F.col("c") / F.col("n1") + 0.25 * F.col("n2") / F.col("big_n")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            F.round(
                -F.sum((F.col("m") * F.log(p)).cast("decimal(28,12)"))
                / F.sum("m"),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle: the global order randomization a training
# run needs, without an RNG — reproducible on any engine or rerun.
# ---------------------------------------------------------------------------


@query(
    "q_corpus_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR) || ':shuffle') AS skey,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuffle'),
                                    1, 2)) AS INTEGER) AS bucket
        FROM documents
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(skey) AS first_key,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc
    FROM keyed GROUP BY bucket
    """,
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order: every doc gets a
    salted-md5 sort key, and range-partitioning on that key IS the
    shuffled order — reproducible across engines, reruns and
    partitionings, unlike rand()-seeded orderings that change with the
    task layout. The audit groups by the key's first byte (256 buckets)
    and reports per-bucket counts — uniform by construction, which is
    what makes downstream range partitioning balanced. Scale posture:
    the key is scan-side compute; the audit is one rollup; the actual
    shuffled write is repartitionByRange(skey) + sortWithinPartitions —
    a single range exchange over sampled bounds."""
    docs = load(spark, sf_dir, "documents")
    skey = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle")))
    keyed = docs.select(
        "doc_id",
        skey.alias("skey"),
        F.conv(F.substring(skey, 1, 2), 16, 10).cast("int").alias("bucket"),
    )
    return keyed.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("skey").alias("first_key"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
    )


@query(
    "q_corpus_drift",
    oracle="""
    WITH s AS (
      SELECT lang,
             CAST(COUNT(*) FILTER (WHERE doc_id % 2 = 0) AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (WHERE doc_id % 2 = 1) AS BIGINT) AS n_b
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(n_a) AS t_a, SUM(n_b) AS t_b FROM s)
    SELECT lang, n_a, n_b,
           CAST(n_a * 1000000 // t_a AS BIGINT) AS rate_a_ppm,
           CAST(n_b * 1000000 // t_b AS BIGINT) AS rate_b_ppm,
           CAST(abs(n_a * 1000000 // t_a - n_b * 1000000 // t_b) AS BIGINT)
             AS drift_ppm
    FROM s, tot
    """,
)
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition drift monitor: the per-language rate of two
    corpus slices (here the doc_id parity split standing in for
    yesterday's vs today's crawl) side by side with the per-language
    total-variation contribution, all in exact floored-ppm integers —
    no KL/log terms, so nothing is libm-dependent and the alert
    threshold (`drift_ppm`) is engine- and partitioning-exact. Summing
    drift_ppm/2 over languages gives total TV distance; the per-language
    rows are what a pipeline alert actually pages on ("zh share fell
    3%").

    Plan shape: ONE scan with conditional partial aggregation (both
    slice counts come out of the same groupBy — no second pass, no
    self-join), then a 1-row totals aggregate cross-joined back onto
    the language-sized relation; Spark broadcasts the single-row side
    into the codegen'd projection. Languages are bounded (thousands),
    so every post-scan relation is KB-sized at any corpus scale."""
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count(F.when(F.col("doc_id") % 2 == 0, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("doc_id") % 2 == 1, 1)).cast("bigint").alias("n_b"),
    )
    tot = s.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .withColumn("rate_a_ppm", F.expr("CAST(n_a * 1000000 DIV t_a AS BIGINT)"))
        .withColumn("rate_b_ppm", F.expr("CAST(n_b * 1000000 DIV t_b AS BIGINT)"))
        .withColumn(
            "drift_ppm", F.expr("CAST(abs(rate_a_ppm - rate_b_ppm) AS BIGINT)")
        )
        .select(
            "lang", "n_a", "n_b", "rate_a_ppm", "rate_b_ppm", "drift_ppm"
        )
    )


@query(
    "q_quality_gate_report",
    oracle="""
    WITH g AS (
        SELECT source,
               n_chars BETWEEN 200 AND 20000 AS len_ok,
               len(list_filter(string_split(text, ' '), x -> x <> '')) >= 30
                   AS tok_ok,
               CASE WHEN length(text) > 0
                    THEN CAST(length(text) - length(translate(text,
                         'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ ', ''))
                              AS DOUBLE) / length(text) >= 0.6
                    ELSE FALSE END AS alpha_ok
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (len_ok) AS BIGINT) AS n_len_ok,
           CAST(COUNT(*) FILTER (tok_ok) AS BIGINT) AS n_tok_ok,
           CAST(COUNT(*) FILTER (alpha_ok) AS BIGINT) AS n_alpha_ok,
           CAST(COUNT(*) FILTER (len_ok AND tok_ok AND alpha_ok) AS BIGINT)
               AS n_pass_all,
           CAST(COUNT(*) FILTER (len_ok AND tok_ok AND alpha_ok)
                * 1000000 // COUNT(*) AS BIGINT) AS pass_ppm
    FROM g GROUP BY source
    """,
)
def q_quality_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate funnel report: per source, how many docs clear each
    ingest gate (length band, minimum token count, alphabetic ratio) and
    the conjunctive pass rate in ppm — the monitoring surface a corpus
    pipeline emits per feed per day (a source whose pass_ppm drops is a
    broken extractor, caught before it poisons a training mix). All
    three gates are scan-side JVM expressions; the only exchange is the
    source rollup with map-side partials, so the report is one pass over
    the corpus at any scale. Gate semantics on degraded rows: null text
    fails every gate on both engines (null/size(-1) comparisons are
    never TRUE); zero-length text fails alpha_ok explicitly rather than
    dividing by zero. No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    len_ok = F.col("n_chars").between(200, 20000)
    tok_ok = F.size(F.filter(F.split("text", " "), lambda x: x != "")) >= 30
    # translate-based count (keep = alpha + space): ~8x cheaper than the
    # equivalent regexp_replace on the scan hot path (measured 1.7s vs
    # 0.2s warm over the 10x fixture) — this gate runs on every byte of
    # a 100 TB corpus
    _alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ "
    alpha_ok = F.when(
        F.length("text") > 0,
        (F.length("text") - F.length(F.translate("text", _alpha, "")))
        .cast("double")
        / F.length("text")
        >= 0.6,
    ).otherwise(F.lit(False))
    g = docs.select(
        "source",
        len_ok.alias("len_ok"),
        tok_ok.alias("tok_ok"),
        alpha_ok.alias("alpha_ok"),
    )
    return g.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count(F.when(F.col("len_ok"), 1)).cast("bigint").alias("n_len_ok"),
        F.count(F.when(F.col("tok_ok"), 1)).cast("bigint").alias("n_tok_ok"),
        F.count(F.when(F.col("alpha_ok"), 1)).cast("bigint").alias("n_alpha_ok"),
        F.count(
            F.when(F.col("len_ok") & F.col("tok_ok") & F.col("alpha_ok"), 1)
        )
        .cast("bigint")
        .alias("n_pass_all"),
        F.expr(
            "CAST(count(CASE WHEN len_ok AND tok_ok AND alpha_ok THEN 1 END)"
            " * 1000000 DIV count(*) AS BIGINT)"
        ).alias("pass_ppm"),
    )


# ---------------------------------------------------------------------------
# Perplexity filter: the CCNet-style quality gate — score every document
# with the corpus-trained unigram LM, keep the least-perplexing three
# quarters per language.
# ---------------------------------------------------------------------------


@query(
    "q_perplexity_filter",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, t
        FROM documents,
             unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS u(t)
    ),
    vocab AS (
        SELECT t, CAST(COUNT(*) AS DOUBLE) AS n FROM toks GROUP BY t
    ),
    tot AS (SELECT SUM(n) AS big_n FROM vocab),
    doc_tok AS (
        SELECT doc_id, lang, t, CAST(COUNT(*) AS DOUBLE) AS m
        FROM toks GROUP BY doc_id, lang, t
    ),
    scored AS (
        SELECT d.doc_id, d.lang,
               ROUND(LN((SELECT big_n FROM tot))
                     - SUM(CAST(m * LN(v.n) AS DECIMAL(28,12))) / SUM(m), 6)
                   AS score
        FROM doc_tok d JOIN vocab v ON v.t = d.t
        GROUP BY d.doc_id, d.lang
    ),
    hist AS (
        SELECT lang, score, CAST(COUNT(*) AS BIGINT) AS c
        FROM scored GROUP BY lang, score
    ),
    cum AS (
        SELECT lang, score, c,
               SUM(c) OVER (PARTITION BY lang ORDER BY score) AS cum_c,
               SUM(c) OVER (PARTITION BY lang) AS n_docs
        FROM hist
    )
    SELECT lang,
           CAST(MIN(n_docs) AS BIGINT) AS n_docs,
           CAST(MIN(cum_c) AS BIGINT) AS n_kept,
           MIN(score) AS cutoff_score
    FROM cum
    WHERE cum_c >= CAST(FLOOR((3 * n_docs + 3) / 4.0) AS BIGINT)
    GROUP BY lang
    """,
)
def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity quality gate (CCNet-style): score each document with
    the corpus-trained unigram LM (the exact q_unigram_logprob
    formula), then keep the least-perplexing ~75% per language —
    reported as a per-lang audit (docs scored, docs kept, realized
    cutoff score). The cutoff is the smallest ROUNDED score whose
    cumulative count reaches ceil(3n/4), ties included — a
    deterministic order statistic with no interpolation, so the kept
    set is engine-exact (scores are the hash-verified rounded decimals;
    ceil is the integer form floor((3n+3)/4), never float-ceil which
    overshoots on exact multiples; /4.0 is a power-of-two division,
    exact in binary floating point).

    Scale posture: the cumulative window runs over the (lang, rounded
    score) HISTOGRAM — type-scale, not doc-scale — so there is no
    per-lang global sort of the corpus; the doc-scale work is the same
    two shuffles as q_unigram_logprob (Zipf token join absorbed by
    pre-aggregation + AQE skew split).

    No reference counterpart (SURVEY.md §2-A): reference has no
    document pipeline at all."""
    docs = load_spread(spark, sf_dir, "documents")
    # not-null filter: no-op that equalizes the branches' pushed-filter
    # sets so exchange reuse fires (see q_unigram_logprob)
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("t"),
    ).where(F.col("t").isNotNull())
    # One corpus pass (guide §2.4): the per-(doc,token) aggregate is the
    # base relation; vocab/total are its exact re-aggregations (integer
    # counts in doubles), so ReuseExchange collapses the 3 scan+explode
    # subtrees into one (measured r13).
    doc_tok = toks.groupBy("doc_id", "lang", "t").agg(
        F.count("*").cast("double").alias("m")
    )
    vocab = doc_tok.groupBy("t").agg(F.sum("m").alias("n"))
    tot = vocab.agg(F.sum("n").alias("big_n"))
    scored = (
        doc_tok.join(vocab, "t")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum((F.col("m") * F.log("n")).cast("decimal(28,12)")).alias(
                "_sum_mln"
            ),
            F.sum("m").alias("_sum_m"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            F.round(
                F.log("big_n") - F.col("_sum_mln") / F.col("_sum_m"), 6
            ).alias("score"),
        )
    )
    hist = scored.groupBy("lang", "score").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "score",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("n_docs"),
    )
    target = F.floor((3 * F.col("n_docs") + 3) / F.lit(4.0)).cast("bigint")
    return (
        cum.filter(F.col("cum_c") >= target)
        .groupBy("lang")
        .agg(
            F.min("n_docs").cast("bigint").alias("n_docs"),
            F.min("cum_c").cast("bigint").alias("n_kept"),
            F.min("score").alias("cutoff_score"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style data selection: importance resampling toward a target
# domain (Xie et al. 2023, "Data Selection for Language Models via
# Importance Resampling"). Train unigram feature distributions on the
# target slice and on the raw corpus, score every raw document by its
# log importance weight, keep the top-scoring docs. No reference
# counterpart (SURVEY.md §2-A).
# ---------------------------------------------------------------------------

_DSIR_TARGET = "src0"
_DSIR_TOPN = 25


@query(
    "q_dsir_select",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, tok
        FROM documents,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS u(tok)
    ),
    vocab AS (SELECT tok, COUNT(*) AS tf_r FROM toks GROUP BY tok),
    tgt AS (
        SELECT tok, COUNT(*) AS tf_t FROM toks
        WHERE source = '{_DSIR_TARGET}' GROUP BY tok
    ),
    tot AS (SELECT (SELECT COUNT(*) FROM toks) AS r_total,
                   (SELECT COUNT(*) FROM toks
                    WHERE source = '{_DSIR_TARGET}') AS t_total,
                   (SELECT COUNT(*) FROM vocab) AS v),
    lam AS (
        SELECT v.tok,
               CAST(ln(COALESCE(t.tf_t, 0) + 1.0) - ln(v.tf_r + 1.0)
                    AS DECIMAL(14,12)) AS lam
        FROM vocab v LEFT JOIN tgt t ON t.tok = v.tok
    ),
    doc_tok AS (
        SELECT doc_id, any_value(source) AS source, tok, COUNT(*) AS m
        FROM toks GROUP BY doc_id, tok
    ),
    w AS (
        SELECT dt.doc_id, any_value(dt.source) AS source,
               CAST(SUM(dt.m) AS BIGINT) AS n_tokens,
               SUM(CAST(dt.m AS DECIMAL(6,0)) * l.lam) AS s_lam
        FROM doc_tok dt JOIN lam l ON l.tok = dt.tok
        GROUP BY dt.doc_id
    )
    SELECT doc_id, source, n_tokens,
           CAST(ROUND(s_lam + CAST(n_tokens AS DECIMAL(7,0)) *
                 CAST(ln((SELECT r_total + v FROM tot) * 1.0)
                      - ln((SELECT t_total + v FROM tot) * 1.0)
                      AS DECIMAL(14,12)), 6) AS DOUBLE) AS log_weight
    FROM w
    WHERE source <> '{_DSIR_TARGET}'
    ORDER BY log_weight DESC, doc_id
    LIMIT {_DSIR_TOPN}
    """,
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{25} non-target documents by DSIR log importance weight
    toward the '{src0}' slice: log w(doc) = sum_t m_t * [ln p_target(t)
    - ln p_raw(t)] with add-one smoothing, decomposed as
    sum m_t*(ln(tf_t+1) - ln(tf_r+1)) + n_tokens*(ln(R+V) - ln(T+V)) so
    every per-token term is computed once on integer counts.

    Engine-exact: each lambda term is a double of integer inputs cast to
    decimal(28,12) BEFORE the weighted sum (the q_unigram_logprob
    shuffle-stability trick), so partial-sum order cannot move the
    rounded result and the top-N cut is deterministic on both engines.

    100 TB design: two corpus passes fused into shuffles on token
    (vocab/target counts) and (doc_id, token) (per-doc rollup) — all
    partial-agg'd map-side; the lambda table joins on token (Zipf-
    skewed: AQE skew split absorbs the head, and per-(doc,token)
    pre-aggregation bounds any key's rows by the doc count); the final
    top-N is a TakeOrdered k-row merge, never a global sort. The vocab
    side is corpus-derived metadata (|V| << corpus), the selection
    output is N rows — nothing driver-side in between."""
    docs = load_spread(spark, sf_dir, "documents")
    # not-null filter: no-op that equalizes the branches' pushed-filter
    # sets so exchange reuse fires (see q_unigram_logprob)
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("tok"),
    ).where(F.col("tok").isNotNull())
    # One corpus pass (guide §2.4): the per-(doc,token) aggregate is the
    # base relation (source is functionally determined by doc_id, so
    # any_value is exact); raw/target corpus counts and the totals are
    # its exact integer re-aggregations, and folding tf_t into vocab
    # also removes the vocab⋈tgt join. ReuseExchange collapses what
    # used to be four scan+explode subtrees into one (measured r13).
    doc_tok = toks.groupBy("doc_id", "tok").agg(
        F.any_value("source").alias("source"), F.count("*").alias("m")
    )
    vocab = doc_tok.groupBy("tok").agg(
        F.sum("m").alias("tf_r"),
        F.sum(
            F.when(F.col("source") == _DSIR_TARGET, F.col("m")).otherwise(
                F.lit(0)
            )
        ).alias("tf_t"),
    )
    # decimal(14,12) (|lambda| < 100) and decimal(6,0) m keep every
    # m*lambda product under Spark's 38-digit precision cap EXACTLY —
    # with wider types the cap silently rounds each product to 6
    # fractional digits (decimal(38,6)), which moved sums by ~1e-6
    lam = vocab.select(
        "tok",
        (
            F.log(F.col("tf_t") + F.lit(1.0))
            - F.log(F.col("tf_r") + F.lit(1.0))
        )
        .cast("decimal(14,12)")
        .alias("lam"),
    )
    tot = vocab.agg(
        F.sum("tf_r").alias("r_total"),
        F.sum("tf_t").alias("t_total"),
        F.count("*").alias("v"),
    )
    w = (
        doc_tok.join(lam, "tok")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.sum("m").cast("bigint").alias("n_tokens"),
            F.sum(F.col("m").cast("decimal(6,0)") * F.col("lam")).alias("s_lam"),
        )
    )
    const = (F.log(F.col("r_total") + F.col("v")) - F.log(F.col("t_total") + F.col("v"))).cast(
        "decimal(14,12)"
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .where(F.col("source") != _DSIR_TARGET)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.round(F.col("s_lam") + F.col("n_tokens") * const, 6)
            .cast("double")
            .alias("log_weight"),
        )
        .orderBy(F.col("log_weight").desc(), "doc_id")
        .limit(_DSIR_TOPN)
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1):
# the published rule battery web-scale corpora are gated on before
# training. Thresholds adapted to the fixture's token range; semantics
# (integer-exact cross-multiplied ratios, no float thresholds) are the
# production form. No reference counterpart (SURVEY.md §2-A).
# ---------------------------------------------------------------------------


@query(
    "q_gopher_rules",
    oracle=f"""
    WITH t AS (
        SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        FROM documents
    ),
    d AS (
        SELECT source, len(tk) AS n,
               len(array_to_string(tk, '')) AS c,
               len(list_filter(tk,
                   x -> len(translate(x,
                        'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ',
                        '')) < len(x))) AS n_alpha,
               len(list_distinct(list_filter(tk, x -> x IN {_SW_SQL}))) AS n_sw,
               len(list_filter(tk,
                   x -> contains(x, '#') OR contains(x, '...'))) AS n_sym,
               CASE WHEN len(tk) >= 2 THEN list_max(list_transform(
                   list_distinct(list_transform(generate_series(1, len(tk) - 1),
                                 i -> tk[i] || ' ' || tk[i + 1])),
                   g -> len(list_filter(
                       list_transform(generate_series(1, len(tk) - 1),
                                      i -> tk[i] || ' ' || tk[i + 1]),
                       b -> b = g)))) END AS maxbg
        FROM t
    ),
    f AS (
        SELECT source,
               COALESCE(n BETWEEN 30 AND 100000, FALSE) AS wc_ok,
               COALESCE(n >= 1 AND 3 * n <= c AND c <= 10 * n, FALSE) AS mwl_ok,
               COALESCE(5 * n_alpha >= 4 * n, FALSE) AS alpha_ok,
               COALESCE(n_sw >= 2, FALSE) AS stop_ok,
               COALESCE(n >= 0 AND 10 * n_sym <= n, FALSE) AS sym_ok,
               COALESCE(n >= 0 AND (n < 2 OR 10 * maxbg <= n), FALSE) AS rep_ok
        FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (NOT wc_ok) AS BIGINT) AS fail_wordcount,
           CAST(COUNT(*) FILTER (NOT mwl_ok) AS BIGINT) AS fail_meanwordlen,
           CAST(COUNT(*) FILTER (NOT alpha_ok) AS BIGINT) AS fail_alphaword,
           CAST(COUNT(*) FILTER (NOT stop_ok) AS BIGINT) AS fail_stopword,
           CAST(COUNT(*) FILTER (NOT sym_ok) AS BIGINT) AS fail_symbol,
           CAST(COUNT(*) FILTER (NOT rep_ok) AS BIGINT) AS fail_repetition,
           CAST(COUNT(*) FILTER (wc_ok AND mwl_ok AND alpha_ok AND stop_ok
                                 AND sym_ok AND rep_ok) AS BIGINT) AS n_pass,
           CAST(COUNT(*) FILTER (wc_ok AND mwl_ok AND alpha_ok AND stop_ok
                                 AND sym_ok AND rep_ok) * 1000000
                // COUNT(*) AS BIGINT) AS pass_ppm
    FROM f GROUP BY source ORDER BY source
    """,
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery per source: word count in [30, 100k], mean
    word length in [3, 10], >= 80% words with an alphabetic char, >= 2
    distinct stop words, symbol-token ratio <= 0.1, top-bigram token
    mass <= 0.2 (the paper's repetition family, its 2-gram member) —
    per-rule failure counts, conjunctive pass count, floored pass ppm.

    Engine-exact: every ratio threshold is an integer cross-multiply
    (5*n_alpha >= 4*n, 10*maxbg <= n, ...) — no float ever decides a
    gate; null/empty text COALESCEs to fail on both engines.

    100 TB design: every rule including the top-bigram mode is a
    scan-side array expression (the mode is O(d^2) per doc over ~d
    distinct bigrams — executor-local arithmetic, cheaper than giving
    the bigram explode a (doc, bigram) exchange); the ONLY shuffle is
    the k-source rollup with map-side partials, so the gate report is
    one pass over the corpus. Degenerate-on-clean rules (symbol, alpha)
    earn their keep on hostile/junk feeds — the hostile sweep exercises
    them."""
    docs = load_spread(spark, sf_dir, "documents")
    tk = F.filter(F.split("text", " "), lambda x: x != "")
    d = docs.select(
        "source",
        F.size(tk).alias("n"),
        F.length(F.concat_ws("", tk)).alias("c"),
        F.size(
            F.filter(
                tk,
                lambda x: F.length(
                    F.translate(
                        x,
                        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
                        "",
                    )
                )
                < F.length(x),
            )
        ).alias("n_alpha"),
        F.size(F.array_distinct(F.filter(tk, lambda x: x.isin(*STOPWORDS)))).alias(
            "n_sw"
        ),
        F.size(
            F.filter(tk, lambda x: x.contains("#") | x.contains("..."))
        ).alias("n_sym"),
        tk.alias("tk"),
    )
    # Top-bigram multiplicity (the mode count) as the longest run in the
    # SORTED bigram array — O(d log d) staged projections instead of the
    # O(d^2) distinct x filter scan (measured 6.9s -> 1.3s at sf0.1; the
    # stages are separate selects because Spark does NOT common-
    # subexpression-eliminate across lambda scopes). Every stage is
    # gated on n >= 2: sequence(1, k) COUNTS DOWN for k < 1 and
    # element_at(arr, 0) throws, so the guard is load-bearing.
    bg = F.expr(
        "transform(sequence(1, size(tk) - 1),"
        " i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"
    )
    d = (
        d.withColumn("bs", F.when(F.col("n") >= 2, F.array_sort(bg)))
        .withColumn(
            "st",
            F.when(
                F.col("n") >= 2,
                F.expr(
                    "filter(transform(sequence(1, size(bs)),"
                    " i -> CASE WHEN i = 1 OR element_at(bs, i)"
                    " != element_at(bs, i - 1) THEN i END),"
                    " x -> x is not null)"
                ),
            ),
        )
        .withColumn(
            "st2",
            F.when(
                F.col("n") >= 2, F.expr("concat(st, array(size(bs) + 1))")
            ),
        )
        .withColumn(
            "maxbg",
            F.when(
                F.col("n") >= 2,
                F.expr(
                    "array_max(transform(sequence(1, size(st)),"
                    " j -> element_at(st2, j + 1) - element_at(st2, j)))"
                ),
            ),
        )
    )
    maxbg = F.col("maxbg")
    f = d.select(
        "source",
        F.coalesce(F.col("n").between(30, 100000), F.lit(False)).alias("wc_ok"),
        # n >= 1: a zero-word doc has no mean word length (and DuckDB's
        # array_to_string([]) is NULL where concat_ws gives '') — fail
        F.coalesce(
            (F.col("n") >= 1)
            & (3 * F.col("n") <= F.col("c"))
            & (F.col("c") <= 10 * F.col("n")),
            F.lit(False),
        ).alias("mwl_ok"),
        F.coalesce(5 * F.col("n_alpha") >= 4 * F.col("n"), F.lit(False)).alias(
            "alpha_ok"
        ),
        F.coalesce(F.col("n_sw") >= 2, F.lit(False)).alias("stop_ok"),
        # n >= 0 guard: Spark's size(null) is -1, which would satisfy
        # 10*n_sym <= n and n < 2 for NULL text — DuckDB's NULL len
        # coalesces to fail, so pin both engines to fail
        F.coalesce(
            (F.col("n") >= 0) & (10 * F.col("n_sym") <= F.col("n")), F.lit(False)
        ).alias("sym_ok"),
        F.coalesce(
            (F.col("n") >= 0)
            & ((F.col("n") < 2) | (10 * maxbg <= F.col("n"))),
            F.lit(False),
        ).alias("rep_ok"),
    )
    def _fails(c):
        return F.sum((~F.col(c)).cast("bigint"))

    all_ok = (
        F.col("wc_ok")
        & F.col("mwl_ok")
        & F.col("alpha_ok")
        & F.col("stop_ok")
        & F.col("sym_ok")
        & F.col("rep_ok")
    )
    return (
        f.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            _fails("wc_ok").alias("fail_wordcount"),
            _fails("mwl_ok").alias("fail_meanwordlen"),
            _fails("alpha_ok").alias("fail_alphaword"),
            _fails("stop_ok").alias("fail_stopword"),
            _fails("sym_ok").alias("fail_symbol"),
            _fails("rep_ok").alias("fail_repetition"),
            F.sum(all_ok.cast("bigint")).alias("n_pass"),
        )
        .select(
            "source",
            "n_docs",
            "fail_wordcount",
            "fail_meanwordlen",
            "fail_alphaword",
            "fail_stopword",
            "fail_symbol",
            "fail_repetition",
            "n_pass",
            F.expr("n_pass * 1000000 div n_docs").alias("pass_ppm"),
        )
        .orderBy("source")
    )


@query(
    "q_kneser_ney",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                   x -> x <> '') AS ts
        FROM documents
    ),
    bi AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
    ),
    cb AS (
        SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c FROM bi GROUP BY w1, w2
    ),
    fwd AS (SELECT w1, SUM(c) AS ctx, CAST(COUNT(*) AS DOUBLE) AS n1f
            FROM cb GROUP BY w1),
    bwd AS (SELECT w2, CAST(COUNT(*) AS DOUBLE) AS n1b FROM cb GROUP BY w2),
    btot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS b FROM cb),
    doc_bi AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS DOUBLE) AS m
        FROM bi GROUP BY doc_id, w1, w2
    )
    SELECT d.doc_id,
           CAST(SUM(m) AS BIGINT) AS n_bigrams,
           ROUND(-SUM(CAST(m * LN(
                 (GREATEST(cb.c - 0.75, 0)
                  + 0.75 * f.n1f * (bw.n1b / (SELECT b FROM btot)))
                 / f.ctx) AS DECIMAL(28,12)))
                 / SUM(m), 6) AS avg_neg_logprob
    FROM doc_bi d
    JOIN cb ON cb.w1 = d.w1 AND cb.w2 = d.w2
    JOIN fwd f ON f.w1 = d.w1
    JOIN bwd bw ON bw.w2 = d.w2
    GROUP BY d.doc_id
    """,
)
def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM score (D = 0.75): p(w2|w1) =
    (max(c(w1w2) − D, 0) + D·N1+(w1·)·p_cont(w2)) / c(w1·), with the
    continuation probability p_cont(w2) = N1+(·w2)/|bigram types| — the
    smoothing that backs off to how many CONTEXTS a word follows, not
    how often it occurs (the classic fix for 'Francisco': frequent but
    only ever after 'San'). Per-doc average negative log-probability;
    sibling of q_bigram_lm's simple interpolation.

    Shuffle-stability: q_bigram_lm's exact trick — each m·ln(p) term is
    cast to DECIMAL(28,12) before the sum, so partial-sum order cannot
    move the rounded result; ln is the host's one libm.

    Scale posture: ALL model tables (bigram counts, forward/backward
    continuation counts, the 1-row type total) are type-scale, derived
    from one bigram rollup; the scoring joins are keyed on types with
    per-(doc, bigram) pre-aggregation bounding any hot key, and the
    per-doc rollup is the only token-scale shuffle."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("ts"),
    )
    bi = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.when(
                    F.size("ts") >= 2, F.sequence(F.lit(1), F.size("ts") - 1)
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.struct(
                    F.element_at("ts", i).alias("w1"),
                    F.element_at("ts", i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2").where(
        # no-op filter (element_at within bounds never yields null here):
        # equalizes every branch's pushed-filter set so exchange reuse
        # fires (see q_unigram_logprob)
        F.col("w1").isNotNull() & F.col("w2").isNotNull()
    )
    # One corpus pass (guide §2.4): doc_bi is the base; cb is its exact
    # re-aggregation (sum of per-doc bigram counts == corpus count), and
    # fwd/bwd/btot derive from cb — so ReuseExchange collapses what used
    # to be five scan+explode subtrees into one (measured r13). bwd/btot
    # count the never-null c instead of count(*): equal by construction,
    # and it stops column pruning from collapsing their branch into a
    # distinct-aggregate whose exchanges no longer match cb's.
    doc_bi = bi.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("double").alias("m")
    )
    cb = doc_bi.groupBy("w1", "w2").agg(F.sum("m").alias("c"))
    fwd = cb.groupBy("w1").agg(
        F.sum("c").alias("ctx"), F.count("c").cast("double").alias("n1f")
    )
    bwd = cb.groupBy("w2").agg(F.count("c").cast("double").alias("n1b"))
    btot = cb.agg(F.count("c").cast("double").alias("b"))
    scored = (
        doc_bi.join(cb, ["w1", "w2"])
        .join(fwd, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(btot))
    )
    p = (
        F.greatest(F.col("c") - 0.75, F.lit(0.0))
        + 0.75 * F.col("n1f") * (F.col("n1b") / F.col("b"))
    ) / F.col("ctx")
    return scored.groupBy("doc_id").agg(
        F.sum("m").cast("bigint").alias("n_bigrams"),
        F.round(
            -F.sum((F.col("m") * F.log(p)).cast("decimal(28,12)"))
            / F.sum("m"),
            6,
        ).alias("avg_neg_logprob"),
    )


@query(
    "q_ccnet_bins",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, tok
      FROM (SELECT doc_id, lang,
                   list_filter(string_split(lower(text), ' '), x -> x <> '')
                     AS t
            FROM documents) d, unnest(t) AS u(tok)
    ),
    vocab AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS n FROM toks GROUP BY tok),
    big AS (SELECT CAST(SUM(n) AS DOUBLE) AS big_n FROM vocab),
    dt AS (
      SELECT doc_id, lang, tok, CAST(COUNT(*) AS DOUBLE) AS m
      FROM toks GROUP BY doc_id, lang, tok
    ),
    scored AS (
      SELECT dt.doc_id, dt.lang,
             ROUND(LN(big.big_n)
                   - SUM(CAST(dt.m * LN(v.n) AS DECIMAL(28,12))) / SUM(dt.m),
                   6) AS nlp
      FROM dt JOIN vocab v ON v.tok = dt.tok CROSS JOIN big
      GROUP BY dt.doc_id, dt.lang, big.big_n
    ),
    binned AS (
      SELECT lang, nlp,
             ntile(3) OVER (
               PARTITION BY lang
               ORDER BY nlp, COALESCE(doc_id, -1)
             ) AS bin
      FROM scored
    )
    SELECT lang, CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(nlp) AS min_nlp, MAX(nlp) AS max_nlp
    FROM binned GROUP BY lang, bin
    """,
)
def q_ccnet_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity binning: score every doc with the corpus
    unigram LM (q_unigram_logprob's shuffle-stable avg-neg-logprob),
    then split each language into head / middle / tail TERTILES of the
    score distribution (ntile(3) over (rounded score, doc_id) — a total
    order, so the bin boundary is engine- and partitioning-exact). CCNet
    keeps head+middle and drops tail; the per-bin rows here are the
    audit of where those cutoffs land per language.

    Scale posture: the LM machinery is q_unigram_logprob's (two
    shuffles, Zipf-skewed token join absorbed by AQE skew-split, per-
    (doc,token) pre-agg bounds each key); the tertiles are EXACT
    ntile(3) semantics computed from the (lang, rounded-score) HISTOGRAM
    — q_perplexity_filter's accepted type-scale relation — because
    ntile's bucket sizes are a function of n alone and tied scores are
    interchangeable: bin b spans ranks [lo_b, hi_b] with lo/hi pure
    integer arithmetic on n, and the score at any rank is the smallest
    score whose cumulative histogram count reaches it. The only windows
    run over histogram rows (never docs), so a 90%-one-lang corpus
    sorts that lang's distinct rounded scores, not half the corpus.
    Ties are interchangeable rows, so per-bin counts and score bounds
    are unique even when ties straddle a boundary. No reference
    counterpart (SURVEY.md §2-A)."""
    docs = load_spread(spark, sf_dir, "documents")
    # not-null filter: no-op that equalizes the branches' pushed-filter
    # sets so exchange reuse fires (see q_unigram_logprob)
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("tok"),
    ).where(F.col("tok").isNotNull())
    # One corpus pass (guide §2.4): dt is the base; vocab/big are its
    # exact re-aggregations, so ReuseExchange collapses what used to be
    # six scan+explode subtrees into one (measured r13).
    dt = toks.groupBy("doc_id", "lang", "tok").agg(
        F.count("*").cast("double").alias("m")
    )
    vocab = dt.groupBy("tok").agg(F.sum("m").alias("n"))
    big = vocab.agg(F.sum("n").alias("big_n"))
    scored = (
        dt.join(vocab, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum((F.col("m") * F.log("n")).cast("decimal(28,12)")).alias(
                "_s"
            ),
            F.sum("m").alias("_m"),
        )
        .crossJoin(F.broadcast(big))
        .select(
            "doc_id",
            "lang",
            F.round(F.log("big_n") - F.col("_s") / F.col("_m"), 6).alias(
                "nlp"
            ),
        )
    )
    hist = scored.groupBy("lang", "nlp").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("nlp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select("lang", "nlp", F.sum("c").over(w_cum).alias("cum_c"))
    langs = hist.groupBy("lang").agg(F.sum("c").alias("n"))
    bounds = (
        langs.select(
            "lang", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("bin"), "n"
        )
        .select(
            "lang",
            "bin",
            (
                F.expr("n DIV 3")
                + F.when(F.col("bin") <= F.expr("n % 3"), 1).otherwise(0)
            ).alias("sz"),
            (
                (F.col("bin") - 1) * F.expr("n DIV 3")
                + F.least(F.col("bin") - 1, F.expr("n % 3"))
                + 1
            ).alias("lo"),
            (
                F.col("bin") * F.expr("n DIV 3")
                + F.least(F.col("bin"), F.expr("n % 3"))
            ).alias("hi"),
        )
        .filter(F.col("sz") > 0)
    )
    # min/max score of bin b = score at rank lo_b / hi_b: the smallest
    # histogram score whose cumulative count reaches the rank. The join
    # is NULL-SAFE: a NULL lang is a real partition on both engines (the
    # ntile form kept it; a plain equi-join would silently drop it).
    return (
        cum.alias("h")
        .join(
            F.broadcast(bounds.alias("b")),
            F.col("h.lang").eqNullSafe(F.col("b.lang")),
        )
        .groupBy(
            F.col("h.lang").alias("lang"),
            F.col("bin").cast("bigint").alias("bin"),
        )
        .agg(
            F.min("sz").cast("bigint").alias("n_docs"),
            F.min(F.when(F.col("cum_c") >= F.col("lo"), F.col("nlp"))).alias(
                "min_nlp"
            ),
            F.min(F.when(F.col("cum_c") >= F.col("hi"), F.col("nlp"))).alias(
                "max_nlp"
            ),
        )
    )


# Context-length candidates priced by q_context_fit (a literal table on
# both engines)
_CTX_WINDOWS = [512, 1024, 2048, 4096]


@query(
    "q_context_fit",
    oracle=f"""
    WITH ws AS (SELECT UNNEST([{', '.join(str(w) for w in _CTX_WINDOWS)}]) AS w),
    toks AS (
      SELECT CAST(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT CAST(ws.w AS BIGINT) AS context_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(COUNT(CASE WHEN n_tok > ws.w THEN 1 END) AS BIGINT)
             AS n_docs_truncated,
           CAST(SUM(CASE WHEN n_tok > ws.w THEN n_tok - ws.w ELSE 0 END)
                AS BIGINT) AS tokens_lost,
           CAST(SUM(CASE WHEN n_tok > ws.w THEN n_tok - ws.w ELSE 0 END)
                * 1000000 // SUM(n_tok) AS BIGINT) AS loss_ppm,
           CAST(SUM(CASE WHEN n_tok <= ws.w THEN ws.w - n_tok ELSE 0 END)
                AS BIGINT) AS pad_tokens
    FROM ws CROSS JOIN toks
    GROUP BY ws.w
    """,
)
def q_context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length sizing table: for each candidate window (512 /
    1024 / 2048 / 4096 tokens), what one-doc-per-sequence training
    would cost — docs truncated, tokens lost to truncation (floored
    ppm of the corpus), and padding needed for short docs. Reading the
    rows picks the context length (or justifies packing, whose
    mechanics q_seq_pack provides) — the capacity-planning complement
    of q_seq_pack's layout.

    Scale posture: per-doc token counts are scan-side; the 4-row window
    table broadcasts (BroadcastNestedLoopJoin with constant fan-out 4),
    and the rollup carries 4 groups. One corpus scan, one type-scale
    shuffle. No reference counterpart (SURVEY.md §2-A)."""
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)
    ws = spark.createDataFrame([(w,) for w in _CTX_WINDOWS], "w bigint")
    toks = docs.select(
        F.size(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        )
        .cast("bigint")
        .alias("n_tok")
    )
    return (
        toks.crossJoin(F.broadcast(ws))
        .groupBy("w")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.count(F.when(F.col("n_tok") > F.col("w"), 1))
            .cast("bigint")
            .alias("n_docs_truncated"),
            F.sum(
                F.when(
                    F.col("n_tok") > F.col("w"), F.col("n_tok") - F.col("w")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("tokens_lost"),
            F.expr(
                "CAST(SUM(CASE WHEN n_tok > w THEN n_tok - w ELSE 0 END)"
                " * 1000000 DIV SUM(n_tok) AS BIGINT)"
            ).alias("loss_ppm"),
            F.sum(
                F.when(
                    F.col("n_tok") <= F.col("w"), F.col("w") - F.col("n_tok")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("pad_tokens"),
        )
        .select(
            F.col("w").alias("context_len"),
            "n_docs",
            "total_tokens",
            "n_docs_truncated",
            "tokens_lost",
            "loss_ppm",
            "pad_tokens",
        )
    )


@query(
    "q_lang_confusion",
    oracle="""
    WITH p AS (
      SELECT lang,
             CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
                  WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
                  WHEN list_contains(string_split(text, ' '), 'el')  THEN 'es'
                  WHEN list_contains(string_split(text, ' '), 'le')  THEN 'fr'
                  ELSE 'unknown' END AS pred_lang
      FROM documents
    ),
    m AS (
      SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM p GROUP BY lang, pred_lang
    ),
    rt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS row_n FROM m GROUP BY lang),
    ct AS (SELECT pred_lang, CAST(SUM(n) AS BIGINT) AS col_n
           FROM m GROUP BY pred_lang)
    SELECT m.lang, m.pred_lang, m.n,
           CAST(m.n * 1000000 // rt.row_n AS BIGINT) AS recall_ppm,
           CAST(m.n * 1000000 // ct.col_n AS BIGINT) AS precision_ppm
    FROM m
    JOIN rt ON rt.lang IS NOT DISTINCT FROM m.lang
    JOIN ct ON ct.pred_lang = m.pred_lang
    """,
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFUSION MATRIX: the labeled lang column against
    q_lang_id's marker-token prediction, each cell with its share of
    the true-language row (recall) and of the predicted column
    (precision) in floored ppm — the eval table that says whether the
    cheap classifier is good enough to gate a crawl, per language.

    Scale posture: prediction is a scan-side CASE; one (lang,
    pred_lang) rollup (≤ langs × 5 cells) and two type-scale marginal
    joins (null-safe on the labeled side, where hostile data puts
    NULLs). No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pred = (
        F.when(F.array_contains(toks, "the"), "en")
        .when(F.array_contains(toks, "der"), "de")
        .when(F.array_contains(toks, "el"), "es")
        .when(F.array_contains(toks, "le"), "fr")
        .otherwise("unknown")
    )
    m = (
        docs.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    rt = m.groupBy("lang").agg(F.sum("n").cast("bigint").alias("row_n"))
    ct = m.groupBy("pred_lang").agg(
        F.sum("n").cast("bigint").alias("col_n")
    )
    return (
        m.join(F.broadcast(rt), m.lang.eqNullSafe(rt.lang))
        .drop(rt.lang)
        .join(F.broadcast(ct), "pred_lang")
        .select(
            "lang",
            "pred_lang",
            "n",
            F.expr("CAST(n * 1000000 DIV row_n AS BIGINT)").alias(
                "recall_ppm"
            ),
            F.expr("CAST(n * 1000000 DIV col_n AS BIGINT)").alias(
                "precision_ppm"
            ),
        )
    )


@query(
    "q_token_entropy",
    oracle="""
    WITH tok AS (
        SELECT lang, tok
        FROM (SELECT lang,
                     list_filter(string_split(lower(text), ' '), x -> x <> '')
                       AS toks
              FROM documents) t, unnest(toks) AS u(tok)
    ),
    vc AS (
        SELECT lang, tok, CAST(COUNT(*) AS DOUBLE) AS c
        FROM tok GROUP BY lang, tok
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(COUNT(CASE WHEN c = 1 THEN 1 END) * 1000000 // COUNT(*)
                AS BIGINT) AS hapax_ppm,
           ROUND(LN(SUM(c))
                 - SUM(CAST(c * LN(c) AS DECIMAL(28,12))) / SUM(c),
                 6) AS entropy
    FROM vc GROUP BY lang
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language UNIGRAM Shannon entropy plus the hapax-legomenon
    ratio — the distribution-level diversity dial (q_char_entropy is the
    per-document twin): entropy collapses on template farms, and a
    hapax_ppm drop flags decode loops recycling the same vocabulary.
    Uses the shuffle-stable form H = ln(N) - sum(c*ln c)/N with the
    c*ln(c) terms fixed in DECIMAL before summation (partial-aggregation
    order cannot move the result); the hapax ratio is integer ppm.

    Scale posture: one (lang, tok) rollup with map-side combine — the
    per-lang aggregation runs over the TYPE-scale vocabulary, never the
    corpus. No reference counterpart (SURVEY.md §2-A)."""
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)
    vc = (
        docs.select(
            "lang",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("tok"),
        )
        .groupBy("lang", "tok")
        .agg(F.count("*").cast("double").alias("c"))
    )
    return vc.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("vocab_size"),
        F.expr(
            "CAST(COUNT(CASE WHEN c = 1 THEN 1 END) * 1000000 "
            "DIV COUNT(*) AS BIGINT)"
        ).alias("hapax_ppm"),
        F.round(
            F.log(F.sum("c"))
            - F.sum((F.col("c") * F.log("c")).cast("decimal(28,12)"))
            / F.sum("c"),
            6,
        ).alias("entropy"),
    )


@query(
    "q_tok_len_profile",
    oracle="""
    WITH tok AS (
        SELECT lang, LEAST(len(tok), 20) AS tok_len
        FROM (SELECT lang,
                     list_filter(string_split(lower(text), ' '), x -> x <> '')
                       AS toks
              FROM documents) t, unnest(toks) AS u(tok)
    ),
    g AS (
        SELECT lang, tok_len, CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM tok GROUP BY lang, tok_len
    )
    SELECT lang, CAST(tok_len AS BIGINT) AS tok_len, n_tokens,
           CAST(n_tokens * 1000000 // SUM(n_tokens) OVER (PARTITION BY lang)
                AS BIGINT) AS ppm
    FROM g
    """,
)
def q_tok_len_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-LENGTH profile per language (lengths capped at 20 so junk
    blobs share one bucket): the subword-budget audit — a language whose
    mass sits at length 15+ fragments into many BPE pieces per word, and
    a spike at length 1 flags tokenizer-hostile spacing. The within-lang
    share is integer ppm over the type-scale (lang, capped-length)
    histogram; the only window runs over <=20 rows per language.

    Scale posture: scan-side length + cap, one map-side combined rollup;
    nothing after the groupBy exceeds langs x 20 rows. No reference
    counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    g = (
        docs.select(
            "lang",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("tok"),
        )
        .select("lang", F.least(F.length("tok"), F.lit(20)).alias("tok_len"))
        .groupBy("lang", "tok_len")
        .agg(F.count("*").cast("bigint").alias("n_tokens"))
    )
    w = Window.partitionBy("lang")
    return g.select(
        "lang",
        F.col("tok_len").cast("bigint").alias("tok_len"),
        "n_tokens",
        F.expr("n_tokens * 1000000").cast("bigint").alias("_num"),
        F.sum("n_tokens").over(w).alias("_den"),
    ).select(
        "lang",
        "tok_len",
        "n_tokens",
        F.expr("CAST(_num DIV _den AS BIGINT)").alias("ppm"),
    )


@query(
    "q_js_divergence",
    oracle="""
    WITH base AS (
        SELECT source, lang FROM documents WHERE source IS NOT NULL
    ),
    sl AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
           FROM base GROUP BY source, lang),
    s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
          FROM base GROUP BY source),
    l AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS g
          FROM base GROUP BY lang),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS big_n FROM base),
    grid AS (
        SELECT s.source, s.ns, l.lang, l.g, COALESCE(sl.n, 0) AS n
        FROM s CROSS JOIN l
        LEFT JOIN sl ON sl.source = s.source
                    AND sl.lang IS NOT DISTINCT FROM l.lang
    ),
    terms AS (
        SELECT source, ns,
               CAST(n AS DOUBLE) / ns AS p,
               CAST(g AS DOUBLE) / (SELECT big_n FROM tot) AS q
        FROM grid
    )
    SELECT source, CAST(MIN(ns) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(
               0.5 * (CASE WHEN p > 0
                           THEN p * LN(p / (0.5 * (p + q))) ELSE 0 END)
               + 0.5 * q * LN(q / (0.5 * (p + q)))
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS js_nats
    FROM terms GROUP BY source
    """,
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's LANGUAGE MIX from the
    corpus mix, in nats — the bounded, symmetric drift statistic that
    complements q_corpus_drift's total-variation distance (JS punishes
    a source concentrating mass on a rare language harder than TV
    does). Per-(source, lang) terms are deterministic double arithmetic
    on exact integer ratios, fixed in DECIMAL before the final sum so
    partial-aggregation order cannot move the 6dp result; p=0 grid
    cells contribute only their q-half (the 0*ln0 = 0 limit, made
    explicit on both engines). NULL lang is a real category (null-safe
    grid join).

    Scale posture: the corpus compresses to (source, lang) counts at
    scan; the grid is sources x langs — type-scale, broadcast-sized.
    No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    base = docs.filter(F.col("source").isNotNull()).select("source", "lang")
    sl = base.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n")
    )
    s = base.groupBy("source").agg(F.count("*").cast("bigint").alias("ns"))
    lng = base.groupBy("lang").agg(F.count("*").cast("bigint").alias("g"))
    tot = base.agg(F.count("*").cast("bigint").alias("big_n"))
    grid = (
        s.crossJoin(F.broadcast(lng))
        .alias("gr")
        .join(
            F.broadcast(sl).alias("sl"),
            (F.col("gr.source") == F.col("sl.source"))
            & F.col("gr.lang").eqNullSafe(F.col("sl.lang")),
            "left",
        )
        .select(
            F.col("gr.source").alias("source"),
            "ns",
            "g",
            F.coalesce(F.col("sl.n"), F.lit(0)).alias("n"),
        )
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("n").cast("double") / F.col("ns")
    q = F.col("g").cast("double") / F.col("big_n")
    m = 0.5 * (p + q)
    term = (
        0.5 * F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + 0.5 * q * F.log(q / m)
    ).cast("decimal(28,12)")
    return grid.groupBy("source").agg(
        F.min("ns").cast("bigint").alias("n_docs"),
        F.round(F.sum(term).cast("double"), 6).alias("js_nats"),
    )


@query(
    "q_split_leakage",
    oracle="""
    WITH assigned AS (
        SELECT md5(text) AS digest,
               CASE
                 WHEN lane % 100 < 80 THEN 'train'
                 WHEN lane % 100 < 90 THEN 'val'
                 ELSE 'test'
               END AS split
        FROM (SELECT text,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || ':split'), 1, 8)) AS BIGINT)
                       AS lane
              FROM documents)
    ),
    train_d AS (
        SELECT DISTINCT digest FROM assigned
        WHERE split = 'train' AND digest IS NOT NULL
    ),
    ev AS (SELECT split, digest FROM assigned WHERE split <> 'train')
    SELECT ev.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(t.digest) AS BIGINT) AS n_leaked,
           CAST(COUNT(t.digest) * 1000000 // COUNT(*) AS BIGINT) AS leak_ppm
    FROM ev LEFT JOIN train_d t ON t.digest = ev.digest
    GROUP BY ev.split
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval LEAKAGE audit: how many val/test documents share an
    exact content digest with ANY train document — the eval-integrity
    check every pretraining pipeline runs after splitting, because a
    random split of an UNdeduplicated corpus puts copies of the same
    page on both sides and inflates eval scores. Reuses q_train_split's
    deterministic salted-md5 80/10/10 assignment verbatim (same lane,
    same boundaries) so the audited split IS the shipped split; NULL
    text never matches (md5(NULL) is NULL and equi-joins drop it on
    both engines) but still counts in n_docs.

    Scale posture: split assignment is scan-side; the only join is a
    32-byte digest left-join of eval rows against the distinct train
    digests (q_dedup_exact's shuffle posture). No reference counterpart
    (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents")
    lane = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    split = (
        F.when(lane % 100 < 80, "train")
        .when(lane % 100 < 90, "val")
        .otherwise("test")
    )
    assigned = docs.select(
        F.md5("text").alias("digest"), split.alias("split")
    )
    train_d = (
        assigned.filter(
            (F.col("split") == "train") & F.col("digest").isNotNull()
        )
        .select("digest")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ev = assigned.filter(F.col("split") != "train")
    return (
        ev.join(train_d, "digest", "left")
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count("hit").cast("bigint").alias("n_leaked"),
            F.expr(
                "CAST(COUNT(hit) * 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("leak_ppm"),
        )
    )


@query(
    "q_char_class_profile",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(len(text) AS BIGINT) AS total,
             CAST(len(text) - len(regexp_replace(text, '[A-Za-z]', '', 'g'))
                  AS BIGINT) AS letters,
             CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS digits,
             CAST(len(text)
                  - len(regexp_replace(text, '[ \t\n\r]', '', 'g'))
                  AS BIGINT) AS ws,
             CAST(len(text) - len(regexp_replace(text, '[<>&]', '', 'g'))
                  AS BIGINT) AS markup
      FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(total) AS BIGINT) AS n_chars,
           CAST(CASE WHEN SUM(total) = 0 THEN NULL
                ELSE SUM(letters) * 1000000 // SUM(total) END AS BIGINT)
             AS letter_ppm,
           CAST(CASE WHEN SUM(total) = 0 THEN NULL
                ELSE SUM(digits) * 1000000 // SUM(total) END AS BIGINT)
             AS digit_ppm,
           CAST(CASE WHEN SUM(total) = 0 THEN NULL
                ELSE SUM(ws) * 1000000 // SUM(total) END AS BIGINT)
             AS ws_ppm,
           CAST(CASE WHEN SUM(total) = 0 THEN NULL
                ELSE SUM(markup) * 1000000 // SUM(total) END AS BIGINT)
             AS markup_ppm
    FROM d GROUP BY source
    """,
)
def q_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-CLASS fingerprint per source: the ppm of ASCII letters,
    digits, whitespace, and markup (<>&) in each feed's character mass —
    the cheap pre-parse audit that separates prose (high letters, ~15%
    whitespace) from tables/logs (digit-heavy), from HTML that escaped
    the extractor (markup > 0 is a boilerplate-stripper bug upstream).
    Classes are ASCII regexes on purpose: Java and RE2 Unicode
    character-class semantics differ, ASCII classes do not — the counts
    are engine-exact integers (length minus stripped length), ratios
    floored ppm.

    Scale posture: pure scan-side regexp arithmetic (whole-stage
    codegen), one source rollup; nothing corpus-sized shuffles. No
    reference counterpart (SURVEY.md §2-A)."""
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000)

    def _cnt(pat: str):
        return (
            F.length("text") - F.length(F.regexp_replace("text", pat, ""))
        ).cast("bigint")

    d = docs.filter(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    ).select(
        "source",
        F.length("text").cast("bigint").alias("total"),
        _cnt("[A-Za-z]").alias("letters"),
        _cnt("[0-9]").alias("digits"),
        _cnt("[ \t\n\r]").alias("ws"),
        _cnt("[<>&]").alias("markup"),
    )
    ppm = lambda c: F.expr(  # noqa: E731 - local ppm shorthand
        f"CAST(CASE WHEN SUM(total) = 0 THEN NULL "
        f"ELSE SUM({c}) * 1000000 DIV SUM(total) END AS BIGINT)"
    ).alias(f"{c.rstrip('s') if c != 'ws' else 'ws'}_ppm")
    return d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("total").cast("bigint").alias("n_chars"),
        ppm("letters"),
        ppm("digits"),
        ppm("ws"),
        ppm("markup"),
    )


_APPORTION_BUDGET = 1000  # total sample budget to allocate across sources


@query(
    "q_source_apportion",
    oracle=f"""
    WITH c AS (
        SELECT source, COUNT(*) AS n FROM documents
        WHERE source IS NOT NULL GROUP BY source
    ),
    t AS (SELECT SUM(n) AS total FROM c),
    q AS (
        SELECT c.source, c.n,
               ({_APPORTION_BUDGET} * c.n) // t.total AS base,
               ({_APPORTION_BUDGET} * c.n) % t.total AS rem,
               t.total AS total
        FROM c, t
    ),
    r AS (
        SELECT source, n, base, rem,
               row_number() OVER (ORDER BY rem DESC, source) AS rk,
               {_APPORTION_BUDGET} - SUM(base) OVER () AS leftover
        FROM q
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM r
    """,
)
def q_source_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer budget apportionment across corpus sources
    (largest-remainder / Hamilton method): allocate a total sample
    budget of {B} docs proportionally to per-source counts — floor the
    exact quota B*n_i/N (integer arithmetic, never floats), then hand
    the leftover units to the largest fractional remainders (ties
    break on source name). This is the allocation step AFTER mixture
    weighting (q_corpus_mixture/q_temperature_mixture pick rates; this
    turns a target budget into per-source integer counts that sum to
    EXACTLY B — naive rounding over- or under-shoots). sum(alloc) == B
    is pinned in tests/test_corpus_ops.py.

    Scale posture: one map-side-combined groupBy over the scan (k
    source rows out), a 1-row broadcast total, and windows over the
    k-row source relation only — type-scale, never corpus-scale; the
    allocation for 10^10 docs costs the same k-row tail as for 10^4.
    No reference counterpart (SURVEY.md §2-A)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    B = _APPORTION_BUDGET
    q = counts.crossJoin(F.broadcast(total)).select(
        "source",
        "n",
        F.expr(f"({B} * n) DIV total").alias("base"),
        F.expr(f"({B} * n) % total").alias("rem"),
    )
    w_rank = Window.orderBy(F.col("rem").desc(), "source")
    w_all = Window.orderBy(F.col("rem").desc(), "source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return q.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        (
            F.col("base")
            + F.when(
                F.row_number().over(w_rank) <= B - F.sum("base").over(w_all),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("alloc"),
    )
