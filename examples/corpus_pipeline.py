"""End-to-end training-corpus pipeline: the composed "switch story" for
a user of the reference — documents land in the KV layer (pot semantics),
then one Spark job takes them from raw text to packed training windows:

    1. ingest     raw docs batch-upserted into a pot (kv_create_batch)
    2. clean      lowercase/strip/collapse normalization + PII scrub
                  (q_text_normalize / q_pii_scrub)
    3. filter     composite quality score + language confidence
                  (q_quality_score / q_lang_id thresholds)
    4. dedup      exact dedup by content hash, keep min doc_id
                  (q_dedup_exact semantics)
    5. score      corpus-trained unigram LM, drop high-surprise outliers
                  (q_unigram_logprob semantics)
    6. pack       2048-token context windows via distributed prefix-sum
                  (q_seq_pack semantics), then a deterministic
                  train/val/test split audit (q_train_split)
    7. publish    packed windows written back to a pot generation the
                  trainer reads (and can time-travel / clone / diff)

Run:  python examples/corpus_pipeline.py [sf_dir]

Every stage is the same JVM-side column expressions the registered
queries use (no Python in the hot path); stage row counts and the final
pot generation are printed. At 100 TB the only shuffles are the dedup
hash aggregate, the vocab/token join, and the prefix-sum rollup — see
SCALE.md for why each survives a 1000-executor cluster.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

from pyspark.sql import Window
from pyspark.sql import functions as F

from pot_spark.kv import PotStore
from pot_spark.session import get_spark
from pot_spark.tables import load

CTX = 2048


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus_pipeline", cpus="8")
    root = tempfile.mkdtemp(prefix="pot_pipeline_")
    store = PotStore(spark=spark, root=root)

    # 1. ingest -- documents arrive as pot upserts (the reference's only
    # write path), then the engine reads them back as a DataFrame
    raw = load(spark, sf_dir, "documents")
    docs = {
        str(r["doc_id"]): {"text": r["text"], "lang": r["lang"]}
        for r in raw.limit(200).collect()
    }
    store.create_batch("corpus/raw", docs)
    ingested = store.get_typed(
        "corpus/raw", "text string, lang string"
    ).selectExpr("CAST(key AS BIGINT) AS doc_id", "text", "lang")
    print(f"[1 ingest ] {ingested.count()} docs in pot generation "
          f"{store.generation_cache['corpus/raw']}")

    # 2. clean -- JVM regex normalization, one scan
    cleaned = ingested.select(
        "doc_id",
        "lang",
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ").alias("text"),
    )

    # 2b. scrub -- PII redaction before anything downstream sees text
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    cleaned = cleaned.withColumn(
        "text", F.regexp_replace("text", email_re, "<EMAIL>")
    )

    # 3. filter -- cheap quality signals as column expressions
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    scored = cleaned.withColumn("n_tok", F.size(toks)).withColumn(
        "quality",
        (F.size(toks) >= 5).cast("int")
        + (F.length("text") >= 30).cast("int")
        + (F.regexp_count("text", F.lit("[a-z]")) * 1.0 / F.length("text")
           > 0.5).cast("int"),
    )
    kept = scored.filter(F.col("quality") >= 2)
    print(f"[3 filter ] kept {kept.count()} docs")

    # 4. dedup -- exact content dedup, min doc_id representative
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    print(f"[4 dedup  ] {deduped.count()} unique docs")

    # 5. score -- corpus unigram LM, drop the most surprising 10%
    tok_rows = deduped.select("doc_id", F.explode(toks).alias("t"))
    vocab = tok_rows.groupBy("t").agg(F.count("*").cast("double").alias("n"))
    big_n = vocab.agg(F.sum("n").alias("big_n"))
    doc_lp = (
        tok_rows.join(vocab, "t")
        .groupBy("doc_id")
        .agg(
            F.sum(F.log("n")).alias("sum_ln"),
            F.count("*").cast("double").alias("m"),
        )
        .crossJoin(F.broadcast(big_n))
        .select(
            "doc_id",
            (F.log("big_n") - F.col("sum_ln") / F.col("m")).alias("neg_lp"),
        )
    )
    cut = doc_lp.agg(
        F.percentile_approx("neg_lp", 0.9, 1000).alias("p90")
    ).collect()[0]["p90"]
    fluent = deduped.join(
        doc_lp.filter(F.col("neg_lp") <= cut).select("doc_id"), "doc_id"
    )
    print(f"[5 score  ] {fluent.count()} docs under p90 surprise {cut:.3f}")

    # 6. pack -- distributed prefix-sum into fixed context windows
    sharded = fluent.withColumn("shard", F.floor(F.col("doc_id") / 1024))
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_sh = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        sharded.groupBy("shard")
        .agg(F.sum("n_tok").alias("tot"))
        .select("shard", (F.sum("tot").over(w_sh) - F.col("tot")).alias("base"))
    )
    packed = (
        sharded.join(F.broadcast(offsets), "shard")
        .withColumn("cum", F.col("base") + F.sum("n_tok").over(w_in))
        .withColumn(
            "win_id", F.floor((F.col("cum") - F.col("n_tok")) / float(CTX))
        )
    )
    n_windows = packed.agg(F.max("win_id")).collect()[0][0] + 1
    print(f"[6 pack   ] {packed.count()} docs -> {n_windows} windows of {CTX}")

    # 6b. split -- deterministic hash split, stratification audit
    lane = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit(":split"))), 1, 8), 16, 10
    ).cast("bigint") % 100
    split_audit = (
        packed.withColumn(
            "split",
            F.when(lane < 80, "train").when(lane < 90, "val").otherwise("test"),
        )
        .groupBy("split")
        .count()
        .orderBy("split")
        .collect()
    )
    print("[6b split ] " + ", ".join(f"{r['split']}={r['count']}" for r in split_audit))

    # 7. publish -- the packed assignment becomes the next pot generation
    # through the "pot" DataSource writer (task-staged parquet, one
    # put-if-absent manifest commit); trainers read it back with
    # spark.read.format("pot"), diff generations, or clone a release
    from pot_spark.kv.datasource import register

    register(spark)
    (
        packed.select(
            F.col("doc_id").cast("string").alias("key"),
            F.to_json(F.struct("win_id", "n_tok")).alias("doc"),
        )
        .write.format("pot")
        .option("root", root)
        .mode("append")
        .save("corpus/packed")
    )
    gen = max(g for g, _ in store.list_generations("corpus/packed"))
    store.clone("corpus/packed", "corpus/packed_release")
    n_published = (
        spark.read.format("pot").option("root", root).load("corpus/packed").count()
    )
    print(f"[7 publish] generation {gen} at corpus/packed ({n_published} docs); "
          f"release clone at corpus/packed_release")
    feed = store.changes("corpus/packed", gen - 1 if gen > 1 else 0)
    print(f"            change feed vs previous: {len(feed)} keys")


if __name__ == "__main__":
    main()
