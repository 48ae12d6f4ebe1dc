"""KV layer exposed through the oracle-checked contract: a full
create/upsert/remove pipeline whose final state is independently
derivable in SQL from the source table — the strongest cross-check the
DuckDB gate can give a stateful store.

Pipeline (deterministic, rebuilt from scratch in a temp root each run):
  1. batch-upsert documents with doc_id < 100 (key = str(doc_id));
  2. upsert docs 50..149 with amended payloads (last-writer-wins);
  3. remove keys 0..9 (plus one missing key — silent no-op);
Final pot state == docs 10..149 with 'amended' flag for 50..149.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pot_spark.kv.store import PotStore
from pot_spark.registry import query
from pot_spark.tables import load


def _query_root(prefix: str) -> str:
    """Temp pot root that outlives the query body.

    The returned DataFrames are lazy distributed reads over the pot's
    parquet snapshots, so the files must survive until the CALLER runs an
    action — collect()-ing inside the query to outlive an eager teardown
    would route the table through the driver (the anti-pattern at scale).
    Cleanup is deferred to interpreter exit instead; a query run leaves a
    few MB of snapshot files behind for the session's lifetime, the
    results stay distributed."""
    root = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


@query(
    "q_kv_pipeline",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS key,
           doc_id, lang,
           (doc_id >= 50) AS amended
    FROM documents
    WHERE doc_id >= 10 AND doc_id < 150
    """,
)
def q_kv_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert/merge/remove through PotStore, read back via the typed
    DataFrame projection."""
    docs = {
        str(r["doc_id"]): {"doc_id": r["doc_id"], "lang": r["lang"]}
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .filter(F.col("doc_id") < 150)
        .collect()
    }
    root = _query_root("pot_kv_pipeline_")
    store = PotStore(spark, root)
    store.create_batch(
        "pipeline",
        {k: {**v, "amended": False} for k, v in docs.items() if v["doc_id"] < 100},
    )
    store.create_batch(
        "pipeline",
        {k: {**v, "amended": True} for k, v in docs.items() if v["doc_id"] >= 50},
    )
    store.remove("pipeline", *[str(i) for i in range(10)], "missing-key")
    return store.get_typed("pipeline", "doc_id long, lang string, amended boolean")


@query(
    "q_kv_bucketed",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS key,
           doc_id, lang,
           (doc_id % 7 = 0) AS touched
    FROM documents
    WHERE doc_id < 200
    """,
)
def q_kv_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O(delta) bucketed upsert path, oracle-checked: bulk-load 200
    docs through create_df_bucketed, then upsert the doc_id % 7 == 0
    subset with a 'touched' flag — only the buckets holding those keys
    are rewritten (manifest file reuse), and the merged read-back must
    equal the SQL replay."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .filter(F.col("doc_id") < 200)
    )

    def keyed(df: DataFrame, touched_expr) -> DataFrame:
        return df.select(
            F.col("doc_id").cast("string").alias("key"),
            F.to_json(
                F.struct(
                    "doc_id", "lang", touched_expr.alias("touched")
                )
            ).alias("doc"),
        )

    root = _query_root("pot_kv_bucketed_")
    store = PotStore(spark, root)
    store.create_df_bucketed("bkt", keyed(docs, F.lit(False)), n_buckets=8)
    delta = docs.filter(F.col("doc_id") % 7 == 0)
    store.create_df_bucketed("bkt", keyed(delta, F.lit(True)), n_buckets=8)
    return store.get_typed("bkt", "doc_id long, lang string, touched boolean")


@query(
    "q_pot_datasource",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE doc_id < 120
    GROUP BY lang
    """,
)
def q_pot_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "pot" Python DataSource end-to-end: documents are written into
    a pot with df.write.format("pot") (task-staged parquet + one
    put-if-absent manifest commit), read back with
    spark.read.format("pot") (per-file input partitions, Arrow batches),
    projected to typed columns and aggregated. The oracle recomputes the
    same aggregate straight from the source table, so the whole
    source->sink->source loop — including the writer's commit protocol —
    is hash-checked. The reference can only reach storage through its
    HTTP routes (server_routes.go:18-41); this is the engine-native
    equivalent surface."""
    from pot_spark.kv.datasource import register

    register(spark)
    root = _query_root("pot_ds_query_")
    src = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select(
            F.col("doc_id").cast("string").alias("key"),
            F.to_json(F.struct("lang", "n_chars")).alias("doc"),
        )
    )
    (
        src.write.format("pot")
        .option("root", root)
        .mode("append")
        .save("ds/docs")
    )
    back = (
        spark.read.format("pot")
        .option("root", root)
        .load("ds/docs")
        .select(
            F.get_json_object("doc", "$.lang").alias("lang"),
            F.get_json_object("doc", "$.n_chars").cast("long").alias("n_chars"),
        )
    )
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@query(
    "q_kv_incremental_agg",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars + CASE WHEN doc_id % 5 = 0 AND doc_id < 250
                                   THEN 1000 ELSE 0 END) AS BIGINT)
             AS sum_chars
    FROM documents
    WHERE doc_id < 300 AND doc_id % 9 <> 0
    GROUP BY lang
    """,
)
def q_kv_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance off the pot change feed (the
    Delta-CDF consumer pattern): a per-lang (count, sum_chars) aggregate
    is computed ONCE against the base generation, then kept current by
    replaying only the change feed — inserts add their contribution,
    deletes retract the before-image, updates apply the difference. The
    final maintained aggregate must hash-match the oracle's from-scratch
    recompute of the final state; the Spark side never re-reads the full
    pot after the base read. At 100 TB this is the difference between
    O(delta) and O(table) per refresh — and the bucketed change feed
    itself prunes to changed buckets (store.changes_df docstring).

    Reference parity: pot generations exist but cannot be diffed
    (server.go:405); the feed is the capability extension SURVEY §2-B-1
    declares as kv_changes."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .filter(F.col("doc_id") < 300)
    )

    def keyed(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("doc_id").cast("string").alias("key"),
            F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("doc"),
        )

    root = _query_root("pot_kv_incr_")
    store = PotStore(spark, root)
    # generation 1: base load (doc_id < 250, original n_chars)
    g1 = store.create_df_bucketed(
        "incr", keyed(docs.filter(F.col("doc_id") < 250)), n_buckets=8
    )
    # base aggregate pinned at gen1 (time travel): the lazy plan keeps
    # reading the gen1 snapshot even after gen2/gen3 commit below
    base = (
        store.get_typed(
            "incr", "doc_id long, lang string, n_chars long", generation=g1
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("b_n"),
            F.sum("n_chars").alias("b_chars"),
        )
    )
    # generation 2: amend every %5 doc (+1000 chars) and insert 250..299
    delta = docs.filter(
        ((F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 250))
    ).withColumn("n_chars", F.col("n_chars") + 1000)
    inserts = docs.filter(F.col("doc_id") >= 250)
    store.create_df_bucketed(
        "incr", keyed(delta.unionByName(inserts)), n_buckets=8
    )
    # generation 3: remove every %9 key
    store.remove("incr", *[str(i) for i in range(0, 300, 9)])
    # replay ONLY the change feed (with before-images) onto the base agg
    cdf = store.changes_df("incr", g1, include_old=True)
    new_chars = F.get_json_object("doc", "$.n_chars").cast("long")
    old_chars = F.get_json_object("old_doc", "$.n_chars").cast("long")
    contrib = cdf.select(
        F.coalesce(
            F.get_json_object("doc", "$.lang"),
            F.get_json_object("old_doc", "$.lang"),
        ).alias("lang"),
        F.when(F.col("op") == "insert", 1)
        .when(F.col("op") == "delete", -1)
        .otherwise(0)
        .alias("d_n"),
        (F.coalesce(new_chars, F.lit(0)) - F.coalesce(old_chars, F.lit(0))).alias(
            "d_chars"
        ),
    )
    deltas = contrib.groupBy("lang").agg(
        F.sum("d_n").alias("d_n"), F.sum("d_chars").alias("d_chars")
    )
    out = (
        base.join(deltas, "lang", "full_outer")
        .select(
            "lang",
            (F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
            .cast("bigint")
            .alias("n_docs"),
            (
                F.coalesce("b_chars", F.lit(0))
                + F.coalesce("d_chars", F.lit(0))
            )
            .cast("bigint")
            .alias("sum_chars"),
        )
        .filter(F.col("n_docs") > 0)
    )
    return out
