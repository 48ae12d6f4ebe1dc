"""Python DataSource formats ("pot", "pot_changes"): batch read with time
travel and key pushdown, transactional batch write (append=upsert,
overwrite=replace), and the generation-offset streaming change feed.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pot_spark.kv import PotStore
from pot_spark.kv.datasource import register


@pytest.fixture()
def ds_spark(spark):
    register(spark)
    return spark


def _mk_store(tmp_path):
    return PotStore(spark=None, root=str(tmp_path / "potroot"))


def test_batch_read_roundtrip_and_time_travel(ds_spark, tmp_path):
    store = _mk_store(tmp_path)
    store.create_batch("a/b", {"k1": {"v": 1}, "k2": {"v": 2}})
    store.create_batch("a/b", {"k2": {"v": 20}})
    df = ds_spark.read.format("pot").option("root", store.root).load("a/b")
    got = {r["key"]: json.loads(r["doc"]) for r in df.collect()}
    assert got == {"k1": {"v": 1}, "k2": {"v": 20}}
    # generation option = time travel
    old = (
        ds_spark.read.format("pot")
        .option("root", store.root)
        .option("generation", 1)
        .load("a/b")
    )
    assert {r["key"]: json.loads(r["doc"]) for r in old.collect()} == {
        "k1": {"v": 1},
        "k2": {"v": 2},
    }
    # missing pot => empty with schema
    empty = ds_spark.read.format("pot").option("root", store.root).load("no/pot")
    assert empty.columns == ["key", "doc"] and empty.count() == 0


def test_batch_read_key_filter(ds_spark, tmp_path):
    store = _mk_store(tmp_path)
    store.create_batch("f/p", {f"k{i}": {"v": i} for i in range(20)})
    df = (
        ds_spark.read.format("pot")
        .option("root", store.root)
        .load("f/p")
        .filter(F.col("key") == "k7")
    )
    rows = df.collect()
    assert len(rows) == 1 and json.loads(rows[0]["doc"]) == {"v": 7}
    isin = (
        ds_spark.read.format("pot")
        .option("root", store.root)
        .load("f/p")
        .filter(F.col("key").isin("k1", "k2", "nope"))
    )
    assert {r["key"] for r in isin.collect()} == {"k1", "k2"}


def test_batch_write_append_is_upsert_overwrite_is_replace(ds_spark, tmp_path):
    store = _mk_store(tmp_path)
    store.create_batch("w/p", {"old": {"v": 0}, "both": {"v": 1}})
    new = ds_spark.createDataFrame(
        [("both", json.dumps({"v": 10})), ("new", json.dumps({"v": 2}))],
        "key string, doc string",
    ).repartition(3)
    new.write.format("pot").option("root", store.root).mode("append").save("w/p")
    assert store.get("w/p") == {
        "old": {"v": 0},
        "both": {"v": 10},
        "new": {"v": 2},
    }
    new.write.format("pot").option("root", store.root).mode("overwrite").save("w/p")
    assert store.get("w/p") == {"both": {"v": 10}, "new": {"v": 2}}
    # every write is one committed generation; history is retained
    assert store.get_at("w/p", 1) == {"old": {"v": 0}, "both": {"v": 1}}


def test_changes_stream_feed(ds_spark, tmp_path):
    store = _mk_store(tmp_path)
    store.create_batch("s/p", {"a": {"v": 1}, "b": {"v": 2}})
    store.create_batch("s/p", {"a": {"v": 10}})
    store.remove("s/p", "b")
    q = (
        ds_spark.readStream.format("pot_changes")
        .option("root", store.root)
        .option("startingGeneration", 0)
        .load("s/p")
        .writeStream.format("memory")
        .queryName("pot_feed")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["key"]: (r["op"], json.loads(r["doc"]) if r["doc"] else None)
        for r in ds_spark.sql("SELECT * FROM pot_feed").collect()
    }
    # full history vs generation 0: net state is inserts of the live keys
    assert rows == {"a": ("insert", {"v": 10})}
    # incremental: stream from generation 1 sees the update and delete
    q2 = (
        ds_spark.readStream.format("pot_changes")
        .option("root", store.root)
        .option("startingGeneration", 1)
        .load("s/p")
        .writeStream.format("memory")
        .queryName("pot_feed2")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows2 = {
        r["key"]: (r["op"], json.loads(r["doc"]) if r["doc"] else None)
        for r in ds_spark.sql("SELECT * FROM pot_feed2").collect()
    }
    assert rows2 == {"a": ("update", {"v": 10}), "b": ("delete", None)}


def test_stream_write_replicates_pot_exactly_once(ds_spark, tmp_path):
    """CDC replication pot->pot: pot_changes source into the pot stream
    writer; a checkpoint-replayed run must not double-apply epochs."""
    store = _mk_store(tmp_path)
    store.create_batch("r/src", {"a": {"v": 1}, "b": {"v": 2}})
    store.create_batch("r/src", {"c": {"v": 3}})
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            ds_spark.readStream.format("pot_changes")
            .option("root", store.root)
            .option("startingGeneration", 0)
            .load("r/src")
            .filter(F.col("op") != "delete")
            .select("key", "doc")
            .writeStream.format("pot")
            .option("root", store.root)
            .option("path", "r/dst")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert store.get("r/dst") == store.get("r/src")
    gen_after_first = store.generation_cache.get("r/dst") or max(
        g for g, _ in store.list_generations("r/dst")
    )
    # replay with the same checkpoint: no new source generations => no
    # new batches; and even a replayed epoch would hit the ledger
    run()
    gen_after_second = max(g for g, _ in store.list_generations("r/dst"))
    assert gen_after_second == gen_after_first


def test_no_pushdown_fallback_reader(ds_spark, tmp_path):
    """A session where spark.sql.python.filterPushdown.enabled stays false
    must still read pots: the fallback reader omits pushFilters (Spark 4
    errors on any pushFilters reader under that conf) and Spark applies
    key filters post-scan instead."""
    from pot_spark.kv.datasource import PotDataSourceNoPushdown

    store = _mk_store(tmp_path)
    store.create_batch("np/p", {f"k{i}": {"v": i} for i in range(10)})
    conf = "spark.sql.python.filterPushdown.enabled"
    old = ds_spark.conf.get(conf)
    ds_spark.conf.set(conf, "false")
    try:
        ds_spark.dataSource.register(PotDataSourceNoPushdown)
        df = (
            ds_spark.read.format("pot")
            .option("root", store.root)
            .load("np/p")
            .filter(F.col("key") == "k3")
        )
        rows = df.collect()
        assert len(rows) == 1 and json.loads(rows[0]["doc"]) == {"v": 3}
    finally:
        ds_spark.conf.set(conf, old)
        register(ds_spark)  # restore the pushdown source for other tests


def test_conjunctive_key_filters_intersect(ds_spark, tmp_path):
    """Two key predicates consumed by pushFilters must INTERSECT — the
    reader keeping only the last one would silently widen the result
    (Spark adds no post-scan filter for consumed predicates)."""
    store = _mk_store(tmp_path)
    store.create_batch("ix/p", {f"k{i}": {"v": i} for i in range(10)})
    df = (
        ds_spark.read.format("pot")
        .option("root", store.root)
        .load("ix/p")
        .filter(F.col("key").isin("k1", "k2") & F.col("key").isin("k2", "k3"))
    )
    assert {r["key"] for r in df.collect()} == {"k2"}
    # disjoint predicates -> empty, not the second set
    empty = (
        ds_spark.read.format("pot")
        .option("root", store.root)
        .load("ix/p")
        .filter(F.col("key").isin("k1") & F.col("key").isin("k4", "k5"))
    )
    assert empty.collect() == []


def test_stream_writer_empty_epoch_truncates_in_overwrite_mode(tmp_path):
    """Complete-mode contract: an epoch that shrinks to ZERO rows must
    still commit (replacing the pot with nothing) and mark its epoch —
    stale keys may not survive an empty complete-mode result. Append
    mode keeps the skip: an empty upsert is a true no-op."""
    from pot_spark.kv.datasource import PotStreamWriter
    from pot_spark.streaming.sink import _epoch_done

    store = _mk_store(tmp_path)
    store.create_batch("s/p", {"old": {"v": 1}})

    w = PotStreamWriter({"root": store.root, "path": "s/p"}, overwrite=True)
    w.commit([], batchId=7)
    assert store.get("s/p") == {}
    assert _epoch_done(store, "s/p", 7)

    # append mode: empty epoch is a no-op and the epoch stays unmarked
    store.create_batch("s/q", {"keep": {"v": 2}})
    wa = PotStreamWriter({"root": store.root, "path": "s/q"}, overwrite=False)
    wa.commit([], batchId=3)
    assert store.get("s/q") == {"keep": {"v": 2}}
    assert not _epoch_done(store, "s/q", 3)


def test_bucket_rooted_datasource_roundtrip(ds_spark):
    """format("pot") against a BUCKET (r10): .option("objectStore",
    endpoint) + .option("bucket", ...) route staging, parts, and the
    commit through the object namespace — batch write, batch read with
    key pushdown, and the pot_changes streaming feed all over real
    HTTP, executor tasks included."""
    from pot_spark.kv.backend import ConditionalPutBackend
    from pot_spark.kv.gcs_emulator import FakeGCSServer, HttpObjectStoreClient
    from pot_spark.kv.storefs import ObjectStoreFS

    server = FakeGCSServer()
    endpoint = server.start()
    try:
        client = HttpObjectStoreClient("dsbkt", endpoint)
        client.create_bucket()

        rows = [("k1", json.dumps({"v": 1})), ("k2", json.dumps({"v": 2}))]
        df = ds_spark.createDataFrame(rows, "key string, doc string")
        (
            df.write.format("pot")
            .option("root", "pots")
            .option("objectStore", endpoint)
            .option("bucket", "dsbkt")
            .option("path", "a/b")
            .mode("append")
            .save()
        )
        # the pot really lives in the bucket
        store = PotStore(
            None,
            "pots",
            backend=ConditionalPutBackend(client),
            fs=ObjectStoreFS(client),
        )
        assert store.get("a/b") == {"k1": {"v": 1}, "k2": {"v": 2}}

        back = (
            ds_spark.read.format("pot")
            .option("root", "pots")
            .option("objectStore", endpoint)
            .option("bucket", "dsbkt")
            .load("a/b")
        )
        got = {r["key"]: json.loads(r["doc"]) for r in back.collect()}
        assert got == {"k1": {"v": 1}, "k2": {"v": 2}}
        # key pushdown still filters reader-side over the bucket
        one = back.filter(F.col("key") == "k2").collect()
        assert [r["key"] for r in one] == ["k2"]
    finally:
        server.stop()
