"""Streaming-equals-batch contract: each event-time window operator run
under real Structured Streaming must produce exactly the rows its batch
twin (which the DuckDB oracle verifies) produces."""

from __future__ import annotations

import pytest

from pot_spark import registry
from pot_spark.streaming.runner import (
    APPEND_BUILDERS,
    BUILDERS,
    STATEFUL_BUILDERS,
    run_streaming_query,
)

registry.load_all_query_modules()


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize(
    "name", sorted(BUILDERS) + sorted(STATEFUL_BUILDERS) + sorted(APPEND_BUILDERS)
)
def test_stream_matches_batch(spark, sf_dir, name):
    streamed = run_streaming_query(spark, name, sf_dir)
    batch = registry.QUERIES[name](spark, sf_dir)
    assert _sorted_rows(streamed) == _sorted_rows(batch)


def test_stream_upsert_to_pot_exactly_once(spark, sf_dir, tmp_path):
    """Multi-epoch stream -> stateful dedup -> PotStore upsert sink: the
    final pot state equals the batch dedup result, each epoch commits one
    pot generation, and a replayed epoch is dropped by the ledger."""
    from pot_spark.kv.store import PotStore
    from pot_spark.streaming.runner import build_stateful_dedup
    from pot_spark.streaming.sink import _epoch_done, start_pot_upsert_stream
    from pot_spark.tables import load

    ev = load(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = PotStore(spark, str(tmp_path / "potroot"))
    q = start_pot_upsert_stream(
        build_stateful_dedup(stream),
        store,
        "dedup/events",
        ["user_id", "event_type"],
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    typed = store.get_typed(
        "dedup/events",
        "user_id long, event_type string, first_event_id long, "
        "first_ts timestamp, first_value double",
    ).drop("key")
    batch = registry.QUERIES["s_dedup_first"](spark, sf_dir)
    assert _sorted_rows(typed) == _sorted_rows(batch)

    # one generation per non-empty epoch, all retained for time travel
    gens = store.list_generations("dedup/events")
    assert len(gens) >= 1
    # earlier generations are readable and no larger than the final state
    first_state = store.get_at("dedup/events", gens[0][0])
    assert 0 < len(first_state) <= len(store.get("dedup/events"))

    # a committed epoch is marked done -> a replay skips it
    assert _epoch_done(store, "dedup/events", 0)


def test_stream_upsert_to_bucket_rooted_pot_exactly_once(spark, sf_dir, tmp_path):
    """The exactly-once sink with the pot ENTIRELY in a bucket (r10):
    the epoch ledger markers go through the store's conditional-put
    backend — zero local-path assumptions — and the final state still
    equals the batch dedup result with a ledger-marked epoch."""
    from pot_spark.kv.backend import ConditionalPutBackend
    from pot_spark.kv.gcs_emulator import FakeGCSServer, HttpObjectStoreClient
    from pot_spark.kv.store import PotStore
    from pot_spark.kv.storefs import ObjectStoreFS
    from pot_spark.streaming.runner import build_stateful_dedup
    from pot_spark.streaming.sink import _epoch_done, start_pot_upsert_stream
    from pot_spark.tables import load

    server = FakeGCSServer()
    endpoint = server.start()
    try:
        client = HttpObjectStoreClient("sinkbkt", endpoint)
        client.create_bucket()
        store = PotStore(
            spark,
            "warehouse/pots",
            backend=ConditionalPutBackend(client),
            fs=ObjectStoreFS(client),
        )
        ev = load(spark, sf_dir, "events")
        src = str(tmp_path / "src")
        ev.repartition(2).write.parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = start_pot_upsert_stream(
            build_stateful_dedup(stream),
            store,
            "dedup/events",
            ["user_id", "event_type"],
            str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        typed = store.get_typed(
            "dedup/events",
            "user_id long, event_type string, first_event_id long, "
            "first_ts timestamp, first_value double",
        ).drop("key")
        batch = registry.QUERIES["s_dedup_first"](spark, sf_dir)
        assert _sorted_rows(typed) == _sorted_rows(batch)
        # the ledger markers are OBJECTS in the bucket
        assert _epoch_done(store, "dedup/events", 0)
        assert client.list(
            prefix="warehouse/pots/dedup/events/_pot/epochs/"
        )
    finally:
        server.stop()


def test_watermark_drops_late_events(spark, tmp_path):
    """Real watermark semantics: after the first batch sets max(ts), a
    second batch's event older than the 1-hour watermark is dropped from
    the windowed aggregation, while an in-window event is kept."""
    import os
    import time as _time
    from datetime import datetime

    from pyspark.sql import functions as F

    sdir = str(tmp_path / "wm_src")
    os.makedirs(sdir)

    def write_batch(name, rows, mtime):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        p = os.path.join(sdir, name)
        df.coalesce(1).write.mode("overwrite").parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))

    t = datetime(2024, 1, 1, 12, 0, 0)
    base = _time.time()
    write_batch("b1", [(1, t, 1.0), (2, t.replace(minute=5), 2.0)], base - 100)
    # watermark computed from b1 (12:05 - 1h = 11:05) applies from the
    # NEXT batch on, so the late row goes in its own third batch
    write_batch("b2", [(4, t.replace(minute=30), 4.0)], base - 50)  # kept
    write_batch("b3", [(3, t.replace(hour=9), 9.0)], base - 10)     # dropped

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(sdir, "*"))
    )
    counts = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    sink = "wm_sink"
    q = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    starts = {r.ws for r in spark.table(sink).collect()}
    assert t in starts                       # 12:00 window present
    assert t.replace(minute=30) in starts    # late-but-in-window kept
    assert t.replace(hour=9) not in starts   # beyond watermark: dropped


def test_watermark_late_stream_drops_lagging_batch(spark, sf_dir):
    """s_watermark_late_stream is NON-VACUOUS real late-drop: the lagging
    (odd event_id) batch loses every row whose window closed at or
    before the on-time batch's watermark, and the stream's output equals
    the batch replay of the same delivery model."""
    from pyspark.sql import functions as F

    from pot_spark.tables import load

    out = registry.QUERIES["s_watermark_late_stream"](spark, sf_dir)
    got = {(r.window_start, r.window_end, r.event_type, r.n) for r in out.collect()}

    ev = load(spark, sf_dir, "events")
    wm = (
        ev.filter(F.col("event_id") % 2 == 0)
        .agg((F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("w"))
        .collect()[0]["w"]
    )
    win = F.window("ts", "10 minutes").alias("w")
    kept = ev.filter(
        (F.col("event_id") % 2 == 0)
        | (F.window("ts", "10 minutes").end > F.lit(wm))
    )
    expected = {
        (r["w"].start, r["w"].end, r.event_type, r.n)
        for r in kept.groupBy(win, "event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == expected and got
    # the drop is real: the full (no-drop) windowing has strictly more groups
    full = ev.groupBy(win, "event_type").count().count()
    assert len(got) < full


def test_streaming_signature_ingest_matches_batch(spark, sf_dir, tmp_path):
    """Incremental corpus ingest: documents stream in over 3 epochs, each
    batch computes minhash signatures (stateless per-doc expressions, so
    the streaming plan is the batch plan) and upserts them into a pot via
    the exactly-once sink. Final pot contents must equal the batch
    q_dedup_minhash_sig result — signatures computed at ingest never need
    recomputation at query time."""
    from pot_spark.kv.store import PotStore
    from pot_spark.queries.llm_dedup import N_HASHES, _mh, _shingles
    from pot_spark.streaming.sink import start_pot_upsert_stream
    from pot_spark.tables import load
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    toks = F.split("text", " ")
    exploded = (
        stream.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.explode(_shingles(F.col("toks"))).alias("shingle"))
    )
    # per-doc signatures are a plain aggregation; documents never span
    # files here, so per-batch aggregation == per-doc aggregation
    sigs = exploded.groupBy("doc_id").agg(
        *[F.min(_mh(j)).alias(f"mh{j}") for j in range(N_HASHES)]
    )

    store = PotStore(spark, str(tmp_path / "potroot"))
    q = start_pot_upsert_stream(
        sigs,
        store,
        "signatures",
        ["doc_id"],
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    schema = "doc_id long, " + ", ".join(f"mh{j} long" for j in range(N_HASHES))
    streamed = store.get_typed("signatures", schema).drop("key")
    batch = registry.QUERIES["q_dedup_minhash_sig"](spark, sf_dir)
    assert _sorted_rows(streamed) == _sorted_rows(batch)
    assert len(store.list_generations("signatures")) >= 2  # multi-epoch


def test_transform_with_state_matches_batch(spark, sf_dir):
    """Spark 4 transformWithStateInPandas twin of the stateful dedup:
    the StatefulProcessor-based stream equals the batch s_dedup_first."""
    from pot_spark.streaming.protobuf_compat import ensure_protobuf

    if ensure_protobuf(spark) is None:
        pytest.skip(
            "transformWithState speaks protobuf to the JVM state server; "
            "no pip package and no on-disk runtime to bridge to"
        )
    from pot_spark.streaming.runner import (
        _event_stream,
        build_stateful_dedup_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = _event_stream(spark, f"{sf_dir}/events.parquet")
        plan = build_stateful_dedup_tws(stream)
        q = (
            plan.writeStream.format("memory")
            .queryName("tws_dedup")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    streamed = spark.sql("SELECT * FROM tws_dedup")
    batch = registry.QUERIES["s_dedup_first"](spark, sf_dir)
    assert _sorted_rows(streamed) == _sorted_rows(batch)


def test_native_dedup_collapses_at_least_once_delivery(spark, sf_dir):
    """The replayed source delivers every event twice; the native
    dropDuplicatesWithinWatermark operator must emit each exactly once —
    output == the batch events table."""
    from pot_spark.registry import QUERIES
    from pot_spark.tables import load

    out = QUERIES["s_native_dedup_stream"](spark, sf_dir)
    batch = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    assert out.count() == batch.count()
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_outer_join_stream_emits_unmatched_signups(spark, sf_dir):
    """s_outer_join_stream's null emission is NON-VACUOUS: the stream
    result contains unmatched signups (NULL purchase_id) produced by
    watermark-driven state eviction, matched rows identical to the batch
    inner join, and no sentinel leakage."""
    from pyspark.sql import functions as F

    from pot_spark.tables import load

    out = registry.QUERIES["s_outer_join_stream"](spark, sf_dir).cache()
    unmatched = out.filter(F.col("purchase_id").isNull()).count()
    assert unmatched > 0  # eviction really emitted null rows
    assert "s_type" not in out.columns  # sentinel marker stripped

    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    batch = s.join(
        p,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select("signup_id", "purchase_id", F.col("s_user").alias("user_id"))
    got = {tuple(r) for r in out.collect()}
    expected = {tuple(r) for r in batch.collect()}
    assert got == expected
    # every signup is represented exactly as often as in the batch twin
    assert out.count() == batch.count()


def test_quota_admits_nothing_twice_under_replay(spark, sf_dir):
    """The replayed (at-least-once) source delivers every event in TWO
    microbatches; the quota operator's admitted-id state must grant each
    key's K slots exactly once — the second delivery emits nothing, so
    the sink still equals the batch twin."""
    from pot_spark.streaming.runner import _event_stream, build_stateful_quota

    stream = _event_stream(spark, f"{sf_dir}/events.parquet", replay=True)
    plan = build_stateful_quota(stream)
    spark.catalog.dropTempView("sink_quota_replay")
    q = (
        plan.writeStream.outputMode("update")
        .format("memory")
        .queryName("sink_quota_replay")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(60)
    out = spark.table("sink_quota_replay")
    batch = registry.QUERIES["s_user_quota"](spark, sf_dir)
    assert _sorted_rows(out) == _sorted_rows(batch)


def test_near_dedup_gate_stream_matches_batch(spark, sf_dir):
    """The round-9 streaming near-duplicate admission gate: the real
    streamed run (ordered doc chunks -> band-key state machine -> sink
    rollup) must equal the batch twin the DuckDB oracle verifies, with
    both verdicts (admit / reject) actually exercised."""
    streamed = registry.QUERIES["s_dedup_near_stream"](spark, sf_dir)
    batch = registry.QUERIES["s_dedup_near_gate"](spark, sf_dir)
    rows = _sorted_rows(streamed)
    assert rows == _sorted_rows(batch)
    # _sorted_rows orders columns alphabetically: (admitted, doc_id)
    verdicts = {r[0] for r in rows}
    assert verdicts == {0, 1}, "fixture must exercise both admit and reject"


def test_near_dedup_gate_matches_sequential_bruteforce(spark, sf_dir):
    """The gate's CONTRACT, recomputed independently in pure Python: walk
    docs in arrival (doc_id) order, retain every arrival's signature per
    band key, reject a doc iff any retained signature in any of its
    bands matches on >= 6/8 minhash lanes. This pins the semantic claim
    that the batch twin's arrival-order-free relational form equals the
    sequential online gate."""
    import hashlib

    from pot_spark.queries.llm_dedup import (
        _GATE_MIN_LANES,
        N_BANDS,
        N_HASHES,
    )
    from pot_spark.tables import load

    def mh(j, shingle):
        h = hashlib.md5(f"{j // 4}:{shingle}".encode()).hexdigest()
        return int(h[(j % 4) * 8 : (j % 4) * 8 + 8], 16)

    docs = sorted(
        (r.doc_id, r.text)
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
        if r.text is not None and len(r.text.split(" ")) >= 3
    )
    rows_per_band = N_HASHES // N_BANDS
    retained: dict[str, list[tuple[int, ...]]] = {}
    want = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        shingles = list(dict.fromkeys(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ))
        sig = tuple(min(mh(j, s) for s in shingles) for j in range(N_HASHES))
        keys = [
            hashlib.md5(
                ",".join([str(b)] + [str(sig[b * rows_per_band + r])
                                     for r in range(rows_per_band)]).encode()
            ).hexdigest()
            for b in range(N_BANDS)
        ]
        collided = any(
            sum(a == b for a, b in zip(old, sig)) >= _GATE_MIN_LANES
            for k in keys
            for old in retained.get(k, [])
        )
        for k in keys:
            retained.setdefault(k, []).append(sig)
        want[doc_id] = 0 if collided else 1
    got = {
        r.doc_id: r.admitted
        for r in registry.QUERIES["s_dedup_near_gate"](spark, sf_dir).collect()
    }
    assert got == want


def test_near_dedup_gate_sharded_matches_batch_under_replay(spark, sf_dir):
    """The shard-keyed gate (r10 per-group-overhead amortization: one
    handler invocation per shard, per-band retained sets inside) emits
    the exact same verdicts as the batch twin even under at-least-once
    redelivery — sharding is a state-layout change, never a semantic
    one. Timeout-free like every deterministic test path (an armed
    ProcessingTimeTimeout keeps scheduling no-data microbatches, so the
    drain never completes — the per-band builder's documented note);
    production passes ttl_ms and gets per-band last-seen pruning with
    the state-level timeout as the whole-shard backstop."""
    from pyspark.sql import functions as F

    from pot_spark.streaming.runner import _doc_stream, build_near_dedup_gate

    stream = _doc_stream(spark, f"{sf_dir}/documents.parquet", replay=True)
    plan = build_near_dedup_gate(stream, n_shards=8)
    spark.catalog.dropTempView("sink_gate_sharded")
    q = (
        plan.writeStream.outputMode("update")
        .format("memory")
        .queryName("sink_gate_sharded")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(60)
    sink = spark.table("sink_gate_sharded")
    contradictions = (
        sink.groupBy("band_key", "doc_id")
        .agg(F.countDistinct("collided").alias("nv"))
        .filter("nv > 1")
        .count()
    )
    assert contradictions == 0
    out = sink.groupBy("doc_id").agg(
        (1 - F.max("collided")).cast("bigint").alias("admitted")
    )
    batch = registry.QUERIES["s_dedup_near_gate"](spark, sf_dir)
    assert _sorted_rows(out) == _sorted_rows(batch)


def test_ohlc_watermark_evicts_state(spark, sf_dir):
    """r13 (verdict item 6): prove the OHLC window state is actually
    RETIRED by the watermark, not just bounded on paper. In APPEND mode
    a windowed aggregate emits a bar ONLY when the watermark passes its
    window end and the state row is evicted — so running build_ohlc in
    append mode over the sentinel source (all events, then a +30d
    flush row) and getting exactly the batch twin's bars is end-to-end
    proof of eviction: zero evictions would emit zero rows. The
    registered s_ohlc_stream keeps complete mode (its oracle needs
    every bar each trigger); production posture is this append shape."""
    from pyspark.sql import functions as F

    from pot_spark.streaming.runner import (
        _sentinel_event_stream,
        build_ohlc,
    )

    stream = _sentinel_event_stream(spark, f"{sf_dir}/events.parquet")
    plan = build_ohlc(stream)
    spark.catalog.dropTempView("sink_ohlc_append")
    q = (
        plan.writeStream.outputMode("append")
        .format("memory")
        .queryName("sink_ohlc_append")
        .start()
    )
    try:
        q.processAllAvailable()
        progresses = q.recentProgress
    finally:
        q.stop()
        q.awaitTermination(60)
    # the sentinel's own +30d bar never finalizes (nothing advances the
    # watermark past it), so the append sink is EXACTLY the batch
    # twin's bars — every real window was evicted and emitted
    batch = registry.QUERIES["q_ohlc_bars"](spark, sf_dir)
    got = spark.table("sink_ohlc_append")
    assert _sorted_rows(got) == _sorted_rows(batch)
    # the engine's own state metrics confirm rows were removed
    import json as _json

    removed = sum(
        (op.get("numRowsRemoved") or 0)
        for p in progresses
        for op in (_json.loads(p.json).get("stateOperators") or [])
    )
    assert removed > 0


def test_daily_dedup_sharded_matches_per_key_and_batch(spark, sf_dir):
    """r13 amortization: the shard-keyed daily dedup (vectorized pandas
    merge inside the handler, 807k -> 32 Python crossings at sf1) must
    emit EXACTLY the per-key builder's rows, which equal the batch twin
    q_dedup_daily_first — sharding is a state-layout change, never a
    semantic one (the gate's invariant, applied here)."""
    from pot_spark.streaming.runner import (
        _event_stream,
        build_stateful_daily_dedup,
    )

    results = {}
    for tag, shards in (("perkey", None), ("sharded", 8)):
        stream = _event_stream(spark, f"{sf_dir}/events.parquet")
        plan = build_stateful_daily_dedup(stream, n_shards=shards)
        sink = f"sink_daily_{tag}"
        spark.catalog.dropTempView(sink)
        q = (
            plan.writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(60)
        results[tag] = _sorted_rows(spark.table(sink))
    assert results["sharded"] == results["perkey"]
    batch = registry.QUERIES["q_dedup_daily_first"](spark, sf_dir)
    assert results["sharded"] == _sorted_rows(batch)


def test_sharded_dedup_cdc_keep_null_values_row_integral(spark, sf_dir, tmp_path):
    """r13 hostile-sweep regression: pandas groupby().first()/.last()
    skip NaN PER COLUMN, so a sharded handler that used them emitted a
    neighboring row's value when the winning row's value was NULL (the
    per-key twins pick whole rows via itertuples/iloc and were correct).
    Pin: with every per-key winning row's value nulled, the sharded
    builders emit exactly the per-key builders' rows — nulls included."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pot_spark.streaming.runner import (
        _event_stream,
        build_stateful_cdc,
        build_stateful_dedup,
    )

    src = pq.read_table(f"{sf_dir}/events.parquet")
    pdf = src.to_pandas()
    # null the value of each key's FIRST event (min event_id) and of
    # each key's LAST event (max (ts, event_id)) — the rows the dedup
    # and cdc operators respectively emit
    first_idx = pdf.sort_values("event_id", kind="stable").drop_duplicates(
        subset=["user_id", "event_type"], keep="first"
    ).index
    last_idx = pdf.sort_values(["ts", "event_id"], kind="stable").drop_duplicates(
        subset=["user_id", "event_type"], keep="last"
    ).index
    pdf.loc[first_idx.union(last_idx), "value"] = None
    out = str(tmp_path / "events.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=src.schema, preserve_index=False), out
    )

    for builder in (build_stateful_dedup, build_stateful_cdc):
        results = {}
        for tag, shards in (("perkey", None), ("sharded", 8)):
            stream = _event_stream(spark, out)
            sink = f"sink_nullrow_{builder.__name__}_{tag}"
            spark.catalog.dropTempView(sink)
            q = (
                builder(stream, n_shards=shards)
                .writeStream.outputMode("update")
                .format("memory")
                .queryName(sink)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
                q.awaitTermination(60)
            results[tag] = _sorted_rows(spark.table(sink))
        assert results["sharded"] == results["perkey"], builder.__name__
        # the nulls actually flowed through: the fixture made every
        # winning row null-valued, so NO emitted value may be a real
        # number (None or NaN depending on the pandas round-trip — the
        # buggy .first()/.last() form emitted neighbors' REAL values)
        col = "first_value" if builder is build_stateful_dedup else "value"
        vals = [r[col] for r in spark.table(
            f"sink_nullrow_{builder.__name__}_sharded").collect()]
        assert vals and all(v is None or v != v for v in vals), (
            builder.__name__, vals[:5])


def test_sharded_gate_ttl_prunes_per_band():
    """The per-band retention horizon under shard-keyed state: a band
    idle past ttl drops its retained set; a band with ONE live pair
    keeps ALL its pairs (the stamp is the band's, not the pair's); the
    boundary is strict (exactly-at-horizon prunes)."""
    from pot_spark.streaming.runner import _prune_stale_bands

    per_band = {
        "stale": [[1, "1,2", 100], [2, "3,4", 200]],
        "live": [[3, "5,6", 100], [4, "7,8", 900]],
        "fresh": [[5, "9,9", 1000]],
    }
    out = _prune_stale_bands(per_band, ttl_ms=500, now=1000)
    assert set(out) == {"live", "fresh"}
    assert out["live"] == [[3, "5,6", 100], [4, "7,8", 900]]
    # strict boundary: last activity + ttl == now is already expired
    assert not _prune_stale_bands({"b": [[1, "s", 500]]}, 500, 1000)
    assert _prune_stale_bands({"b": [[1, "s", 501]]}, 500, 1000)


def test_near_dedup_gate_idempotent_under_replay(spark, sf_dir):
    """At-least-once delivery: every doc chunk is delivered twice; the
    gate re-emits the SAME verdict for a redelivered doc (its signature
    is already retained, never appended twice), so the sink rollup still
    equals the batch twin."""
    from pyspark.sql import functions as F

    from pot_spark.streaming.runner import _doc_stream, build_near_dedup_gate

    stream = _doc_stream(spark, f"{sf_dir}/documents.parquet", replay=True)
    plan = build_near_dedup_gate(stream)
    spark.catalog.dropTempView("sink_gate_replay")
    q = (
        plan.writeStream.outputMode("update")
        .format("memory")
        .queryName("sink_gate_replay")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(60)
    sink = spark.table("sink_gate_replay")
    # a redelivered (band, doc) must re-emit ONE verdict value, never a
    # contradicting one
    contradictions = (
        sink.groupBy("band_key", "doc_id")
        .agg(F.countDistinct("collided").alias("nv"))
        .filter("nv > 1")
        .count()
    )
    assert contradictions == 0
    out = sink.groupBy("doc_id").agg(
        (1 - F.max("collided")).cast("bigint").alias("admitted")
    )
    batch = registry.QUERIES["s_dedup_near_gate"](spark, sf_dir)
    assert _sorted_rows(out) == _sorted_rows(batch)


def test_quota_tws_matches_batch_under_replay(spark, sf_dir):
    """The round-9 transformWithState twin of the admission quota
    (ListState-held grants) equals the batch s_user_quota even when the
    at-least-once source redelivers every event — a redelivered id is
    already in the ListState and grants nothing twice."""
    from pot_spark.streaming.protobuf_compat import ensure_protobuf

    if ensure_protobuf(spark) is None:
        pytest.skip(
            "transformWithState speaks protobuf to the JVM state server; "
            "no pip package and no on-disk runtime to bridge to"
        )
    from pot_spark.streaming.runner import (
        _event_stream,
        build_stateful_quota_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = _event_stream(spark, f"{sf_dir}/events.parquet", replay=True)
        plan = build_stateful_quota_tws(stream)
        spark.catalog.dropTempView("tws_quota")
        q = (
            plan.writeStream.format("memory")
            .queryName("tws_quota")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    streamed = spark.sql("SELECT * FROM tws_quota")
    batch = registry.QUERIES["s_user_quota"](spark, sf_dir)
    assert _sorted_rows(streamed) == _sorted_rows(batch)


def test_near_dedup_gate_tws_matches_batch(spark, sf_dir):
    """The admission gate on transformWithState (ListState-held
    retained signatures, append-only state writes): the rolled-up sink
    equals the batch twin s_dedup_near_gate — the same contract as the
    applyInPandasWithState twin, on the Spark 4 API."""
    from pot_spark.streaming.protobuf_compat import ensure_protobuf

    if ensure_protobuf(spark) is None:
        pytest.skip(
            "transformWithState speaks protobuf to the JVM state server; "
            "no pip package and no on-disk runtime to bridge to"
        )
    from pyspark.sql import functions as F

    from pot_spark.streaming.runner import (
        _doc_stream,
        build_near_dedup_gate_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = _doc_stream(spark, f"{sf_dir}/documents.parquet")
        plan = build_near_dedup_gate_tws(stream)
        spark.catalog.dropTempView("tws_gate")
        q = (
            plan.writeStream.format("memory")
            .queryName("tws_gate")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    out = spark.table("tws_gate").groupBy("doc_id").agg(
        (1 - F.max("collided")).cast("bigint").alias("admitted")
    )
    batch = registry.QUERIES["s_dedup_near_gate"](spark, sf_dir)
    assert _sorted_rows(out) == _sorted_rows(batch)


def test_sim_index_tws_matches_batch_under_replay(spark, sf_dir):
    """The r10 transformWithState twin of the ANN index maintainer
    (ListState posting lists, append-only writes): the per-cell final
    emission equals the batch s_sim_index even when every embedding
    chunk is redelivered."""
    from pot_spark.streaming.protobuf_compat import ensure_protobuf

    if ensure_protobuf(spark) is None:
        pytest.skip(
            "transformWithState speaks protobuf to the JVM state server; "
            "no pip package and no on-disk runtime to bridge to"
        )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pot_spark.streaming.runner import _vec_stream, build_sim_index_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = _vec_stream(spark, f"{sf_dir}/embeddings.parquet", replay=True)
        plan = build_sim_index_tws(stream, spark, sf_dir)
        spark.catalog.dropTempView("tws_sim_index")
        q = (
            plan.writeStream.format("memory")
            .queryName("tws_sim_index")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    sink = spark.table("tws_sim_index")
    w = Window.partitionBy("cell").orderBy(F.col("n_members").desc())
    out = (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch = registry.QUERIES["s_sim_index"](spark, sf_dir)
    assert _sorted_rows(out) == _sorted_rows(batch)


def test_cdc_compact_tws_matches_batch_under_replay(spark, sf_dir):
    """The round-10 transformWithState twin of the CDC compactor:
    MapState keyed by user_id with event_type -> latest record map
    entries (completing Value/List/Map state-shape coverage across the
    TWS twins). The at-least-once source redelivers every event; a
    replayed older/equal record never supersedes a newer map entry, so
    the sink still holds exactly the per-key latest snapshot == the
    batch twin s_cdc_compact."""
    from pot_spark.streaming.protobuf_compat import ensure_protobuf

    if ensure_protobuf(spark) is None:
        pytest.skip(
            "transformWithState speaks protobuf to the JVM state server; "
            "no pip package and no on-disk runtime to bridge to"
        )
    from pot_spark.streaming.runner import (
        _event_stream,
        build_stateful_cdc_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = _event_stream(spark, f"{sf_dir}/events.parquet", replay=True)
        plan = build_stateful_cdc_tws(stream)
        spark.catalog.dropTempView("tws_cdc")
        q = (
            plan.writeStream.format("memory")
            .queryName("tws_cdc")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    streamed = spark.sql("SELECT * FROM tws_cdc")
    batch = registry.QUERIES["s_cdc_compact"](spark, sf_dir)
    assert _sorted_rows(streamed) == _sorted_rows(batch)


def test_sim_index_stream_matches_batch_under_replay(spark, sf_dir):
    """Streaming ANN index maintenance (r10): embeddings delivered
    across chunks AND each chunk redelivered (at-least-once). A
    redelivered vec_id is already in the cell's posting list and
    changes nothing, so each cell's final emission equals the batch
    full-corpus build s_sim_index exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pot_spark.streaming.runner import _vec_stream, build_sim_index

    stream = _vec_stream(spark, f"{sf_dir}/embeddings.parquet", replay=True)
    plan = build_sim_index(stream, spark, sf_dir)
    spark.catalog.dropTempView("sink_sim_index_replay")
    q = (
        plan.writeStream.outputMode("update")
        .format("memory")
        .queryName("sink_sim_index_replay")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(60)
    sink = spark.table("sink_sim_index_replay")
    w = Window.partitionBy("cell").orderBy(F.col("n_members").desc())
    out = (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch = registry.QUERIES["s_sim_index"](spark, sf_dir)
    assert _sorted_rows(out) == _sorted_rows(batch)
    # membership never double-counts: every sink emission's n_members
    # is bounded by the cell's true batch membership
    caps = {r.cell: r.n_members for r in batch.collect()}
    for r in sink.collect():
        assert r.n_members <= caps[r.cell]


def test_near_dedup_gate_to_pot_exactly_once(spark, sf_dir, tmp_path):
    """The full production admission pipeline: crawl stream -> band-key
    gate -> exactly-once pot upsert. Per-(band, doc) verdicts land in a
    PotStore keyed (band_key, doc_id) through the epoch-ledger sink; the
    rolled-up pot contents equal the oracle-checked batch twin, and each
    non-empty epoch commits exactly one replay-protected generation."""
    import json

    from pot_spark.kv.store import PotStore
    from pot_spark.streaming.runner import _doc_stream, build_near_dedup_gate
    from pot_spark.streaming.sink import _epoch_done, start_pot_upsert_stream

    stream = _doc_stream(spark, f"{sf_dir}/documents.parquet")
    store = PotStore(spark, str(tmp_path / "potroot"))
    q = start_pot_upsert_stream(
        build_near_dedup_gate(stream),
        store,
        "gate/verdicts",
        ["band_key", "doc_id"],
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    content = store.get("gate/verdicts")
    admitted: dict[int, int] = {}
    for doc in content.values():
        d = int(doc["doc_id"])
        admitted[d] = min(admitted.get(d, 1), 1 - int(doc["collided"]))
    batch = {
        r.doc_id: r.admitted
        for r in registry.QUERIES["s_dedup_near_gate"](spark, sf_dir).collect()
    }
    assert admitted == batch
    # one generation per non-empty epoch, ledger marks them done
    gens = store.list_generations("gate/verdicts")
    assert len(gens) >= 1
    assert _epoch_done(store, "gate/verdicts", 0)
