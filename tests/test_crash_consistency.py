"""Crash-consistency matrix for the object-store commit path.

The reference's write is one atomic whole-object replace guarded by GCS
preconditions (server.go:396-400; readme.md:128's 412 contract). Our
bucket-rooted store decomposes that into stage (snapshot parquet PUTs)
then publish (conditional manifest PUT), so there are MORE crash points
— this module injects faults at each of them and asserts the reference
invariants survive:

- readers never observe a torn generation (every committed manifest's
  snapshot is complete and parseable);
- a fault before the publish leaves the pot at its old generation with
  byte-identical content;
- an "applied but response lost" publish (5xx/timeout after the server
  committed) is a CLEAN new generation — the caller's retry just lands
  the next one;
- vacuum reclaims orphaned staging trees (via objects.get metadata
  ``updated`` age), and reclaiming never disturbs live data.

Faults are injected in a wrapper around the real HTTP client, so every
surviving byte still crossed a real socket to the in-repo GCS emulator.
"""

from __future__ import annotations

import json

import pytest

from pot_spark.kv.backend import ConditionalPutBackend
from pot_spark.kv.errors import CommitConflict  # noqa: F401  (re-raise surface)
from pot_spark.kv.gcs_emulator import FakeGCSServer, HttpObjectStoreClient
from pot_spark.kv.store import PotStore
from pot_spark.kv.storefs import ObjectStoreFS


class InjectedFault(Exception):
    """Stands in for a 503/timeout surfacing from the HTTP layer."""


class FlakyClient:
    """Wraps the real HTTP client; fires one arranged fault on the next
    upload whose key matches ``substr``. mode='lost_request' raises
    before the server sees the PUT (connection refused / 503-before-
    body); mode='lost_response' forwards the PUT and THEN raises (the
    server applied it, the caller saw a timeout — the ambiguous
    outcome every retrying client must survive)."""

    def __init__(self, inner) -> None:
        self.inner = inner
        self._arm: tuple[str, str] | None = None
        self.faults_fired = 0

    def arm(self, substr: str, mode: str) -> None:
        assert mode in ("lost_request", "lost_response")
        self._arm = (substr, mode)

    def upload(self, key, payload, if_generation_match=None):
        if self._arm is not None and self._arm[0] in key:
            substr, mode = self._arm
            self._arm = None
            self.faults_fired += 1
            if mode == "lost_request":
                raise InjectedFault(f"injected 503 before PUT {key}")
            self.inner.upload(key, payload, if_generation_match=if_generation_match)
            raise InjectedFault(f"injected timeout after PUT {key}")
        return self.inner.upload(key, payload, if_generation_match=if_generation_match)

    def __getattr__(self, name):  # download/list/delete/mtime/create_bucket
        return getattr(self.inner, name)


@pytest.fixture()
def flaky_parts():
    server = FakeGCSServer()
    endpoint = server.start()
    raw = HttpObjectStoreClient("crashbkt", endpoint)
    raw.create_bucket()
    client = FlakyClient(raw)
    store = PotStore(
        None,
        "warehouse/pots",
        backend=ConditionalPutBackend(client),
        fs=ObjectStoreFS(client),
    )
    yield client, store, raw
    server.stop()


def _fresh_reader(raw) -> PotStore:
    """A reader with NO shared state with the writer (new client objects
    over the same bucket) — what another node sees mid-crash."""
    reader_client = HttpObjectStoreClient(raw.bucket, raw.endpoint)
    return PotStore(
        None,
        "warehouse/pots",
        backend=ConditionalPutBackend(reader_client),
        fs=ObjectStoreFS(reader_client),
    )


def _assert_history_untorn(store: PotStore, path: str) -> int:
    """Every commit record parses and its snapshot reads completely;
    generations are a contiguous 1..N chain. Returns N."""
    pot_dir = store._pot_dir(path)
    commits = store._fs.join(pot_dir, "commits")
    gens = []
    for name in sorted(store._fs.listdir(commits)):
        if not name.endswith(".json"):
            continue
        rec = json.loads(store._fs.read_bytes(store._fs.join(commits, name)))
        gens.append(rec["generation"])
        content = store.get_at(path, rec["generation"])
        assert isinstance(content, dict)
        assert len(content) == rec["n_keys"]
    assert gens == list(range(1, len(gens) + 1))
    return len(gens)


def test_fault_during_snapshot_stage(flaky_parts):
    """5xx while uploading the snapshot parquet: the mutation fails, the
    pot stays at its old generation byte-identically, and the next
    writer proceeds cleanly."""
    client, store, raw = flaky_parts
    store.create("users", {"name": "ada", "v": 1})

    client.arm("part-00000.parquet", "lost_request")
    with pytest.raises(InjectedFault):
        store.create("users", {"name": "bob"})
    assert client.faults_fired == 1

    reader = _fresh_reader(raw)
    assert reader.get("users") == {"ada": {"name": "ada", "v": 1}}
    assert _assert_history_untorn(reader, "users") == 1

    # recovery: the same logical write goes through on retry
    store.create("users", {"name": "bob"})
    assert _fresh_reader(raw).get("users") == {
        "ada": {"name": "ada", "v": 1},
        "bob": {"name": "bob"},
    }
    assert _assert_history_untorn(reader, "users") == 2


def test_crash_between_stage_and_publish_then_vacuum(flaky_parts):
    """Writer dies after the snapshot is fully staged but before the
    conditional manifest PUT: readers see the old generation; the
    orphaned stage is invisible to every read path and is reclaimed by
    vacuum via objects.get metadata age."""
    client, store, raw = flaky_parts
    store.create("users", {"name": "ada"})

    client.arm("commits/", "lost_request")
    with pytest.raises(InjectedFault):
        store.create("users", {"name": "bob"})

    reader = _fresh_reader(raw)
    assert reader.get("users") == {"ada": {"name": "ada"}}
    assert _assert_history_untorn(reader, "users") == 1

    # the orphan IS in the bucket (fully staged), referenced by nothing
    pot_prefix = "warehouse/pots/users/_pot/"
    stages = {
        k[len(pot_prefix):].split("/", 1)[0]
        for k in raw.list(prefix=pot_prefix)
        if k[len(pot_prefix):].startswith("snap-")
    }
    assert len(stages) == 2  # committed gen-1 snapshot + the gen-2 orphan

    # vacuum on the READER (a different node) reclaims it once past the
    # grace window — and live data is untouched
    removed = reader.vacuum("users", grace_s=0.0)
    assert removed == 1
    assert reader.get("users") == {"ada": {"name": "ada"}}
    stages_after = {
        k[len(pot_prefix):].split("/", 1)[0]
        for k in raw.list(prefix=pot_prefix)
        if k[len(pot_prefix):].startswith("snap-")
    }
    assert len(stages_after) == 1

    # a young orphan (within grace) is left alone: might be in-flight
    client.arm("commits/", "lost_request")
    with pytest.raises(InjectedFault):
        store.create("users", {"name": "carol"})
    assert reader.vacuum("users", grace_s=3600.0) == 0


def test_publish_applied_but_response_lost(flaky_parts):
    """The ambiguous outcome: the conditional PUT lands server-side but
    the writer sees a timeout. The commit is COMPLETE (whole-object PUT
    is atomic), so readers observe a clean new generation; the writer's
    retry simply lands the next generation with last-writer-wins
    semantics (server.go:385-393)."""
    client, store, raw = flaky_parts
    store.create("users", {"name": "ada"})

    client.arm("commits/", "lost_response")
    with pytest.raises(InjectedFault):
        store.create("users", {"name": "bob"})

    reader = _fresh_reader(raw)
    # not torn: generation 2 exists, fully readable, content complete
    assert reader.get("users") == {"ada": {"name": "ada"}, "bob": {"name": "bob"}}
    assert _assert_history_untorn(reader, "users") == 2

    # the writer retries the SAME upsert: idempotent outcome, gen 3
    resp = store.create("users", {"name": "bob"})
    assert resp.generation == 3
    assert _fresh_reader(raw).get("users") == {
        "ada": {"name": "ada"},
        "bob": {"name": "bob"},
    }
    assert _assert_history_untorn(reader, "users") == 3


def test_fault_matrix_preserves_history_invariants(flaky_parts):
    """Sweep: inject each fault mode at each plane across a write
    sequence; after every step the full 1..N history stays contiguous,
    parseable, and completely readable, and a final vacuum+read agrees
    with a model dict."""
    client, store, raw = flaky_parts
    model: dict[str, dict] = {}

    plan = [
        (None, None),
        ("part-00000.parquet", "lost_request"),
        (None, None),
        ("commits/", "lost_request"),
        ("commits/", "lost_response"),
        (None, None),
        (".dirmarker", "lost_request"),
        (None, None),
    ]
    for i, (substr, mode) in enumerate(plan):
        doc = {"name": f"k{i}", "v": i}
        if substr is None:
            store.create("users", doc)
            model[f"k{i}"] = doc
        else:
            client.arm(substr, mode)
            try:
                store.create("users", doc)
                model[f"k{i}"] = doc  # fault hit a non-critical upload
            except InjectedFault:
                if mode == "lost_response" and substr == "commits/":
                    model[f"k{i}"] = doc  # server applied it
        reader = _fresh_reader(raw)
        assert reader.get("users") == model, (i, substr, mode)
        _assert_history_untorn(reader, "users")

    # vacuum reclaims superseded generations AND the crash orphans; the
    # live generation survives byte-identically
    reader = _fresh_reader(raw)
    before_gen = reader._latest_manifest("users").generation
    assert reader.vacuum("users", grace_s=0.0) > 0
    assert reader.get("users") == model
    assert reader._latest_manifest("users").generation == before_gen
    # exactly the live snapshot remains in the bucket
    pot_prefix = "warehouse/pots/users/_pot/"
    stages = {
        k[len(pot_prefix):].split("/", 1)[0]
        for k in raw.list(prefix=pot_prefix)
        if k[len(pot_prefix):].startswith("snap-")
    }
    assert len(stages) == 1


# ---------------------------------------------------------------------------
# Exactly-once stream sink under mid-epoch faults: the commit-then-mark
# ledger contract (streaming/sink.py) replayed exactly as a restarted
# foreachBatch would, with faults injected at both the pot commit and
# the ledger-marker PUT.
# ---------------------------------------------------------------------------


def _apply_epoch(spark, store, path: str, epoch_id: int, rows) -> None:
    """What start_pot_upsert_stream's _sink does per micro-batch —
    replayed here directly so faults and restarts are deterministic."""
    from pot_spark.streaming.sink import (
        _epoch_done,
        _mark_epoch_done,
        keyed_json,
    )

    batch_df = spark.createDataFrame(rows, "user string, v long")
    if _epoch_done(store, path, epoch_id):
        return
    store.create_df(path, keyed_json(batch_df, ["user"]))
    _mark_epoch_done(store, path, epoch_id)


def test_sink_exactly_once_under_mid_epoch_faults(flaky_parts, spark):
    """Four crash windows, one invariant: after replay the pot holds each
    epoch's writes exactly once (byte-identical content), and a marked
    epoch never re-applies."""
    client, store, raw = flaky_parts
    store = PotStore(
        spark,
        "warehouse/pots",
        backend=ConditionalPutBackend(client),
        fs=ObjectStoreFS(client),
    )
    path = "stream/users"

    # epoch 0: clean
    _apply_epoch(spark, store, path, 0, [("ada", 1)])
    assert store.get(path) == {"ada": {"user": "ada", "v": 1}}
    gen0 = store._latest_manifest(path).generation

    # epoch 1: fault DURING the pot commit (before it lands) -> replay
    # applies the epoch exactly once
    client.arm("commits/", "lost_request")
    with pytest.raises(InjectedFault):
        _apply_epoch(spark, store, path, 1, [("bob", 2)])
    assert _fresh_reader(raw).get(path) == {"ada": {"user": "ada", "v": 1}}
    _apply_epoch(spark, store, path, 1, [("bob", 2)])  # restart replay
    assert _fresh_reader(raw).get(path) == {
        "ada": {"user": "ada", "v": 1},
        "bob": {"user": "bob", "v": 2},
    }

    # epoch 2: crash AFTER the pot commit, BEFORE the marker -> the
    # replay re-applies an IDENTICAL keyed upsert (one redundant
    # generation, byte-same state) — the documented effectively-once
    # window of commit-then-mark
    client.arm("epochs/", "lost_request")
    with pytest.raises(InjectedFault):
        _apply_epoch(spark, store, path, 2, [("bob", 3)])
    content_mid = _fresh_reader(raw).get(path)
    assert content_mid["bob"] == {"user": "bob", "v": 3}  # commit landed
    gen_mid = store._latest_manifest(path).generation
    _apply_epoch(spark, store, path, 2, [("bob", 3)])  # restart replay
    assert _fresh_reader(raw).get(path) == content_mid  # byte-same
    assert store._latest_manifest(path).generation == gen_mid + 1

    # epoch 3: marker PUT applied but response lost -> the ledger HAS
    # the epoch; the replay must skip entirely (no extra generation)
    _apply_epoch(spark, store, path, 3, [("carol", 4)])
    gen3 = store._latest_manifest(path).generation
    client.arm("epochs/", "lost_response")
    # marker for epoch 4: commit lands, marker lands, response lost
    with pytest.raises(InjectedFault):
        _apply_epoch(spark, store, path, 4, [("dave", 5)])
    gen4 = store._latest_manifest(path).generation
    assert gen4 == gen3 + 1
    _apply_epoch(spark, store, path, 4, [("dave", 5)])  # replay: skipped
    assert store._latest_manifest(path).generation == gen4  # no re-apply
    assert _fresh_reader(raw).get(path)["dave"] == {"user": "dave", "v": 5}

    # a marked epoch replayed much later is still a no-op
    _apply_epoch(spark, store, path, 0, [("ada", 99)])
    assert _fresh_reader(raw).get(path)["ada"] == {"user": "ada", "v": 1}
    assert gen0 >= 1
