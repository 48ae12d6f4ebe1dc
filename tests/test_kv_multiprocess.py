"""Cross-PROCESS commit safety: separate OS processes (separate PotStore
instances, no shared locks) racing upserts on one pot must all land via
the put-if-absent manifest commit — the property the reference gets from
GCS preconditions across server instances (server.go:670-702).

Parameterized over commit backends (kv/backend.py): the OCC protocol —
retry on a lost put, generation bump, single norewrite winner — must
hold through the SEAM, not just through the local-FS primitive, so the
same races run against LocalFSBackend and the conditional-put
object-store adapter (ConditionalPutBackend over the emulated
GCS-shaped client).
"""

from __future__ import annotations

import multiprocessing as mp
import tempfile

import pytest

BACKENDS = ["local", "object_store", "fsspec"]


class LocalFsspecShim:
    """Minimal fsspec-shaped filesystem over the local FS: ``open`` with
    "xb" is O_EXCL (atomic across processes), plus ``makedirs``/``rm`` —
    exactly the duck-typed surface FsspecBackend consumes, so the races
    exercise the FsspecBackend code path with real cross-process
    exclusive-create semantics and no fsspec dependency."""

    def makedirs(self, path, exist_ok=False):
        import os

        os.makedirs(path, exist_ok=exist_ok)

    def open(self, path, mode="rb"):
        return open(path, mode)

    def rm(self, path):
        import os

        os.remove(path)

    def exists(self, path):
        import os

        return os.path.exists(path)

    def mv(self, src, dst):
        import os

        os.replace(src, dst)

    def modified(self, path):
        import datetime
        import os

        return datetime.datetime.fromtimestamp(
            os.path.getmtime(path), tz=datetime.timezone.utc
        )


def _mk_store(root: str, backend_kind: str):
    from pot_spark.kv.backend import (
        ConditionalPutBackend,
        EmulatedObjectStoreClient,
        FsspecBackend,
    )
    from pot_spark.kv.store import PotStore

    if backend_kind == "local":
        return PotStore(None, root)
    if backend_kind == "fsspec":
        return PotStore(None, root, backend=FsspecBackend(LocalFsspecShim()))
    if backend_kind.startswith("bucket:"):
        # fully bucket-rooted: the DATA PLANE (manifest listing, snapshot
        # parquet) AND the conditional-put commit both cross the HTTP
        # socket — no filesystem anywhere in the store (r10 storefs seam)
        from pot_spark.kv.gcs_emulator import HttpObjectStoreClient
        from pot_spark.kv.storefs import ObjectStoreFS

        endpoint = backend_kind.split(":", 1)[1]
        client = HttpObjectStoreClient("racebkt", endpoint)
        return PotStore(
            None,
            root,
            backend=ConditionalPutBackend(client),
            fs=ObjectStoreFS(client),
        )
    # bucket mounted at the store root: conditional-put objects land
    # exactly where the store's readers list manifests
    return PotStore(
        None, root, backend=ConditionalPutBackend(EmulatedObjectStoreClient("/"))
    )


def _writer(args):
    root, i, backend_kind = args
    # fresh store per process: no shared in-process locks — only the
    # put-if-absent manifest create serializes these writers
    store = _mk_store(root, backend_kind)
    resp = store.create_batch(
        "race/mp", {f"p{i}-{j}": {"w": i, "j": j} for j in range(3)}
    )
    return i, resp.generation


@pytest.mark.parametrize("backend_kind", BACKENDS)
def test_cross_process_writers_all_commit(backend_kind, tmp_path):
    root = tempfile.mkdtemp(prefix=f"pot_mp_{backend_kind}_", dir=tmp_path)
    with mp.get_context("spawn").Pool(4) as pool:
        results = pool.map(_writer, [(root, i, backend_kind) for i in range(4)])

    store = _mk_store(root, backend_kind)
    gens = sorted(g for _, g in results)
    assert gens == [1, 2, 3, 4]  # every writer won exactly one generation
    content = store.get("race/mp")
    assert len(content) == 12
    assert {k for k in content} == {f"p{i}-{j}" for i in range(4) for j in range(3)}
    # history is fully replayable: each generation adds exactly one batch
    sizes = [len(store.get_at("race/mp", g)) for g in gens]
    assert sizes == [3, 6, 9, 12]


@pytest.mark.parametrize("backend_kind", BACKENDS)
def test_cross_process_norewrite_single_winner(backend_kind, tmp_path):
    """The reference's 5-client race (client_test.go:175-245), across
    processes: exactly one norewrite create wins, the rest see
    NoRewriteViolated, and the surviving value is the winner's."""
    root = tempfile.mkdtemp(prefix=f"pot_mp_nr_{backend_kind}_", dir=tmp_path)
    with mp.get_context("spawn").Pool(5) as pool:
        results = pool.map(_nr_writer, [(root, i, backend_kind) for i in range(5)])

    store = _mk_store(root, backend_kind)
    winners = [i for i, ok in results if ok]
    assert len(winners) == 1
    assert store.get("race/nr") == {"leader": {"id": "leader", "w": winners[0]}}


def _nr_writer(args):
    root, i, backend_kind = args
    from pot_spark.kv.errors import NoRewriteViolated

    store = _mk_store(root, backend_kind)
    try:
        store.create(
            "race/nr", {"id": "leader", "w": i}, norewrite=True, norewrite_duration=30.0
        )
        return i, True
    except NoRewriteViolated:
        return i, False


def test_mixed_backends_interoperate(tmp_path):
    """A pot written through the object-store backend is read and
    extended by a local-FS-backend store (and vice versa): the manifest
    layout is backend-independent — only the publish primitive differs."""
    root = tempfile.mkdtemp(prefix="pot_mp_mixed_", dir=tmp_path)
    obj = _mk_store(root, "object_store")
    local = _mk_store(root, "local")
    obj.create("mix/p", {"id": "a", "v": 1})
    assert local.get("mix/p") == {"a": {"id": "a", "v": 1}}
    local.create("mix/p", {"id": "b", "v": 2})
    assert obj.get("mix/p")["b"] == {"id": "b", "v": 2}
    assert [g for g, _ in obj.list_generations("mix/p")] == [1, 2]


def test_cross_process_writers_all_commit_bucket_rooted():
    """The full-commit race with the store ENTIRELY in a bucket: four
    separate OS processes race create_batch over real HTTP — staged
    snapshot uploads, manifest listing, and the ifGenerationMatch=0
    commit all cross the socket. Every writer must win exactly one
    generation and history must replay, exactly like the filesystem
    backends (the reference's multi-server GCS deployment model)."""
    from pot_spark.kv.gcs_emulator import FakeGCSServer, HttpObjectStoreClient

    server = FakeGCSServer()
    endpoint = server.start()
    try:
        HttpObjectStoreClient("racebkt", endpoint).create_bucket()
        kind = f"bucket:{endpoint}"
        with mp.get_context("spawn").Pool(4) as pool:
            results = pool.map(
                _writer, [("warehouse/pots", i, kind) for i in range(4)]
            )
        store = _mk_store("warehouse/pots", kind)
        gens = sorted(g for _, g in results)
        assert gens == [1, 2, 3, 4]
        content = store.get("race/mp")
        assert {k for k in content} == {
            f"p{i}-{j}" for i in range(4) for j in range(3)
        }
        sizes = [len(store.get_at("race/mp", g)) for g in gens]
        assert sizes == [3, 6, 9, 12]
    finally:
        server.stop()


def test_cross_process_norewrite_single_winner_bucket_rooted():
    """The reference's 5-client lease race, bucket-rooted end-to-end:
    exactly one norewrite create wins over the HTTP conditional put."""
    from pot_spark.kv.gcs_emulator import FakeGCSServer, HttpObjectStoreClient

    server = FakeGCSServer()
    endpoint = server.start()
    try:
        HttpObjectStoreClient("racebkt", endpoint).create_bucket()
        kind = f"bucket:{endpoint}"
        with mp.get_context("spawn").Pool(5) as pool:
            results = pool.map(
                _nr_writer, [("warehouse/pots", i, kind) for i in range(5)]
            )
        store = _mk_store("warehouse/pots", kind)
        winners = [i for i, ok in results if ok]
        assert len(winners) == 1
        assert store.get("race/nr") == {
            "leader": {"id": "leader", "w": winners[0]}
        }
    finally:
        server.stop()
