"""Commit-backend seam (kv/backend.py): the put-if-absent contract each
backend must honor, and the adapter's mapping of conditional-put
precondition failures onto the protocol's lost-race signal."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from pot_spark.kv.backend import (
    ConditionalPutBackend,
    EmulatedObjectStoreClient,
    GCSBackend,
    LocalFSBackend,
    PreconditionFailed,
)


@pytest.fixture(params=["local", "object_store"])
def backend(request):
    if request.param == "local":
        return LocalFSBackend()
    return ConditionalPutBackend(EmulatedObjectStoreClient("/"))


def test_put_if_absent_contract(backend):
    d = tempfile.mkdtemp(prefix="pot_backend_")
    target = os.path.join(d, "commits", "00000000000000000001.json")
    assert backend.put_if_absent(target, b'{"generation": 1}') is True
    # the winner's content is fully visible immediately
    with open(target, "rb") as f:
        assert json.load(f)["generation"] == 1
    # a second put loses and must NOT clobber the winner
    assert backend.put_if_absent(target, b'{"generation": 999}') is False
    with open(target, "rb") as f:
        assert json.load(f)["generation"] == 1
    # no staging litter next to the target either way
    litter = [n for n in os.listdir(os.path.dirname(target)) if n != os.path.basename(target)]
    assert litter == []


def test_emulated_client_is_gcs_shaped():
    d = tempfile.mkdtemp(prefix="pot_emu_")
    client = EmulatedObjectStoreClient(d)
    client.upload("a/b.json", b"one", if_generation_match=0)
    with pytest.raises(PreconditionFailed):
        client.upload("a/b.json", b"two", if_generation_match=0)
    with open(os.path.join(d, "a/b.json"), "rb") as f:
        assert f.read() == b"one"
    # unconditional upload overwrites (GCS default semantics)
    client.upload("a/b.json", b"three")
    with open(os.path.join(d, "a/b.json"), "rb") as f:
        assert f.read() == b"three"
    # only the create-if-absent precondition is emulated
    with pytest.raises(NotImplementedError):
        client.upload("a/b.json", b"x", if_generation_match=7)


def test_gcs_backend_gates_on_import():
    # the real binding is optional; without the SDK the constructor must
    # fail loudly with the install hint, not at first commit
    with pytest.raises(ImportError, match="google-cloud-storage"):
        GCSBackend("some-bucket")


def test_fsspec_backend_contract(tmp_path):
    """FsspecBackend over a local fsspec-shaped fs: the claim sidecar
    wins once, losers get False, the committed manifest is complete
    content (mv commit point), write failure rolls both sidecars back,
    and no sidecar survives a successful commit."""
    from tests.test_kv_multiprocess import LocalFsspecShim

    from pot_spark.kv.backend import FsspecBackend

    be = FsspecBackend(LocalFsspecShim(), prefix=str(tmp_path))
    assert be.put_if_absent("/c/1.json", b'{"generation": 1}') is True
    assert be.put_if_absent("/c/1.json", b'{"generation": 9}') is False
    with open(tmp_path / "c" / "1.json", "rb") as f:
        assert json.load(f)["generation"] == 1
    # sidecars cleaned up; nothing dot-named for the lister to trip on
    assert sorted(os.listdir(tmp_path / "c")) == ["1.json"]

    class BoomFS(LocalFsspecShim):
        # fail the STAGING write (payload path), not the claim create:
        # the commit point is now the mv of complete staged content
        def open(self, path, mode="rb"):
            f = super().open(path, mode)
            if ".stage-" in path and "w" in mode:
                f.write = lambda b: (_ for _ in ()).throw(OSError("enospc"))
            return f

    be2 = FsspecBackend(BoomFS(), prefix=str(tmp_path))
    with pytest.raises(OSError):
        be2.put_if_absent("/c/2.json", b"data")
    # the failed write rolled back claim AND stage: a retry can still win
    assert not os.path.exists(tmp_path / "c" / "2.json")
    assert sorted(os.listdir(tmp_path / "c")) == ["1.json"]
    assert be.put_if_absent("/c/2.json", b'{"generation": 1}') is True


def test_fsspec_backend_truncated_writer_never_commits(tmp_path):
    """The round-7 advice scenario: a writer that hard-crashes after
    claiming but before publishing leaves NO manifest at the generation
    (liveness stall, not corruption); after the claim horizon a new
    writer reclaims and commits complete content."""
    from tests.test_kv_multiprocess import LocalFsspecShim

    from pot_spark.kv.backend import FsspecBackend

    class CrashFS(LocalFsspecShim):
        def mv(self, src, dst):  # die at the commit point
            raise KeyboardInterrupt("kill -9")

    be_crash = FsspecBackend(CrashFS(), prefix=str(tmp_path))
    with pytest.raises(KeyboardInterrupt):
        be_crash.put_if_absent("/c/1.json", b'{"generation": 1}')
    # no manifest and no truncated file — readers see "not committed"
    assert not os.path.exists(tmp_path / "c" / "1.json")

    # simulate a REALLY dead writer: claim left behind, past the horizon
    be_live = FsspecBackend(LocalFsspecShim(), prefix=str(tmp_path))
    claim = tmp_path / "c" / ".1.json.claim"
    claim.write_bytes(b"")
    old = 1_000_000_000  # 2001 — far past any horizon
    os.utime(claim, (old, old))
    assert be_live.put_if_absent("/c/1.json", b'{"generation": 1}') is True
    with open(tmp_path / "c" / "1.json", "rb") as f:
        assert json.load(f)["generation"] == 1

    # a LIVE claim (fresh mtime) is honored: everyone gets False
    claim2 = tmp_path / "c" / ".2.json.claim"
    claim2.write_bytes(b"")
    assert be_live.put_if_absent("/c/2.json", b'{"generation": 1}') is False

    # without `modified` support reclaim is disabled (conservative)
    class NoMtimeFS(LocalFsspecShim):
        modified = None

    be_nom = FsspecBackend(NoMtimeFS(), prefix=str(tmp_path))
    assert be_nom.put_if_absent("/c/2.json", b'{"generation": 1}') is False


def test_fsspec_stalled_writer_cannot_overwrite_reclaimer(tmp_path):
    """Round-8 advice (backend.py claim-horizon reclaim): a writer
    stalled past claim_horizon_s whose claim was reclaimed by a newer
    writer must NOT publish when it resumes — exactly one caller may
    return True. The stall is simulated by pausing the first writer at
    the staging write, letting a reclaimer run to completion, then
    resuming: the resumed writer must see its claim nonce replaced,
    abort with False, and leave the reclaimer's manifest intact."""
    from tests.test_kv_multiprocess import LocalFsspecShim

    from pot_spark.kv.backend import FsspecBackend

    results = {}

    class StallFS(LocalFsspecShim):
        """Pauses writer #1 between claim and publish by running the
        reclaimer inside the stalled writer's staging-write call."""

        def open(self, path, mode="rb"):
            if ".stage-" in path and "w" in mode and "stalled" not in results:
                results["stalled"] = True
                # age the stalled writer's claim past the horizon, then
                # let a second writer reclaim and commit while writer #1
                # is "paused" here
                claim = tmp_path / "c" / ".1.json.claim"
                os.utime(claim, (1_000_000_000, 1_000_000_000))
                be2 = FsspecBackend(LocalFsspecShim(), prefix=str(tmp_path))
                results["reclaimer"] = be2.put_if_absent(
                    "/c/1.json", b'{"writer": "reclaimer"}'
                )
            return super().open(path, mode)

    be1 = FsspecBackend(StallFS(), prefix=str(tmp_path))
    results["stalled_writer"] = be1.put_if_absent(
        "/c/1.json", b'{"writer": "stalled"}'
    )
    # exactly one winner: the reclaimer; the resumed writer lost
    assert results["reclaimer"] is True
    assert results["stalled_writer"] is False
    with open(tmp_path / "c" / "1.json", "rb") as f:
        assert json.load(f)["writer"] == "reclaimer"
    # no staging/claim litter from the aborted writer
    assert sorted(os.listdir(tmp_path / "c")) == ["1.json"]


def test_fsspec_from_url_gates_on_import():
    from pot_spark.kv.backend import FsspecBackend

    with pytest.raises(ImportError, match="fsspec"):
        FsspecBackend.from_url("file:///tmp/x")


def test_gcs_backend_maps_preconditions(monkeypatch):
    """Exercise GCSBackend's actual commit path against a faked
    google-cloud-storage SDK: win on create, False on the 412
    PreconditionFailed a losing conditional put raises, key =
    prefix + store-absolute target with slashes normalized."""
    import sys
    import types

    class FakePreconditionFailed(Exception):
        pass

    class FakeBlob:
        def __init__(self, store, key):
            self.store, self.key = store, key

        def upload_from_string(self, payload, if_generation_match=None):
            assert if_generation_match == 0  # the ONLY mode the commit uses
            if self.key in self.store:
                raise FakePreconditionFailed(self.key)
            self.store[self.key] = payload

    class FakeBucket:
        def __init__(self, store):
            self.store = store

        def blob(self, key):
            return FakeBlob(self.store, key)

    objects: dict[str, bytes] = {}

    class FakeClient:
        def bucket(self, name):
            assert name == "my-bucket"
            return FakeBucket(objects)

    gcloud = types.ModuleType("google.cloud")
    gcloud.storage = types.SimpleNamespace(Client=FakeClient)
    gapi = types.ModuleType("google.api_core")
    gexc = types.SimpleNamespace(PreconditionFailed=FakePreconditionFailed)
    gapi.exceptions = gexc
    groot = types.ModuleType("google")
    monkeypatch.setitem(sys.modules, "google", groot)
    monkeypatch.setitem(sys.modules, "google.cloud", gcloud)
    monkeypatch.setitem(sys.modules, "google.cloud.storage", gcloud.storage)
    monkeypatch.setitem(sys.modules, "google.api_core", gapi)
    monkeypatch.setitem(sys.modules, "google.api_core.exceptions", gexc)

    from pot_spark.kv.backend import GCSBackend

    be = GCSBackend("my-bucket", prefix="/pots/")
    assert be.put_if_absent("/race/mp/commits/1.json", b"one") is True
    assert objects == {"pots/race/mp/commits/1.json": b"one"}
    # a losing writer's 412 maps to False, content untouched
    assert be.put_if_absent("/race/mp/commits/1.json", b"two") is False
    assert objects["pots/race/mp/commits/1.json"] == b"one"


def test_gcs_backend_drives_store_occ(monkeypatch, tmp_path):
    """PotStore's OCC protocol runs end-to-end through GCSBackend (faked
    SDK over a dict 'bucket' that also materializes files locally so the
    store's readers see the committed manifests): two sequential
    writers, two generations, full replay."""
    import os
    import sys
    import types

    class FakePreconditionFailed(Exception):
        pass

    root = str(tmp_path)

    class FakeBlob:
        def __init__(self, key):
            self.key = key

        def upload_from_string(self, payload, if_generation_match=None):
            path = "/" + self.key
            if os.path.exists(path):
                raise FakePreconditionFailed(self.key)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(payload)

    class FakeBucket:
        def blob(self, key):
            return FakeBlob(key)

    class FakeClient:
        def bucket(self, name):
            return FakeBucket()

    gcloud = types.ModuleType("google.cloud")
    gcloud.storage = types.SimpleNamespace(Client=FakeClient)
    gapi = types.ModuleType("google.api_core")
    gexc = types.SimpleNamespace(PreconditionFailed=FakePreconditionFailed)
    gapi.exceptions = gexc
    monkeypatch.setitem(sys.modules, "google", types.ModuleType("google"))
    monkeypatch.setitem(sys.modules, "google.cloud", gcloud)
    monkeypatch.setitem(sys.modules, "google.cloud.storage", gcloud.storage)
    monkeypatch.setitem(sys.modules, "google.api_core", gapi)
    monkeypatch.setitem(sys.modules, "google.api_core.exceptions", gexc)

    from pot_spark.kv.backend import GCSBackend
    from pot_spark.kv.store import PotStore

    store = PotStore(None, root, backend=GCSBackend("any"))
    store.create("gcs/pot", {"id": "a", "v": 1})
    store.create("gcs/pot", {"id": "b", "v": 2})
    content = store.get("gcs/pot")
    assert set(content) == {"a", "b"}
    assert len(store.get_at("gcs/pot", 1)) == 1


def test_fsspec_from_url_resolves_prefix(monkeypatch, tmp_path):
    """from_url must wire (fs, resolved path prefix) through the same
    commit path the duck-typed constructor uses — exercised under a
    faked fsspec module."""
    import sys
    import types

    from tests.test_kv_multiprocess import LocalFsspecShim

    def get_fs_token_paths(url):
        assert url == f"file://{tmp_path}/pots"
        return LocalFsspecShim(), "token", [f"{tmp_path}/pots"]

    fake = types.ModuleType("fsspec")
    fake.get_fs_token_paths = get_fs_token_paths
    monkeypatch.setitem(sys.modules, "fsspec", fake)

    from pot_spark.kv.backend import FsspecBackend

    be = FsspecBackend.from_url(f"file://{tmp_path}/pots")
    assert be.put_if_absent("/c/1.json", b"one") is True
    assert be.put_if_absent("/c/1.json", b"two") is False
    with open(tmp_path / "pots" / "c" / "1.json", "rb") as f:
        assert f.read() == b"one"
