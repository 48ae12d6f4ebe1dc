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
    """FsspecBackend over a local fsspec-shaped fs: exclusive create wins
    once, losers get False, write failure rolls the claim back."""
    from tests.test_kv_multiprocess import LocalFsspecShim

    from pot_spark.kv.backend import FsspecBackend

    be = FsspecBackend(LocalFsspecShim(), prefix=str(tmp_path))
    assert be.put_if_absent("/c/1.json", b'{"generation": 1}') is True
    assert be.put_if_absent("/c/1.json", b'{"generation": 9}') is False
    with open(tmp_path / "c" / "1.json", "rb") as f:
        assert json.load(f)["generation"] == 1

    class ExplodingPayload(bytes):
        pass

    class BoomFS(LocalFsspecShim):
        def open(self, path, mode="rb"):
            f = super().open(path, mode)
            if "x" in mode:
                orig = f.write
                f.write = lambda b: (_ for _ in ()).throw(OSError("enospc"))
            return f

    be2 = FsspecBackend(BoomFS(), prefix=str(tmp_path))
    with pytest.raises(OSError):
        be2.put_if_absent("/c/2.json", b"data")
    # the failed claim was rolled back: a retry can still win
    assert not os.path.exists(tmp_path / "c" / "2.json")
    assert be.put_if_absent("/c/2.json", b'{"generation": 1}') is True


def test_fsspec_from_url_gates_on_import():
    from pot_spark.kv.backend import FsspecBackend

    with pytest.raises(ImportError, match="fsspec"):
        FsspecBackend.from_url("file:///tmp/x")
