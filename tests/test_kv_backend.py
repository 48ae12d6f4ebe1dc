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
