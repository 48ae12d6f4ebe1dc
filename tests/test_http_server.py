"""HTTP parity shim vs the reference's client/server flow
(client_test.go TestFlow/TestElection/TestListPaths + server_routes.go
status contract): GET / GET :list / POST (batch, norewrite, generation)
/ DELETE, 201 on create, 423 Locked on a no-rewrite violation."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from pot_spark.kv import PotStore
from pot_spark.kv.http_server import parse_go_duration, serve


@pytest.fixture()
def srv(tmp_path):
    store = PotStore(None, str(tmp_path / "potroot"))
    server = serve(store, port=0)
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}", store
    server.shutdown()


def _req(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as r:
            raw = r.read()
            return r.status, json.loads(raw) if raw.strip() else None
    except urllib.error.HTTPError as e:
        return e.code, None


def test_flow_get_create_remove(srv):
    base, _ = srv
    # empty pot reads as {}
    assert _req(f"{base}/test/path") == (200, {})
    # single-doc POST: key derived id-over-name, 201 + CreateResponse
    obj = {"id": "test", "age": 10, "path": ["a", "b"]}
    status, resp = _req(f"{base}/test/path", "POST", obj)
    assert status == 201
    assert resp["content"] == {"test": obj}
    assert resp["generation"] == 1
    status, content = _req(f"{base}/test/path")
    assert status == 200 and content == {"test": obj}
    # DELETE ?key= removes; pot reads empty again
    status, _ = _req(f"{base}/test/path?key=test", "DELETE")
    assert status == 200
    assert _req(f"{base}/test/path") == (200, {})


def test_list_suffix_dispatch(srv):
    base, _ = srv
    assert _req(f"{base}/test/path:list") == (200, {"paths": []})
    _req(f"{base}/test/path", "POST", {"id": "x"})
    assert _req(f"{base}/test/path:list") == (200, {"paths": ["test/path"]})
    assert _req(f"{base}/other:list") == (200, {"paths": []})


def test_batch_post_is_two_level_map(srv):
    base, _ = srv
    docs = {"a": {"v": 1}, "b": {"v": 2}}
    status, resp = _req(f"{base}/b/p?batch", "POST", docs)
    assert status == 201 and resp["content"] == docs
    assert _req(f"{base}/b/p")[1] == docs


def test_norewrite_election_returns_423_locked(srv):
    base, _ = srv
    winner = {"id": "leader", "holder": "w0"}
    status, resp = _req(f"{base}/e/p?norewrite=1m", "POST", winner)
    assert status == 201
    gen = resp["generation"]
    # a second writer without the generation loses with 423 Locked
    status, _ = _req(f"{base}/e/p?norewrite=1m", "POST",
                     {"id": "leader", "holder": "w1"})
    assert status == 423
    assert _req(f"{base}/e/p")[1]["leader"]["holder"] == "w0"
    # the holder renews by generation ownership (server_routes.go:95-103)
    status, resp = _req(
        f"{base}/e/p?norewrite=1m&generation={gen}", "POST",
        {"id": "leader", "holder": "w0", "turn": 2},
    )
    assert status == 201 and resp["generation"] == gen + 1


def test_unparseable_duration_means_zero_lease(srv):
    base, _ = srv
    _req(f"{base}/d/p?norewrite=bogus", "POST", {"id": "k"})
    # duration 0 -> rewrite allowed immediately (lease expired by rule)
    status, _ = _req(f"{base}/d/p?norewrite=bogus", "POST", {"id": "k", "v": 2})
    assert status == 201


def test_parse_go_duration():
    assert parse_go_duration("1m30s") == 90.0
    assert parse_go_duration("500ms") == 0.5
    assert parse_go_duration("2h") == 7200.0
    assert parse_go_duration("1.5s") == 1.5
    assert parse_go_duration("bogus") == 0.0
    assert parse_go_duration("") == 0.0


def test_post_then_zip_trigger(tmp_path):
    import os

    store = PotStore(None, str(tmp_path / "zr"))
    server = serve(store, port=0, zip_dest="archive")
    host, port = server.server_address[:2]
    try:
        _req(f"http://{host}:{port}/z/p", "POST", {"id": "k"})
        assert os.path.exists(
            os.path.join(store.root, "archive", "bundle.tar.gz")
        )
    finally:
        server.shutdown()


def test_metrics_endpoint(srv):
    base, store = srv
    _req(f"{base}/mm/p", "POST", {"id": "k"})
    _req(f"{base}/mm/p")
    status, m = _req(f"{base}/:metrics")
    assert status == 200
    assert m["pot_writes"] >= 1 and m["pot_reads"] >= 1
