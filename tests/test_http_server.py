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
    # span export rides along (otel.go:70-98 trace parity)
    assert m["pot_span_create_calls"] >= 1
    assert m["pot_span_local_lock_seconds_total"] <= m["pot_span_create_seconds_total"]


def test_path_traversal_rejected_with_400(srv, tmp_path):
    """A `..` segment (bare or percent-encoded) must never reach the
    filesystem: the reference's GCS namespace is traversal-immune, so
    the shim has to enforce the same property itself."""
    base, store = srv
    import os

    for evil in ("/../evil", "/a/../../evil", "/%2e%2e/evil", "/a/%2E%2E/%2e%2e/evil"):
        status, _ = _req(f"{base}{evil}", "POST", {"id": "x"})
        assert status == 400, evil
        assert _req(f"{base}{evil}")[0] == 400, evil
        assert _req(f"{base}{evil}?key=x", "DELETE")[0] == 400, evil
    # nothing escaped the store root: the parent of root gained no entries
    parent = os.path.dirname(store.root)
    assert not os.path.exists(os.path.join(parent, "evil"))
    # and a normal path still works after the rejected attempts
    assert _req(f"{base}/ok/p", "POST", {"id": "x"})[0] == 201


def test_store_rejects_traversal_paths(tmp_path):
    """Defense in depth: PotStore._pot_dir itself refuses to resolve a
    path outside the root, independent of the HTTP layer."""
    store = PotStore(None, str(tmp_path / "potroot"))
    for evil in ("../evil", "a/../../evil", "../../etc"):
        with pytest.raises(ValueError, match="escapes the store root"):
            store.get(evil)
        with pytest.raises(ValueError, match="escapes the store root"):
            store.create(evil, {"id": "x"})
    # interior `..` that stays inside the root is legal path algebra
    store.create("a/b/../c", {"id": "x"})
    assert store.get("a/c") == {"x": {"id": "x"}}


def test_commit_conflict_maps_to_412(srv):
    """readme.md:128 contract: commit contention surfaces as 412
    Precondition Failed, not a generic 500."""
    base, store = srv
    from pot_spark.kv.errors import CommitConflict

    def boom(*a, **k):
        raise CommitConflict("commit contention on 'x' exceeded retries")

    store.create = boom
    store.remove = boom
    assert _req(f"{base}/c/p", "POST", {"id": "x"})[0] == 412
    assert _req(f"{base}/c/p?key=x", "DELETE")[0] == 412


def test_shim_survives_junk_requests(srv):
    """Hostile-input posture for the network surface: malformed JSON,
    non-object bodies, empty bodies, unknown methods, and bare junk
    bytes must produce clean 4xx/5xx responses — never kill the server.
    A valid request afterwards still works."""
    import http.client
    import urllib.error
    import urllib.request

    base, _ = srv
    host_port = base[len("http://"):]

    def raw_status(method, path, body=None, headers=None):
        conn = http.client.HTTPConnection(host_port, timeout=10)
        try:
            conn.request(method, path, body=body, headers=headers or {})
            return conn.getresponse().status
        finally:
            conn.close()

    assert raw_status("POST", "/j/p", b"{not json") == 500
    assert raw_status("POST", "/j/p", b"[1, 2, 3]") == 500  # not an object
    # empty body = json decode error, like the reference's Decoder EOF
    # (server.go:343-345)
    assert raw_status("POST", "/j/p", b"") == 500
    assert raw_status("POST", "/j/p?batch", b'{"k": 42}') == 500  # doc not a map
    assert raw_status("PUT", "/j/p", b"{}") == 501  # unimplemented method
    # junk query strings parse leniently, never crash
    assert raw_status("GET", "/j/p?%%%=&&&") == 200
    # oversized declared Content-Length with a short body: the read
    # blocks until the client closes; the server thread must survive
    try:
        urllib.request.urlopen(
            urllib.request.Request(
                f"{base}/j/p",
                data=b"{}",
                method="POST",
                headers={"Content-Length": "10"},
            ),
            timeout=2,
        )
    except (urllib.error.URLError, TimeoutError, OSError):
        pass  # client-side timeout is fine; server must stay up
    # the server is still alive and correct after all of the above
    assert _req(f"{base}/j/q", "POST", {"id": "ok"})[0] == 201
    assert _req(f"{base}/j/q")[1] == {"ok": {"id": "ok"}}


def test_concurrent_writes_with_vacuum_and_compact(srv):
    """Maintenance under write load: four HTTP writers hammer distinct
    keys while vacuum+compact cycle concurrently. Invariants: no
    request errors, every writer's LAST value is the final state of its
    key, and the pot stays readable throughout (no reclaimed-snapshot
    reads, no truncated manifests)."""
    import threading

    base, store = srv
    errors: list = []
    last: dict[str, int] = {}
    stop = threading.Event()

    def writer(wid):
        i = 0
        while not stop.is_set():
            i += 1
            status, _ = _req(
                f"{base}/vc/p", "POST", {"id": f"k{wid}", "v": i}
            )
            if status != 201:
                errors.append((wid, i, status))
                return
            last[f"k{wid}"] = i

    def maintainer():
        while not stop.is_set():
            try:
                store.vacuum("vc/p", grace_s=0.0)
                store.compact("vc/p")
                content = store.get("vc/p")  # must stay readable
                assert isinstance(content, dict)
            except Exception as e:  # noqa: BLE001
                errors.append(("maint", str(e)))
                return

    ts = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    ts.append(threading.Thread(target=maintainer))
    for t in ts:
        t.start()
    import time as _time

    _time.sleep(2.0)
    stop.set()
    for t in ts:
        t.join()
    assert errors == []
    final = _req(f"{base}/vc/p")[1]
    for key, v in last.items():
        assert final[key]["v"] == v, key


def test_http_contention_exactly_one_winner(srv):
    """Two clients racing a norewrite create over HTTP (the
    client_test.go:175-245 race, client/server-split): exactly one 201,
    the loser sees 423 per the reference's status contract."""
    import threading

    base, _ = srv
    results = {}

    def attempt(who):
        results[who] = _req(
            f"{base}/race/p?norewrite=1m", "POST", {"id": "leader", "holder": who}
        )[0]

    ts = [threading.Thread(target=attempt, args=(w,)) for w in ("w0", "w1")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(results.values()) == [201, 423]
    # the pot holds exactly the winner's doc
    winner = [w for w, s in results.items() if s == 201][0]
    assert _req(f"{base}/race/p")[1]["leader"]["holder"] == winner
