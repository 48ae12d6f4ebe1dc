"""In-process GCS emulator: the JSON-API subset the commit protocol
touches, served over REAL HTTP — plus an SDK-free client speaking it.

Why this exists: the put-if-absent seam (backend.py) is only truly
exercised end-to-end when the conditional put crosses a process/socket
boundary and the 412 comes back over the wire. fake-gcs-server provides
that on a provisioned CI host (tests/test_kv_gcs_emulator.py uses it
via ``STORAGE_EMULATOR_HOST`` with the real google-cloud-storage SDK
when installed); this module provides the same boundary with zero
dependencies, so the multiprocess commit race runs over HTTP in any
container.

API subset (matching GCS JSON API shapes, the same endpoints
fake-gcs-server serves — public API documented at
https://cloud.google.com/storage/docs/json_api):

- ``GET  /storage/v1/b``                      list buckets (probe)
- ``POST /storage/v1/b``                      create bucket
- ``GET  /storage/v1/b/{b}``                  lookup bucket
- ``POST /upload/storage/v1/b/{b}/o``         media upload; honors
  ``ifGenerationMatch=0`` with **412** when the object exists — the
  one precondition the commit protocol uses
- ``GET  /storage/v1/b/{b}/o/{obj}?alt=media`` download
- ``GET  /storage/v1/b/{b}/o?prefix=...``      list objects (names)
- ``DELETE /storage/v1/b/{b}/o/{obj}``         delete (404 if missing)

The list/delete endpoints exist for the object-store DATA PLANE
(kv/storefs.py ObjectStoreFS): snapshot parquet + manifest listing run
against the same bucket the conditional-put commit writes to, so a
bucket-rooted PotStore round-trips end-to-end over real HTTP.

The precondition check and the object write happen under one lock, so
concurrent uploads of the same key see exactly-one-winner semantics —
what real GCS guarantees for ``if_generation_match=0``.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pot_spark.kv.backend import PreconditionFailed


def _rfc3339(epoch: float) -> str:
    """GCS's ``updated`` timestamp shape (objects.get metadata)."""
    stamp = datetime.fromtimestamp(epoch, tz=timezone.utc)
    return stamp.isoformat().replace("+00:00", "Z")


def _parse_rfc3339(s: str) -> float:
    return datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp()


class FakeGCSServer:
    """Threaded HTTP server over an in-memory object map. Start binds an
    ephemeral localhost port; ``endpoint`` is the STORAGE_EMULATOR_HOST
    value clients use."""

    def __init__(self, page_size: int | None = None) -> None:
        self._objects: dict[tuple[str, str], bytes] = {}
        self._updated: dict[tuple[str, str], float] = {}
        self._buckets: set[str] = set()
        self._lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        #: server-side page cap for objects.list when the request sends
        #: no maxResults (None = GCS's 1000). Tests set a tiny value to
        #: force multi-page listings through clients.
        self.page_size = page_size

    # -- lifecycle ---------------------------------------------------
    def start(self) -> str:
        objects, buckets, lock = self._objects, self._buckets, self._lock
        updated = self._updated
        page_size = lambda: self.page_size  # noqa: E731 — live read, tests mutate it

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _reply(self, code: int, body: dict | bytes | None = None):
                payload = (
                    body
                    if isinstance(body, bytes)
                    else json.dumps(body or {}).encode()
                )
                self.send_response(code)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):
                url = urllib.parse.urlparse(self.path)
                parts = url.path.strip("/").split("/")
                if url.path == "/storage/v1/b":
                    self._reply(200, {"items": sorted(buckets)})
                elif parts[:2] == ["storage", "v1"] and len(parts) == 4:
                    # /storage/v1/b/{bucket}
                    self._reply(200 if parts[3] in buckets else 404)
                elif parts[:2] == ["storage", "v1"] and len(parts) == 5:
                    # /storage/v1/b/{bucket}/o?prefix=...  (list) —
                    # paged like real GCS objects.list: results are
                    # name-ordered, capped at maxResults (default 1000),
                    # truncation signalled via nextPageToken which the
                    # caller echoes back as pageToken. The token is the
                    # last name of the page (resume strictly after it) —
                    # opaque to clients, like GCS's.
                    qs = urllib.parse.parse_qs(url.query)
                    prefix = qs.get("prefix", [""])[0]
                    after = qs.get("pageToken", [None])[0]
                    cap = int(qs.get("maxResults", [0])[0] or 0)
                    cap = min(cap, 1000) if cap > 0 else (page_size() or 1000)
                    bucket = parts[3]
                    with lock:
                        names = sorted(
                            k
                            for (b, k) in objects
                            if b == bucket
                            and k.startswith(prefix)
                            and (after is None or k > after)
                        )
                    body = {"items": [{"name": n} for n in names[:cap]]}
                    if len(names) > cap:
                        body["nextPageToken"] = names[cap - 1]
                    self._reply(200, body)
                elif parts[:2] == ["storage", "v1"] and len(parts) == 6:
                    # /storage/v1/b/{bucket}/o/{object} — ?alt=media
                    # downloads bytes; without it, object METADATA JSON
                    # (name/updated), like the real objects.get
                    qs = urllib.parse.parse_qs(url.query)
                    key = (parts[3], urllib.parse.unquote(parts[5]))
                    with lock:
                        blob = objects.get(key)
                        stamp = updated.get(key)
                    if blob is None:
                        self._reply(404)
                    elif qs.get("alt", [""])[0] == "media":
                        self._reply(200, blob)
                    else:
                        self._reply(
                            200,
                            {
                                "name": key[1],
                                "updated": _rfc3339(stamp or 0.0),
                            },
                        )
                else:
                    self._reply(404)

            def do_POST(self):
                url = urllib.parse.urlparse(self.path)
                qs = urllib.parse.parse_qs(url.query)
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                parts = url.path.strip("/").split("/")
                if url.path == "/storage/v1/b":
                    name = json.loads(body or b"{}").get("name", "")
                    with lock:
                        buckets.add(name)
                    self._reply(200, {"name": name})
                elif parts[:3] == ["upload", "storage", "v1"] and len(parts) == 6:
                    # /upload/storage/v1/b/{bucket}/o?name=...&ifGenerationMatch=0
                    bucket = parts[4]
                    obj = urllib.parse.unquote(qs.get("name", [""])[0])
                    gen_match = qs.get("ifGenerationMatch", [None])[0]
                    with lock:
                        if gen_match == "0" and (bucket, obj) in objects:
                            self._reply(
                                412,
                                {"error": {"code": 412,
                                           "message": "conditionNotMet"}},
                            )
                            return
                        objects[(bucket, obj)] = body
                        updated[(bucket, obj)] = time.time()
                    self._reply(200, {"name": obj, "generation": "1"})
                else:
                    self._reply(404)

            def do_DELETE(self):
                url = urllib.parse.urlparse(self.path)
                parts = url.path.strip("/").split("/")
                if parts[:2] == ["storage", "v1"] and len(parts) == 6:
                    key = (parts[3], urllib.parse.unquote(parts[5]))
                    with lock:
                        existed = objects.pop(key, None) is not None
                        updated.pop(key, None)
                    self._reply(204 if existed else 404)
                else:
                    self._reply(404)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()


class HttpObjectStoreClient:
    """SDK-free GCS-JSON-API client with the same GCS-shaped ``upload``
    protocol as EmulatedObjectStoreClient — 412 over the wire maps to
    :class:`PreconditionFailed`, so ``ConditionalPutBackend`` runs the
    genuine commit path against any ``STORAGE_EMULATOR_HOST`` endpoint
    (FakeGCSServer here, fake-gcs-server in CI) without
    google-cloud-storage installed."""

    def __init__(self, bucket: str, endpoint: str) -> None:
        self.bucket = bucket
        self.endpoint = endpoint.rstrip("/")

    def create_bucket(self) -> None:
        req = urllib.request.Request(
            f"{self.endpoint}/storage/v1/b",
            data=json.dumps({"name": self.bucket}).encode(),
            method="POST",
        )
        urllib.request.urlopen(req, timeout=10)

    def upload(
        self, key: str, payload: bytes, if_generation_match: int | None = None
    ) -> None:
        name = urllib.parse.quote(key.lstrip("/"), safe="")
        url = (
            f"{self.endpoint}/upload/storage/v1/b/{self.bucket}/o"
            f"?uploadType=media&name={name}"
        )
        if if_generation_match is not None:
            url += f"&ifGenerationMatch={if_generation_match}"
        req = urllib.request.Request(url, data=payload, method="POST")
        try:
            urllib.request.urlopen(req, timeout=10)
        except urllib.error.HTTPError as e:
            if e.code == 412:
                raise PreconditionFailed(key) from e
            raise

    def download(self, key: str) -> bytes:
        """Raises FileNotFoundError on 404 — the dict-like miss signal
        the data plane's manifest/snapshot readers branch on."""
        name = urllib.parse.quote(key.lstrip("/"), safe="")
        url = (
            f"{self.endpoint}/storage/v1/b/{self.bucket}/o/{name}?alt=media"
        )
        try:
            return urllib.request.urlopen(url, timeout=10).read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(key) from e
            raise

    def list(self, prefix: str = "", max_results: int | None = None) -> list[str]:
        """Object names under ``prefix`` (flat namespace, GCS
        ``objects.list`` shape). Follows ``nextPageToken`` to
        exhaustion: real GCS (and fake-gcs-server) page at
        maxResults=1000, and a silently-truncated first page would make
        _latest_manifest's max() return a stale generation and make
        rmtree/copytree skip objects.

        ``max_results`` maps to the public ``maxResults`` parameter and
        stops paging once that many names are in hand — existence
        probes (ObjectStoreFS.exists on the bucket root) pass 1 instead
        of draining every page of a large bucket."""
        q = urllib.parse.quote(prefix.lstrip("/"), safe="")
        base = f"{self.endpoint}/storage/v1/b/{self.bucket}/o?prefix={q}"
        if max_results is not None:
            base += f"&maxResults={int(max_results)}"
        names: list[str] = []
        token: str | None = None
        while True:
            url = base if token is None else (
                f"{base}&pageToken={urllib.parse.quote(token, safe='')}"
            )
            body = json.loads(urllib.request.urlopen(url, timeout=10).read())
            names.extend(item["name"] for item in body.get("items", []))
            token = body.get("nextPageToken")
            if not token or (
                max_results is not None and len(names) >= max_results
            ):
                # honor the documented GCS maxResults contract even when
                # the last page overshoots — callers must never receive
                # more names than they asked for (round-12 advice item)
                if max_results is not None:
                    return names[:max_results]
                return names

    def mtime(self, key: str) -> float:
        """Last-modified epoch seconds from objects.get METADATA (the
        public ``updated`` field — no ``alt=media``). Lets vacuum age
        unreferenced stage dirs on bucket-rooted stores instead of
        skipping them forever (the mtime-less conservative path)."""
        name = urllib.parse.quote(key.lstrip("/"), safe="")
        url = f"{self.endpoint}/storage/v1/b/{self.bucket}/o/{name}"
        try:
            body = json.loads(urllib.request.urlopen(url, timeout=10).read())
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(key) from e
            raise
        return _parse_rfc3339(body["updated"])

    def delete(self, key: str) -> None:
        """Delete; missing keys are a silent no-op (rmtree semantics)."""
        name = urllib.parse.quote(key.lstrip("/"), safe="")
        url = f"{self.endpoint}/storage/v1/b/{self.bucket}/o/{name}"
        req = urllib.request.Request(url, method="DELETE")
        try:
            urllib.request.urlopen(req, timeout=10)
        except urllib.error.HTTPError as e:
            if e.code != 404:
                raise
