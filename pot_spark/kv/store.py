"""PotStore: path-scoped key->JSON-document store over versioned parquet
snapshots with an atomic put-if-absent commit manifest.

Semantics mirror the reference exactly (citations against
/root/reference):

- upsert derives the key from the doc's `name`, overridden by `id`
  (server.go:347-354); non-string key raises TypeError (the reference
  panics on the type assertion, server.go:350/353); a doc with neither
  gets key "" (Go zero value).
- upsert is last-writer-wins per key, unrelated keys preserved
  (server.go:385-393); batch bodies are applied atomically
  (server.go:334-339, 411-423).
- Get of a missing pot returns empty, not an error (server.go:468-491).
- Remove silently ignores missing keys and (re)writes the pot even when
  it didn't exist (server.go:494-548).
- no-rewrite: with an existing pot, rewriting an existing key is blocked
  iff norewrite is set AND duration > 0 AND NOT (committed_at + d < now)
  (canRewrite, server.go:262-264), UNLESS the caller holds the current
  generation (server.go:379-382). New keys are never blocked; the first
  conflicting key fails the whole request before anything is written
  (server.go:385-393). A missing pot skips the check entirely
  (server.go:369-371).
- ListPaths is a raw string-prefix filter and can never report a
  root-level pot (suffix match on "/data.json", server.go:432-466).

Storage model (the Spark-first replacement for one whole-rewritten
data.json object per pot, server.go:212-214, 396-400):

    <root>/<path>/_pot/commits/<generation>.json   -- manifest, O_EXCL
    <root>/<path>/_pot/snap-<generation>-<nonce>/  -- parquet snapshot

The commit record is the commit point: writers stage a full snapshot,
then publish with a put-if-absent manifest create. Losers re-read fresh
state and retry (optimistic concurrency; the Delta-Lake-style protocol
replaces the reference's GCS generation preconditions, server.go:670-702).
The primitive is pluggable (kv/backend.py): LocalFSBackend (staged write
+ fsync + os.link) by default, or a conditional-put object-store backend
(GCS `if_generation_match=0` / S3+ABS `If-None-Match: *`) — the same
primitive the reference uses for its .potlock. Generation numbers are
the manifest versions (server.go:405).

Data plane: per-doc dict APIs write/read snapshots via pyarrow (a pot
mutation is a metadata-scale operation; spinning a Spark job per PUT
would add nothing), while `create_df`/`get_df` move bulk data through
Spark DataFrames — both produce the identical (key, doc) parquet layout,
so a pot written by either path is readable by both. At 100 TB a pot is
a table: bulk upserts go through `create_df` (left_anti + union, one
shuffle on key), and `get_typed` projects the JSON documents to a typed
DataFrame for the relational layer.
"""

from __future__ import annotations

import json
import logging
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Optional

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pot_spark.kv.backend import CommitBackend, LocalFSBackend
from pot_spark.kv.errors import CommitConflict, NoRewriteViolated
from pot_spark.kv.storefs import LocalStoreFS

_LOG = logging.getLogger("pot_spark.kv")

_POT_DIRNAME = "_pot"
_COMMITS = "commits"
_MAX_COMMIT_RETRIES = 32

DOC_SCHEMA = "key string, doc string"
_ARROW_SCHEMA = pa.schema([("key", pa.string()), ("doc", pa.string())])


@dataclass
class CreateResponse:
    """Mirror of the reference's CreateResponse (server.go:267-270)."""

    content: dict[str, Any]
    generation: int


@dataclass
class StoreMetrics:
    """The reference's observability surface (server.go:64-81, 104-168):
    pot_writes/reads/lists/removes counters plus the local-lock wait
    histogram, reduced to its mean, plus per-phase span accumulators
    mirroring the reference's trace() spans (otel.go:70-98,
    server.go:273-313: create / local-lock / read / write / commit).
    On a cluster these would feed a SparkListener/metrics sink; the
    counters themselves are the contract.

    All mutation goes through bump()/observe_span(), which hold a lock:
    the HTTP shim's ThreadingHTTPServer drives the store from concurrent
    request threads, and bare ``+=`` on the counters loses increments."""

    writes: int = 0
    reads: int = 0
    lists: int = 0
    removes: int = 0
    lock_wait_s: float = 0.0
    lock_acquisitions: int = 0
    span_seconds: dict = field(default_factory=dict)
    span_calls: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        self._guard = threading.Lock()
        self._span_listeners: list = []

    def bump(self, **deltas: float) -> None:
        """Atomically add each delta to the named counter."""
        with self._guard:
            for k, v in deltas.items():
                setattr(self, k, getattr(self, k) + v)

    def add_span_listener(self, fn) -> None:
        """Register a per-call span callback ``fn(name, seconds)`` — the
        hook a host uses to emit REAL spans (OTel, statsd timers) with
        per-call latency attribution, which the aggregated sums below
        cannot reconstruct. Mirrors the reference wiring trace() into
        its OTel tracer (server.go:704-712, otel.go)."""
        with self._guard:
            self._span_listeners.append(fn)

    def observe_span(self, name: str, seconds: float) -> None:
        """Accumulate one timed phase (the reference's trace() span,
        server.go:704-712, reduced to a sum + call count per phase) and
        fan it out to any registered per-call listeners."""
        with self._guard:
            self.span_seconds[name] = self.span_seconds.get(name, 0.0) + seconds
            self.span_calls[name] = self.span_calls.get(name, 0) + 1
            listeners = list(self._span_listeners)
        for fn in listeners:  # outside the lock: a slow sink must not
            try:  #            serialize the store's mutation path
                fn(name, seconds)
            except Exception:  # noqa: BLE001 - a raising sink must never
                pass  # fail a mutation that has already committed

    @property
    def avg_local_lock_duration_ms(self) -> float:
        if not self.lock_acquisitions:
            return 0.0
        return self.lock_wait_s / self.lock_acquisitions * 1000.0

    def as_dict(self) -> dict[str, float]:
        """Export the counters as a flat dict — the reference's OTel
        metric export (otel.go:70-98) without the dependency: feed this
        to any metrics sink (StatsD, Prometheus textfile, a Spark
        custom metric source) on whatever cadence the host wants."""
        with self._guard:
            out = {
                "pot_writes": self.writes,
                "pot_reads": self.reads,
                "pot_lists": self.lists,
                "pot_removes": self.removes,
                "pot_local_lock_wait_seconds_total": self.lock_wait_s,
                "pot_local_lock_acquisitions": self.lock_acquisitions,
                "pot_local_lock_duration_avg_ms": self.avg_local_lock_duration_ms,
            }
            for name in sorted(self.span_seconds):
                out[f"pot_span_{name}_seconds_total"] = self.span_seconds[name]
                out[f"pot_span_{name}_calls"] = self.span_calls[name]
            return out


@dataclass
class _Manifest:
    generation: int
    committed_at: float
    snapshot: str
    n_keys: int
    # bucketed layout: {bucket_id: dir relative to the pot dir}; buckets
    # untouched by a commit keep pointing at earlier snapshots' files
    # (Delta-style file reuse -> O(delta) mutations, not O(table))
    files: Optional[dict[str, str]] = None


def derive_key(doc: dict[str, Any]) -> str:
    """`name` first, `id` overrides (server.go:347-354); zero-value key
    when neither is present; non-string raises (reference panics)."""
    key = ""
    if "name" in doc:
        if not isinstance(doc["name"], str):
            raise TypeError(f"pot key must be a string, got {type(doc['name']).__name__}")
        key = doc["name"]
    if "id" in doc:
        if not isinstance(doc["id"], str):
            raise TypeError(f"pot key must be a string, got {type(doc['id']).__name__}")
        key = doc["id"]
    return key


class PotStore:
    """A pot server over a data root on any filesystem path."""

    def __init__(
        self,
        spark: Optional[SparkSession],
        root: str,
        backend: Optional["CommitBackend"] = None,
        fs=None,
    ) -> None:
        self.spark = spark
        # the data-plane seam (kv/storefs.py): manifest listing, snapshot
        # parquet I/O and tree maintenance all go through _fs — local
        # os/pyarrow by default, an object-store/fsspec filesystem for
        # bucket-rooted stores (pair it with the matching commit backend
        # so reads and the put-if-absent commit share one namespace)
        self._fs = fs or LocalStoreFS()
        if fs is not None and not isinstance(fs, LocalStoreFS) and backend is None:
            # defaulting to LocalFSBackend would split the namespaces:
            # commits on local disk, data in the bucket — readers would
            # silently see an empty store. Fail loudly instead.
            raise ValueError(
                "a non-local data-plane fs needs a commit backend writing"
                " to the same namespace (e.g. ConditionalPutBackend over"
                " the same object client)"
            )
        self.root = self._fs.canonical_root(root)
        # the commit-point seam (kv/backend.py): every generation publish
        # goes through backend.put_if_absent — local FS by default, a
        # conditional-put object store (GCS if_generation_match=0, S3/ABS
        # If-None-Match) in the reference's actual deployment model
        # (server.go:670-702)
        self.backend: CommitBackend = backend or LocalFSBackend()
        if not getattr(self.backend, "read_only", False):
            # read-only replicas (export tasks) must not write anything
            # into the source namespace — not even a root .dirmarker
            self._fs.makedirs(self.root)
        self._locks: dict[str, threading.RLock] = {}
        self._locks_guard = threading.Lock()
        self.metrics = StoreMetrics()
        # per-path last-read generation cache, like the typed client's
        # (client.go:148-152); used by callers for lease renewal.
        self.generation_cache: dict[str, int] = {}

    # -- path helpers -------------------------------------------------------

    def _pot_dir(self, path: str) -> str:
        path = path.strip("/")
        base = self._fs.normjoin(self.root, path) if path else self.root
        # containment gate: a pot path must never escape the store root.
        # The reference is immune by construction (GCS object namespace);
        # a filesystem root is not, so `..` segments (or anything that
        # normalizes outside root) are rejected here — the single choke
        # point every read/write/list path goes through.
        if not path:
            contained = True  # the root pot itself
        elif self.root:
            # a root of '/' (absolute-path fsspec) already ends with the
            # separator — don't double it or nothing would ever match
            root_pref = (
                self.root
                if self.root.endswith(self._fs.sep)
                else self.root + self._fs.sep
            )
            contained = base == self.root or base.startswith(root_pref)
        else:  # whole-bucket root (object store ""): no upward escapes
            contained = base not in ("", "..") and not base.startswith(
                ("..%s" % self._fs.sep, self._fs.sep)
            )
        if not contained:
            raise ValueError(f"pot path escapes the store root: {path!r}")
        return self._fs.join(base, _POT_DIRNAME)

    def _local_lock(self, path: str) -> threading.RLock:
        """Per-path in-process lock (reference's mutex map,
        server.go:617-661). Reads are snapshot-isolated and lock-free."""
        with self._locks_guard:
            if path not in self._locks:
                self._locks[path] = threading.RLock()
            return self._locks[path]

    # -- manifest I/O --------------------------------------------------------

    def _latest_manifest(self, path: str) -> Optional[_Manifest]:
        commits = self._fs.join(self._pot_dir(path), _COMMITS)
        try:
            names = [n for n in self._fs.listdir(commits) if n.endswith(".json")]
        except FileNotFoundError:
            return None
        if not names:
            return None
        latest = max(names)
        m = json.loads(self._fs.read_bytes(self._fs.join(commits, latest)))
        return _Manifest(
            generation=m["generation"],
            committed_at=m["committed_at"],
            snapshot=m["snapshot"],
            n_keys=m["n_keys"],
            files=m.get("files"),
        )

    def _try_commit(self, path: str, manifest: _Manifest) -> bool:
        """Put-if-absent publish of a FULLY WRITTEN manifest — the commit
        point, delegated to the pluggable backend (kv/backend.py).

        The backend contract: atomically create the target with complete
        content iff absent; readers never observe a partial manifest; a
        False return means another writer won this generation and the
        caller re-reads fresh state and retries. The default
        LocalFSBackend implements it as staged-write + fsync + os.link;
        object-store backends use the conditional put the reference
        itself relies on (GCS if_generation_match=0, server.go:670-702).
        """
        commits = self._fs.join(self._pot_dir(path), _COMMITS)
        target = self._fs.join(commits, f"{manifest.generation:020d}.json")
        record = {
            "generation": manifest.generation,
            "committed_at": manifest.committed_at,
            "snapshot": manifest.snapshot,
            "n_keys": manifest.n_keys,
        }
        if manifest.files is not None:
            record["files"] = manifest.files
        return self.backend.put_if_absent(target, json.dumps(record).encode())

    # -- snapshot I/O (pyarrow fast path; layout identical to Spark's) ------

    def _snapshot_path(self, path: str, name: str) -> str:
        return self._fs.join(self._pot_dir(path), name)

    def _parquet_parts(self, d: str) -> list[str]:
        return sorted(
            self._fs.join(d, n)
            for n in self._fs.listdir(d)
            if n.endswith(".parquet")
        )

    def _vacuum_guard(self, manifest: _Manifest, path: str) -> None:
        """Raise a CLEAR error when a retained manifest's snapshot data
        was reclaimed by vacuum — a raw FileNotFoundError out of a
        parquet read reads as corruption, not lifecycle (`restore` has
        always had this guard; time travel and the change feed need the
        same one)."""
        dirs = (
            {rel.split("/", 1)[0] for rel in manifest.files.values()}
            if manifest.files is not None
            else {manifest.snapshot}
        )
        for d in dirs:
            if not self._fs.exists(self._snapshot_path(path, d)):
                raise ValueError(
                    f"generation {manifest.generation} of {path!r} was vacuumed"
                )

    def _read_content(self, manifest: Optional[_Manifest], path: str) -> dict[str, Any]:
        if manifest is None:
            return {}
        self._vacuum_guard(manifest, path)
        if manifest.files is not None:
            parts: list[str] = []
            for rel in manifest.files.values():
                try:
                    parts.extend(
                        self._parquet_parts(self._snapshot_path(path, rel))
                    )
                except FileNotFoundError:
                    # an EMPTY bucket dir on an object store has only its
                    # marker: no parquet parts to read
                    pass
            table = (
                pa.concat_tables(
                    [self._fs.read_parquet(p, _ARROW_SCHEMA) for p in parts]
                )
                if parts
                else _ARROW_SCHEMA.empty_table()
            )
            keys = table.column("key").to_pylist()
            docs = table.column("doc").to_pylist()
            return {k: json.loads(d) for k, d in zip(keys, docs)}
        snap = self._snapshot_path(path, manifest.snapshot)
        if self._fs.isdir(snap):
            # Spark snapshots carry _SUCCESS markers; read only the parts
            parts = self._parquet_parts(snap)
            table = pa.concat_tables(
                [self._fs.read_parquet(p, _ARROW_SCHEMA) for p in parts]
            ) if parts else _ARROW_SCHEMA.empty_table()
        else:
            table = self._fs.read_parquet(snap, _ARROW_SCHEMA)
        keys = table.column("key").to_pylist()
        docs = table.column("doc").to_pylist()
        return {k: json.loads(d) for k, d in zip(keys, docs)}

    def _write_snapshot(self, path: str, generation: int, content: dict[str, Any]) -> str:
        if getattr(self.backend, "read_only", False):
            # fail BEFORE staging: a read-only replica that merely
            # refused at the commit point would still have littered the
            # source namespace with a snapshot dir + parquet
            raise RuntimeError(
                f"read-only store: refusing to write snapshot for {path!r}"
            )
        name = f"snap-{generation:020d}-{uuid.uuid4().hex[:8]}"
        self._write_snapshot_named(path, name, content)
        return name

    def _write_snapshot_named(
        self, path: str, name: str, content: dict[str, Any]
    ) -> None:
        """Stage `content` at an EXPLICIT snapshot name. Split from
        _write_snapshot so the post-publish restage repair
        (_restage_if_vacuumed) can rewrite the exact name a winning
        manifest already references."""
        snap_dir = self._snapshot_path(path, name)
        self._fs.makedirs(snap_dir)
        keys = sorted(content)
        table = pa.Table.from_pydict(
            {
                "key": keys,
                "doc": [json.dumps(content[k], sort_keys=True) for k in keys],
            },
            schema=_ARROW_SCHEMA,
        )
        self._fs.write_parquet(table, self._fs.join(snap_dir, "part-00000.parquet"))

    def _restage_if_vacuumed(
        self, path: str, committed: "_Manifest", restage: Callable[[], None]
    ) -> None:
        """BEST-EFFORT narrowing of the stage-then-publish vacuum race
        (round-11 advice; scope honesty per round-12 advice): a
        vacuum() in ANOTHER process — where our per-path lock cannot
        serialize it — running with an aggressive grace window can
        reclaim this writer's staged snapshot between its last stage
        write and the manifest put_if_absent; the conditional PUT still
        succeeds, and the pot's new HEAD would then fail every read
        with "was vacuumed" until a later commit. Once we have WON the
        generation, any vacuum that LISTS from now on sees the snapshot
        referenced by the latest manifest and keeps it alive — but a
        vacuum that took its reclaim list BEFORE our publish may still
        delete at any later moment, so no post-publish check can fully
        close the window. This verify-restage-reverify loop (3 rounds)
        repairs every delete that lands while we are looking; the
        86400 s default grace window is the actual correctness
        guarantee against the delayed case. One isdir() per commit in
        the common (alive) case."""
        for _ in range(3):
            if self._fs.isdir(self._snapshot_path(path, committed.snapshot)):
                return
            restage()

    # -- norewrite gate ------------------------------------------------------

    @staticmethod
    def _can_rewrite(committed_at: float, now: float, duration: float) -> bool:
        """Lease expiry: strictly older than `duration` (server.go:262-264;
        boundary cases pinned by server_test.go:14-32)."""
        return committed_at + duration < now

    def _allow_rewrite(
        self,
        manifest: _Manifest,
        norewrite: bool,
        norewrite_duration: float,
        last_known_generation: int,
    ) -> bool:
        allow = True
        if norewrite:
            if norewrite_duration > 0 and not self._can_rewrite(
                manifest.committed_at, time.time(), norewrite_duration
            ):
                allow = False
            # ownership: holding the latest generation re-allows (this is
            # what makes leader-election lease renewal work,
            # server.go:379-382)
            if manifest.generation == last_known_generation:
                allow = True
        return allow

    # -- public API: the pot surface ----------------------------------------

    def get(self, path: str) -> dict[str, Any]:
        """Read-all at path; missing pot => empty map (server.go:468-491)."""
        self.metrics.bump(reads=1)
        manifest = self._latest_manifest(path)
        if manifest is not None:
            self.generation_cache[path] = manifest.generation
        return self._read_content(manifest, path)

    def _manifest_at(self, path: str, generation: int) -> Optional[_Manifest]:
        commits = self._fs.join(self._pot_dir(path), _COMMITS)
        target = self._fs.join(commits, f"{generation:020d}.json")
        try:
            m = json.loads(self._fs.read_bytes(target))
        except FileNotFoundError:
            return None
        return _Manifest(
            generation=m["generation"],
            committed_at=m["committed_at"],
            snapshot=m["snapshot"],
            n_keys=m["n_keys"],
            files=m.get("files"),
        )

    def get_at(self, path: str, generation: int) -> dict[str, Any]:
        """Time travel: read the pot as of a past generation (extension
        beyond the reference, whose GCS generations identify but cannot
        replay old states). Valid until `vacuum` reclaims the snapshot;
        missing generation => empty map, mirroring get()'s missing-path
        semantics."""
        return self._read_content(self._manifest_at(path, generation), path)

    def list_generations(self, path: str) -> list[tuple[int, float]]:
        """All retained (generation, committed_at) pairs, oldest first."""
        commits = self._fs.join(self._pot_dir(path), _COMMITS)
        try:
            names = sorted(
                n for n in self._fs.listdir(commits) if n.endswith(".json")
            )
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            m = json.loads(self._fs.read_bytes(self._fs.join(commits, n)))
            out.append((m["generation"], m["committed_at"]))
        return out

    def create(
        self,
        path: str,
        doc: dict[str, Any],
        *,
        norewrite: bool = False,
        norewrite_duration: float = 0.0,
        generation: int = 0,
    ) -> CreateResponse:
        """Single-doc upsert; key derived from name/id (server.go:272-407)."""
        return self._mutate(
            path,
            {derive_key(doc): doc},
            norewrite=norewrite,
            norewrite_duration=norewrite_duration,
            last_known_generation=generation,
        )

    def create_batch(
        self,
        path: str,
        docs: dict[str, dict[str, Any]],
        *,
        norewrite: bool = False,
        norewrite_duration: float = 0.0,
        generation: int = 0,
    ) -> CreateResponse:
        """Batch upsert: caller-supplied keys, all-or-nothing
        (server.go:334-339, 411-423)."""
        return self._mutate(
            path,
            dict(docs),
            norewrite=norewrite,
            norewrite_duration=norewrite_duration,
            last_known_generation=generation,
        )

    def replace_batch(self, path: str, docs: dict[str, dict[str, Any]]) -> CreateResponse:
        """Truncate-and-load: the new content replaces the whole pot in
        one commit (the overwrite mode of the "pot" DataSource writer;
        the reference has no replace — only per-key merge,
        server.go:385-393 — but its whole-object rewrite makes this the
        natural extension)."""
        return self._mutate(path, dict(docs), replace=True)

    def remove(
        self, path: str, *keys: str, generation: Optional[int] = None
    ) -> None:
        """Delete keys; missing keys are silent no-ops; writes the pot even
        if it didn't exist (server.go:494-548).

        ``generation`` (extension): compare-and-delete. When set, the
        removal commits only if the pot is still at exactly that
        generation, else raises NoRewriteViolated — the conditional
        mutation that closes the get-then-remove TOCTOU in lease
        release (a stalled ex-leader whose check passed before its
        lease expired can no longer delete the new leader's key: the
        new leader's election bumped the generation)."""
        self.metrics.bump(removes=1)
        self._mutate(path, {}, remove_keys=keys, require_generation=generation)

    def list_paths(self, subdir: str = "") -> list[str]:
        """Raw string-prefix listing of pot paths; a root-level pot is
        never listed (server.go:432-466)."""
        self.metrics.bump(lists=1)
        found = []
        for dirpath, dirnames, _ in self._fs.walk(self.root):
            if _POT_DIRNAME in dirnames:
                rel = (
                    self._fs.relpath(dirpath, self.root)
                    if self.root
                    else dirpath
                )
                rel = "" if rel == "." else rel.replace(self._fs.sep, "/")
                if rel and rel.startswith(subdir):
                    commits = self._fs.join(dirpath, _POT_DIRNAME, _COMMITS)
                    try:
                        has_commits = bool(self._fs.listdir(commits))
                    except FileNotFoundError:
                        has_commits = False
                    if has_commits:
                        found.append(rel)
            # never descend into pot internals
            dirnames[:] = [d for d in dirnames if d != _POT_DIRNAME]
        return sorted(found)

    # -- mutation core (read -> merge -> stage -> put-if-absent commit) -----

    def _mutate(
        self,
        path: str,
        new_docs: dict[str, Any],
        *,
        remove_keys: Iterable[str] = (),
        norewrite: bool = False,
        norewrite_duration: float = 0.0,
        last_known_generation: int = 0,
        replace: bool = False,
        require_generation: Optional[int] = None,
    ) -> CreateResponse:
        lock = self._local_lock(path)
        t_total = time.perf_counter()
        with lock:
            lock_wait = time.perf_counter() - t_total
            self.metrics.bump(
                lock_wait_s=lock_wait, lock_acquisitions=1, writes=1
            )
            self.metrics.observe_span("local_lock", lock_wait)
            for _ in range(_MAX_COMMIT_RETRIES):
                t_phase = time.perf_counter()
                manifest = self._latest_manifest(path)
                content = self._read_content(manifest, path)
                self.metrics.observe_span("read", time.perf_counter() - t_phase)

                if require_generation is not None and (
                    manifest is None or manifest.generation != require_generation
                ):
                    raise NoRewriteViolated(
                        "conditional mutation lost: pot is at generation "
                        f"{manifest.generation if manifest else 0}, "
                        f"required {require_generation}"
                    )

                if new_docs and manifest is not None:
                    allow = self._allow_rewrite(
                        manifest, norewrite, norewrite_duration, last_known_generation
                    )
                    for k in new_docs:
                        if k in content and not allow:
                            # fail before any write: all-or-nothing
                            raise NoRewriteViolated(f"no-rewrite violated: {k}")

                merged = {} if replace else dict(content)
                for k in remove_keys:
                    merged.pop(k, None)
                merged.update(new_docs)

                next_gen = (manifest.generation if manifest else 0) + 1
                t_phase = time.perf_counter()
                snapshot = self._write_snapshot(path, next_gen, merged)
                self.metrics.observe_span("write", time.perf_counter() - t_phase)
                committed = _Manifest(
                    generation=next_gen,
                    committed_at=time.time(),
                    snapshot=snapshot,
                    n_keys=len(merged),
                )
                t_phase = time.perf_counter()
                won = self._try_commit(path, committed)
                self.metrics.observe_span("commit", time.perf_counter() - t_phase)
                if won:
                    self._restage_if_vacuumed(
                        path,
                        committed,
                        lambda: self._write_snapshot_named(path, snapshot, merged),
                    )
                    self.generation_cache[path] = next_gen
                    self.metrics.observe_span(
                        "create", time.perf_counter() - t_total
                    )
                    return CreateResponse(content=new_docs, generation=next_gen)
                # lost the race: discard the staged snapshot, re-read, retry
                self._fs.rmtree(self._snapshot_path(path, snapshot))
        raise CommitConflict(f"commit contention on {path!r} exceeded retries")

    # -- Spark data plane ----------------------------------------------------

    def _spark_read_parquet(self, dirs: list[str]) -> DataFrame:
        """Read snapshot dirs as a DataFrame. When the data-plane fs
        reports Spark-readable URLs (local paths, or a connector-backed
        gs://... prefix) this is a plain distributed parquet scan — the
        100 TB path. A connector-less object-store fs streams the parts
        through the fs client on the driver instead (the reference's
        own SDK posture, server.go:468-491: it too streams whole
        objects through the driver-side SDK)."""
        assert self.spark is not None
        urls = [self._fs.spark_url(d) for d in dirs]
        if all(u is not None for u in urls):
            return self.spark.read.schema(DOC_SCHEMA).parquet(*urls)
        tables = []
        for d in dirs:
            try:
                parts = self._parquet_parts(d)
            except FileNotFoundError:
                parts = []
            tables.extend(self._fs.read_parquet(p, _ARROW_SCHEMA) for p in parts)
        table = (
            pa.concat_tables(tables) if tables else _ARROW_SCHEMA.empty_table()
        )
        return self.spark.createDataFrame(table.to_pandas(), schema=DOC_SCHEMA)

    def _spark_write_parquet(
        self, df: DataFrame, snap_dir: str, partition_by: Optional[str] = None
    ) -> None:
        """Write a snapshot DataFrame through the data-plane fs. With a
        Spark-readable URL the write is fully distributed. Without one,
        Spark stages to a local temp dir and the parts stream through
        the fs client (upload_tree) — the merge/shuffle stays
        distributed; only the final byte movement is driver-side, which
        is exactly what the reference does for every write
        (server.go:396-400)."""
        url = self._fs.spark_url(snap_dir)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        if url is not None:
            writer.parquet(url)
            return
        import shutil as _shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="pot_spark_stage_")
        try:
            writer.parquet(tmp)
            self._fs.upload_tree(tmp, snap_dir)
        finally:
            _shutil.rmtree(tmp, ignore_errors=True)

    def get_df(self, path: str) -> DataFrame:
        """The pot as a DataFrame[key string, doc string]; missing pot =>
        empty DataFrame with the same schema."""
        return self._df_of(path, self._latest_manifest(path))

    def get_df_at(self, path: str, generation: int) -> DataFrame:
        """DataFrame time travel: the pot as of a past generation
        (DataFrame twin of get_at); missing generation => empty."""
        return self._df_of(path, self._manifest_at(path, generation))

    def _df_of(self, path: str, manifest: Optional[_Manifest]) -> DataFrame:
        assert self.spark is not None, "PotStore needs a SparkSession for DataFrame APIs"
        if manifest is None:
            return self.spark.createDataFrame([], schema=DOC_SCHEMA)
        # fail at plan time with the lifecycle error, not at action time
        # with a parquet path error
        self._vacuum_guard(manifest, path)
        if manifest.files is not None:
            dirs = [self._snapshot_path(path, rel) for rel in manifest.files.values()]
            return self._spark_read_parquet(dirs)
        snap = self._snapshot_path(path, manifest.snapshot)
        return self._spark_read_parquet([snap])

    def changes_df(
        self,
        path: str,
        from_generation: int,
        to_generation: Optional[int] = None,
        include_old: bool = False,
    ) -> DataFrame:
        """Spark-plane change feed: DataFrame[key, op, doc] with op in
        insert/update/delete between two generations — for pots too large
        to diff on the driver. With ``include_old`` the before-image rides
        along as ``old_doc`` (the Delta CDF preimage), which is what an
        incremental consumer needs to retract a deleted/updated row's
        contribution from a downstream aggregate. On the bucketed layout, buckets whose
        manifest file entries are identical in both generations are
        PRUNED before any read: a key always hashes to the same bucket,
        so an untouched bucket cannot contribute a change — the diff cost
        is O(changed buckets), mirroring the O(delta) write path."""
        assert self.spark is not None, "PotStore needs a SparkSession for DataFrame APIs"
        m_old = self._manifest_at(path, from_generation)
        m_new = (
            self._latest_manifest(path)
            if to_generation is None
            else self._manifest_at(path, to_generation)
        )
        if (
            m_old is not None
            and m_new is not None
            and m_old.files is not None
            and m_new.files is not None
            and set(m_old.files) == set(m_new.files)
        ):
            changed = [b for b in m_new.files if m_old.files[b] != m_new.files[b]]
            old_dirs = [self._snapshot_path(path, m_old.files[b]) for b in changed]
            new_dirs = [self._snapshot_path(path, m_new.files[b]) for b in changed]
            empty = self.spark.createDataFrame([], schema=DOC_SCHEMA)
            old_df = self._spark_read_parquet(old_dirs) if old_dirs else empty
            new_df = self._spark_read_parquet(new_dirs) if new_dirs else empty
        else:
            old_df = self._df_of(path, m_old)
            new_df = self._df_of(path, m_new)
        o = old_df.select(F.col("key"), F.col("doc").alias("old_doc"))
        n = new_df.select(F.col("key"), F.col("doc").alias("new_doc"))
        j = o.join(n, "key", "full_outer")
        op = (
            F.when(F.col("old_doc").isNull(), "insert")
            .when(F.col("new_doc").isNull(), "delete")
            .otherwise("update")
        )
        cols = ["key", op.alias("op"), F.col("new_doc").alias("doc")]
        if include_old:
            cols.append(F.col("old_doc"))
        return (
            j.filter(
                F.col("old_doc").isNull()
                | F.col("new_doc").isNull()
                | (F.col("old_doc") != F.col("new_doc"))
            )
            .select(*cols)
        )

    def get_typed(
        self, path: str, schema, generation: Optional[int] = None
    ) -> DataFrame:
        """Typed projection of the documents (the engine's analogue of the
        typed Go client, client.go:14-38): parse the JSON doc column with
        an explicit schema. Timestamp fields parse at microsecond
        precision, matching the sink-side to_json format
        (pot_spark.streaming.sink.JSON_TS_OPTIONS). With ``generation``
        the projection is pinned to that snapshot (time travel), so the
        lazy DataFrame keeps reading the same files even after later
        commits advance the pot."""
        df = (
            self.get_df(path)
            if generation is None
            else self.get_df_at(path, generation)
        )
        opts = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}
        return df.select(
            "key", F.from_json("doc", schema, opts).alias("d")
        ).select("key", "d.*")

    def create_df(
        self,
        path: str,
        new_df: DataFrame,
        *,
        norewrite: bool = False,
        norewrite_duration: float = 0.0,
        generation: int = 0,
    ) -> int:
        """Bulk upsert from a DataFrame[key, doc]: old left_anti new +
        new, staged as a Spark-written parquet snapshot, published with
        the same put-if-absent commit. Returns the new generation.

        This is the 100 TB path: the merge is one shuffle on `key` (or
        zero with a broadcast of a small delta); the dict APIs above are
        the metadata-scale convenience path with identical layout.

        Duplicate keys WITHIN the batch are collapsed to one arbitrary
        row before merging: a JSON batch body can never carry the same
        key twice (object keys are unique, and the dict plane dedups
        structurally), so the DataFrame plane enforces the same
        one-row-per-key invariant — without this, left_anti + union
        would publish a pot with multiple rows per key. Callers that
        care WHICH duplicate wins must pre-aggregate deterministically."""
        assert self.spark is not None, "PotStore needs a SparkSession for DataFrame APIs"
        new_df = new_df.dropDuplicates(["key"])
        lock = self._local_lock(path)
        t_lock = time.perf_counter()
        with lock:
            lock_wait = time.perf_counter() - t_lock
            self.metrics.bump(
                lock_wait_s=lock_wait, lock_acquisitions=1, writes=1
            )
            self.metrics.observe_span("local_lock", lock_wait)
            for _ in range(_MAX_COMMIT_RETRIES):
                manifest = self._latest_manifest(path)
                old = self.get_df(path)
                if norewrite and manifest is not None:
                    allow = self._allow_rewrite(
                        manifest, norewrite, norewrite_duration, generation
                    )
                    if not allow:
                        conflict = (
                            new_df.join(old, "key", "left_semi").limit(1).collect()
                        )
                        if conflict:
                            raise NoRewriteViolated(
                                f"no-rewrite violated: {conflict[0]['key']}"
                            )
                merged = old.join(new_df, "key", "left_anti").unionByName(new_df)
                next_gen = (manifest.generation if manifest else 0) + 1
                name = f"snap-{next_gen:020d}-{uuid.uuid4().hex[:8]}"
                snap_dir = self._snapshot_path(path, name)
                t_phase = time.perf_counter()
                self._spark_write_parquet(merged, snap_dir)
                self.metrics.observe_span("write", time.perf_counter() - t_phase)
                committed = _Manifest(
                    generation=next_gen,
                    committed_at=time.time(),
                    snapshot=name,
                    n_keys=-1,
                )
                t_phase = time.perf_counter()
                won = self._try_commit(path, committed)
                self.metrics.observe_span("commit", time.perf_counter() - t_phase)
                if won:
                    self._restage_if_vacuumed(
                        path,
                        committed,
                        lambda: self._spark_write_parquet(merged, snap_dir),
                    )
                    self.generation_cache[path] = next_gen
                    self.metrics.observe_span("create", time.perf_counter() - t_lock)
                    return next_gen
                self._fs.rmtree(snap_dir)
        raise CommitConflict(f"commit contention on {path!r} exceeded retries")

    def create_df_bucketed(
        self, path: str, new_df: DataFrame, *, n_buckets: int = 16
    ) -> int:
        """O(delta) bulk upsert: keys hash into n_buckets fixed buckets;
        only buckets containing changed keys are merged and rewritten,
        every other bucket's files are carried into the new manifest
        untouched (Delta-style file reuse). Mutation cost is
        O(delta + affected-bucket bytes) instead of O(table) — at 100 TB
        with 10^5 buckets, a 1 GB delta rewrites ~1/10^5 of the table.

        The commit remains the same put-if-absent manifest; readers of
        any generation see a consistent bucket set. A pot previously
        written unbucketed (or with a different n_buckets) is fully
        re-bucketed on its first bucketed commit.

        Duplicate keys within the batch collapse to one arbitrary row,
        same invariant (and reasoning) as create_df.
        """
        assert self.spark is not None, "PotStore needs a SparkSession for DataFrame APIs"
        new_df = new_df.dropDuplicates(["key"])
        bucket_of = F.pmod(F.hash("key"), F.lit(n_buckets)).cast("int")
        lock = self._local_lock(path)
        t_lock = time.perf_counter()
        with lock:
            lock_wait = time.perf_counter() - t_lock
            self.metrics.bump(
                lock_wait_s=lock_wait, lock_acquisitions=1, writes=1
            )
            self.metrics.observe_span("local_lock", lock_wait)
            for _ in range(_MAX_COMMIT_RETRIES):
                manifest = self._latest_manifest(path)
                prev = (
                    manifest.files
                    if manifest is not None
                    and manifest.files is not None
                    and len(manifest.files) == n_buckets
                    else None
                )
                delta = new_df.withColumn("__b", bucket_of)
                if prev is None:
                    # first bucketed commit (or layout change): re-bucket all
                    affected = list(range(n_buckets))
                    old = self.get_df(path) if manifest is not None else None
                else:
                    affected = sorted(
                        r["__b"] for r in delta.select("__b").distinct().collect()
                    )
                    dirs = [
                        self._snapshot_path(path, prev[str(b)]) for b in affected
                    ]
                    old = self._spark_read_parquet(dirs) if dirs else None
                merged = delta.select("key", "doc", "__b")
                if old is not None:
                    merged = (
                        old.join(new_df, "key", "left_anti")
                        .withColumn("__b", bucket_of)
                        .unionByName(merged)
                    )
                next_gen = (manifest.generation if manifest else 0) + 1
                name = f"snap-{next_gen:020d}-{uuid.uuid4().hex[:8]}"
                snap_dir = self._snapshot_path(path, name)
                # route each bucket to one task: file count per bucket dir stays
                # 1, not n_tasks (small-file hygiene the compactor otherwise pays)
                t_phase = time.perf_counter()
                self._spark_write_parquet(
                    merged.repartition("__b"), snap_dir, partition_by="__b"
                )
                self.metrics.observe_span("write", time.perf_counter() - t_phase)
                files = {
                    str(b): (
                        f"{name}/__b={b}"
                        if b in affected
                        and self._fs.isdir(self._fs.join(snap_dir, f"__b={b}"))
                        else (prev or {}).get(str(b), f"{name}/__b={b}")
                    )
                    for b in range(n_buckets)
                }
                # an affected bucket can end up empty (all its keys were
                # new-key-free and anti-joined away is impossible here, but
                # an empty delta bucket after re-bucket-all is): give it an
                # empty dir so readers never dangle
                for b in range(n_buckets):
                    d = self._snapshot_path(path, files[str(b)])
                    if not self._fs.isdir(d):
                        self._fs.makedirs(d)
                committed = _Manifest(
                    generation=next_gen,
                    committed_at=time.time(),
                    snapshot=name,
                    n_keys=-1,
                    files=files,
                )
                t_phase = time.perf_counter()
                won = self._try_commit(path, committed)
                self.metrics.observe_span("commit", time.perf_counter() - t_phase)
                if won:

                    def _restage_bucketed(
                        merged=merged, snap_dir=snap_dir, files=files
                    ) -> None:
                        self._spark_write_parquet(
                            merged.repartition("__b"), snap_dir, partition_by="__b"
                        )
                        for b in range(n_buckets):
                            d = self._snapshot_path(path, files[str(b)])
                            if not self._fs.isdir(d):
                                self._fs.makedirs(d)

                    self._restage_if_vacuumed(path, committed, _restage_bucketed)
                    self.generation_cache[path] = next_gen
                    self.metrics.observe_span("create", time.perf_counter() - t_lock)
                    return next_gen
                self._fs.rmtree(snap_dir)
        raise CommitConflict(f"commit contention on {path!r} exceeded retries")

    # -- maintenance ---------------------------------------------------------

    def changes(
        self, path: str, from_generation: int, to_generation: Optional[int] = None
    ) -> dict[str, tuple[str, Optional[dict[str, Any]]]]:
        """Change feed between two retained generations (the Delta CDF
        pattern): {key: (op, new_doc)} with op in insert/update/delete
        (new_doc None for deletes) — what an incremental consumer replays
        instead of re-reading the whole pot. Extension beyond the
        reference, whose generations can't be diffed (server.go:405).
        Dict-plane implementation diffs the two snapshots; on the
        bucketed layout a scale implementation prunes to buckets whose
        file entries differ between the manifests before reading."""
        old = self._read_content(self._manifest_at(path, from_generation), path)
        if to_generation is None:
            new = self.get(path)
        else:
            new = self._read_content(self._manifest_at(path, to_generation), path)
        out: dict[str, tuple[str, Optional[dict[str, Any]]]] = {}
        for k, v in new.items():
            if k not in old:
                out[k] = ("insert", v)
            elif old[k] != v:
                out[k] = ("update", v)
        for k in old:
            if k not in new:
                out[k] = ("delete", None)
        return out

    def restore(self, path: str, generation: int) -> int:
        """Metadata-only rollback (Delta-style RESTORE): publish a NEW
        generation whose manifest points back at `generation`'s snapshot.
        No data is copied or rewritten — the commit is O(1) regardless of
        pot size — and the rolled-back-over history stays readable via
        get_at() until vacuum reclaims it. Extension beyond the
        reference: GCS generations identify past states but cannot
        republish them (server.go:405). Raises ValueError if the target
        generation (or its already-vacuumed snapshot) is gone; returns
        the new generation number."""
        lock = self._local_lock(path)
        t_lock = time.perf_counter()
        with lock:
            lock_wait = time.perf_counter() - t_lock
            self.metrics.bump(lock_wait_s=lock_wait, lock_acquisitions=1)
            self.metrics.observe_span("local_lock", lock_wait)
            target = self._manifest_at(path, generation)
            if target is None:
                raise ValueError(f"generation {generation} not found at {path!r}")
            # covers the plain snapshot AND every bucket dir a bucketed
            # manifest carries from older generations
            self._vacuum_guard(target, path)
            for _ in range(_MAX_COMMIT_RETRIES):
                manifest = self._latest_manifest(path)
                if manifest is None:
                    raise ValueError(f"pot {path!r} no longer exists")
                committed = _Manifest(
                    generation=manifest.generation + 1,
                    committed_at=time.time(),
                    snapshot=target.snapshot,
                    n_keys=target.n_keys,
                    files=target.files,
                )
                if self._try_commit(path, committed):
                    self.generation_cache[path] = committed.generation
                    return committed.generation
        raise CommitConflict(f"commit contention on {path!r} exceeded retries")

    def clone(self, src: str, dst: str, deep: bool = False) -> int:
        """Delta-style CLONE of a pot to a new path. Shallow (default):
        an O(1) metadata commit whose manifest references `src`'s current
        snapshot files in place — no data copied, cost independent of pot
        size. The clone is copy-on-write: its next mutation stages its
        own snapshot, and `src` never observes clone writes. Until then
        the clone depends on `src`'s snapshot surviving — compact+vacuum
        on `src` invalidates shallow clones, exactly Delta's documented
        shallow-clone/VACUUM interaction. `deep=True` copies the snapshot
        files (O(data)) so the clone is fully independent. Locally the
        reference is a root-relative dir; on cloud storage it maps to
        absolute-URI file entries in the manifest (the same mechanism
        Delta shallow clones use). Extension beyond the reference: pot
        can only duplicate by re-POSTing documents (server.go:272-407).
        Returns the clone's new generation at `dst`."""
        src_m = self._latest_manifest(src)
        if src_m is None:
            raise ValueError(f"pot {src!r} does not exist")
        lock = self._local_lock(dst)
        t_lock = time.perf_counter()
        with lock:
            lock_wait = time.perf_counter() - t_lock
            self.metrics.bump(lock_wait_s=lock_wait, lock_acquisitions=1)
            self.metrics.observe_span("local_lock", lock_wait)
            dst_dir = self._pot_dir(dst)
            self._fs.makedirs(dst_dir)
            for _ in range(_MAX_COMMIT_RETRIES):
                cur = self._latest_manifest(dst)
                next_gen = 1 if cur is None else cur.generation + 1
                if deep:
                    name = f"snap-{next_gen:020d}-{uuid.uuid4().hex[:8]}"
                    snap_dir = self._snapshot_path(dst, name)
                    files: Optional[dict[str, str]] = None
                    if src_m.files is not None:
                        self._fs.makedirs(snap_dir)
                        files = {}
                        for b, rel in src_m.files.items():
                            bucket_dst = self._fs.join(snap_dir, f"__b={b}")
                            try:
                                self._fs.copytree(
                                    self._snapshot_path(src, rel), bucket_dst
                                )
                            except FileNotFoundError:
                                # empty bucket dir (marker-only on an
                                # object store): clone it as empty
                                self._fs.makedirs(bucket_dst)
                            files[b] = f"{name}/__b={b}"
                    else:
                        self._fs.copytree(
                            self._snapshot_path(src, src_m.snapshot), snap_dir
                        )
                else:
                    # relative reference into src's pot dir: the commit is
                    # pure metadata, nothing is read or copied
                    name = self._fs.relpath(
                        self._snapshot_path(src, src_m.snapshot), dst_dir
                    )
                    files = (
                        {
                            b: self._fs.relpath(
                                self._snapshot_path(src, rel), dst_dir
                            )
                            for b, rel in src_m.files.items()
                        }
                        if src_m.files is not None
                        else None
                    )
                committed = _Manifest(
                    generation=next_gen,
                    committed_at=time.time(),
                    snapshot=name,
                    n_keys=src_m.n_keys,
                    files=files,
                )
                if self._try_commit(dst, committed):
                    self.generation_cache[dst] = committed.generation
                    return committed.generation
        raise CommitConflict(f"commit contention on {dst!r} exceeded retries")

    def vacuum(self, path: str, grace_s: float = 86400.0) -> int:
        """Remove snapshots not referenced by the latest manifest (loser
        stages and superseded versions). Returns count removed.

        Three safety rules protect concurrent writers:
        - the per-path lock is held (an in-process writer can't be mid
          stage-then-commit);
        - UNREFERENCED stage dirs — commit-race losers left at a
          generation <= committed, and crashed writers' orphans at
          next_gen > committed — are reclaimed only once their newest
          mtime is older than ``grace_s``; younger ones are skipped
          rather than rmtree'd under an in-flight parquet write. After
          the grace window an uncommitted stage is garbage: its owner
          either already failed the manifest put-if-absent and retried
          at a fresh generation, or died between staging and
          publishing. ``grace_s`` is therefore a retention contract,
          exactly like Delta Lake's VACUUM retention (PAPERS.md, Delta
          Lake VLDB 2020 §3.2): it must exceed the longest
          stage-to-publish latency of any live writer, else a stalled
          writer could publish a manifest whose snapshot was reclaimed
          (readers detect that as an explicit "was vacuumed" error, not
          silent corruption). The DEFAULT is 24 h — Delta's equivalent
          retention default is 7 days, and a cross-process writer
          stalled minutes between stage and publish (GC pause,
          partition, slow driver work) must not lose its stage to a
          concurrently-scheduled janitor; tests and aggressive
          reclamation pass an explicit shorter grace. Belt-and-braces:
          every commit path also verifies its staged snapshot still
          exists immediately after winning the generation and restages
          it if reclaimed (_restage_if_vacuumed), so even a
          mis-configured grace window cannot strand a committed HEAD.
        Snapshots referenced by RETAINED HISTORY manifests (superseded
        committed versions) carry no in-flight risk — their commit is
        final — and are reclaimed immediately regardless of age."""
        lock = self._local_lock(path)
        with lock:
            manifest = self._latest_manifest(path)
            pot_dir = self._pot_dir(path)
            if manifest is None or not self._fs.isdir(pot_dir):
                return 0
            live = {manifest.snapshot}
            if manifest.files is not None:
                # bucket paths look like "<snapdir>/__b=<k>"; keep the snapdirs
                live.update(rel.split("/", 1)[0] for rel in manifest.files.values())
            # every snapshot any retained commit manifest references:
            # these are finished writes (safe to reclaim when superseded)
            committed_refs: set[str] = set()
            commits = self._fs.join(pot_dir, _COMMITS)
            try:
                commit_names = self._fs.listdir(commits)
            except FileNotFoundError:
                commit_names = []
            for cname in commit_names:
                if not cname.endswith(".json"):
                    continue
                try:
                    m = json.loads(
                        self._fs.read_bytes(self._fs.join(commits, cname))
                    )
                except (OSError, ValueError):
                    continue
                committed_refs.add(m.get("snapshot", ""))
                for rel in (m.get("files") or {}).values():
                    committed_refs.add(rel.split("/", 1)[0])
            now = time.time()
            removed = 0
            for name in self._fs.listdir(pot_dir):
                if not name.startswith("snap-") or name in live:
                    continue
                full = self._fs.join(pot_dir, name)
                if name not in committed_refs:
                    # unreferenced stage at gen <= committed: possibly a
                    # commit-race loser still writing — honor the grace.
                    # Age = NEWEST mtime anywhere in the snapshot tree:
                    # bucketed stage writes land in __b=<k> subdirs that
                    # never refresh the top-level dir's mtime, so the
                    # top-level stat alone would age out a stage that is
                    # actively being written. An fs that cannot report
                    # mtimes (object-store JSON subset) raises OSError →
                    # the stage is SKIPPED, never reclaimed blind:
                    # conservative liveness cost, zero corruption risk.
                    try:
                        newest = self._fs.mtime(full)
                        for dirpath, dirnames, filenames in self._fs.walk(full):
                            for child in dirnames + filenames:
                                newest = max(
                                    newest,
                                    self._fs.mtime(
                                        self._fs.join(dirpath, child)
                                    ),
                                )
                    except OSError:
                        continue  # vanished under us, or mtime-less fs
                    if now - newest < grace_s:
                        continue
                self._fs.rmtree(full)
                removed += 1
            return removed

    def compact(self, path: str) -> int:
        """Rewrite the pot's live content into ONE fresh snapshot at a new
        generation (the OPTIMIZE counterpart to `vacuum`). A long chain of
        O(delta) bucketed commits leaves the live table scattered across
        many generations' bucket dirs; compaction collapses it so readers
        touch one directory and `vacuum` can reclaim the entire history.
        Content is byte-identical before/after; the commit uses the same
        put-if-absent manifest publish, so concurrent writers just win or
        lose the generation race as usual. Returns the new generation (or
        the current one unchanged if the pot is missing/empty)."""
        lock = self._local_lock(path)
        t_lock = time.perf_counter()
        with lock:
            lock_wait = time.perf_counter() - t_lock
            self.metrics.bump(lock_wait_s=lock_wait, lock_acquisitions=1)
            self.metrics.observe_span("local_lock", lock_wait)
            for _ in range(_MAX_COMMIT_RETRIES):
                manifest = self._latest_manifest(path)
                if manifest is None:
                    return 0
                next_gen = manifest.generation + 1
                name = f"snap-{next_gen:020d}-{uuid.uuid4().hex[:8]}"
                snap_dir = self._snapshot_path(path, name)
                files: Optional[dict[str, str]] = None
                if self.spark is not None and manifest.files is not None:
                    # preserve the bucket layout: every bucket rewritten
                    # under the single new snapshot dir
                    n_buckets = len(manifest.files)
                    df = self.get_df(path).withColumn(
                        "__b", F.pmod(F.hash("key"), F.lit(n_buckets)).cast("int")
                    )
                    self._spark_write_parquet(
                        df.repartition("__b"), snap_dir, partition_by="__b"
                    )
                    for b in range(n_buckets):
                        d = self._fs.join(snap_dir, f"__b={b}")
                        if not self._fs.isdir(d):
                            self._fs.makedirs(d)
                    files = {str(b): f"{name}/__b={b}" for b in range(n_buckets)}
                elif self.spark is not None:
                    self._spark_write_parquet(
                        self.get_df(path).coalesce(1), snap_dir
                    )
                else:
                    name = self._write_snapshot(
                        path, next_gen, self._read_content(manifest, path)
                    )
                    snap_dir = self._snapshot_path(path, name)
                committed = _Manifest(
                    generation=next_gen,
                    committed_at=time.time(),
                    snapshot=name,
                    n_keys=manifest.n_keys,
                    files=files,
                )
                if self._try_commit(path, committed):

                    def _restage_compact(
                        manifest=manifest,
                        name=name,
                        snap_dir=snap_dir,
                        files=files,
                    ) -> None:
                        # re-derive from the OLD manifest (the head has
                        # already moved to the snapshot being restaged)
                        if self.spark is not None and files is not None:
                            n_b = len(files)
                            df = self._df_of(path, manifest).withColumn(
                                "__b",
                                F.pmod(F.hash("key"), F.lit(n_b)).cast("int"),
                            )
                            self._spark_write_parquet(
                                df.repartition("__b"), snap_dir, partition_by="__b"
                            )
                            for b in range(n_b):
                                d = self._fs.join(snap_dir, f"__b={b}")
                                if not self._fs.isdir(d):
                                    self._fs.makedirs(d)
                        elif self.spark is not None:
                            self._spark_write_parquet(
                                self._df_of(path, manifest).coalesce(1), snap_dir
                            )
                        else:
                            self._write_snapshot_named(
                                path, name, self._read_content(manifest, path)
                            )

                    # the restage re-derives from the OLD manifest, whose
                    # superseded-history snapshot vacuum reclaims with NO
                    # grace — a second vacuum landing between the probe
                    # and the restage read makes the repair itself raise.
                    # The commit has already won, so the repair must not
                    # throw out of it: leave the committed HEAD and log;
                    # readers get the explicit "was vacuumed" error until
                    # the next commit (round-12 advice item).
                    try:
                        self._restage_if_vacuumed(
                            path, committed, _restage_compact
                        )
                    except (ValueError, FileNotFoundError, OSError) as e:
                        _LOG.error(
                            "compact(%r): committed generation %d but the "
                            "post-publish restage repair could not re-derive "
                            "the snapshot (old history vacuumed): %s",
                            path,
                            next_gen,
                            e,
                        )
                    self.generation_cache[path] = next_gen
                    return next_gen
                self._fs.rmtree(snap_dir)
        raise CommitConflict(f"commit contention on {path!r} exceeded retries")
