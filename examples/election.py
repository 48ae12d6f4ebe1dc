"""Leader election over PotStore no-rewrite leases — the engine's
counterpart of the reference's election example
(/root/reference/examples/election/main.go:23-99, behavior only):
N workers race to upsert the fixed key "leader" under a lease; exactly
one holds the lease at a time, renews it by generation ownership,
voluntarily releases after a few turns, and a standby takes over.

Run:  python examples/election.py [n_workers] [turns] [--http]

Default mode runs in-process against a temp-dir store (the reference
needs a running pot server + GCS bucket; the same semantics come from
the put-if-absent manifest commit). With --http the example runs
client/server-SPLIT like the reference's: it spawns
`python -m pot_spark serve` as a subprocess and every worker drives a
PotClient over real HTTP, with lease renewal coming from the client's
per-path generation cache (client.go:148-152) instead of a hand-threaded
generation variable. Every transition is printed; the invariant checked
at the end is that the leadership log never shows two concurrent
primaries and every release is followed by a takeover.
"""

from __future__ import annotations

import sys
import tempfile
import threading
import time

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

from pot_spark.kv import NoRewriteViolated, PotClient, PotStore

PATH = "test/election"
LEASE_S = 0.6
RELEASE_AFTER_TURNS = 5


class LocalLease:
    """In-process transport: PotStore calls with an explicitly threaded
    generation, like a reference client process caching its own."""

    def __init__(self, store: PotStore) -> None:
        self.store = store
        self.gen = 0

    def elect(self, wid: str) -> None:
        res = self.store.create(
            PATH,
            {"id": "leader", "holder": wid},
            norewrite=True,
            norewrite_duration=LEASE_S,
            generation=self.gen,
        )
        self.gen = res.generation  # renewal keeps ownership

    def lost(self) -> None:
        self.gen = 0

    def release(self) -> None:
        # CONDITIONAL release (compare-and-delete): the remove commits
        # only if the pot is still at OUR generation. A get-then-remove
        # would be a TOCTOU — the lease can expire between the holder
        # check and the delete, and a stalled ex-leader would erase the
        # new leader's key. Guarding on generation makes the race lose
        # loudly (NoRewriteViolated) instead of deleting someone else's
        # leadership.
        try:
            self.store.remove(PATH, "leader", generation=self.gen)
        finally:
            self.gen = 0


class HttpLease:
    """Client/server-split transport: the same flow over PotClient,
    whose per-path generation cache supplies renewal ownership
    automatically (client.go:112-118, 148-152)."""

    def __init__(self, base_url: str) -> None:
        self.client = PotClient(base_url)

    def elect(self, wid: str) -> None:
        self.client.create(
            PATH, [{"id": "leader", "holder": wid}], norewrite=LEASE_S
        )

    def lost(self) -> None:
        self.client.drop_generation(PATH)

    def release(self) -> None:
        try:
            self.client.remove(
                PATH, "leader", generation=self.client.generation_of(PATH)
            )
        finally:
            self.client.drop_generation(PATH)


def worker(lease, wid: str, log: list, stop: threading.Event) -> None:
    primary = False
    turns = 0
    while not stop.is_set():
        try:
            lease.elect(wid)
            if not primary:
                primary = True
                log.append(("elect", wid, time.monotonic()))
            else:
                log.append(("renew", wid, time.monotonic()))
        except NoRewriteViolated:
            if primary:
                primary = False  # lost ownership (lease expired elsewhere)
            lease.lost()
        if primary:
            turns += 1
            if turns >= RELEASE_AFTER_TURNS:
                try:
                    lease.release()
                    log.append(("release", wid, time.monotonic()))
                except NoRewriteViolated:
                    pass  # someone already took over; nothing to release
                primary, turns = False, 0
        time.sleep(LEASE_S / 3)


def run_election(make_lease, n: int, run_turns: int) -> list:
    """Run n workers for ~run_turns ticks; returns the event log."""
    log: list = []
    stop = threading.Event()
    threads = [
        threading.Thread(target=worker, args=(make_lease(), f"w{i}", log, stop))
        for i in range(n)
    ]
    for t in threads:
        t.start()
    time.sleep(run_turns * LEASE_S / 3)
    stop.set()
    for t in threads:
        t.join()
    log.sort(key=lambda e: e[2])
    return log


def check_no_overlap(log: list, eps: float = 0.05) -> bool:
    """THE invariant, checked from the event log: leadership sessions
    never overlap. A session runs from its "elect" until its "release",
    or — if the holder stalled/stopped without releasing — until
    LEASE_S after its last elect/renew (the moment the lease becomes
    stealable). Every next election must start at/after that point."""
    elects = [e for e in log if e[0] == "elect"]
    sessions = []  # (start, end, wid)
    cur = None  # (wid, start, last_heartbeat)
    ok = len(elects) >= 1
    for kind, wid, ts in log:
        if kind == "elect":
            if cur is not None:
                sessions.append((cur[1], cur[2] + LEASE_S, cur[0]))
            cur = (wid, ts, ts)
        elif kind == "renew" and cur is not None and cur[0] == wid:
            cur = (wid, cur[1], ts)
        elif kind == "release" and cur is not None and cur[0] == wid:
            sessions.append((cur[1], ts, wid))
            cur = None
    if cur is not None:
        sessions.append((cur[1], cur[2] + LEASE_S, cur[0]))
    for (s1, e1, w1), (s2, _e2, w2) in zip(sessions, sessions[1:]):
        if w1 != w2 and s2 < e1 - eps:
            ok = False
            print(f"OVERLAP: {w1} [{s1:.3f},{e1:.3f}] vs {w2} elect {s2:.3f}")
    return ok


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--http"]
    over_http = "--http" in sys.argv[1:]
    n = int(args[0]) if len(args) > 0 else 3
    run_turns = int(args[1]) if len(args) > 1 else 25

    with tempfile.TemporaryDirectory() as root:
        if over_http:
            import subprocess

            proc = subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "pot_spark",
                    "--root",
                    root,
                    "serve",
                    "--port",
                    "0",
                ],
                stdout=subprocess.PIPE,
                text=True,
            )
            try:
                banner = proc.stdout.readline()  # "pot serving <root> on <url>"
                base_url = banner.strip().rsplit(" ", 1)[-1]
                print(f"server: {base_url} (pid {proc.pid})")
                log = run_election(lambda: HttpLease(base_url), n, run_turns)
            finally:
                proc.terminate()
                proc.wait()
        else:
            # one store per worker: each has its own generation cache,
            # like each reference client process caching its own
            log = run_election(lambda: LocalLease(PotStore(None, root)), n, run_turns)

    elects = [e for e in log if e[0] == "elect"]
    for kind, wid, ts in log:
        print(f"{ts:12.3f}  {kind:8s}  {wid}")
    print(f"\n{len(elects)} elections across {n} workers")
    ok = check_no_overlap(log)
    holders = {wid for _, wid, _ in elects}
    print("handover across workers:", sorted(holders))
    print("OK" if ok else "VIOLATION")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
