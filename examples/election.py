"""Leader election over PotStore no-rewrite leases — the engine's
counterpart of the reference's election example
(/root/reference/examples/election/main.go:23-99, behavior only):
N workers race to upsert the fixed key "leader" under a lease; exactly
one holds the lease at a time, renews it by generation ownership,
voluntarily releases after a few turns, and a standby takes over.

Run:  python examples/election.py [n_workers] [turns]

The reference needs a running pot server + GCS bucket; here the same
semantics come from the put-if-absent manifest commit, so the example is
self-contained on a temp dir. Every transition is printed; the invariant
checked at the end is that the leadership log never shows two concurrent
primaries and every release is followed by a takeover.
"""

from __future__ import annotations

import sys
import tempfile
import threading
import time

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

from pot_spark.kv import NoRewriteViolated, PotStore

PATH = "test/election"
LEASE_S = 0.6
RELEASE_AFTER_TURNS = 5


def worker(store: PotStore, wid: str, log: list, stop: threading.Event) -> None:
    primary = False
    turns = 0
    gen = 0  # generation ownership, threaded like the reference client's
    #          per-path generation cache (client.go:148-152)
    while not stop.is_set():
        try:
            res = store.create(
                PATH,
                {"id": "leader", "holder": wid},
                norewrite=True,
                norewrite_duration=LEASE_S,
                generation=gen,
            )
            gen = res.generation  # renewal keeps ownership
            if not primary:
                primary = True
                log.append(("elect", wid, time.monotonic()))
            else:
                log.append(("renew", wid, time.monotonic()))
        except NoRewriteViolated:
            if primary:
                primary = False  # lost ownership (lease expired elsewhere)
            gen = 0
        if primary:
            turns += 1
            if turns >= RELEASE_AFTER_TURNS:
                # CONDITIONAL release (compare-and-delete): the remove
                # commits only if the pot is still at OUR generation.
                # A get-then-remove would be a TOCTOU — the lease can
                # expire between the holder check and the delete, and a
                # stalled ex-leader would erase the new leader's key.
                # Guarding on generation makes the race lose loudly
                # (NoRewriteViolated) instead of deleting someone
                # else's leadership.
                try:
                    store.remove(PATH, "leader", generation=gen)
                    log.append(("release", wid, time.monotonic()))
                except NoRewriteViolated:
                    pass  # someone already took over; nothing to release
                primary, turns, gen = False, 0, 0
        time.sleep(LEASE_S / 3)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    run_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    log: list = []
    stop = threading.Event()
    with tempfile.TemporaryDirectory() as root:
        # one store per worker: each has its own generation cache, like
        # each reference client process caching its own generation
        threads = [
            threading.Thread(
                target=worker, args=(PotStore(None, root), f"w{i}", log, stop)
            )
            for i in range(n)
        ]
        for t in threads:
            t.start()
        time.sleep(run_turns * LEASE_S / 3)
        stop.set()
        for t in threads:
            t.join()

    log.sort(key=lambda e: e[2])
    elects = [e for e in log if e[0] == "elect"]
    for kind, wid, ts in log:
        print(f"{ts:12.3f}  {kind:8s}  {wid}")
    print(f"\n{len(elects)} elections across {n} workers")

    # THE invariant, checked from the event log: leadership sessions
    # never overlap. A session runs from its "elect" until its "release",
    # or — if the holder stalled/stopped without releasing — until
    # LEASE_S after its last elect/renew (the moment the lease becomes
    # stealable). Every next election must start at/after that point.
    eps = 0.05  # scheduler jitter allowance
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
    holders = {wid for _, wid, _ in elects}
    print("handover across workers:", sorted(holders))
    print("OK" if ok else "VIOLATION")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
