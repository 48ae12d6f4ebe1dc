#!/usr/bin/env python
"""Object-store data-plane smoke: measure PotStore op rates with the
store fully bucket-rooted (every byte over real HTTP via the in-repo
emulator) against the identical workload on the local-FS store, so the
StoreFS seam's overhead is a recorded number, not an assertion.

Workload per store: N create (single-doc upsert, one commit each),
N get (read-all), one create_batch of N docs, one export of the tree.
The absolute bucket numbers are an emulator floor (loopback HTTP,
in-memory object map); what transfers to real GCS is the SHAPE: a
constant small number of HTTP round-trips per op (list commits, read
manifest, read parquet, conditional PUT), so per-op latency is
round-trips x RTT and throughput scales with concurrent writers on
DIFFERENT pots (per-pot commits serialize by design — same as the
reference's per-object generation preconditions).

Usage: python tools/bucket_smoke.py [N]      (feeds SCALE.md's table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(store, n: int, label: str) -> dict[str, float]:
    out: dict[str, float] = {}
    t0 = time.perf_counter()
    for i in range(n):
        store.create(f"smoke/p{i % 8}", {"id": f"k{i}", "v": i})
    out["create_ops_s"] = round(n / (time.perf_counter() - t0), 1)
    t0 = time.perf_counter()
    for i in range(n):
        store.get(f"smoke/p{i % 8}")
    out["get_ops_s"] = round(n / (time.perf_counter() - t0), 1)
    t0 = time.perf_counter()
    store.create_batch("smoke/bulk", {f"b{i}": {"v": i} for i in range(n)})
    out["batch_docs_s"] = round(n / (time.perf_counter() - t0), 1)
    from pot_spark.kv.archive import export_snapshot

    # an explicit temp dest: a cwd-relative path litters the invoking
    # repo with run artifacts (bit in r10 — exports/ got committed)
    import tempfile

    t0 = time.perf_counter()
    n_pots = export_snapshot(
        store, tempfile.mkdtemp(prefix="pot_bucket_smoke_export_")
    )
    out["export_pots_s"] = round(n_pots / (time.perf_counter() - t0), 1)
    print(f"{label:8s} " + "  ".join(f"{k}={v}" for k, v in out.items()))
    return out


def main() -> None:
    import tempfile

    from pot_spark.kv.backend import ConditionalPutBackend
    from pot_spark.kv.gcs_emulator import FakeGCSServer, HttpObjectStoreClient
    from pot_spark.kv.store import PotStore
    from pot_spark.kv.storefs import ObjectStoreFS

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    local_root = tempfile.mkdtemp(prefix="pot_bucket_smoke_local_")
    local = PotStore(None, local_root)
    loc = _measure(local, n, "local")

    server = FakeGCSServer()
    endpoint = server.start()
    try:
        client = HttpObjectStoreClient("smokebkt", endpoint)
        client.create_bucket()
        bucket = PotStore(
            None,
            "pots",
            backend=ConditionalPutBackend(client),
            fs=ObjectStoreFS(client),
        )
        bkt = _measure(bucket, n, "bucket")
    finally:
        server.stop()

    print("| op | local | bucket (HTTP emulator) | ratio |")
    print("|---|---|---|---|")
    for k in loc:
        r = loc[k] / bkt[k] if bkt[k] else float("inf")
        print(f"| {k} | {loc[k]} | {bkt[k]} | {r:.1f}x |")


if __name__ == "__main__":
    main()
