"""Bucket-rooted PotStore: the reference's native deployment model
(every read/write against a GCS bucket, server.go:212-214, 396-400)
with NO FUSE/NFS mount anywhere.

Two seams compose (round 10):

- the COMMIT backend (kv/backend.py ConditionalPutBackend): the
  put-if-absent manifest publish as a conditional PUT
  (``ifGenerationMatch=0`` -> 412 on conflict), the exact primitive
  the reference uses for its .potlock;
- the DATA-PLANE fs (kv/storefs.py ObjectStoreFS): manifest listing,
  snapshot parquet I/O, maintenance and export through the same
  object namespace.

This example runs against the in-repo real-HTTP GCS emulator
(kv/gcs_emulator.py). In production, swap the client for a thin
wrapper over the real SDK (same four calls: upload/download/list/
delete) or use FsspecStoreFS(gcsfs) + GCSBackend, and pass
``spark_url_prefix="gs://bucket"`` so the Spark bulk plane reads the
snapshots natively through the Hadoop connector.

Run:  python examples/bucket_store.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pot_spark.kv.archive import export_snapshot
from pot_spark.kv.backend import ConditionalPutBackend
from pot_spark.kv.gcs_emulator import FakeGCSServer, HttpObjectStoreClient
from pot_spark.kv.store import PotStore
from pot_spark.kv.storefs import ObjectStoreFS


def main() -> int:
    server = FakeGCSServer()
    endpoint = server.start()
    try:
        client = HttpObjectStoreClient("demo-bucket", endpoint)
        client.create_bucket()

        store = PotStore(
            None,  # dict plane only; pass a SparkSession for the bulk plane
            "warehouse/pots",
            backend=ConditionalPutBackend(client),
            fs=ObjectStoreFS(client),
        )

        # mutate: every byte of this flows over HTTP into the bucket
        store.create("teams/core", {"name": "ada", "role": "lead"})
        store.create_batch("teams/core", {"bob": {"role": "dev"}})
        store.create("config", {"id": "flags", "dark_mode": True})

        print("paths:", store.list_paths())
        print("core team:", json.dumps(store.get("teams/core"), sort_keys=True))

        # the manifests and snapshots are ordinary objects in the bucket
        keys = client.list(prefix="warehouse/pots/teams/core/_pot/")
        print("bucket objects under the pot:", len(keys))

        # time travel + maintenance work unchanged over the bucket
        print("gen 1:", store.get_at("teams/core", 1))
        store.compact("teams/core")
        removed = store.vacuum("teams/core", grace_s=0.0)
        print("vacuumed snapshots:", removed)

        # distributed-form export writes data.json objects into the
        # same bucket (whole-object PUTs — atomic, no staging files)
        n = export_snapshot(store, "exports/nightly")
        print("exported pots:", n)
        print(
            "exported doc:",
            client.download("exports/nightly/teams/core/data.json").decode(),
        )
        return 0
    finally:
        server.stop()


if __name__ == "__main__":
    raise SystemExit(main())
