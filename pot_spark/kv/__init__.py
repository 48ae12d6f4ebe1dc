"""pot-faithful KV/document layer (SURVEY.md §2-B-1).

Reproduces the reference's surface — upsert/get/remove/list/archive with
lease-based optimistic concurrency — as versioned parquet snapshots plus
an atomic put-if-absent commit manifest, replacing GCS object generations
(reference /root/reference/server.go:272-548, 617-702).
"""

from pot_spark.kv.client import PotClient
from pot_spark.kv.errors import CommitConflict, NoRewriteViolated
from pot_spark.kv.store import CreateResponse, PotStore

__all__ = [
    "PotStore",
    "PotClient",
    "CreateResponse",
    "NoRewriteViolated",
    "CommitConflict",
]
