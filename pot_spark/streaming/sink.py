"""Exactly-once streaming sink into the KV layer.

`foreachBatch` hands each micro-batch to `PotStore.create_df`, whose
put-if-absent manifest commit is atomic; an epoch ledger (one O_EXCL file
per epoch under the pot's metadata dir) makes replayed epochs no-ops, so
the pot observes each epoch's writes exactly once even across restarts.
This is the engine's answer to the reference's write path (server.go:
272-407) for streaming producers: the stream continuously upserts keyed
documents, and readers always see a consistent generation.

Scale notes: the per-epoch work is one keyed merge (left_anti + union) —
a single shuffle on `key`, or none when the epoch delta is broadcast-
small. State lives in the pot, not the stream, so the sink restarts
cheaply from the checkpoint + ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pot_spark.kv.store import PotStore

_EPOCHS_DIRNAME = "epochs"


def _epoch_ledger_dir(store: PotStore, path: str) -> str:
    return store._fs.join(store._pot_dir(path), _EPOCHS_DIRNAME)


def _epoch_done(store: PotStore, path: str, epoch_id: int) -> bool:
    """True iff this epoch's pot commit already succeeded AND was marked
    (a foreachBatch replay after failure) — the batch must be skipped."""
    return store._fs.exists(
        store._fs.join(_epoch_ledger_dir(store, path), f"{epoch_id:020d}")
    )


def _mark_epoch_done(store: PotStore, path: str, epoch_id: int) -> None:
    """Record a SUCCESSFUL pot commit for this epoch.

    Ordering is the whole contract: the marker is written strictly AFTER
    the pot commit. Marking first (the previous design) opened an
    at-most-once hole — a crash between marker and commit made the
    replayed epoch skip itself and its data vanish forever. With
    commit-then-mark, the only crash window (after commit, before mark)
    makes the replay re-apply an IDENTICAL keyed upsert: one redundant
    generation, byte-same final state — effectively once.

    The marker create goes through the store's COMMIT BACKEND
    (put_if_absent — a zero-byte object): the exact create-if-absent
    primitive the manifest publish uses, so the ledger works verbatim
    on a bucket-rooted store (conditional PUT) with no local-path
    assumption (r10; previously raw os.O_EXCL, which silently wrote
    ledger markers to the driver's local disk when the store lived in
    a bucket)."""
    target = store._fs.join(
        _epoch_ledger_dir(store, path), f"{epoch_id:020d}"
    )
    store.backend.put_if_absent(target, b"")


# to_json's default format truncates timestamps to milliseconds; pot docs
# must round-trip losslessly, so both directions use microsecond precision
# (PotStore.get_typed mirrors this).
JSON_TS_OPTIONS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def keyed_json(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Project an arbitrary DataFrame to the pot layout [key, doc]: key is
    the '/'-joined key columns, doc the row as a JSON document — the same
    row shape the reference stores (server.go:315, 341-343)."""
    key = F.concat_ws("/", *[F.col(c).cast("string") for c in key_cols])
    return df.select(
        key.alias("key"),
        F.to_json(F.struct(*df.columns), JSON_TS_OPTIONS).alias("doc"),
    )


def start_pot_upsert_stream(
    plan: DataFrame,
    store: PotStore,
    path: str,
    key_cols: list[str],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Wire a streaming plan to the pot: every micro-batch is upserted by
    key under the store's commit protocol. Safe to restart: the source
    replays from the checkpoint and the epoch ledger drops duplicates.

    Upsert idempotence note: replaying an epoch with identical data would
    be a semantic no-op even without the ledger (same keys -> same merged
    state); the ledger additionally skips the write entirely and keeps
    generation numbers stable across recoveries.
    """

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if _epoch_done(store, path, epoch_id):
            return
        store.create_df(path, keyed_json(batch_df, key_cols))
        _mark_epoch_done(store, path, epoch_id)

    return (
        plan.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
