"""Streaming ADMISSION GATE demo: the online dedup a continuously
ingesting corpus runs instead of re-deduping from scratch.

Pipeline (all round-9 components, each pinned in tests/test_streaming.py):

    documents arrive in ingest order across microbatches
        -> per-row MinHash signatures (stateless array_min — no
           pre-state aggregation, so the plan stays single-stateful)
        -> band-key-sharded retained-signature state
           (applyInPandasWithState; opt-in TTL = the dedup horizon)
        -> per-(band, doc) collision flags
        -> exactly-once pot upsert (epoch ledger drops replays)
        -> per-doc verdict = all-bands-clean rollup of the store

The final verdicts equal the oracle-checked batch twin
s_dedup_near_gate — printed side by side at the end.

Run:  python examples/streaming_admission.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pot_spark import registry
from pot_spark.kv.store import PotStore
from pot_spark.session import get_spark
from pot_spark.streaming.runner import _doc_stream, build_near_dedup_gate
from pot_spark.streaming.sink import start_pot_upsert_stream


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming_admission", cpus="8")
    registry.load_all_query_modules()
    work = tempfile.mkdtemp(prefix="pot_admission_")

    # crawl stream: doc_id-ordered chunks; production swaps in Kafka /
    # cloud-files with the identical plan. ttl_ms would bound the
    # retained-signature horizon on an unbounded stream.
    stream = _doc_stream(spark, f"{sf_dir}/documents.parquet")
    store = PotStore(spark, f"{work}/potroot")
    q = start_pot_upsert_stream(
        build_near_dedup_gate(stream),
        store,
        "gate/verdicts",
        ["band_key", "doc_id"],
        f"{work}/ckpt",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    verdicts: dict[int, int] = {}
    for doc in store.get("gate/verdicts").values():
        d = int(doc["doc_id"])
        verdicts[d] = min(verdicts.get(d, 1), 1 - int(doc["collided"]))
    admitted = sum(verdicts.values())
    print(f"streamed verdicts : {len(verdicts)} docs, {admitted} admitted, "
          f"{len(verdicts) - admitted} rejected as near-duplicates")

    batch = registry.QUERIES["s_dedup_near_gate"](spark, sf_dir)
    n_docs, n_admitted = batch.agg(
        F.count("*"), F.sum("admitted")
    ).collect()[0]
    print(f"batch twin        : {n_docs} docs, {n_admitted} admitted "
          f"(oracle-checked; stream == batch pinned in tests)")
    ok = verdicts == {
        r.doc_id: r.admitted for r in batch.collect()
    }
    print(f"stream == batch   : {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
