"""Cross-PROCESS commit safety: separate OS processes (separate PotStore
instances, no shared locks) racing upserts on one pot must all land via
the put-if-absent manifest commit — the property the reference gets from
GCS preconditions across server instances (server.go:670-702)."""

from __future__ import annotations

import json
import multiprocessing as mp
import tempfile


def _writer(args):
    root, i = args
    # fresh store per process: no shared in-process locks — only the
    # O_EXCL manifest create serializes these writers
    from pot_spark.kv.store import PotStore

    store = PotStore(None, root)
    resp = store.create_batch("race/mp", {f"p{i}-{j}": {"w": i, "j": j} for j in range(3)})
    return i, resp.generation


def test_cross_process_writers_all_commit():
    root = tempfile.mkdtemp(prefix="pot_mp_")
    with mp.get_context("spawn").Pool(4) as pool:
        results = pool.map(_writer, [(root, i) for i in range(4)])

    from pot_spark.kv.store import PotStore

    store = PotStore(None, root)
    gens = sorted(g for _, g in results)
    assert gens == [1, 2, 3, 4]  # every writer won exactly one generation
    content = store.get("race/mp")
    assert len(content) == 12
    assert {k for k in content} == {f"p{i}-{j}" for i in range(4) for j in range(3)}
    # history is fully replayable: each generation adds exactly one batch
    sizes = [len(store.get_at("race/mp", g)) for g in gens]
    assert sizes == [3, 6, 9, 12]


def test_cross_process_norewrite_single_winner():
    """The reference's 5-client race (client_test.go:175-245), across
    processes: exactly one norewrite create wins, the rest see
    NoRewriteViolated, and the surviving value is the winner's."""
    root = tempfile.mkdtemp(prefix="pot_mp_nr_")
    with mp.get_context("spawn").Pool(5) as pool:
        results = pool.map(_nr_writer, [(root, i) for i in range(5)])

    from pot_spark.kv.store import PotStore

    store = PotStore(None, root)
    winners = [i for i, ok in results if ok]
    assert len(winners) == 1
    assert store.get("race/nr") == {"leader": {"id": "leader", "w": winners[0]}}


def _nr_writer(args):
    root, i = args
    from pot_spark.kv.errors import NoRewriteViolated
    from pot_spark.kv.store import PotStore

    store = PotStore(None, root)
    try:
        store.create(
            "race/nr", {"id": "leader", "w": i}, norewrite=True, norewrite_duration=30.0
        )
        return i, True
    except NoRewriteViolated:
        return i, False
