"""NULL-join-key parity for the as-of family (round-8 advice,
joins.py): Spark's Window.partitionBy groups NULL user_ids into one
partition, while the DuckDB ASOF equi-join oracle never matches NULL
keys. The queries drop NULL-key rows from the MATCH side; this fixture
actually CONTAINS NULL user_ids on both event types (the shipped
testdata does not, and the hostile sweep keeps user_id intact because
it is in KEYS), so the divergence would reproduce here if the guard
regressed."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def null_user_dir(tmp_path_factory) -> str:
    dst = tmp_path_factory.mktemp("sf_null_users")
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        base = os.path.basename(f)
        if base != "events.parquet":
            os.symlink(f, dst / base)
            continue
        t = pq.read_table(f)
        uid = t.column("user_id").to_pylist()
        eid = t.column("event_id").to_pylist()
        # deterministic ~20% NULL user_ids, hitting signups AND
        # purchases (event_id stripes both types in the generator)
        uid = [None if e % 5 == 0 else u for e, u in zip(eid, uid)]
        cols = {
            name: (
                pa.array(uid, type=t.schema.field("user_id").type)
                if name == "user_id"
                else t.column(name)
            )
            for name in t.column_names
        }
        pq.write_table(pa.table(cols, schema=t.schema), dst / base)
    return str(dst)


@pytest.mark.parametrize(
    "name",
    ["q_asof_join", "q_asof_forward", "q_asof_tolerance", "q_attribution"],
)
def test_asof_family_null_user_parity(spark, null_user_dir, name):
    from pot_spark import registry
    from pot_spark.oracle import check_parity

    registry.load_all_query_modules()
    res = check_parity(
        spark, name, registry.QUERIES[name], registry.ORACLES[name], null_user_dir
    )
    assert res.ok, res


def test_null_user_rows_are_exercised(spark, null_user_dir):
    """The fixture must put NULL-user rows on BOTH sides of each as-of
    (probe rows surviving unmatched, match-side rows dropped) —
    otherwise the parity test above proves nothing."""
    from pot_spark import registry

    registry.load_all_query_modules()
    out = registry.QUERIES["q_asof_join"](spark, null_user_dir)
    null_probe = out.filter("user_id IS NULL")
    assert null_probe.count() > 0
    # a NULL-user purchase may never match (the oracle's equi-join
    # semantics) even though NULL-user signups exist in the fixture
    assert null_probe.filter("signup_ts IS NOT NULL").count() == 0
    ev = spark.read.parquet(os.path.join(null_user_dir, "events.parquet"))
    assert (
        ev.filter("user_id IS NULL AND event_type = 'signup'").count() > 0
    ), "fixture must contain NULL-user signups (the match side)"
