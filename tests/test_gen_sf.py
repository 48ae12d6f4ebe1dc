"""tools/gen_sf.py contract: the generated fixture must be a drop-in
for the driver's testdata — same table set, same column names and
arrow types, scaled row counts — so sf1-tier bench numbers measure the
engine, not a schema skew."""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

REF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny_fixture(tmp_path_factory):
    from gen_sf import generate

    out = str(tmp_path_factory.mktemp("gen_sf") / "sf0.001")
    generate(0.001, out, seed=7)
    return out


@pytest.mark.skipif(not os.path.isdir(REF), reason="driver testdata absent")
def test_schemas_match_driver_testdata(tiny_fixture):
    for t in TABLES:
        ref = pq.read_schema(os.path.join(REF, f"{t}.parquet"))
        gen = pq.read_schema(os.path.join(tiny_fixture, f"{t}.parquet"))
        assert gen.names == ref.names, t
        for name in ref.names:
            rt = ref.field(name).type
            gt = gen.field(name).type
            assert str(gt) == str(rt), (t, name, str(gt), str(rt))


@pytest.mark.skipif(not os.path.isdir(REF), reason="driver testdata absent")
def test_row_counts_scale(tiny_fixture):
    for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        ref_n = pq.read_metadata(os.path.join(REF, f"{t}.parquet")).num_rows
        gen_n = pq.read_metadata(os.path.join(tiny_fixture, f"{t}.parquet")).num_rows
        assert abs(gen_n - ref_n) <= max(2, ref_n * 0.02), (t, gen_n, ref_n)


def test_deterministic(tmp_path):
    from gen_sf import generate

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate(0.001, a, seed=7)
    generate(0.001, b, seed=7)
    for t in TABLES:
        ta = pq.read_table(os.path.join(a, f"{t}.parquet"))
        tb = pq.read_table(os.path.join(b, f"{t}.parquet"))
        assert ta.equals(tb), t
