"""Cross-engine NULL-corner parity cases the shipped fixtures never
hit (round-8 advice): a language whose entire <=cap kept set has NULL
n_chars must report kept_chars = 0 on BOTH engines — the oracle's
conditional SUM has no ELSE-0 rows for such a group and yielded NULL
before the COALESCE fix."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def allnull_lang_dir(tmp_path_factory) -> str:
    dst = tmp_path_factory.mktemp("sf_allnull_lang")
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        base = os.path.basename(f)
        if base != "documents.parquet":
            os.symlink(f, dst / base)
            continue
        t = pq.read_table(f)
        lang = t.column("lang").to_pylist()
        nch = t.column("n_chars").to_pylist()
        did = t.column("doc_id").to_pylist()
        # retag 3 docs (< the 50 cap) into a brand-new lang and NULL
        # their n_chars: the kept set for 'zz' is then entirely NULL
        victims = set(sorted(did)[:3])
        lang = ["zz" if d in victims else v for d, v in zip(did, lang)]
        nch = [None if d in victims else v for d, v in zip(did, nch)]
        cols = {}
        for name in t.column_names:
            if name == "lang":
                cols[name] = pa.array(lang, type=t.schema.field("lang").type)
            elif name == "n_chars":
                cols[name] = pa.array(nch, type=t.schema.field("n_chars").type)
            else:
                cols[name] = t.column(name)
        pq.write_table(pa.table(cols, schema=t.schema), dst / base)
    return str(dst)


def test_group_cap_sample_allnull_kept_group_parity(spark, allnull_lang_dir):
    from pot_spark import registry
    from pot_spark.oracle import check_parity

    registry.load_all_query_modules()
    res = check_parity(
        spark,
        "q_group_cap_sample",
        registry.QUERIES["q_group_cap_sample"],
        registry.ORACLES["q_group_cap_sample"],
        allnull_lang_dir,
    )
    assert res.ok, res
    row = (
        registry.QUERIES["q_group_cap_sample"](spark, allnull_lang_dir)
        .filter("lang = 'zz'")
        .collect()
    )
    assert len(row) == 1
    assert (row[0].n_kept, row[0].kept_chars, row[0].n_dropped) == (3, 0, 0)
