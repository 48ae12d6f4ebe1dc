"""Registry contract guards: every registered query must carry a DuckDB
oracle unless it is on the documented rows-only list, and the Spark and
oracle column names must agree (the driver sorts columns by name before
hashing, so a naming drift fails the gate even with identical values).
Schema-level only — no query execution — so the whole sweep stays fast."""

from __future__ import annotations

import duckdb
import pytest

from pot_spark import registry
from pot_spark.tables import TABLE_NAMES

registry.load_all_query_modules()

# approximate or algorithmic operators whose outputs can't hash-match a
# deterministic SQL oracle: the driver records a weaker rows-only check
# for these by design (the multimodal trio graduated to hash-checked
# real-PNG oracles in r10)
ROWS_ONLY = {
    "q_approx_cd",
    "q_hll_sketch",
    "q_approx_percentile",
    "q_approx_topk",
    "q_bpe_encode",
}


def test_every_query_has_oracle_or_is_declared_rows_only():
    missing = set(registry.QUERIES) - set(registry.ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle nor rows-only declaration: {missing}"
    stale = ROWS_ONLY - set(registry.QUERIES)
    assert not stale, f"rows-only entries for unregistered queries: {stale}"
    assert not ROWS_ONLY & set(registry.ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_columns_match_oracle(spark, sf_dir, duck, name):
    spark_cols = sorted(registry.QUERIES[name](spark, sf_dir).columns)
    oracle_cols = sorted(
        d[0] for d in duck.execute(f"DESCRIBE ({registry.ORACLES[name]})").fetchall()
    )
    assert spark_cols == oracle_cols


def test_survey_inventory_matches_registry():
    """SURVEY.md §2-B-2 is the judge's checklist: every table row must be
    a registered query and every registered query must have a row."""
    import os
    import re

    survey_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md"
    )
    with open(survey_path) as f:
        survey = f.read()
    names = set(re.findall(r"^\| `([a-z0-9_]+)` \|", survey, re.M))
    qnames = {n for n in names if n.split("_")[0] in ("q", "s", "u")}
    reg = set(registry.QUERIES)
    assert qnames - reg == set(), f"SURVEY rows without a query: {qnames - reg}"
    assert reg - qnames == set(), f"queries without a SURVEY row: {reg - qnames}"
