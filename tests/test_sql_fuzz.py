"""Property-based engine-vs-oracle fuzzing: hypothesis generates random
filter/aggregate SQL in the dialect intersection, and the SAME string
runs through spark.sql and DuckDB over the same parquet — sorted results
must match exactly. This widens the correctness surface far beyond the
141 hand-written queries: every run explores fresh predicate shapes
(comparisons, BETWEEN, IN, LIKE, AND/OR nesting) against the lineitem
and orders fixtures.

Determinism rules (same as the registry conventions): aggregates go
through DECIMAL(18,2) and are cast to DOUBLE (exact for fixture sums),
counts to BIGINT; only null-free numeric/string columns are drawn, so
three-valued-logic differences can't arise.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pot_spark.tables import load

# (table, column, kind); timestamp columns excluded (literal formats and
# session time zones are covered by the hand-written date queries)
_COLUMNS = {
    "lineitem": [
        ("l_quantity", "num"),
        ("l_extendedprice", "num"),
        ("l_discount", "num"),
        ("l_linenumber", "num"),
        ("l_returnflag", "cat"),
        ("l_linestatus", "cat"),
    ],
    "orders": [
        ("o_totalprice", "num"),
        ("o_custkey", "num"),
        ("o_orderstatus", "cat"),
        ("o_orderpriority", "cat"),
    ],
}
_CAT_VALUES = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
}


@st.composite
def _predicate(draw, table: str) -> str:
    col, kind = draw(st.sampled_from(_COLUMNS[table]))
    if kind == "num":
        op = draw(st.sampled_from(["<", "<=", "=", ">=", ">", "between"]))
        a = draw(st.integers(min_value=0, max_value=100000))
        if op == "between":
            b = a + draw(st.integers(min_value=0, max_value=100000))
            return f"{col} BETWEEN {a} AND {b}"
        return f"{col} {op} {a}"
    vals = _CAT_VALUES[col]
    op = draw(st.sampled_from(["=", "<>", "in", "like"]))
    if op == "in":
        chosen = draw(st.lists(st.sampled_from(vals), min_size=1, max_size=3))
        inlist = ", ".join(f"'{v}'" for v in sorted(set(chosen)))
        return f"{col} IN ({inlist})"
    v = draw(st.sampled_from(vals))
    if op == "like":
        return f"{col} LIKE '{v[0]}%'"
    return f"{col} {op} '{v}'"


@st.composite
def _query(draw) -> tuple[str, str]:
    table = draw(st.sampled_from(sorted(_COLUMNS)))
    preds = draw(st.lists(_predicate(table), min_size=1, max_size=3))
    glue = draw(st.sampled_from([" AND ", " OR "]))
    where = glue.join(f"({p})" for p in preds)
    group_col = draw(
        st.sampled_from([None] + [c for c, k in _COLUMNS[table] if k == "cat"])
    )
    num_col = draw(st.sampled_from([c for c, k in _COLUMNS[table] if k == "num"]))
    agg = (
        f"CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CAST({num_col} AS DECIMAL(18,2))) AS DOUBLE) AS s"
    )
    if group_col is None:
        sql = f"SELECT {agg} FROM {table} WHERE {where}"
    else:
        sql = (
            f"SELECT {group_col} AS g, {agg} FROM {table} "
            f"WHERE {where} GROUP BY {group_col}"
        )
    return table, sql


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in _COLUMNS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@settings(max_examples=30, deadline=None, derandomize=True)
@given(tq=_query())
def test_random_sql_matches_duckdb(spark, sf_dir, duck, tq):
    table, sql = tq
    load(spark, sf_dir, table).createOrReplaceTempView(table)
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == want, sql
