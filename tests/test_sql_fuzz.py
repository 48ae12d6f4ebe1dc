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


@st.composite
def _window_query(draw) -> str:
    """Random ranking/analytic window over orders; order keys always end
    with the unique o_orderkey so row_number/lag are total-ordered and
    engine-deterministic."""
    part = draw(st.sampled_from(["o_orderstatus", "o_orderpriority"]))
    order_col = draw(st.sampled_from(["o_totalprice", "o_custkey"]))
    direction = draw(st.sampled_from(["ASC", "DESC"]))
    func = draw(
        st.sampled_from(
            [
                "row_number()",
                "rank()",
                "dense_rank()",
                "CAST(lag(o_custkey) OVER w AS BIGINT)",
                "CAST(lead(o_custkey) OVER w AS BIGINT)",
            ]
        )
    )
    fexpr = func if "OVER" in func else f"CAST({func} OVER w AS BIGINT)"
    limit_pred = draw(st.integers(min_value=1, max_value=50))
    # Spark has no QUALIFY: filter the rank in an outer query (the
    # dialect-intersection spelling both engines parse)
    return (
        f"SELECT o_orderkey, v FROM ("
        f"SELECT o_orderkey, {fexpr} AS v, row_number() OVER w AS rn "
        f"FROM orders "
        f"WINDOW w AS (PARTITION BY {part} "
        f"ORDER BY {order_col} {direction}, o_orderkey)"
        f") WHERE rn <= {limit_pred}"
    )


@settings(max_examples=20, deadline=None, derandomize=True)
@given(sql=_window_query())
def test_random_window_sql_matches_duckdb(spark, sf_dir, duck, sql):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == want, sql


@st.composite
def _join_query(draw) -> str:
    """Random orders⋈customer equi-join with filters on both sides and a
    DECIMAL-stable aggregate."""
    jtype = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    pred_o = draw(_predicate("orders"))
    bal = draw(st.integers(min_value=-1000, max_value=8000))
    group = draw(st.sampled_from(["c_mktsegment", "o_orderpriority", None]))
    agg = (
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s"
    )
    base = (
        f"FROM customer c {jtype} orders o "
        f"ON c.c_custkey = o.o_custkey AND ({pred_o}) "
        f"WHERE c.c_acctbal > {bal}"
    )
    if group is None:
        return f"SELECT {agg} {base}"
    return f"SELECT {group} AS g, {agg} {base} GROUP BY {group}"


@settings(max_examples=20, deadline=None, derandomize=True)
@given(sql=_join_query())
def test_random_join_sql_matches_duckdb(spark, sf_dir, duck, sql):
    for t in ("orders", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    duck.execute(
        f"CREATE VIEW IF NOT EXISTS customer AS "
        f"SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    # LEFT JOIN can emit NULL aggregates/groups: sort on a repr key so
    # None never compares against str/float
    got = sorted((tuple(r) for r in spark.sql(sql).collect()), key=repr)
    want = sorted((tuple(r) for r in duck.execute(sql).fetchall()), key=repr)
    assert got == want, sql
