"""Over-int64 exactness of the ppm rank-sum/Fano numerators (round-8
advice): the *1e6 numerators in q_gini / q_user_activity_gini /
q_burstiness exceed int64 on large skewed corpora. The queries now
accumulate in DECIMAL(38,0) (the oracle in HUGEINT); these tests drive
the exact Spark expressions with histogram rows big enough that the
old bigint arithmetic silently wrapped, and compare against Python's
arbitrary-precision integers."""

from __future__ import annotations

from pyspark.sql import functions as F

# the exact aggregate exprs the queries ship (x = value, c = tied count,
# c_prev = cumulative count before the run) — q_gini uses the same form
# with n_tok in place of x
GINI_EXPR = (
    "CAST(CASE WHEN SUM(CAST(x AS DECIMAL(38,0)) * c) = 0 THEN NULL "
    "ELSE (SUM(CAST(x AS DECIMAL(38,0)) "
    "* (2 * CAST(c AS DECIMAL(38,0)) * c_prev "
    "+ CAST(c AS DECIMAL(38,0)) * (c + 1))) "
    "- (SUM(c) + 1) * SUM(CAST(x AS DECIMAL(38,0)) * c)) * 1000000 "
    "DIV (SUM(c) * SUM(CAST(x AS DECIMAL(38,0)) * c)) "
    "END AS BIGINT)"
)

FANO_EXPR = (
    "CAST((COUNT(*) * SUM(CAST(c AS DECIMAL(38,0)) * c) "
    "- SUM(CAST(c AS DECIMAL(38,0))) * SUM(CAST(c AS DECIMAL(38,0)))) "
    "* 1000000 "
    "DIV (COUNT(*) * SUM(CAST(c AS DECIMAL(38,0)))) AS BIGINT)"
)


def _py_gini_ppm(runs: list[tuple[int, int, int]]) -> int:
    n = sum(c for _, c, _ in runs)
    tot = sum(x * c for x, c, _ in runs)
    rank_sum2 = sum(x * (2 * c * cp + c * (c + 1)) for x, c, cp in runs)
    return (rank_sum2 - (n + 1) * tot) * 1_000_000 // (n * tot)


def test_gini_expr_exact_beyond_int64(spark):
    # 9e9 users at activity 2, 1e9 users at 1e7 events: the rank-sum
    # numerator ~ 1.8e27 — 8 orders past int64, trivially inside 10^38
    hist = [(2, 9_000_000_000, 0), (10_000_000, 1_000_000_000, 9_000_000_000)]
    df = spark.createDataFrame(hist, "x: long, c: long, c_prev: long")
    got = df.agg(F.expr(GINI_EXPR).alias("g")).collect()[0].g
    want = _py_gini_ppm(hist)
    assert got == want
    assert want > 0  # a real, skewed-inequality value
    # sanity: the old bigint arithmetic genuinely wrapped on this input
    numer = sum(x * (2 * c * cp + c * (c + 1)) for x, c, cp in hist)
    assert numer * 1_000_000 > 2**63 - 1


def test_fano_expr_exact_beyond_int64(spark):
    days = [(3_000_000_000,), (1_000_000_000,), (2_000_000_000,)]
    df = spark.createDataFrame(days, "c: long")
    got = df.agg(F.expr(FANO_EXPR).alias("f")).collect()[0].f
    cs = [c for (c,) in days]
    d, s, s2 = len(cs), sum(cs), sum(c * c for c in cs)
    want = (d * s2 - s * s) * 1_000_000 // (d * s)
    assert got == want
    assert (d * s2 - s * s) * 1_000_000 > 2**63 - 1


def test_gini_expr_matches_duckdb_hugeint_beyond_int64(spark):
    """Cross-engine: the DECIMAL(38,0) Spark form and the HUGEINT
    DuckDB form of the same numerator agree beyond int64."""
    import duckdb

    hist = [(2, 9_000_000_000, 0), (10_000_000, 1_000_000_000, 9_000_000_000)]
    df = spark.createDataFrame(hist, "x: long, c: long, c_prev: long")
    got = df.agg(F.expr(GINI_EXPR).alias("g")).collect()[0].g
    duck = duckdb.sql(
        "SELECT CAST((SUM(CAST(x AS HUGEINT) * (2 * CAST(c AS HUGEINT) * c_prev"
        " + CAST(c AS HUGEINT) * (c + 1)))"
        " - (SUM(c) + 1) * SUM(CAST(x AS HUGEINT) * c)) * 1000000"
        " // (SUM(c) * SUM(CAST(x AS HUGEINT) * c)) AS BIGINT) AS g"
        " FROM (VALUES (2, 9000000000, 0),"
        " (10000000, 1000000000, 9000000000)) t(x, c, c_prev)"
    ).fetchone()[0]
    assert got == duck == _py_gini_ppm(hist)
