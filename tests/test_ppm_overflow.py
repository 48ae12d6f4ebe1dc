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


SIMPSON_EXPR = (
    "CAST(CASE WHEN SUM(c) < 2 THEN NULL "
    "ELSE SUM(CAST(c AS DECIMAL(38,0)) * (c - 1)) * 1000000 "
    "DIV (SUM(CAST(c AS DECIMAL(38,0))) "
    "* (SUM(CAST(c AS DECIMAL(38,0))) - 1)) END AS BIGINT)"
)


def test_simpson_expr_exact_beyond_int64(spark):
    # two langs of 5e9 docs each: c*(c-1) = 2.5e19 > int64 per row
    hist = [(5_000_000_000,), (5_000_000_000,)]
    df = spark.createDataFrame(hist, "c: long")
    got = df.agg(F.expr(SIMPSON_EXPR).alias("s")).collect()[0].s
    cs = [c for (c,) in hist]
    n = sum(cs)
    want = sum(c * (c - 1) for c in cs) * 1_000_000 // (n * (n - 1))
    assert got == want
    assert cs[0] * (cs[0] - 1) > 2**63 - 1


def test_ks_dnum_exact_beyond_int64(spark):
    """The decimal KS deviation s_cum*(total-ns) - rest*ns on operands
    big enough that the old bigint products wrapped."""
    row = [(4_000_000_000, 9_000_000_000, 10_000_000_000, 4_500_000_000)]
    df = spark.createDataFrame(
        row, "s_cum: long, t_cum: long, total: long, ns: long"
    )
    expr = (
        F.abs(
            F.col("s_cum").cast("decimal(38,0)")
            * (F.col("total") - F.col("ns"))
            - (F.col("t_cum") - F.col("s_cum"))
            * F.col("ns").cast("decimal(38,0)")
        )
    ).alias("dnum")
    got = int(df.select(expr).collect()[0].dnum)
    s_cum, t_cum, total, ns = row[0]
    want = abs(s_cum * (total - ns) - (t_cum - s_cum) * ns)
    assert got == want
    assert s_cum * (total - ns) > 2**63 - 1
