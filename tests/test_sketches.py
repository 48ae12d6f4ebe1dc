"""HLL sketch accuracy: rows-only queries still need a correctness story
— the estimates must land within HLL's error bound of the exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from pot_spark import registry
from pot_spark.tables import load

registry.load_all_query_modules()


def test_hll_estimates_within_error_bound(spark, sf_dir):
    est = {
        r.o_orderpriority: r.approx_customers
        for r in registry.QUERIES["q_hll_sketch"](spark, sf_dir).collect()
    }
    orders = load(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["__all__"] = orders.select("o_custkey").distinct().count()
    assert set(est) == set(exact)
    for k, e in est.items():
        assert abs(e - exact[k]) / exact[k] < 0.05, (k, e, exact[k])
