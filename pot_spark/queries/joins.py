"""Join operators: equi/broadcast/multiway/outer/semi/anti/range/as-of.

No join of any kind exists in the reference (SURVEY.md §2-B); this is the
relational layer the engine adds. Scale notes per query:

- dimension tables (region/nation/customer/part/supplier) are broadcast —
  at 100 TB the fact tables shuffle once on their join key at most;
- the range join pre-partitions on the equality key (user_id) so the
  theta predicate evaluates within co-located partitions;
- the as-of join is a union + single window pass (one shuffle on user_id),
  not a join + aggregate — O(n log n) per partition instead of a per-key
  cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load


@query(
    "q_hash_join",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def q_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join. customer is small relative to orders at every SF,
    so AQE picks broadcast-hash; with a huge build side it degrades to
    shuffled hash / sort-merge on o_custkey."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    cust = load(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q_broadcast_join",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size < 10
    GROUP BY p.p_brand
    """,
)
def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint on the dimension side: the 100 TB plan is a
    map-side join — zero shuffle for the join itself, one partial-agg
    shuffle for the groupBy."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_multiway_join",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship TPC-H-Q5-style revenue rollup. Join order: dims broadcast
    onto the orders->lineitem chain, so the only large shuffle is
    lineitem x orders on o_orderkey (and AQE may broadcast orders too)."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    one = F.lit(1).cast("decimal(18,2)")
    # dim is customer-sized (scales with SF): no forced broadcast — AQE
    # broadcasts the region-filtered slice while it fits; the bounded
    # nation/region hints above can never explode
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim, orders.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (one - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_left_join",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS sum_price
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-tolerant aggregates (customers with no
    orders keep n_orders=0, sum_price=0)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): no duplication of the left side."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — also the engine's upsert primitive
    (kv upsert = old left_anti new + new; reference server.go:385-393)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q_theta_range_join",
    oracle="""
    SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
           s.user_id AS user_id
    FROM events s
    JOIN events p
      ON p.user_id = s.user_id
     AND p.ts > s.ts
     AND p.ts <= s.ts + INTERVAL 1 HOUR
    WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
    """,
)
def q_theta_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/theta join: purchase within 1h after a signup, same user.

    Executed as a BUCKETED interval join, not a per-user cross product:
    the window length (1h) is the bucket width, the signup side is
    exploded into its own bucket plus the next one, and the join key is
    (user_id, bucket) — a qualifying pair differs by 0 or 1 buckets, so
    it matches exactly one of the two exploded rows (no dedup needed)
    and the range predicate only post-filters within (user, bucket)
    groups. A plain equi-join on user_id alone would enumerate all
    signup x purchase pairs per user before filtering — one bot user
    with 10^6 events is a 10^12-pair task; bucketing bounds the group by
    the per-hour event rate instead."""
    ev = load(spark, sf_dir, "events")

    def bucket(c):
        return F.floor(F.unix_micros(c) / 3600000000)

    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
        F.explode(F.array(bucket(F.col("ts")), bucket(F.col("ts")) + 1)).alias(
            "s_bk"
        ),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        bucket(F.col("ts")).alias("p_bk"),
    )
    joined = s.join(
        p,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("p_bk") == F.col("s_bk"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select("signup_id", "purchase_id", F.col("s_user").alias("user_id"))


@query(
    "q_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
           s.ts AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest signup at-or-before it.

    Spark lacks a native ASOF JOIN; rather than join+aggregate (per-key
    cross product) we tag both sides, union them, and take a running
    `last(signup_ts)` over a window ordered by (ts, side) — signup sorts
    before purchase at equal ts to honor `s.ts <= p.ts`. One shuffle on
    user_id, linear per partition: the scalable merge-asof plan.
    """
    ev = load(spark, sf_dir, "events")
    # NULL-key guard (round-8 advice): the window's partitionBy groups
    # all NULL user_ids together, so a NULL-user signup would match a
    # NULL-user purchase — but the ASOF equi-join semantics (and the
    # DuckDB oracle) never match NULL keys. Dropping NULL-key rows from
    # the MATCH side (side 0) keeps NULL-key purchases in the output
    # (left-join semantics) with a NULL signup_ts, exactly the oracle's
    # behavior.
    s = ev.filter(
        (F.col("event_type") == "signup") & F.col("user_id").isNotNull()
    ).select(
        "user_id", "ts", F.lit(None).cast("long").alias("purchase_id"), F.lit(0).alias("side")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), F.lit(1).alias("side")
    )
    unioned = s.unionByName(p)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    signup_ts = F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w)
    return (
        unioned.withColumn("signup_ts", signup_ts)
        .filter(F.col("side") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "signup_ts",
        )
    )


@query(
    "q_full_outer_join",
    oracle="""
    WITH a AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_f
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    ),
    b AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_o
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    )
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
           COALESCE(a.n_f, 0) AS n_f,
           COALESCE(b.n_o, 0) AS n_o,
           CASE WHEN a.o_custkey IS NULL THEN 'o_only'
                WHEN b.o_custkey IS NULL THEN 'f_only'
                ELSE 'both' END AS presence
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on BOTH sides: per-customer
    finished-order counts vs open-order counts — customers who only ever
    placed one kind survive with null-filled partners. Physically a
    sort-merge join on the grouped (already shuffled-by-key) inputs; at
    scale both aggregations and the join share the o_custkey
    partitioning, so the join itself adds no third shuffle."""
    orders = load(spark, sf_dir, "orders")
    a = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("ck_f"))
        .agg(F.count("*").alias("n_f"))
    )
    b = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("ck_o"))
        .agg(F.count("*").alias("n_o"))
    )
    j = a.join(b, a.ck_f == b.ck_o, "full_outer")
    return j.select(
        F.coalesce("ck_f", "ck_o").alias("custkey"),
        F.coalesce("n_f", F.lit(0)).alias("n_f"),
        F.coalesce("n_o", F.lit(0)).alias("n_o"),
        F.when(F.col("ck_f").isNull(), "o_only")
        .when(F.col("ck_o").isNull(), "f_only")
        .otherwise("both")
        .alias("presence"),
    )


@query(
    "q_nullsafe_join",
    oracle="""
    WITH ev AS (
        SELECT event_id,
               NULLIF(CAST(json_extract(CASE WHEN json_valid(props) THEN props END, '$.k') AS INTEGER) % 7, 0)
                   AS grp
        FROM events
    ),
    a AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_a
        FROM ev WHERE event_id % 2 = 0 GROUP BY grp
    ),
    b AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_b
        FROM ev WHERE event_id % 2 = 1 GROUP BY grp
    )
    SELECT a.grp, a.n_a, b.n_b
    FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantic a
    reconciliation join needs when the key itself can be absent (here a
    deterministic NULLIF-derived group). Catalyst plans EqualNullSafe as
    an ordinary hash-join key (null-safe equality is still an
    equi-join), so the physical shape is identical to q_hash_join — no
    nested-loop penalty; both sides are pre-aggregated so the join
    matches groups, not rows.

    No reference counterpart: the reference has no join operators at all
    (SURVEY.md §2-A)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.nullif(
            F.get_json_object("props", "$.k").cast("int") % 7, F.lit(0)
        ).alias("grp"),
    )
    a = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("grp")
        .agg(F.count("*").cast("bigint").alias("n_a"))
    )
    b = (
        ev.filter(F.col("event_id") % 2 == 1)
        .groupBy("grp")
        .agg(F.count("*").cast("bigint").alias("n_b"))
    )
    return a.join(b, a["grp"].eqNullSafe(b["grp"])).select(
        a["grp"].alias("grp"), "n_a", "n_b"
    )


@query(
    "q_asof_forward",
    oracle="""
    SELECT s.event_id AS signup_id, s.user_id AS user_id, s.ts AS signup_ts,
           p.ts AS next_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON s.user_id = p.user_id AND p.ts > s.ts
    """,
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each signup, the FIRST purchase strictly
    after it — time-to-conversion lookups, label-window construction
    ("outcome within the future horizon") and next-event attribution all
    take this shape. Mirror of q_asof_join's merge-asof: tag both sides,
    union, one per-user window ordered by (ts, side) running BACKWARD
    (first purchase at-or-after via a following-frame first_value);
    purchases sort before signups at equal ts so the strict `p.ts > s.ts`
    bound holds. One shuffle on user_id, linear per partition — never a
    per-key cross product."""
    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.col("event_id").alias("signup_id"),
        F.lit(1).alias("side"),
    )
    # NULL-key guard (round-8 advice, same as q_asof_join): drop
    # NULL-user rows from the MATCH side so the shared NULL window
    # partition can never produce a cross-NULL match the ASOF
    # equi-join oracle would not.
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select(
        "user_id", "ts", F.lit(None).cast("long").alias("signup_id"), F.lit(0).alias("side")
    )
    unioned = s.unionByName(p)
    # order (ts, side): at equal ts a purchase (side 0) precedes the
    # signup, and the frame starts at 1 FOLLOWING, so an equal-ts
    # purchase is excluded -> strictly-after semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.first(
        F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        unioned.withColumn("next_purchase_ts", nxt)
        .filter(F.col("side") == 1)
        .select(
            "signup_id",
            "user_id",
            F.col("ts").alias("signup_ts"),
            "next_purchase_ts",
        )
    )


@query(
    "q_right_join",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS sum_price
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (orders RIGHT JOIN customer): every customer
    survives, order-less ones with zero counts. Catalyst normalizes
    right-outer to a left-outer with swapped sides, so the physical plan
    is identical to q_left_join's — registered for surface completeness
    (a SQL user writes both spellings) and to pin that the null-filled
    aggregate semantics match the oracle's."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("sum_price"),
        )
    )


# shared basket definition: one distinct (order, part-type) item set —
# q_cooccurrence and q_basket_rules must agree on it, so there is exactly
# one copy of the SQL fragment and one Spark builder
_BASKET_SQL = """basket AS (
        SELECT DISTINCT l.l_orderkey, p.p_type
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )"""


def _basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
    )


@query(
    "q_cooccurrence",
    oracle=f"""
    WITH {_BASKET_SQL}
    SELECT a.p_type AS type_a, b.p_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
    GROUP BY 1, 2
    ORDER BY support DESC, type_a, type_b
    LIMIT 10
    """,
)
def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (frequent-itemset support counts):
    which part types are ordered together, from a per-order distinct
    item set self-joined on the order key — the input statistic of
    association-rule and also-bought recommenders. Pair volume per
    order is bounded by the basket size squared (TPC-H baskets are ~7
    lines), so the self-join output is O(orders · basket²), linear in
    orders; the part dim broadcasts into the basket build; top-10 is a
    per-partition heap, and it BINDS on the fixtures (6 part types ->
    15 undirected pairs, so 5 are cut -- the truncation and its
    support-then-name tie-break are actually exercised). Integer
    supports, engine-exact."""
    basket = _basket(spark, sf_dir)
    a = basket.select(F.col("l_orderkey"), F.col("p_type").alias("type_a"))
    b = basket.select(F.col("l_orderkey"), F.col("p_type").alias("type_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), "type_a", "type_b")
        .limit(10)
    )


@query(
    "q_basket_rules",
    oracle=f"""
    WITH {_BASKET_SQL},
    singles AS (
        SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n FROM basket GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
            FROM basket),
    pairs AS (
        SELECT a.p_type AS antecedent, b.p_type AS consequent,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.p_type <> b.p_type
        GROUP BY 1, 2
    )
    SELECT antecedent, consequent, support,
           CAST(floor(support * 1000000.0 / sa.n) AS BIGINT)
             AS confidence_ppm,
           CAST(floor(support * 1000000.0 * t.n_orders / (sa.n * sc.n))
                AS BIGINT) AS lift_ppm
    FROM pairs
    JOIN singles sa ON sa.p_type = antecedent
    JOIN singles sc ON sc.p_type = consequent
    CROSS JOIN tot t
    WHERE support * 1000 >= 235 * t.n_orders
    """,
)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from basket co-occurrence: confidence
    P(consequent|antecedent) and lift P(pair)/(P(a)·P(c)) in floored ppm
    integers for every directed pair above a support floor — the output
    an also-bought recommender actually ranks by (lift > 1e6 ppm means
    positive association). The singles table and the 1-row basket total
    broadcast onto the pair rollup; the support floor is RELATIVE
    (support/n_orders >= 23.5% -- the Apriori min-support form, so it
    binds at every scale factor and is integer-exact cross-engine). All ratios are one double multiply-divide chain floored to
    integers — engine-exact."""
    from pot_spark.session import reliable_checkpoint

    # the basket feeds four consumers (singles, tot, both pair legs):
    # checkpoint it so the lineitem x part join + distinct runs once,
    # like the oracle CTE, instead of once per consumer
    basket = reliable_checkpoint(_basket(spark, sf_dir))
    singles = basket.groupBy("p_type").agg(F.count("*").alias("n"))
    tot = basket.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a = basket.select("l_orderkey", F.col("p_type").alias("antecedent"))
    b = basket.select("l_orderkey", F.col("p_type").alias("consequent"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("support"))
    )
    sa = singles.select(F.col("p_type").alias("antecedent"), F.col("n").alias("na"))
    sc = singles.select(F.col("p_type").alias("consequent"), F.col("n").alias("nc"))
    return (
        pairs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sc), "consequent")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("support") * 1000 >= 235 * F.col("n_orders"))
        .select(
            "antecedent",
            "consequent",
            "support",
            F.floor(F.col("support") * 1000000.0 / F.col("na"))
            .cast("bigint")
            .alias("confidence_ppm"),
            F.floor(
                F.col("support") * 1000000.0 * F.col("n_orders")
                / (F.col("na") * F.col("nc"))
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )


@query(
    "q_asof_tolerance",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts,
           CASE WHEN s.ts IS NOT NULL AND p.ts - s.ts <= INTERVAL 1 HOUR
                THEN s.ts END AS signup_ts,
           CAST(CASE WHEN s.ts IS NOT NULL
                      AND p.ts - s.ts <= INTERVAL 1 HOUR
                THEN (epoch_us(p.ts) - epoch_us(s.ts)) // 1000000
                END AS BIGINT) AS staleness_s,
           CAST(CASE WHEN s.ts IS NOT NULL
                      AND p.ts - s.ts <= INTERVAL 1 HOUR
                THEN 1 ELSE 0 END AS BIGINT) AS matched
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH A STALENESS BOUND: each purchase matches the
    latest at-or-before signup ONLY if it is at most 1 hour old —
    otherwise the match is rejected (NULL signup, matched = 0). This is
    the operator variant every feature-store lookup needs (a price /
    model-score / attribute older than the tolerance must NOT silently
    join as if fresh — q_asof_join keeps it, this rejects it), with the
    realized staleness in whole seconds for SLA audits.

    Same scalable MERGE-AS-OF plan as q_asof_join (tag, union, one
    user-keyed window pass — never a per-user cross product); the
    tolerance is a post-window filter in codegen, so the plan cost is
    identical to the unbounded as-of. Staleness uses exact microsecond
    integer arithmetic (epoch_us DIV — DuckDB epoch() returns
    fractional-second doubles, a known cross-engine trap)."""
    ev = load(spark, sf_dir, "events")
    # NULL-key guard (round-8 advice, same as q_asof_join): NULL-user
    # signups may not feed the running last() — ASOF equi-join keys
    # never match NULL. NULL-user purchases stay (left-join) unmatched.
    s = ev.filter(
        (F.col("event_type") == "signup") & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("side"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    signup_ts = F.last(
        F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    staleness = (
        F.unix_micros("ts") - F.unix_micros("signup_ts")
    ).cast("bigint")
    fresh = F.col("signup_ts").isNotNull() & (
        staleness <= 3600 * 1_000_000
    )
    return (
        s.unionByName(p)
        .withColumn("signup_ts", signup_ts)
        .filter(F.col("side") == 1)
        .withColumn("stale_us", staleness)
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.when(fresh, F.col("signup_ts")).alias("signup_ts"),
            F.when(fresh, F.expr("stale_us DIV 1000000"))
            .cast("bigint")
            .alias("staleness_s"),
            F.when(fresh, 1).otherwise(0).cast("bigint").alias("matched"),
        )
    )
