"""Scalar function families: string, date, math, array, map, JSON,
conditional.

Cross-engine parity rules applied here:
- transcendentals (ln) rounded to 6 decimals (1-ulp libm differences);
- integer-valued functions cast to the same width on both sides
  (DuckDB len()/year()/datediff() are BIGINT, Spark's are INT);
- array folds cast elements to DOUBLE before multiplying (float*float
  would lose bits differently per engine) and round the fold result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load, load_spread


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           substr(p_name, 1, 5) AS pre5,
           p_brand || '-' || p_type AS brand_type,
           (p_name LIKE '%widget%') AS is_widget,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           CAST(length(p_name) AS INTEGER) AS name_len,
           replace(p_name, ' ', '_') AS snake_name,
           trim('  ' || p_name || '  ') AS trimmed
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-propagating concatenation on BOTH sides (Spark concat /
    DuckDB ||): Spark's concat_ws skips NULL args while DuckDB's
    concat() ignores them but keeps literal separators — three
    different answers for one null operand. The || form gives the one
    semantics both engines share: any NULL poisons the result."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.substring("p_name", 1, 5).alias("pre5"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.col("p_name").like("%widget%").alias("is_widget"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           CAST(day(o_orderdate) AS INTEGER) AS o_day,
           CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INTEGER)
             AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(2,1))
                AS DOUBLE) AS tenth_price,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           round(ln(l_extendedprice), 6) AS ln_price,
           sqrt(l_extendedprice) AS sqrt_price,
           l_quantity * l_quantity AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt is IEEE-correctly-rounded (safe raw); ln is rounded; squares use
    multiplication (exact) rather than pow."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice").cast("decimal(18,2)") * F.lit(0.1).cast("decimal(2,1)"))
        .cast("double")
        .alias("tenth_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           embedding[1] AS first_val,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size / element access / higher-order fold (L2 norm). The fold
    casts float elements to double before squaring so both engines square
    the same exact values; result rounded for summation-order tolerance."""
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
    )


@query(
    "q_array_agg",
    oracle="""
    SELECT label,
           list_aggr(list_sort(list(vec_id)), 'string_agg', ',') AS vec_ids,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM embeddings
    GROUP BY label
    """,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list + array_sort, emitted as a joined string so the checked
    value is hash-stable (raw array columns break pandas-based canonical
    sorts in the external harness)."""
    return (
        load(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("vec_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("vec_ids"),
            F.count("*").alias("n_vecs"),
        )
    )


@query(
    "q_explode",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/unnest: token frequency across the corpus."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           list_aggr(list_sort(map_keys(
               MAP(['k'], [json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k')]))),
               'string_agg', ',') AS prop_keys,
           CAST(element_at(MAP(['k'], [json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k')]), 'k')[1]
                AS INTEGER) AS k_val
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map column from parsed JSON, read keys and values back.
    The key list is emitted as a sorted joined string (the q_array_agg
    pattern): raw array/map columns break the pandas-based canonical
    sort in the external harness.

    The scan is spread (r13 opt): per-row JSON parsing is the whole
    cost and ran on one core of the single-split fixture — A/B
    interleaved: sf0.1 2.71 -> 0.99 s, true-sf1 7.96 -> 2.84 s, a win
    at BOTH scales so the spread is unconditional."""
    ev = load_spread(spark, sf_dir, "events")
    m = F.create_map(F.lit("k"), F.get_json_object("props", "$.k"))
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.element_at(m, "k").cast("int").alias("k_val"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS INTEGER) AS k_int,
           json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS k_str,
           (json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') IS NOT NULL) AS has_k,
           CAST(CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS INTEGER) % 10 AS INTEGER)
             AS k_bucket
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    k_str = F.get_json_object("props", "$.k")
    return load(spark, sf_dir, "events").select(
        "event_id",
        k_str.cast("int").alias("k_int"),
        k_str.alias("k_str"),
        k_str.isNotNull().alias("has_k"),
        (k_str.cast("int") % 10).alias("k_bucket"),
    )


@query(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN l_extendedprice < 1000 THEN 'low'
                WHEN l_extendedprice < 5000 THEN 'mid'
                ELSE 'high' END AS price_band,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    band = (
        F.when(F.col("l_extendedprice") < 1000, "low")
        .when(F.col("l_extendedprice") < 5000, "mid")
        .otherwise("high")
    )
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(band.alias("price_band"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


@query(
    "q_null_funcs",
    oracle="""
    SELECT c.c_custkey,
           coalesce(CAST(o.n_orders AS BIGINT), 0) AS n_orders,
           round(coalesce(o.total, 0.0), 2) AS total_spent,
           CASE WHEN o.total IS NULL THEN 'never-ordered'
                ELSE 'customer' END AS status,
           nullif(c.c_mktsegment, 'BUILDING') AS seg_or_null
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalars (coalesce / nullif / IS NULL banding) over
    the null-bearing side of an outer join."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    agg = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )
    j = cust.join(agg, cust.c_custkey == agg.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce(F.col("n_orders").cast("bigint"), F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("total", F.lit(0.0)), 2).alias("total_spent"),
        F.when(F.col("total").isNull(), "never-ordered")
        .otherwise("customer")
        .alias("status"),
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg_or_null"),
    )


@query(
    "q_struct_funcs",
    oracle="""
    SELECT o_custkey,
           o_orderdate AS first_date,
           o_orderkey AS first_key,
           o_totalprice AS first_price,
           n_orders
    FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
        FROM orders
    ) WHERE rn = 1
    """,
)
def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type surface: build structs, collect them into an array,
    sort the array by struct field order, and project fields back out —
    the array-of-struct round-trip matching the reference's nested-doc
    complexity bar (client_test.go:18-25 `NiceThings []struct{Name}`).
    array_sort on structs compares field-by-field, so (date, key) makes
    the pick deterministic; the whole thing is one aggregation shuffle.
    The oracle replays it as the equivalent window top-1."""
    orders = load(spark, sf_dir, "orders")
    first = F.element_at(
        F.array_sort(
            F.collect_list(F.struct("o_orderdate", "o_orderkey", "o_totalprice"))
        ),
        1,
    )
    return (
        orders.groupBy("o_custkey")
        .agg(first.alias("fo"), F.count("*").alias("n_orders"))
        .select(
            "o_custkey",
            F.col("fo.o_orderdate").alias("first_date"),
            F.col("fo.o_orderkey").alias("first_key"),
            F.col("fo.o_totalprice").alias("first_price"),
            "n_orders",
        )
    )


@query(
    "q_url_funcs",
    oracle="""
    SELECT doc_id,
           CASE WHEN n_chars IS NULL THEN NULL
                ELSE source || '.example.com' END AS host,
           CASE WHEN n_chars IS NULL THEN NULL
                ELSE '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) END
             AS path,
           CAST(n_chars AS VARCHAR) AS v
    FROM documents
    """,
)
def q_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (parse_url HOST/PATH/QUERY:key) over per-doc URLs
    synthesized from fixture columns; the oracle reconstructs each
    component from the same inputs, so any parse drift (encoding, query
    splitting) hash-fails. Pure scan-side expressions, no shuffle.
    A NULL component poisons the WHOLE url (Spark concat semantics), so
    every parsed field of that row is NULL — the oracle mirrors the
    poisoning instead of rebuilding components from the intact inputs."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?v="),
        F.col("n_chars").cast("string"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("v")).alias("v"),
    )


@query(
    "q_try_funcs",
    oracle="""
    SELECT e.event_id,
           CAST(floor(e.value /
                      NULLIF(CAST(json_extract(CASE WHEN json_valid(e.props) THEN e.props END, '$.k') AS DOUBLE), 0))
                AS BIGINT) AS per_k_floor,
           TRY_CAST(substr(e.event_type, 1, 1) AS INTEGER) AS bad_int,
           TRY_CAST(CAST(json_extract(CASE WHEN json_valid(e.props) THEN e.props END, '$.k') AS VARCHAR) AS INTEGER) AS k_int
    FROM events e
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant scalar family (try_divide / try_cast): dirty-data
    arithmetic that yields NULL instead of failing the job — at 100 TB a
    single malformed row must never kill a 10^6-task stage, and try_*
    keeps the error handling inside codegen instead of a Python guard.
    Divide-by-zero (props.k = 0 rows) and unparseable casts both become
    NULLs the oracle reproduces with NULLIF/TRY_CAST. The quotient is
    floored, not rounded: floor of an identical double is engine-stable,
    while round's half-tie mode is not."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return ev.select(
        "event_id",
        F.floor(F.try_divide(F.col("value"), k)).cast("bigint").alias("per_k_floor"),
        F.try_to_number(
            F.substring("event_type", 1, 1), F.lit("999")
        ).cast("int").alias("bad_int"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    )


@query(
    "q_higher_order",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(len(list_filter(embedding, x -> x > 0))) AS BIGINT)
               AS pos_components,
           CAST(SUM(CASE WHEN len(list_filter(embedding, x -> x > 0.2)) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_has_big,
           CAST(SUM(CASE WHEN len(list_filter(embedding, x -> abs(x) > 1)) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_unit_box
    FROM embeddings
    GROUP BY label
    """,
)
def q_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (filter/exists/forall) over the
    embedding vectors: per label, total positive components, vectors
    with any component > 0.2, vectors entirely inside the unit box.
    The lambdas run inside codegen on the array in place — no explode,
    so a 64-wide vector never becomes 64 shuffle rows; the only
    exchange is the final 1-word-per-group aggregate. The oracle
    expresses exists/forall as list_filter length tests (counts are
    integers, so the hash is exact — no float tolerance needed).

    No reference counterpart (SURVEY.md §2-A)."""
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return e.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum(F.size(F.filter(v, lambda x: x > 0))).cast("bigint").alias(
            "pos_components"
        ),
        F.sum(F.exists(v, lambda x: x > 0.2).cast("int"))
        .cast("bigint")
        .alias("n_has_big"),
        F.sum(F.forall(v, lambda x: F.abs(x) <= 1).cast("int"))
        .cast("bigint")
        .alias("n_unit_box"),
    )


@query(
    "q_variant_funcs",
    oracle="""
    SELECT k_floor,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k_int) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN k_int % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_even
    FROM (
        SELECT CAST(json_extract(CASE WHEN json_valid(props) THEN props END, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract(CASE WHEN json_valid(props) THEN props END, '$.k') AS INTEGER)
                 - (CAST(json_extract(CASE WHEN json_valid(props) THEN props END, '$.k') AS INTEGER) % 10) AS k_floor
        FROM events
    )
    GROUP BY k_floor
    """,
)
def q_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): parse_json once into the
    binary variant encoding, then typed variant_get extraction — the
    open-schema path for ingesting JSON tails without a declared struct,
    and the engine-native upgrade over per-access get_json_object string
    re-parsing (each extraction re-reads the string; variant parses
    once). Decile flooring stays in integer arithmetic (k - k % 10) so
    both engines agree bit-exactly. DuckDB's oracle reads the same field
    through its JSON type.

    Generalizes the reference's schemaless JSON documents
    (server.go:315, 341-343) to a typed, columnar-friendly encoding."""
    ev = load_spread(spark, sf_dir, "events", min_bytes=8_000_000)
    # try_parse_json, not parse_json: FAILFAST variant parsing turns ONE
    # malformed/empty props string into a job abort; open-schema ingest
    # must degrade that row to NULL instead (fixture rows are all
    # well-formed, so the oracle result is unchanged)
    k = F.variant_get(F.try_parse_json("props"), "$.k", "int")
    d = ev.select(k.alias("k_int"))
    return (
        d.withColumn("k_floor", F.col("k_int") - (F.col("k_int") % 10))
        .groupBy("k_floor")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("k_int").cast("bigint").alias("sum_k"),
            # coalesce the predicate: a NULL k is "not even" (counts 0,
            # the oracle CASE's ELSE), so the all-null group sums to 0
            # instead of NULL
            F.sum(F.coalesce((F.col("k_int") % 2 == 0).cast("int"), F.lit(0)))
            .cast("bigint")
            .alias("n_even"),
        )
    )


@query(
    "q_collation",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
                    ELSE lower(p_brand) END AS brand_mixed,
               p_retailprice
        FROM part
    )
    SELECT lower(brand_mixed) AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM mixed
    GROUP BY lower(brand_mixed)
    """,
)
def q_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): case-insensitive grouping expressed
    as a COLLATION PROPERTY of the column (UTF8_LCASE) instead of eager
    lower() normalization — the engine's comparator, hash and group-by
    all honor it, so the original casing stays available to downstream
    consumers while equality is case-insensitive. A deterministically
    mixed-case brand column groups to one row per brand; the output key
    is re-collated to UTF8_BINARY so the result schema is a plain
    string. The oracle expresses the same semantics the pre-collation
    way (lower() everywhere) — which is exactly the rewrite collations
    make unnecessary.

    No reference counterpart (SURVEY.md §2-A)."""
    part = load(spark, sf_dir, "part")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.upper("p_brand")
    ).otherwise(F.lower("p_brand"))
    return (
        part.select(mixed.alias("brand_mixed"), "p_retailprice")
        .groupBy(F.collate("brand_mixed", "UTF8_LCASE").alias("k"))
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            F.collate(F.lower("k"), "UTF8_BINARY").alias("brand"),
            "n_parts",
            "sum_price",
        )
    )


@query(
    "q_array_setops",
    oracle="""
    WITH halves AS (
        SELECT o_custkey,
               COALESCE(list_sort(list_distinct(list(o_orderstatus)
                   FILTER (WHERE o_orderdate <  TIMESTAMP '1998-01-01'))), [])
                 AS s_early,
               COALESCE(list_sort(list_distinct(list(o_orderstatus)
                   FILTER (WHERE o_orderdate >= TIMESTAMP '1998-01-01'))), [])
                 AS s_late
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(len(list_intersect(s_early, s_late)) AS INTEGER) AS n_both,
           CAST(len(list_distinct(list_concat(s_early, s_late))) AS INTEGER)
             AS n_union,
           CAST(len(list_filter(s_early, x -> NOT list_contains(s_late, x)))
                AS INTEGER) AS n_only_early
    FROM halves
    ORDER BY o_custkey LIMIT 100
    """,
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (array_intersect / array_union / array_except)
    over per-customer status sets from two order periods — churn-style
    'behaviors kept / gained / lost' comparisons computed entirely as
    codegen array expressions after ONE grouped collect per customer.
    The conditional collect_set pair shares a single shuffle; the set
    ops never leave the JVM; top-100 plans as TakeOrderedAndProject."""
    orders = load(spark, sf_dir, "orders")
    cut = "1998-01-01"
    halves = orders.groupBy("o_custkey").agg(
        F.array_sort(
            F.collect_set(
                F.when(F.col("o_orderdate") < cut, F.col("o_orderstatus"))
            )
        ).alias("s_early"),
        F.array_sort(
            F.collect_set(
                F.when(F.col("o_orderdate") >= cut, F.col("o_orderstatus"))
            )
        ).alias("s_late"),
    )
    return (
        halves.select(
            "o_custkey",
            F.size(F.array_intersect("s_early", "s_late")).alias("n_both"),
            F.size(F.array_union("s_early", "s_late")).alias("n_union"),
            F.size(F.array_except("s_early", "s_late")).alias("n_only_early"),
        )
        .orderBy("o_custkey")
        .limit(100)
    )
