"""Scans, projections, predicates, JSON parsing, and sink round-trips.

Generalizes the reference's only read path — whole-pot scan Get()
(/root/reference/server.go:468-491) — into columnar scans where Catalyst
pushes predicates and prunes columns down to the parquet reader.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.tables import load, load_spread


def _sink_dir(sf_dir: str, kind: str) -> str:
    """Round-trip sink dir, unique per fixture AND per process.

    The fixture identity is the absolute path (a bare basename collides
    across fixture roots that share a name); the pid suffix keeps two
    concurrent sessions (bench at sf0.1 + correctness gate at sf0.01, or
    two drivers on one host) from mode("overwrite")-deleting files a
    concurrent reader of the same dir has already listed. Per-PID dirs
    are torn down atexit (the session.py checkpoint-dir pattern) so
    repeated process runs don't accumulate /tmp garbage forever."""
    import atexit
    import hashlib
    import shutil

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    h = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    d = os.path.join(
        tempfile.gettempdir(), f"pot_spark_{kind}_{tag}_{h}_{os.getpid()}"
    )
    if d not in _SINK_DIRS_REGISTERED:
        _SINK_DIRS_REGISTERED.add(d)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


_SINK_DIRS_REGISTERED: set[str] = set()



@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_extendedprice, l_shipdate
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: ReadSchema must contain only the 3 columns."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_shipdate"
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30 AND l_returnflag = 'R'
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushed to the parquet scan (PushedFilters in explain)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@query(
    "q_scan_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON-string props column into typed fields.

    Mirrors the reference's schemaless JSON documents (server.go:315,
    341-343) landed as a typed column.
    """
    ev = load_spread(spark, sf_dir, "events", min_bytes=2_000_000)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@query(
    "q_sink_parquet",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink round-trip: write a filtered projection, read it back,
    aggregate. The oracle computes the same aggregate straight from the
    source table, so this checks the sink preserves values exactly."""
    out = _sink_dir(sf_dir, "sink_parquet")
    orders = load(spark, sf_dir, "orders")
    (
        orders.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


@query(
    "q_sink_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink/source round-trip with explicit schema (no inferSchema)."""
    out = _sink_dir(sf_dir, "sink_csv")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    cust.write.mode("overwrite").option("header", "true").csv(out)
    back = spark.read.schema("c_custkey long, c_mktsegment string, c_acctbal double").option(
        "header", "true"
    ).csv(out)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_bal"),
    )


@query(
    "q_sink_json_roundtrip",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MAX(p_size) AS INTEGER) AS max_size
    FROM part
    GROUP BY p_brand
    """,
)
def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink/source round-trip — the reference's native document
    format (server.go:315-331) as an egress/ingest format."""
    out = _sink_dir(sf_dir, "sink_json")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    part.write.mode("overwrite").json(out)
    back = spark.read.schema("p_partkey long, p_brand string, p_size int").json(out)
    return back.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.max("p_size").alias("max_size"),
    )


@query(
    "q_sink_text_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(length(COALESCE(regexp_replace(text, '[\r\n]', ' ', 'g'), '')))
                AS BIGINT) AS total_chars,
           CAST(MIN(length(COALESCE(regexp_replace(text, '[\r\n]', ' ', 'g'), '')))
                AS BIGINT) AS min_len
    FROM documents
    """,
)
def q_sink_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source/sink: document bodies written as one line each
    (spark.read/write.text — the rawest corpus interchange format), read
    back and aggregated. Line counts and char totals must survive the
    round trip exactly, so the writer SANITIZES what a line sink cannot
    represent: embedded CR/LF become spaces (same length, one line per
    doc — otherwise one multiline document silently becomes several
    records downstream) and NULL bodies become empty lines. The oracle
    applies the identical normalization."""
    out = _sink_dir(sf_dir, "text")
    docs = load(spark, sf_dir, "documents").select(
        F.coalesce(
            F.regexp_replace("text", "[\\r\\n]", " "), F.lit("")
        ).alias("value")
    )
    docs.write.mode("overwrite").text(out)
    rb = spark.read.text(out)
    return rb.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).cast("bigint").alias("total_chars"),
        F.min(F.length("value")).cast("bigint").alias("min_len"),
    )


@query(
    "q_sink_xml_roundtrip",
    oracle="""
    SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM supplier
    GROUP BY 1
    """,
)
def q_sink_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink/source round-trip (Spark 4 native XML source, rowTag
    records) with explicit read schema — the document-interchange format
    next to JSON-lines. Aggregates must survive the trip exactly."""
    out = _sink_dir(sf_dir, "sink_xml")
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    supp.write.mode("overwrite").format("xml").option("rowTag", "supplier").save(out)
    back = (
        spark.read.schema("s_suppkey long, s_nationkey long, s_acctbal double")
        .format("xml")
        .option("rowTag", "supplier")
        .load(out)
    )
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_bal"),
    )


@query(
    "q_merge_schema",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(o_totalprice) AS BIGINT) AS n_with_price
    FROM (
        SELECT o_orderkey, o_orderpriority, NULL::DOUBLE AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 1
    )
    GROUP BY o_orderpriority
    """,
)
def q_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet generations with different
    column sets (the old files lack o_totalprice) are read as one table
    via mergeSchema — missing columns surface as NULLs, exactly how a
    lakehouse absorbs additive schema changes without rewriting history."""
    base = _sink_dir(sf_dir, "evo")
    orders = load(spark, sf_dir, "orders")
    (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_orderpriority")  # old schema: no price
        .write.mode("overwrite")
        .parquet(os.path.join(base, "gen=1"))
    )
    (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "gen=2"))
    )
    rb = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "gen=1"), os.path.join(base, "gen=2")
    )
    return rb.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.count("o_totalprice").alias("n_with_price"),
    )


@query(
    "q_scan_corrupt_tolerant",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_scan_corrupt_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-file-tolerant scan: a directory holding the orders data
    plus one garbage file that is not parquet, read with
    ignoreCorruptFiles so the malformed file is skipped and the good
    rows still flow. This is the posture a 100 TB ingest needs — one
    truncated upload must not kill a million-file scan; the skip happens
    per-file at footer-validation time, so healthy files pay nothing.
    The oracle recomputes from the clean source, proving no good row was
    dropped alongside the bad file."""
    import hashlib
    import shutil

    # content-identity cache key (abspath + source mtime/size): a second
    # fixture sharing the basename, or an in-place regeneration, gets a
    # fresh staging dir instead of silently reusing stale orders data;
    # publish by atomic rename so a crashed stager leaves nothing behind
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:16]
    out = os.path.join(tempfile.gettempdir(), f"pot_spark_corrupt_{key}")
    if not os.path.isdir(out):
        stage = tempfile.mkdtemp(prefix="pot_spark_corrupt_stage_")
        load(spark, sf_dir, "orders").write.mode("overwrite").parquet(stage)
        with open(os.path.join(stage, "part-corrupt.parquet"), "wb") as f:
            f.write(b"this is not a parquet file")
        try:
            os.rename(stage, out)
        except OSError:  # concurrent stager published first
            shutil.rmtree(stage, ignore_errors=True)
    back = (
        spark.read.option("ignoreCorruptFiles", "true")
        .schema(load(spark, sf_dir, "orders").schema)
        .parquet(out)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )
